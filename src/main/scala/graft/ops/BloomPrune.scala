package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction: build a bloom filter over the (already
  * filtered) dimension's join keys and pre-filter the fact side with it
  * BEFORE the join's shuffle, so rows that cannot match never enter the
  * exchange.
  *
  * Why this exists when Spark has AQE runtime filters
  * (`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`): the injected
  * filter is best-effort — it only fires when the creation-side plan cost
  * clears internal thresholds, silently does nothing otherwise, and its
  * sizing is opaque. A pipeline that KNOWS one side is a selective dim
  * (the reference's date-scoped sync joins fact rows to a filtered key
  * universe, e.g. `main_paginated.py:118-143`'s keyset-scoped pulls) wants
  * the reduction guaranteed and sized from its own key-count estimate.
  *
  * Mechanics: both sides hash the key with xxhash64 (the bloom stores
  * longs), so membership has NO false negatives — every true match passes
  * the pre-filter and the exact join afterwards makes false positives
  * harmless. The result is therefore bit-identical to the plain join, which
  * is exactly what the oracle checks.
  *
  * The serialized filter is collected to the driver and embedded as a
  * literal — a bounded control-plane artifact (~1.2 MB at the default 10⁶
  * expected items / 3% fpp), the same category as the PQ codebook
  * ([[graft.ann.Pq]]): its size depends on the EXPECTED KEY COUNT, never on
  * fact rows, so it is as driver-safe at 100 TB as at sf0.01. At 1000
  * executors the literal rides task broadcast once per executor.
  *
  * 100 TB story: the fact-side scan → bloom filter → exchange ordering
  * means a 95%-selective dim predicate drops ~95% of fact bytes from the
  * join shuffle (modulo fpp). That is the difference between shuffling
  * 100 TB and shuffling 5 TB, and it composes with AQE skew handling and
  * with partition pruning (the bloom runs AFTER pushed-down scan filters).
  * PlanSpec asserts the `might_contain` predicate evaluates below the
  * fact side's Exchange.
  */
object BloomPrune {

  /** Serialized bloom filter over `xxhash64(key)` for every row of `keys`.
    * One partial aggregate per partition, merged on the driver — the only
    * full pass over the dim, reusable across any number of fact joins.
    *
    * `expectedItems` ≤ 0 (the default) sizes the filter from a count of
    * `keys` — one cheap aggregate over the (column-pruned) dim subtree,
    * often satisfied by parquet row-group stats. A fixed constant that
    * doesn't track scale factor SATURATES silently once the dim outgrows
    * it: fpp drifts toward 1 and the prune degrades to a correct no-op
    * with the stated shuffle reduction gone and no signal — exactly the
    * no-silent-caps failure. Counting is an upper bound on distinct keys,
    * so the derived size can only over-provision (fpp at or below design
    * point); pass an explicit estimate only when the caller already knows
    * the key count.
    */
  def buildFilter(keys: DataFrame, key: Column, expectedItems: Long = 0L): Array[Byte] = {
    val items = if (expectedItems > 0L) expectedItems else math.max(keys.count(), 64L)
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)), items).toAggregateExpression()
    keys.select(ColumnBridge.column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** `might_contain(filter, xxhash64(key))` as a Column predicate. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType), ColumnBridge.expression(xxhash64(key))))

  /** Equi-join `fact` to `dim` with the fact side bloom-pruned first.
    * Output ≡ `fact.join(dim, fact(factKey) === dim(dimKey), joinType)` —
    * the equivalence holds because the bloom has no false negatives and
    * the exact join removes false positives, which is sound precisely for
    * the match-preserving join types this method accepts: `inner` and
    * `left_semi` (validated; an outer/anti join would need the DROPPED
    * fact rows, which the pre-filter cannot preserve). The dim is scanned
    * twice (bloom build + join) — at scale the build pass is dim-sized and
    * map-side-only, orders of magnitude under the fact shuffle bytes it
    * saves. `expectedItems` defaults to auto-sizing from the dim count
    * (see [[buildFilter]]).
    */
  def pruneJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedItems: Long = 0L, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi", "leftsemi").contains(joinType.toLowerCase),
      s"pruneJoin supports inner/left_semi joins only, got $joinType")
    val bf = buildFilter(dim, col(dimKey), expectedItems)
    fact.filter(mightContain(bf, col(factKey)))
      .join(dim, fact(factKey) === dim(dimKey), joinType)
  }
}

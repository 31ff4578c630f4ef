package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (X13; beyond-reference): keep a
  * grouped aggregate CURRENT under arriving batches without re-scanning the
  * fact table — materialized-view maintenance by partial-aggregate fold,
  * the dd11b persisted-artifact economics applied to aggregation.
  *
  * The artifact is the PARTIAL table: one row per group with associative
  * summaries (COUNT + long SUMs). Folding a batch is
  * `partials(batch) ∪ artifact → groupBy keys → sum the summaries` — cost
  * O(batch + groups), never O(fact). This is exactly the algebra Spark's
  * own partial/final HashAggregate uses inside one query
  * (`a11_partial_merge_agg` demonstrates it in-plan); here the partial
  * state is persisted BETWEEN jobs, which is what makes a 100 TB fact's
  * daily report an increment-sized job instead of a full re-aggregation.
  *
  * Only associative-commutative summaries qualify (counts, long/decimal
  * sums, min/max); averages and ratios must be derived from sums at serve
  * time — [[Exact.cents]] keeps money columns in exact long arithmetic so
  * the fold is bit-identical to a from-scratch recompute at any fold depth.
  */
object IncrementalAgg {

  /** One partial row per group: `n_rows` + each named long sum. */
  def partials(df: DataFrame, keys: Seq[String], sums: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      sums.map { case (name, c) => sum(c).as(name) }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Persist the base fact's partial table — the artifact serves every
    * subsequent fold; the base fact is never re-read.
    */
  def writePartials(df: DataFrame, keys: Seq[String],
      sums: Seq[(String, org.apache.spark.sql.Column)], path: String): Unit =
    partials(df, keys, sums).write.mode("overwrite").parquet(path)

  /** Update the ARTIFACT itself: merge an increment's partials into the
    * persisted table and atomically swap it in (write-aside + rename, via
    * [[graft.merge.AtomicWriter]]) — the step a scheduled pipeline runs per
    * batch so folds compose to any depth at O(batch + groups) each. The
    * merged frame groups at most `groups + batch-groups` rows, so the swap
    * write is artifact-sized, never fact-sized.
    */
  def foldIntoPartials(spark: SparkSession, path: String, increment: DataFrame,
      keys: Seq[String], sums: Seq[(String, org.apache.spark.sql.Column)]): Unit = {
    val aggs = sum(col("n_rows")).as("n_rows") +:
      sums.map { case (name, _) => sum(col(name)).as(name) }
    val merged = spark.read.parquet(path)
      .unionByName(partials(increment, keys, sums))
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    graft.merge.AtomicWriter.overwrite(merged, path)
  }

  /** Fold an increment into the persisted partials and serve the merged
    * aggregate. Scans: the partials parquet + the increment — nothing else
    * (spec-pinned via the plan's input files).
    */
  def serveWithIncrement(spark: SparkSession, path: String, increment: DataFrame,
      keys: Seq[String], sums: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val merged = spark.read.parquet(path)
      .unionByName(partials(increment, keys, sums))
    val aggs = sum(col("n_rows")).as("n_rows") +:
      sums.map { case (name, _) => sum(col(name)).as(name) }
    merged.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}

package graft

import graft.ops.BloomPrune
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction: the prune must be invisible in the result
  * (no false negatives + exact final join) and visible in the plan
  * (PlanSpec asserts the filter sits below the fact-side exchange).
  */
class BloomPruneSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("pruneJoin output equals the plain join bit-for-bit") {
    val fact = Tables.lineitem(spark, dir)
    val dim = Tables.part(spark, dir).filter(col("p_size") <= 5)
      .select(col("p_partkey"), col("p_brand"))
    val pruned = BloomPrune.pruneJoin(fact, "l_partkey", dim, "p_partkey")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("p_brand"))
    val plain = fact.join(dim, fact("l_partkey") === dim("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("p_brand"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    assert(pruned.count() === plain.count())
  }

  test("the filter admits every dim key (no false negatives)") {
    val dim = Tables.part(spark, dir).select(col("p_partkey"))
    val bf = BloomPrune.buildFilter(dim, col("p_partkey"))
    val admitted = dim.filter(BloomPrune.mightContain(bf, col("p_partkey"))).count()
    assert(admitted === dim.count())
  }

  test("dd12: verbatim re-arrivals flag dup, suffixed arrivals flag new") {
    val out = graft.queries.LlmQueries.defs("dd12_bloom_incremental")(
      spark, "/root/testdata/sf0.001")
    assert(out.filter(col("doc_id") >= 800000 && col("doc_id") < 900000 &&
      !col("is_dup")).isEmpty, "a verbatim re-arrival escaped the dedup")
    assert(out.filter(col("doc_id") >= 900000 && col("is_dup")).isEmpty,
      "a novel doc was falsely deduped")
  }

  test("left_semi pruneJoin equals the plain semi join; outer types are rejected") {
    val fact = Tables.lineitem(spark, dir)
    val dim = Tables.part(spark, dir).filter(col("p_size") <= 5)
      .select(col("p_partkey"))
    val pruned = BloomPrune.pruneJoin(fact, "l_partkey", dim, "p_partkey",
        joinType = "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val plain = fact.join(dim, fact("l_partkey") === dim("p_partkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    // an outer join would need the fact rows the pre-filter drops
    intercept[IllegalArgumentException] {
      BloomPrune.pruneJoin(fact, "l_partkey", dim, "p_partkey", joinType = "left_outer")
    }
  }

  test("auto-sizing keeps fpp at design point where a stale constant saturates") {
    // 50k keys through a filter sized for 100 items: saturated, nearly
    // everything passes; auto-sized from the same frame, fpp stays ~3%
    val keys = spark.range(0, 50000).select((col("id") * 7919L).as("k"))
    val probes = spark.range(10000000, 10010000).select(col("id").as("k"))
    val saturated = BloomPrune.buildFilter(keys, col("k"), expectedItems = 100L)
    val auto = BloomPrune.buildFilter(keys, col("k"))
    val satPassed = probes.filter(BloomPrune.mightContain(saturated, col("k"))).count()
    val autoPassed = probes.filter(BloomPrune.mightContain(auto, col("k"))).count()
    assert(satPassed > 5000, s"expected a saturated filter to leak, passed $satPassed")
    assert(autoPassed < 500, s"auto-sized filter passed $autoPassed of 10000 non-members")
  }

  test("the filter rejects most keys outside the dim (fpp is real)") {
    val dim = Tables.part(spark, dir).select(col("p_partkey"))
    val bf = BloomPrune.buildFilter(dim, col("p_partkey"), expectedItems = 10000L)
    // keys far outside the dim's key space: nearly all must be rejected
    val probes = spark.range(1000000, 1010000).select(col("id").as("k"))
    val passed = probes.filter(BloomPrune.mightContain(bf, col("k"))).count()
    assert(passed < 500, s"bloom passed $passed of 10000 non-member keys")
  }
}

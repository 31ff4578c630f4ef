package graft

import graft.text.Decontaminate
import org.apache.spark.sql.functions._

/** tx9: benchmark decontamination — planted-contamination recall, clean-doc
  * specificity, and the broadcast shape of the gram join.
  */
class DecontaminateSpec extends SparkSuite {
  import spark.implicits._

  test("verbatim benchmark copies flag; disjoint-vocab docs don't") {
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val corpus = Seq(
      // verbatim copy of bench doc 1 -> many shared 5-grams
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // partial overlap: exactly one window of 5 consecutive bench words
      (11L, "xx alpha beta gamma delta epsilon yy zz ww vv uu"),
      // disjoint vocabulary
      (12L, "red green blue cyan magenta yellow black white pink grey"))
      .toDF("doc_id", "text")
    val out = Decontaminate.flag(corpus, bench, "doc_id", "text", k = 5, minHits = 3L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(10L)._1 === 6L) // 10 words -> 6 distinct 5-grams, all shared
    assert(out(10L)._2)
    assert(out(11L) === ((1L, false))) // one shared gram < minHits
    assert(out(12L) === ((0L, false)))
  }

  test("every corpus doc gets a row; eval docs flag themselves") {
    val docs = sf("documents")
    val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val out = Decontaminate.flag(docs, bench, "doc_id", "text")
    assert(out.count() === docs.count())
    // a bench doc shares ALL its grams with the bench set
    val self = out.join(bench.select(col("doc_id")), Seq("doc_id"))
    assert(self.filter(!col("is_contaminated")).count() === 0)
  }

  test("the gram join broadcasts the benchmark side") {
    val docs = sf("documents")
    val out = Decontaminate.flag(docs,
      docs.filter(pmod(col("doc_id"), lit(50)) === 0), "doc_id", "text")
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(600))
  }
}

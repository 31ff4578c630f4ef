package graft

import graft.ops.HeavyHitters
import org.apache.spark.sql.functions._

/** x10: two-pass Misra–Gries heavy hitters — the output must be EXACT
  * (equal to brute-force group-count) even when the sketch is far too
  * small to hold the key space, because the sketch only proposes a
  * candidate superset and the verify pass counts exactly.
  */
class HeavyHittersSpec extends SparkSuite {

  private def docs = sf("documents")

  test("output equals the brute-force exact answer on the documents corpus") {
    val toks = filter(graft.text.TextOps.tokens(lower(col("text"))),
      t => length(t) > 0)
    val out = HeavyHitters.exactTopShare(spark, docs, toks, share = 0.0005)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val exploded = docs.select(explode(toks).as("key"))
    val n = exploded.count()
    val brute = exploded.groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= math.floor(n * 0.0005).toLong + 1L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out.nonEmpty && out === brute)
  }

  test("a sketch far smaller than the key space still yields exact hitters") {
    import spark.implicits._
    // 4 heavy keys (200 each) drowned in 2000 singletons; sketchSize 40
    // cannot hold the key space, but 200/2800 > 1/41 so the superset
    // guarantee holds and the verify pass must recover exact counts
    val rows = (0 until 4).flatMap(h => Seq.fill(200)(s"hot$h")) ++
      (0 until 2000).map(i => s"cold$i")
    val df = rows.toDF("k").select(array(col("k")).as("ks"))
      .repartition(7) // adversarial partitioning: partials merge across 7 maps
    val out = HeavyHitters.exactTopFreq(spark, df, col("ks"),
      minFreq = 100L, sketchSize = 40)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out === (0 until 4).map(h => (s"hot$h", 200L)).toSet)
  }

  test("configurations that could miss a hitter are refused, not truncated") {
    import spark.implicits._
    val df = (0 until 100).map(i => s"k$i").toDF("k")
      .select(array(col("k")).as("ks"))
    // minFreq 2 over 100 items with a 10-entry sketch: 2 <= 100/11 — the
    // superset guarantee fails and the call must refuse
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.exactTopFreq(spark, df, col("ks"), minFreq = 2L, sketchSize = 10)
    }
    assert(e.getMessage.contains("superset"))
    // share-form: structurally refused before any job runs
    val e2 = intercept[IllegalArgumentException] {
      HeavyHitters.exactTopShare(spark, df, col("ks"), share = 0.0001, sketchSize = 100)
    }
    assert(e2.getMessage.contains("guarantee floor"))
  }

  test("nondeterministic inputs are refused: the two passes must read one realization") {
    import spark.implicits._
    val base = (0 until 100).map(i => s"k${i % 3}").toDF("k")
    // rand in the lineage: pass 2 would count a different realization than
    // the one pass 1 sketched — must refuse, not silently drop a hitter
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.exactTopFreq(spark,
        base.filter(rand(42) > 0.5).select(array(col("k")).as("ks")),
        col("ks"), minFreq = 10L)
    }
    assert(e.getMessage.contains("deterministic"))
    // a Sample operator is equally nondeterministic across reads
    val e2 = intercept[IllegalArgumentException] {
      HeavyHitters.exactTopFreq(spark,
        base.sample(0.5).select(array(col("k")).as("ks")),
        col("ks"), minFreq = 10L)
    }
    assert(e2.getMessage.contains("deterministic"))
    // the materialized form of the same input is accepted
    val out = HeavyHitters.exactTopFreq(spark,
      base.sample(0.5).select(array(col("k")).as("ks")).localCheckpoint(true),
      col("ks"), minFreq = 1L)
    assert(out.count() > 0)
  }
}

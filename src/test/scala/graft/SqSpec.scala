package graft

import graft.ann.{Pq, Sq}
import org.apache.spark.sql.functions._

/** ann8: SQ8 scalar quantization — the scale guard (the ann4 lesson applied
  * to the SQ path) and the codes-only-shuffle contract.
  */
class SqSpec extends SparkSuite {

  private def emb = sf("embeddings")

  test("scale guard: shallow blocks keep the fixed path; oversize ones reroute to learned lists") {
    // 500 vectors / 10 labels = avg depth 50, under the default 256 cap:
    // the guarded default must equal the pinned fixed-block path exactly
    val guardedDefault = Sq.sqTopK(emb, "label", k = 3).collect().toSet
    val pinned = Sq.sqTopK(emb, "label", k = 3, contrast = true).collect().toSet
    assert(guardedDefault === pinned)
    // force the guard (any real block exceeds avg depth 1): the reroute must
    // equal the learned-list path with the same adaptive parameters — i.e.
    // no default call can reach the fixed-block quadratic
    val rerouted = Sq.sqTopK(emb, "label", k = 3, maxAvgBlock = 1)
      .withColumn("block", col("block").cast("string")).collect().toSet
    val cents = Pq.coarseTrain(emb, Pq.adaptiveNlist(emb.count()))
    val learned = Sq.sqTopKLearned(emb, k = 3, cents, nprobe = 2)
      .withColumn("block", col("block").cast("string")).collect().toSet
    assert(rerouted === learned)
    assert(rerouted !== pinned) // the two routes are genuinely different plans
  }

  test("deep tier: past the flat nlist clamp the reroute blocks by the IMI, not clamped lists") {
    // maxNlist = 4 makes 500 vectors "past the clamp" (ceil(500/32) = 16 > 4):
    // the guard must train the inverted multi-index and match a direct
    // sqTopKImi call with the same adaptive parameters — the ann7 100x knee
    // is not reachable through the guard either
    val viaGuard = Sq.sqTopK(emb, "label", k = 3, maxAvgBlock = 1, maxNlist = 4)
      .collect().toSet
    // guarded entry point emits a stable string block; tier-named functions
    // keep their natural int list id — align for compare
    val imi = Pq.train(emb, m = 2, k = Pq.adaptiveImiK(emb.count()))
    val direct = Sq.sqTopKImi(emb, k = 3, imi, nprobe = 2)
      .withColumn("block", col("block").cast("string")).collect().toSet
    assert(viaGuard === direct)
    // and the IMI blocking is genuinely different from the clamped flat tier
    val cents = Pq.coarseTrain(emb, Pq.adaptiveNlist(emb.count(), maxNlist = 4))
    val flat = Sq.sqTopKLearned(emb, k = 3, cents, nprobe = 2)
      .withColumn("block", col("block").cast("string")).collect().toSet
    assert(viaGuard !== flat)
  }

  test("learned path: planted identical vectors are recalled at code distance 0") {
    // a copy quantizes and codes identically and lands in the same home
    // list, so the query's first probe finds it at d2 = 0
    val copies = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(copies)
    val cents = Pq.coarseTrain(corpus, Pq.adaptiveNlist(corpus.count()))
    val out = Sq.sqTopKLearned(corpus, k = 1, cents, nprobe = 2)
    (0 until 5).foreach { i =>
      val row = out.filter(col("query_id") === (i + 100000)).head()
      assert(row.getAs[Long]("neighbor_id") === i.toLong &&
        row.getAs[Long]("d2") === 0L,
        s"copy ${i + 100000}: got ${row.getAs[Long]("neighbor_id")} d2=${row.getAs[Long]("d2")}")
    }
  }

  test("learned path: no pair is scored twice (a neighbor lives in exactly one list)") {
    val cents = Pq.coarseTrain(emb, Pq.adaptiveNlist(emb.count()))
    val top = Sq.sqTopKLearned(emb, k = 1000000, cents, nprobe = 3)
    val dups = top.groupBy("query_id", "neighbor_id").count()
      .filter(col("count") > 1).count()
    assert(dups === 0L)
  }

  test("learned path: no exchange carries the raw embedding — codes only cross the wire") {
    val cents = Pq.coarseTrain(emb, Pq.adaptiveNlist(emb.count()))
    val out = Sq.sqTopKLearned(emb, k = 3, cents, nprobe = 2)
    out.collect() // finalize the adaptive plan, then read each Exchange's input
    val formatted = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val lines = formatted.linesIterator.toVector
    val exchangeInputs = lines.zipWithIndex
      .filter { case (l, _) => l.matches(""".*\(\d+\) (Broadcast)?Exchange.*""") }
      .filterNot { case (_, i) =>
        // starved-scan spread exemption: see PqSpec — the claim under test
        // is about the CANDIDATE JOIN's exchanges
        lines.drop(i + 1).take(3).exists(_.contains("RoundRobinPartitioning"))
      }
      .map { case (_, i) =>
        lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse("")
      }
    assert(exchangeInputs.nonEmpty, formatted.take(800))
    exchangeInputs.foreach { in =>
      assert(!in.contains("embedding") && !in.contains("__emb"),
        s"embedding crossed an exchange: $in")
    }
  }

  test("custom id/emb column names thread through both paths") {
    val renamed = emb.select(col("vec_id").as("item"), col("embedding").as("vec"),
      col("label"))
    val viaRenamed = Sq.sqTopK(renamed, "label", k = 3, contrast = true,
      idCol = "item", embCol = "vec").collect().toSet
    val viaDefault = Sq.sqTopK(emb, "label", k = 3, contrast = true).collect().toSet
    assert(viaRenamed === viaDefault)
  }
}

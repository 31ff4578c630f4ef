package graft

import graft.ann.Pq
import org.apache.spark.sql.functions._

/** ann4: IVF+PQ. Training determinism, the ADC lower-bound property on
  * planted duplicates, and the compression contract (codes in [0, k)).
  */
class PqSpec extends SparkSuite {
  import spark.implicits._

  private def emb = sf("embeddings")

  test("training is deterministic and codebooks are well-formed") {
    val m1 = Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    val m2 = Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    assert(m1.codebooks.flatten.flatten.toSeq === m2.codebooks.flatten.flatten.toSeq)
    assert(m1.codebooks.length === 4)
    assert(m1.codebooks.forall(_.length === 8))
    assert(m1.codebooks.forall(_.forall(_.length === m1.subDim)))
  }

  test("planted exact duplicates achieve the minimal ADC and are recalled") {
    // a duplicate shares the query's codes, so its ADC equals the query's
    // own quantization residual — the minimum any candidate can achieve
    val planted = emb.filter(col("vec_id") % 7 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    val corpus = emb.unionByName(planted)
    val model = Pq.train(corpus, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    val top = Pq.ivfPqTopK(corpus, "label", k = 3, model)
    val hits = top.filter(col("neighbor_id") === col("query_id") + 100000)
      .select("query_id").distinct().count()
    val nPlanted = planted.count()
    assert(nPlanted > 0)
    assert(hits.toDouble / nPlanted >= 0.8,
      s"duplicate recall ${hits.toDouble / nPlanted} < 0.8")
    // ranking sanity: ranks dense from 1, adc non-negative
    val r = top.groupBy("query_id").agg(min(col("rank").cast("long")).as("mn"),
      min(col("adc")).as("minadc")).collect()
    assert(r.forall(_.getLong(1) == 1L))
    assert(r.forall(_.getLong(2) >= 0L))
  }

  test("native LUT equals a naive recomputation (quantize + all m x k distances)") {
    val model = Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    val rows = emb.select(col("vec_id"),
        org.apache.spark.sql.graft.ColumnBridge.column(graft.functions.PqDistances(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("embedding")),
          model.m, model.k, model.subDim,
          model.codebooks.flatten.flatten.toIndexedSeq)).as("lut"),
        col("embedding"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getSeq[Float](2).map(v =>
        java.math.BigDecimal.valueOf(v.toDouble * 1000000d)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()).toArray
      val expected = for (mi <- 0 until model.m; j <- 0 until model.k) yield
        (0 until model.subDim).map { t =>
          val d = e(mi * model.subDim + t) - model.codebooks(mi)(j)(t); d * d
        }.sum
      assert(r.getSeq[Long](1) === expected, s"vec ${r.getLong(0)}")
    }
  }

  test("ann5 re-rank: planted exact duplicates score d2 = 0 at rank 1") {
    val planted = emb.filter(col("vec_id") % 7 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    val corpus = emb.unionByName(planted)
    val model = Pq.train(corpus, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    val out = Pq.ivfPqRerankTopK(corpus, "label", k = 3, shortlist = 10, model)
    val dup = out.filter(col("neighbor_id") === col("query_id") + 100000)
    assert(dup.count() > 0)
    // an exact duplicate quantizes identically -> exact distance 0 -> and
    // 0 is the global minimum, so re-ranking must place it first
    assert(dup.filter(col("d2") =!= 0L || col("rank") =!= 1).count() === 0)
  }

  test("ann5 d2 is the exact integer L2 of the quantized pair, ranks dense") {
    val model = Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    val out = Pq.ivfPqRerankTopK(emb, "label", k = 3, shortlist = 10, model).collect()
    assert(out.nonEmpty)
    val vecs: Map[Long, Array[Long]] = emb.select(col("vec_id"), col("embedding"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[Float](1).map(v =>
          java.math.BigDecimal.valueOf(v.toDouble * 1000000d)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()).toArray
      }.toMap
    out.foreach { r =>
      val (q, n) = (vecs(r.getLong(0)), vecs(r.getLong(1)))
      val expected = q.zip(n).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(r.getLong(3) === expected, s"pair ${r.getLong(0)} -> ${r.getLong(1)}")
    }
    val byQuery = out.groupBy(_.getLong(0)).values
    byQuery.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(4))
      assert(sorted.map(_.getInt(4)).toSeq === (1 to sorted.length))
      assert(sorted.map(_.getLong(3)).toSeq === sorted.map(_.getLong(3)).sorted.toSeq)
    }
  }

  test("adaptiveNlist pins the oracle contract and clamps at both ends") {
    // the ann7 DuckDB oracle hardcodes nlist = 16 for the sf0.01 corpus
    // (500 vectors); this pin is what keeps the two sides in lockstep
    assert(Pq.adaptiveNlist(500) === 16)
    assert(Pq.adaptiveNlist(1) === 16) // floor
    assert(Pq.adaptiveNlist(2000) === 63)
    assert(Pq.adaptiveNlist(1000000) === 1024) // cap
  }

  test("CoarseProbes equals a naive recompute and orders probes by (d, id)") {
    val cents = Pq.coarseTrain(emb, nlist = 16)
    val nlist = cents.length
    val dim = cents.head.length
    val rows = emb.select(col("vec_id"),
        org.apache.spark.sql.graft.ColumnBridge.column(graft.functions.CoarseProbes(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("embedding")),
          nlist, dim, 3, cents.flatten.toIndexedSeq)).as("probes"),
        col("embedding"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getSeq[Float](2).map(v =>
        java.math.BigDecimal.valueOf(v.toDouble * 1000000d)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()).toArray
      val d = cents.map(c => c.indices.map { t =>
        val df = e(t) - c(t); df * df
      }.sum)
      val expected = d.zipWithIndex.sortBy { case (dd, i) => (dd, i) }.take(3).map(_._2)
      assert(r.getSeq[Int](1) === expected.toSeq, s"vec ${r.getLong(0)}")
    }
  }

  test("ann7 learned IVF: planted exact duplicates are recalled via the home list") {
    // a duplicate quantizes identically -> same home list, same codes ->
    // the query's first probe finds it at the minimal ADC
    val planted = emb.filter(col("vec_id") % 7 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    val corpus = emb.unionByName(planted)
    val nlist = Pq.adaptiveNlist(corpus.count())
    val cents = Pq.coarseTrain(corpus, nlist)
    val model = Pq.train(corpus, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    val top = Pq.ivfPqTopKLearned(corpus, k = 3, model, cents, nprobe = 2)
    val hits = top.filter(col("neighbor_id") === col("query_id") + 100000)
      .select("query_id").distinct().count()
    val nPlanted = planted.count()
    assert(nPlanted > 0)
    assert(hits.toDouble / nPlanted >= 0.8,
      s"duplicate recall ${hits.toDouble / nPlanted} < 0.8")
    // blocks are learned list ids, not labels; every query appears
    val blocks = top.select("block").distinct().collect().map(_.getInt(0))
    assert(blocks.forall(b => b >= 0 && b < nlist))
    assert(top.select("query_id").distinct().count() === corpus.count())
  }

  test("ann7: no pair is scored twice (a neighbor lives in exactly one list)") {
    val nlist = Pq.adaptiveNlist(emb.count())
    val cents = Pq.coarseTrain(emb, nlist)
    val model = Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    val top = Pq.ivfPqTopKLearned(emb, k = 1000000, model, cents, nprobe = 3)
    val dups = top.groupBy("query_id", "neighbor_id").count()
      .filter(col("count") > 1).count()
    assert(dups === 0L)
  }

  test("scale guard: shallow blocks keep the fixed path; oversize ones reroute to learned IVF") {
    val model = Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    // 500 vectors / 10 labels = avg depth 50, under the default 256 cap:
    // the guarded default must equal the pinned fixed-block path exactly
    val guardedDefault = Pq.ivfPqTopK(emb, "label", k = 3, model).collect().toSet
    val pinned = Pq.ivfPqTopK(emb, "label", k = 3, model, contrast = true).collect().toSet
    assert(guardedDefault === pinned)
    // force the guard (any real block exceeds avg depth 1): the reroute must
    // equal the learned-quantizer path with the same adaptive parameters —
    // i.e. no default call can reach the fixed-block quadratic
    val rerouted = Pq.ivfPqTopK(emb, "label", k = 3, model, maxAvgBlock = 1)
      .collect().toSet
    val cents = Pq.coarseTrain(emb, Pq.adaptiveNlist(emb.count()))
    // the guarded entry point emits a stable string block on every path;
    // the tier-named function keeps its natural int list id — align for compare
    val learned = Pq.ivfPqTopKLearned(emb, k = 3, model, cents, nprobe = 2)
      .withColumn("block", col("block").cast("string"))
      .collect().toSet
    assert(rerouted === learned)
    assert(rerouted !== pinned) // the two routes are genuinely different plans
  }

  test("deep tier: past the flat nlist clamp the guard reroutes through the IMI") {
    val model = Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    // maxNlist = 4 puts 500 vectors past the clamp (ceil(500/32) = 16 > 4):
    // the guard must compose the inverted multi-index, equal to a direct
    // ivfPqTopKImi with the same adaptive k — the flat tier's own knee is
    // not reachable through the default API either
    val viaGuard = Pq.ivfPqTopK(emb, "label", k = 3, model,
      maxAvgBlock = 1, maxNlist = 4).collect().toSet
    val imi = Pq.train(emb, m = 2, k = Pq.adaptiveImiK(emb.count()))
    val direct = Pq.ivfPqTopKImi(emb, k = 3, model, imi, nprobe = 2)
      .withColumn("block", col("block").cast("string"))
      .collect().toSet
    assert(viaGuard === direct)
    // boundary: the clamp predicate flips exactly at targetList·maxNlist
    assert(!Pq.nlistClamped(32768) && Pq.nlistClamped(32769))
  }

  test("adaptiveImiK pins the oracle contract; the composed grid outgrows the flat cap") {
    // the ann10 DuckDB oracle hardcodes k = 4 (16 lists) for the sf0.01
    // corpus (500 vectors) — the pin that keeps the two sides in lockstep
    assert(Pq.adaptiveImiK(500) === 4)
    assert(Pq.adaptiveImiK(1) === 4) // floor
    assert(Pq.adaptiveImiK(200000) === 80) // 6400 lists where flat clamps at 1024
    assert(Pq.adaptiveImiK(100000000) === 256) // cap: 65536 lists
    // the knee comparison the deep scale leg measured: at 200k vectors the
    // flat quantizer is pinned at 1024 lists (depth ~195), the IMI is not
    assert(Pq.adaptiveNlist(200000) === 1024)
    assert(Pq.adaptiveImiK(200000) * Pq.adaptiveImiK(200000) > 4 * 1024)
  }

  test("ImiProbes equals a naive composed recompute and orders probes by (d, id)") {
    val imi = Pq.train(emb, m = 2, k = 4, iters = 2, sampleRate = 0.5)
    val rows = emb.select(col("vec_id"),
        org.apache.spark.sql.graft.ColumnBridge.column(graft.functions.ImiProbes(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("embedding")),
          imi.k, imi.subDim, 3, imi.codebooks.flatten.flatten.toIndexedSeq)).as("probes"),
        col("embedding"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getSeq[Float](2).map(v =>
        java.math.BigDecimal.valueOf(v.toDouble * 1000000d)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()).toArray
      def half(h: Int, j: Int): Long = (0 until imi.subDim).map { t =>
        val d = e(h * imi.subDim + t) - imi.codebooks(h)(j)(t); d * d
      }.sum
      val composed = for (i <- 0 until imi.k; j <- 0 until imi.k)
        yield (half(0, i) + half(1, j), i * imi.k + j)
      val expected = composed.sortBy(identity).take(3).map(_._2)
      assert(r.getSeq[Int](1) === expected, s"vec ${r.getLong(0)}")
    }
  }

  test("ImiProbes nprobe=1 fast path equals the composed grid's first minimum") {
    // the home-list assignment (corpus side, once per row) takes the
    // decomposed two-half-argmin path; it must agree with the grid scan's
    // (d, id)-ordered head on every vector
    val imi = Pq.train(emb, m = 2, k = 4, iters = 2, sampleRate = 0.5)
    def probes(np: Int) = emb.select(col("vec_id"),
        org.apache.spark.sql.graft.ColumnBridge.column(graft.functions.ImiProbes(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("embedding")),
          imi.k, imi.subDim, np, imi.codebooks.flatten.flatten.toIndexedSeq)).as("probes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val home = probes(1)
    val grid = probes(2)
    assert(home.nonEmpty)
    home.foreach { case (id, p) =>
      assert(p.length === 1 && p.head === grid(id).head, s"vec $id")
    }
  }

  test("ann10 IMI: planted exact duplicates are recalled via the composed home list") {
    val planted = emb.filter(col("vec_id") % 7 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    val corpus = emb.unionByName(planted)
    val imiK = Pq.adaptiveImiK(corpus.count())
    val imi = Pq.train(corpus, m = 2, k = imiK, iters = 2, sampleRate = 0.5)
    val model = Pq.train(corpus, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    val top = Pq.ivfPqTopKImi(corpus, k = 3, model, imi, nprobe = 2)
    val hits = top.filter(col("neighbor_id") === col("query_id") + 100000)
      .select("query_id").distinct().count()
    val nPlanted = planted.count()
    assert(nPlanted > 0)
    assert(hits.toDouble / nPlanted >= 0.8,
      s"duplicate recall ${hits.toDouble / nPlanted} < 0.8")
    val blocks = top.select("block").distinct().collect().map(_.getInt(0))
    assert(blocks.forall(b => b >= 0 && b < imiK * imiK))
  }

  test("ann10 IMI: no pair is scored twice (a neighbor lives in exactly one composed list)") {
    val imi = Pq.train(emb, m = 2, k = 4, iters = 2, sampleRate = 0.5)
    val model = Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    val top = Pq.ivfPqTopKImi(emb, k = 1000000, model, imi, nprobe = 3)
    val dups = top.groupBy("query_id", "neighbor_id").count()
      .filter(col("count") > 1).count()
    assert(dups === 0L)
  }

  test("ann9: a persisted index serves a query batch identically to the learned path") {
    val cents = Pq.coarseTrain(emb, Pq.adaptiveNlist(emb.count()))
    val model = Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    val idx = tmpDir() + "/ivf_index"
    Pq.writeIvfIndex(emb, idx, model, cents)
    val queries = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"), col("embedding"))
    val served = Pq.ivfPqTopKFromIndex(spark, idx, queries, k = 3, nprobe = 2)
      .collect().toSet
    // the serve path shares candidate corpus, ADC arithmetic, probe
    // selection and tie rules with the learned path — so restricting the
    // learned output to the batch must reproduce it exactly
    val learned = Pq.ivfPqTopKLearned(emb, k = 3, model, cents, nprobe = 2)
      .filter(col("query_id") % 7 === 0).collect().toSet
    assert(served.nonEmpty)
    assert(served === learned)
  }

  test("ann11: appended increments serve as if the union had been indexed under the base model") {
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val inc1 = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") % 2 === 0)
    val inc2 = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") % 2 =!= 0)
    val cents = Pq.coarseTrain(base, Pq.adaptiveNlist(base.count()))
    val model = Pq.train(base, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    val idx = tmpDir() + "/ivf_index_appended"
    Pq.writeIvfIndex(base, idx, model, cents)
    val modelBytes = spark.read.parquet(s"$idx/model").collect().toSeq
    Pq.appendIvfIndex(spark, idx, inc1)
    Pq.appendIvfIndex(spark, idx, inc2)
    // the model row is untouched by appends — no retrain happened
    assert(spark.read.parquet(s"$idx/model").collect().toSeq === modelBytes)
    // codes cover the union exactly once
    assert(spark.read.parquet(s"$idx/codes").count() === emb.count())
    val queries = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"), col("embedding"))
    val served = Pq.ivfPqTopKFromIndex(spark, idx, queries, k = 3, nprobe = 2)
      .collect().toSet
    // appends encode under the persisted model, so serving equals the
    // learned search over the UNION corpus with the BASE-trained model
    val learned = Pq.ivfPqTopKLearned(emb, k = 3, model, cents, nprobe = 2)
      .filter(col("query_id") % 7 === 0).collect().toSet
    assert(served.nonEmpty)
    assert(served === learned)
  }

  test("ann14: tombstoned vectors leave the candidate set; codes stay immutable; rebuild reclaims") {
    val cents = Pq.coarseTrain(emb, Pq.adaptiveNlist(emb.count()))
    val model = Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    val idx = tmpDir() + "/ivf_index_deleted"
    Pq.writeIvfIndex(emb, idx, model, cents)
    val codesBefore = spark.read.parquet(s"$idx/codes").count()
    Pq.deleteFromIvfIndex(spark, idx,
      emb.filter(col("vec_id") % 10 === 0).select(col("vec_id")))
    // deletes never touch the corpus-sized codes table
    assert(spark.read.parquet(s"$idx/codes").count() === codesBefore)
    val queries = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"), col("embedding"))
    val served = Pq.ivfPqTopKFromIndex(spark, idx, queries, k = 3, nprobe = 2).collect()
    assert(served.nonEmpty)
    // the tombstone invariant: no deleted id is ever returned as a neighbor
    assert(served.forall(_.getAs[Long]("neighbor_id") % 10 != 0))
    // but deleted vectors may still QUERY (self-lookup after retire)
    // and the un-deleted serve did return %10 neighbors (delete was load-bearing)
    val full = Pq.ivfPqTopKLearned(emb, k = 3, model, cents, nprobe = 2)
      .filter(col("query_id") % 7 === 0).collect()
    assert(full.exists(_.getAs[Long]("neighbor_id") % 10 == 0))
    // rebuild = reclaim: writeIvfIndex clears tombstones, full set serves again
    Pq.writeIvfIndex(emb, idx, model, cents)
    val rebuilt = Pq.ivfPqTopKFromIndex(spark, idx, queries, k = 3, nprobe = 2).collect()
    assert(rebuilt.exists(_.getAs[Long]("neighbor_id") % 10 == 0))
  }

  test("ann14 plan: the tombstone anti-join broadcasts (codes never shuffle for a delete)") {
    val cents = Pq.coarseTrain(emb, Pq.adaptiveNlist(emb.count()))
    val model = Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    val idx = tmpDir() + "/ivf_index_del_plan"
    Pq.writeIvfIndex(emb, idx, model, cents)
    Pq.deleteFromIvfIndex(spark, idx,
      emb.filter(col("vec_id") % 10 === 0).select(col("vec_id")))
    val queries = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"), col("embedding"))
    val out = Pq.ivfPqTopKFromIndex(spark, idx, queries, k = 3, nprobe = 2)
    out.collect() // finalize AQE
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"tombstone exclusion must be a broadcast anti-join, plan was:\n$plan")
    assert(!plan.contains("SortMergeJoin LeftAnti"),
      "a delete batch must never force a corpus-wide codes shuffle")
  }

  test("exactGlobalTopK: planted copies are each other's global nearest at d2 = 0") {
    val copies = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(copies)
    val rows = Pq.exactGlobalTopK(corpus, k = 1, col("vec_id") >= 100000)
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Long]("d2"))).toMap
    (0 until 5).foreach { i =>
      assert(rows(i + 100000L) === (i.toLong, 0L))
    }
  }

  test("no exchange carries the raw embedding — codes/LUT only cross the wire") {
    val model = Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
    val out = Pq.ivfPqTopK(emb, "label", k = 3, model)
    out.collect() // finalize the adaptive plan, then read each Exchange's input
    val formatted = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val lines = formatted.linesIterator.toVector
    val exchangeInputs = lines.zipWithIndex
      .filter { case (l, _) => l.matches(""".*\(\d+\) (Broadcast)?Exchange.*""") }
      .filterNot { case (_, i) =>
        // the starved-scan spread (test-scale-only, stats-gated no-op at
        // real scale) round-robins the raw rows by design — exempt it; the
        // claim under test is about the CANDIDATE JOIN's exchanges
        lines.drop(i + 1).take(3).exists(_.contains("RoundRobinPartitioning"))
      }
      .map { case (_, i) =>
        lines.drop(i + 1).find(_.trim.startsWith("Input")).getOrElse("")
      }
    assert(exchangeInputs.nonEmpty, formatted.take(800))
    exchangeInputs.foreach { in =>
      assert(!in.contains("embedding"), s"embedding crossed an exchange: $in")
    }
  }
}

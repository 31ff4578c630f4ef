package graft

import graft.ops.{Sampling, Skew}
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Deterministic sampling, skew-salted joins, and PII redaction: the
  * dataset-curation operators are hash-driven, so every property here is
  * exact — no statistical tolerance needed beyond split-fraction sanity.
  */
class SamplingSkewSpec extends SparkSuite {
  import spark.implicits._

  test("SP1: hash split is stable under corpus growth and roughly proportional") {
    val docs = sf("documents")
    val full = Sampling.hashSplit(docs, "doc_id", Seq("train", "val", "test"), Seq(0.8, 0.9))
      .select("doc_id", "split")
    // membership is a pure function of doc_id: splitting a subset assigns
    // every row exactly what the full-corpus split assigns it
    val subset = Sampling.hashSplit(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", Seq("train", "val", "test"), Seq(0.8, 0.9)).select("doc_id", "split")
    assert(subset.join(full, Seq("doc_id"))
      .filter(subset("split") =!= full("split")).count() == 0)

    val counts = full.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val n = docs.count().toDouble
    assert(math.abs(counts("train") / n - 0.8) < 0.08)
    assert(math.abs(counts("val") / n - 0.1) < 0.05)
    assert(counts("train") + counts("val") + counts("test") == n.toLong)
    // a different salt reshuffles membership (salt actually participates)
    val salted = Sampling.hashSplit(docs, "doc_id", Seq("a", "b"), Seq(0.5), salt = "s1")
    val unsalted = Sampling.hashSplit(docs, "doc_id", Seq("a", "b"), Seq(0.5))
    assert(salted.join(unsalted, Seq("doc_id"))
      .filter(salted("split") =!= unsalted("split")).count() > 0)
  }

  test("SP7: near-dup families never straddle splits; doc-keyed splitting does leak") {
    import graft.dedup.Dedup
    val docs = sf("documents").select(col("doc_id"), col("text"))
    // plant near-dups of docs 0-7 with far-apart ids: a doc-id hash split
    // can separate them, a group-keyed split cannot
    val mutants = docs.filter(col("doc_id") < 8)
      .select((col("doc_id") + 7000).as("doc_id"),
        concat(col("text"), lit(" mutated tail")).as("text"))
    val corpus = docs.unionByName(mutants)
    val pairs = Dedup.minhashLsh(corpus, "doc_id", "text",
      numHashes = 16, bands = 4, threshold = 0.5, portableHash = true)
    val keyed = corpus.join(Dedup.dupGroups(pairs), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("group_id"), col("doc_id")).as("group_key"))
    val out = Sampling.hashSplit(keyed, "group_key",
      Seq("train", "val", "test"), Seq(0.8, 0.9)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    // every planted pair lands in ONE split
    (0 until 8).foreach { i =>
      assert(out(i.toLong) === out(i + 7000L),
        s"near-dup pair ($i, ${i + 7000}) straddles splits: ${out(i.toLong)} vs ${out(i + 7000L)}")
    }
    // and the hazard sp7 exists for is real: the doc-keyed split separates
    // at least one planted pair (else this test proves nothing)
    val docKeyed = Sampling.hashSplit(corpus, "doc_id",
      Seq("train", "val", "test"), Seq(0.8, 0.9)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert((0 until 8).exists(i => docKeyed(i.toLong) !== docKeyed(i + 7000L)),
      "fixture too small to demonstrate doc-keyed leakage — change mutant ids")
  }

  test("SP8: walk-forward folds keep the embargo gap; membership is bounded and deterministic") {
    import graft.ops.Sampling
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"))
    val folds = Sampling.walkForwardFolds(ev, col("ts"), origin = "2024-01-01",
      nFolds = 4, trainDays = 10, testDays = 4, embargoDays = 2).cache()
    assert(folds.count() > 0)
    // the embargo invariant — per fold, no test day within embargoDays of
    // the last train day (trailing-window features cannot leak across)
    val gaps = folds.groupBy(col("fold")).agg(
      max(when(col("role") === "train", col("day_offset"))).as("tr_max"),
      min(when(col("role") === "test", col("day_offset"))).as("te_min")).collect()
    assert(gaps.nonEmpty)
    gaps.foreach { r =>
      if (!r.isNullAt(1) && !r.isNullAt(2))
        assert(r.getAs[Int]("te_min") - r.getAs[Int]("tr_max") > 2,
          s"fold ${r.get(0)}: embargo violated (${r.get(1)} → ${r.get(2)})")
    }
    // roles are disjoint within a fold (a day is train xor test)
    assert(folds.groupBy(col("fold"), col("day_offset"))
      .agg(countDistinct(col("role")).as("nr")).filter(col("nr") > 1).count() === 0)
    // fan-out bound: an event appears at most nFolds times
    assert(folds.groupBy(col("event_id")).count().filter(col("count") > 4).count() === 0)
    // deterministic: a second run is identical
    val again = Sampling.walkForwardFolds(ev, col("ts"), origin = "2024-01-01",
      nFolds = 4, trainDays = 10, testDays = 4, embargoDays = 2)
    assert(folds.exceptAll(again).isEmpty && again.exceptAll(folds).isEmpty)
    folds.unpersist()
    // a typo'd origin must fail loudly on the driver, not return zero folds
    // (to_date(lit(bad)) would be null → datediff null → join matches nothing)
    val bad = intercept[IllegalArgumentException] {
      Sampling.walkForwardFolds(ev, col("ts"), origin = "2024-13-45",
        nFolds = 4, trainDays = 10, testDays = 4, embargoDays = 2)
    }
    assert(bad.getMessage.contains("ISO date"))
  }

  test("SP2: stratified sample keeps per-stratum fractions and is idempotent") {
    val docs = sf("documents")
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5), defaultFraction = 0.2)
    // sampling the sample with the same config is a no-op (membership is
    // a deterministic per-row predicate, not a draw)
    val resampled = Sampling.stratifiedSample(sampled, "doc_id", "lang",
      Map("en" -> 0.5), defaultFraction = 0.2)
    assert(resampled.count() == sampled.count())
    val frac = sampled.groupBy("lang").count()
      .join(docs.groupBy("lang").count().withColumnRenamed("count", "total"), "lang")
      .select(col("lang"), col("count") / col("total"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(frac("en") - 0.5) < 0.15)
    frac.filterNot(_._1 == "en").values.foreach(f => assert(math.abs(f - 0.2) < 0.15))
  }

  test("SP3: per-key reservoir holds exactly min(n, |group|) rows, deterministically") {
    val docs = sf("documents")
    val res = Sampling.reservoirPerKey(docs, "source", "doc_id", n = 25)
    val sizes = res.groupBy("source").count()
      .join(docs.groupBy("source").count().withColumnRenamed("count", "total"), "source")
      .as[(String, Long, Long)].collect()
    sizes.foreach { case (_, kept, total) => assert(kept == math.min(25L, total)) }
    val rerun = Sampling.reservoirPerKey(docs, "source", "doc_id", n = 25)
    assert(res.select("doc_id").exceptAll(rerun.select("doc_id")).isEmpty)
  }

  test("J14: salted join equals the plain inner join, keys spread across salts") {
    val li = sf("lineitem").select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val ord = sf("orders").select("o_orderkey", "o_orderstatus")
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey",
      salts = 8, saltFrom = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"))
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"), "inner")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the salt really fans out: a multi-row key occupies >1 salt bucket
    val spread = li.groupBy("l_orderkey").count().filter(col("count") >= 4)
      .join(li.withColumn("__salt",
        pmod(xxhash64(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber")),
          lit(8L))), "l_orderkey")
      .groupBy("l_orderkey").agg(countDistinct(col("__salt")).as("nsalts"))
      .agg(max("nsalts")).head().getLong(0)
    assert(spread > 1)
  }

  test("SP4: temperature mix up-weights small sources and is deterministic") {
    import graft.ops.Sampling
    // 9000 docs from a dominant source, 1000 from a minority one
    val docs = spark.range(10000).selectExpr("id AS doc_id",
      "CASE WHEN id < 9000 THEN 'big' ELSE 'small' END AS source")
    val mixed = Sampling.temperatureMix(docs, "doc_id", "source", targetRows = 2000)
    val kept = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // τ=0.5 weights: w ∝ √n → small's share of the 2000 budget is
    // √1000/(√9000+√1000) = 0.25 → ~500 kept of 1000 (50% rate) vs
    // big ~1500 of 9000 (17%): the minority source's keep RATE must be
    // far higher even though it contributes fewer rows overall.
    val smallRate = kept("small").toDouble / 1000
    val bigRate = kept("big").toDouble / 9000
    assert(smallRate > 2 * bigRate, s"small=$smallRate big=$bigRate")
    // Bernoulli noise aside, totals should be near the target budget
    assert(math.abs(kept.values.sum - 2000L) < 300, kept.toString)
    // deterministic: a second evaluation keeps the identical id set
    val again = Sampling.temperatureMix(docs, "doc_id", "source", 2000)
    assert(mixed.select("doc_id").exceptAll(again.select("doc_id")).isEmpty)
  }

  test("SP5: priority sample is deterministic, size-bounded, and weight-responsive") {
    val docs = sf("documents")
    val picked = Sampling.prioritySamplePerKey(docs, "source", "doc_id", "n_chars", n = 30)
    // per-stratum size = min(30, stratum size)
    val sizes = picked.groupBy("source").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    totals.foreach { case (src, tot) =>
      assert(sizes.getOrElse(src, 0L) == math.min(30L, tot),
        s"stratum $src: picked ${sizes.getOrElse(src, 0L)} of $tot")
    }
    // deterministic: a second evaluation returns the identical set
    val again = Sampling.prioritySamplePerKey(docs, "source", "doc_id", "n_chars", n = 30)
    assert(picked.select("doc_id").exceptAll(again.select("doc_id")).isEmpty)
    // weight-responsive: with a genuinely selective draw (n=5 — at this SF
    // n=30 selects whole strata), selected docs skew long (P(select) rises
    // with n_chars), so the selected mean length must exceed the corpus mean
    val tight = Sampling.prioritySamplePerKey(docs, "source", "doc_id", "n_chars", n = 5)
    val meanSel = tight.agg(avg("n_chars")).head.getDouble(0)
    val meanAll = docs.agg(avg("n_chars")).head.getDouble(0)
    assert(meanSel > meanAll, s"selected mean $meanSel <= corpus mean $meanAll")
    // an unweighted draw (constant weight) differs: weight participates
    val flat = Sampling.prioritySamplePerKey(
      docs.withColumn("__w", lit(1)), "source", "doc_id", "__w", n = 5)
    assert(tight.select("doc_id").exceptAll(flat.select("doc_id")).count() > 0)
  }

  test("TX14: bigram LM score matches hand-computed probabilities") {
    val docs = Seq((1L, "a b a c"), (2L, "a b"), (3L, "z q"), (4L, "x"))
      .toDF("doc_id", "text")
    val out = graft.text.LmScore.bigramScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select(col("doc_id"), col("n_bigrams"), col("lm_score").cast("double"))
      .as[(Long, Long, Option[Double])].collect()
    // model: p(b|a)=2/3, p(c|a)=1/3, p(a|b)=1, p(q|z)=1
    // doc1 = mean(2/3, 1, 1/3) = 2/3; doc2 = p(b|a) = 2/3; doc3 = 1
    assert(out(0)._2 == 3L && math.abs(out(0)._3.get - 2.0 / 3) < 1e-9)
    assert(out(1)._2 == 1L && math.abs(out(1)._3.get - 2.0 / 3) < 1e-9)
    assert(out(2)._2 == 1L && out(2)._3.contains(1.0))
    // a single-token doc has no bigram evidence: count 0, score NULL
    assert(out(3)._2 == 0L && out(3)._3.isEmpty)
  }

  test("TX5: PII redaction masks emails and phones; the audit count matches") {
    val rows = Seq(
      ("contact me at jane.doe+x@example.co.uk today", 1L),
      ("call +1 (555) 123-4567 or 020 7946 0958 now", 2L),
      ("mixed: a@b.io and 555-867-5309", 2L),
      ("no pii here, just 42 and v1.2", 0L)).toDF("text", "expected")
    val out = rows.select(col("expected"),
      TextOps.redactPii(col("text")).as("clean"),
      TextOps.piiCount(col("text")).as("hits"))
    assert(out.filter(col("hits") =!= col("expected")).count() == 0)
    assert(out.filter(col("clean").rlike(TextOps.EmailRe)).count() == 0)
    val cleaned = out.as[(Long, String, Long)].collect().map(_._2)
    assert(cleaned(0) == "contact me at <EMAIL> today")
    assert(cleaned(1).contains("<PHONE>") && !cleaned(1).exists(_.isDigit))
  }
}

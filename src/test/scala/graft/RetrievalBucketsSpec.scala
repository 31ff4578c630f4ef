package graft

import graft.text.{Bm25, LmScore}
import org.apache.spark.sql.functions._

/** BM25 retrieval (tx17) and CCNet perplexity bucketing (tx16): the score
  * formula is hand-checked on a tiny corpus, the two-stage salted top-k is
  * proven equal to the single-window reference, and the bucket thresholds
  * must order the corpus.
  */
class RetrievalBucketsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = sf("documents").select("doc_id", "text")

  test("bm25: hand-computed scores on a three-doc corpus") {
    val corpus = Seq((1L, "a a b"), (2L, "a c"), (3L, "c c c")).toDF("doc_id", "text")
    val q = Seq((1L, "a")).toDF("query_id", "term")
    val out = Bm25.topK(corpus, q, "doc_id", "text", topK = 10)
      .orderBy("rank").collect()
    // N=3, avgdl=8/3, df(a)=2 → idf=(3-2+0.5)/(2+0.5)=0.6
    // doc1: tf=2, dl=3 → 0.6*4.4/(2+1.2*(0.25+0.75*3/(8.0/3)))
    // doc2: tf=1, dl=2 → 0.6*2.2/(1+1.2*(0.25+0.75*2/(8.0/3)))
    val avgdl = 8.0 / 3
    val s1 = 0.6 * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / avgdl))
    val s2 = 0.6 * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 2 / avgdl))
    assert(out.length === 2) // doc 3 has no query term
    assert(out(0).getAs[Long]("doc_id") === 1L && out(1).getAs[Long]("doc_id") === 2L)
    assert(math.abs(out(0).getAs[Double]("score") - s1) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("score") - s2) < 1e-9)
    assert(out(0).getAs[Long]("matched_terms") === 1L)
  }

  test("bm25 two-stage salted top-k equals the single-window reference") {
    val q = Seq((1L, "spark"), (1L, "table"), (2L, "customer"), (2L, "vector"))
      .toDF("query_id", "term")
    val salted = Bm25.topK(docs, q, "doc_id", "text", topK = 5, saltParts = 32)
    // saltParts=1 → the salt window IS the plain per-query window
    val reference = Bm25.topK(docs, q, "doc_id", "text", topK = 5, saltParts = 1)
    assert(salted.exceptAll(reference).isEmpty && reference.exceptAll(salted).isEmpty)
  }

  test("bm25 large-vocabulary fallback (broadcast semi-join) equals the inline path") {
    val q = Seq((1L, "spark"), (1L, "table"), (2L, "customer"), (2L, "vector"))
      .toDF("query_id", "term")
    val inline = Bm25.topK(docs, q, "doc_id", "text", topK = 5)
    // maxInlineTerms = 0 forces the degraded path: the term set is never
    // collected past the probe limit; matching runs as a broadcast
    // semi-join on the exploded tokens — output must be identical
    val fallback = Bm25.topK(docs, q, "doc_id", "text", topK = 5,
      maxInlineTerms = 0)
    assert(inline.exceptAll(fallback).isEmpty && fallback.exceptAll(inline).isEmpty)
    assert(inline.count() > 0)
  }

  test("contrastive select: decision matches the score difference; no-evidence is never selected") {
    val out = LmScore.contrastiveSelect(docs, col("doc_id") % 5 === 0, "doc_id", "text").cache()
    assert(out.count() === docs.count())
    // selected ⇔ ml_diff > 0 (NULL diff → false)
    assert(out.filter(col("selected") =!= coalesce(col("ml_diff") > 0, lit(false))).isEmpty)
    assert(out.filter(col("score_in").isNull && col("selected")).isEmpty)
    // seed docs score under a model trained on themselves: evidence exists
    val seedScored = out.filter(col("doc_id") % 5 === 0)
    assert(seedScored.filter(col("score_in").isNull).count() === 0)
    out.unpersist()
  }

  test("ppl buckets: complete, labeled, and ordered by score") {
    val scored = LmScore.bigramScore(docs, "doc_id", "text")
    val out = LmScore.pplBuckets(scored, sampleFraction = 0.5).cache()
    assert(out.count() === docs.count())
    val labels = out.select("bucket").distinct().as[String].collect().toSet
    assert(labels.subsetOf(Set("head", "middle", "tail", "no_evidence")))
    // no_evidence ⇔ NULL score
    assert(out.filter(col("bucket") === "no_evidence" && col("lm_score").isNotNull).isEmpty)
    assert(out.filter(col("bucket") =!= "no_evidence" && col("lm_score").isNull).isEmpty)
    // thresholds order the corpus (ties may straddle a cut, hence >=)
    def stats(b: String) = out.filter(col("bucket") === b)
      .agg(min("lm_score"), max("lm_score")).head()
    val (head, mid, tail) = (stats("head"), stats("middle"), stats("tail"))
    if (!head.isNullAt(0) && !mid.isNullAt(1))
      assert(head.getDouble(0) >= mid.getDouble(1))
    if (!mid.isNullAt(0) && !tail.isNullAt(1))
      assert(mid.getDouble(0) >= tail.getDouble(1))
    out.unpersist()
  }
}

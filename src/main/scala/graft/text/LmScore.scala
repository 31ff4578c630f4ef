package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** tx14: n-gram language-model quality scoring (the CCNet recipe — Wenzek
  * et al. 2020, "CCNet: Extracting High Quality Monolingual Datasets from
  * Web Crawl Data" — score documents under a small n-gram LM and filter on
  * the score; the reference analogue is the quality gate a curation
  * pipeline applies before training). CCNet scores under a pre-trained
  * KenLM; here the bigram model is trained ON the corpus itself in the same
  * query — self-perplexity — which needs no external artifact and still
  * separates fluent text from gibberish/boilerplate (rare-transition docs
  * score low, templated docs score high).
  *
  * The reported score is the mean conditional bigram probability
  * `mean P(w_i | w_{i-1})` rather than the log-space perplexity: a log sum
  * reintroduces libm (`ln`) whose last-ulp behavior differs across engines,
  * while mean-P needs only division and an EXACT decimal sum — each P is
  * quantized to DECIMAL(18,12) (double→decimal rounding is identical
  * everywhere), summed exactly (order-independent, so shuffle
  * nondeterminism can't flip a bit), and the final divide runs the same
  * double op on the same bits in any engine. Monotonicity with respect to
  * filtering is what matters for a quality gate, not the log scale.
  *
  * 100 TB story: training is one groupBy over exploded bigrams (map-side
  * combine collapses repeats before the shuffle — the only corpus-sized
  * exchange); the per-prefix continuation total is a window over the
  * AGGREGATED model, whose prefix re-shuffle carries distinct bigrams
  * only — model-sized, never the corpus. (Pre-partitioning the groupBy by
  * prefix would let the window reuse the exchange, but would also push the
  * partial aggregation above the shuffle — trading a model-sized exchange
  * for a corpus-sized one. Deliberately not done.)
  * Scoring joins exploded bigrams to the model on (prefix, word): every
  * probe row matches exactly one model row, so a hot bigram ("of the")
  * skews a probe partition but never fans out. Docs with <2 tokens carry
  * no bigram evidence and surface with n_bigrams = 0 and a NULL score —
  * a gate must see "no evidence", not a fake 0.
  */
object LmScore {

  def bigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramScoreAgainst(df, df, idCol, textCol)

  /** [[bigramScore]] generalized to a separate model corpus: the bigram LM
    * trains on `modelDf` and scores `df` (bigramScore is the modelDf = df
    * case). With distinct corpora a scored bigram may be absent from the
    * model; unmodeled transitions carry no evidence — n_bigrams counts the
    * MODELED bigrams and a doc whose bigrams are all unmodeled surfaces
    * with n_bigrams = 0 and NULL score, exactly like a <2-token doc. This
    * is the primitive behind contrastive (Moore-Lewis) selection, which
    * compares the same doc under an in-domain and a general model (tx18).
    */
  def bigramScoreAgainst(df: DataFrame, modelDf: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val pairs = bigramPairs(df, idCol, textCol)
    val modelPairs = if (modelDf eq df) pairs else bigramPairs(modelDf, idCol, textCol)
    bigramScoreFromPairs(pairs, modelPairs, df, idCol)
  }

  /** (doc, prefix, word) for every adjacent token pair of lower(text). */
  private def bigramPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextOps.tokens(lower(col(textCol)))
    df
      .select(col(idCol).as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), posexplode(
        when(size(col("__toks")) >= 2,
          transform(sequence(lit(0), size(col("__toks")) - 2), i =>
            struct(element_at(col("__toks"), i + 1).as("prefix"),
              element_at(col("__toks"), i + 2).as("word"))))
          .otherwise(array().cast("array<struct<prefix:string,word:string>>"))))
      .select(col("doc_id"), col("col.prefix").as("prefix"), col("col.word").as("word"))
  }

  private def bigramScoreFromPairs(pairs: DataFrame, modelPairs: DataFrame,
      df: DataFrame, idCol: String): DataFrame = {
    // model: c2(prefix,word) by groupBy; c1(prefix) = Σ c2 via a window on
    // the aggregated frame. HashPartitioning(prefix,word) does NOT satisfy
    // the window's ClusteredDistribution(prefix), so Spark inserts one more
    // exchange here — over the distinct-bigram model, not the corpus (see
    // the scale note above for why that's the right side to re-shuffle)
    val model = modelPairs.groupBy(col("prefix"), col("word"))
      .agg(count(lit(1)).as("__c2"))
      .withColumn("__c1", sum(col("__c2")).over(Window.partitionBy(col("prefix"))))
      // every P quantized identically in any engine: double divide, then
      // round once to decimal(18,12)
      .select(col("prefix"), col("word"),
        (col("__c2").cast("double") / col("__c1").cast("double"))
          .cast("decimal(18,12)").as("__p"))
    // The score stays a DOUBLE: both divide operands are bit-identical
    // across engines (exact decimal sum → nearest double, exact count), so
    // the quotient is the same IEEE double everywhere — a final
    // double→decimal cast would reintroduce engine-specific tie rounding
    // in the last digit.
    val scored = pairs.join(model, Seq("prefix", "word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__p")).as("__psum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("__psum").cast("double") / col("n_bigrams").cast("double")).as("lm_score"))
    // docs without bigrams (0- or 1-token): no evidence → NULL score
    df.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lm_score"))
  }

  /** tx16: CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3 — split
    * the corpus into head/middle/tail thirds by LM score; downstream
    * training mixes buckets deliberately). Input is [[bigramScore]] output
    * (doc_id, n_bigrams, lm_score).
    *
    * CCNet computes its thresholds from a sample of the corpus, not a
    * global sort — that is the scalable shape and the one implemented here:
    * a hash-deterministic `sampleFraction` of scored docs is ranked (the
    * ONLY ordered window, bounded by the sample size), the ⌈m/3⌉-th and
    * ⌈2m/3⌉-th (score, doc_id) pairs become the two cut points, and bucket
    * assignment is a map-side tuple comparison against the broadcast 1-row
    * threshold frame — no corpus-sized sort, no NTILE, shuffle-free
    * assignment. Exactness: scores are bit-identical doubles (see
    * [[bigramScore]]), ranking ties break on doc_id, cut ranks use integer
    * arithmetic ((m+2) DIV 3), and the bucket compare is on the exact
    * (score, doc_id) tuple — every engine draws the same line.
    *
    * Docs with no bigram evidence (NULL score) land in 'no_evidence'; in
    * the degenerate empty-sample case the NULL thresholds send every scored
    * doc to 'tail' (conditions evaluate NULL → skipped).
    */
  def pplBuckets(scored: DataFrame, sampleFraction: Double = 0.25): DataFrame = {
    val w = Window.orderBy(col("lm_score").desc, col("doc_id"))
    val wAll = Window.partitionBy(lit(1))
    val ranked = scored
      .filter(col("lm_score").isNotNull)
      .filter(graft.ops.Sampling.unitHash(col("doc_id"), "#ppl") < lit(sampleFraction))
      .select(col("doc_id"), col("lm_score"))
      .withColumn("rn", row_number().over(w))
      .withColumn("m", count(lit(1)).over(wAll))
    val th = ranked.agg(
      max(when(expr("rn = (m + 2) DIV 3"), col("lm_score"))).as("t1s"),
      max(when(expr("rn = (m + 2) DIV 3"), col("doc_id"))).as("t1d"),
      max(when(expr("rn = (2 * m + 2) DIV 3"), col("lm_score"))).as("t2s"),
      max(when(expr("rn = (2 * m + 2) DIV 3"), col("doc_id"))).as("t2d"))
    scored.crossJoin(broadcast(th))
      .select(col("doc_id"), col("n_bigrams"), col("lm_score"),
        when(col("lm_score").isNull, lit("no_evidence"))
          .when(col("lm_score") > col("t1s") ||
            (col("lm_score") === col("t1s") && col("doc_id") <= col("t1d")), lit("head"))
          .when(col("lm_score") > col("t2s") ||
            (col("lm_score") === col("t2s") && col("doc_id") <= col("t2d")), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** tx18: contrastive (Moore-Lewis) domain selection — Moore & Lewis 2010,
    * "Intelligent Selection of Language Model Training Data": score every
    * doc under an IN-DOMAIN LM (trained on `targetFilter` docs) and a
    * GENERAL LM (trained on the whole corpus), select where the in-domain
    * model likes the doc more. The classic recipe compares cross-entropies;
    * with this engine's mean-P scores the decision statistic is
    * `score_in − score_gen > 0` — the same "which model explains this doc
    * better" test, in the all-rational form that stays bit-exact
    * cross-engine ([[bigramScore]]'s log-free rationale).
    *
    * A doc none of whose bigrams the in-domain model has seen carries NULL
    * score_in and is never selected (no evidence ≠ negative evidence — the
    * caller sees the NULL and can route such docs to a fallback gate).
    *
    * 100 TB story: both models are distinct-bigram-sized aggregates of the
    * same corpus explode shape as tx14 (the in-domain one over the filtered
    * subset); each scoring join is 1:1 per model row. Two models means two
    * corpus-sized explodes — inherent to Moore-Lewis; a production run
    * materializes the bigram pairs once and feeds both branches.
    */
  def contrastiveSelect(df: DataFrame, targetFilter: Column,
      idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol), col(textCol))
    val inDom = bigramScoreAgainst(base, base.filter(targetFilter), idCol, textCol)
      .select(col("doc_id"), col("lm_score").as("score_in"))
    val gen = bigramScore(base, idCol, textCol)
      .select(col("doc_id"), col("lm_score").as("score_gen"))
    inDom.join(gen, Seq("doc_id"))
      .select(col("doc_id"), col("score_in"), col("score_gen"),
        (col("score_in") - col("score_gen")).as("ml_diff"),
        coalesce(col("score_in") - col("score_gen") > 0, lit(false)).as("selected"))
  }
}

package graft.text

import org.apache.spark.sql.DataFrame
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

  def bigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextOps.tokens(lower(col(textCol)))
    // (doc, prefix, word) for every adjacent token pair
    val pairs = df
      .select(col(idCol).as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), posexplode(
        when(size(col("__toks")) >= 2,
          transform(sequence(lit(0), size(col("__toks")) - 2), i =>
            struct(element_at(col("__toks"), i + 1).as("prefix"),
              element_at(col("__toks"), i + 2).as("word"))))
          .otherwise(array().cast("array<struct<prefix:string,word:string>>"))))
      .select(col("doc_id"), col("col.prefix").as("prefix"), col("col.word").as("word"))
    // model: c2(prefix,word) by groupBy; c1(prefix) = Σ c2 via a window on
    // the aggregated frame. HashPartitioning(prefix,word) does NOT satisfy
    // the window's ClusteredDistribution(prefix), so Spark inserts one more
    // exchange here — over the distinct-bigram model, not the corpus (see
    // the scale note above for why that's the right side to re-shuffle)
    val model = pairs.groupBy(col("prefix"), col("word"))
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
}

package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level collocation mining (tx21): rank adjacent word pairs by
  * pointwise mutual information — the classic "which bigrams are phrases,
  * not chance co-occurrence" statistic a corpus-analysis pass runs before
  * building tokenizer vocabularies or phrase tables. PMI compares the
  * bigram's observed rate against the independence expectation:
  * `pmi = log(c_ab * N / (c_a * c_b))`. The log is monotone, so RANKING by
  * PMI needs no floating point at all: this implementation scores with the
  * exact integer `c_ab * N * 1e6 div (c_a * c_b)` (the argument of the log,
  * fixed-point) — bit-identical on any engine, no ulp drift in the
  * ordering, and a DuckDB oracle replays it with hugeint `//`.
  *
  * Scale shape (100 TB): bigram extraction is map-side (`zip_with` over two
  * slices of the token array — no explode-join, one row per bigram only
  * into the counting shuffle); the two aggregations shuffle on word keys
  * (high cardinality, naturally parallel); `minCount` prunes the bigram
  * table BEFORE the unigram joins (the heavy tail of hapax bigrams never
  * joins); the corpus total is a 1-row broadcast; top-k is
  * TakeOrderedAndProject (per-partition heaps, never a global sort).
  *
  * Overflow bounds (round-12 audit rule): scores run in decimal(38,0) —
  * `c_ab * N * 1e6 <= N² * 1e6`, inside 38 digits to N = 10^16 tokens. The
  * quotient fits a long because `c_a * c_b >= c_ab²` (each unigram count
  * bounds the pair count), so `score <= N * 1e6 / c_ab <= N * 1e6 / minCount`
  * — N must stay below 2.7e12 * minCount. Checked loudly IN THE PLAN: the
  * decimal `div` returns NULL (not an error) past long range under non-ANSI
  * mode, so an `assert_true(pmi_scaled IS NOT NULL)` filter rides the score
  * projection — a silently-NULL score can never reach the ranking.
  */
object Collocations {

  /** Top-`topK` adjacent word pairs by fixed-point PMI over `textCol`,
    * among pairs seen at least `minCount` times. Tokenization is the
    * engine-portable [[TextOps.tokens]] contract on lowercased text, empty
    * tokens dropped. Deterministic total order: (score desc, w1, w2).
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Long = 3L, topK: Int = 100): DataFrame = {
    require(minCount >= 1 && topK >= 1, s"minCount/topK must be >= 1")
    val ws = filter(TextOps.tokens(lower(col(textCol))), t => length(t) > 0)
    val toks = docs.select(ws.as("__ws"))
    val uni = toks.select(explode(col("__ws")).as("w"))
    val uc = uni.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = uc.agg(sum(col("c")).cast("decimal(38,0)").as("n_total"))
    val pairs = toks.select(explode(zip_with(
        slice(col("__ws"), lit(1), greatest(size(col("__ws")) - 1, lit(0))),
        slice(col("__ws"), lit(2), greatest(size(col("__ws")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
    val bc = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    bc
      .join(uc.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uc.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("__num",
        col("c_ab").cast("decimal(38,0)") * col("n_total") * lit(1000000L))
      .withColumn("__den",
        col("c1").cast("decimal(38,0)") * col("c2").cast("decimal(38,0)"))
      .withColumn("pmi_scaled", expr("__num div __den"))
      // the documented overflow guard: decimal div past long range yields
      // NULL silently — fail the job instead of corrupting the ranking
      .filter(assert_true(col("pmi_scaled").isNotNull,
        lit("pmi_scaled overflowed long: corpus exceeds the " +
          "n_total < 2.7e12 * minCount fixed-point PMI bound")).isNull)
      .select(col("w1"), col("w2"), col("c_ab"), col("c1"), col("c2"),
        col("pmi_scaled"))
      .orderBy(col("pmi_scaled").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}

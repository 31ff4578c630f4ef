package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** tx9: benchmark decontamination — the standard pretraining hygiene step
  * of flagging corpus documents that share word n-grams with an evaluation
  * set (e.g. Brown et al. 2020 §C "Measuring and Preventing Memorization Of
  * Benchmarks": 13-gram collision filtering; n and the hit threshold are
  * parameters here).
  *
  * Scale shape: the benchmark side is SMALL by nature (eval suites are
  * thousands of documents), so its distinct gram set broadcasts and the
  * corpus-side gram explode joins map-side — no shuffle of corpus grams;
  * the only wide movement is the per-doc partial counts (doc_id, n). The
  * corpus is scanned once.
  */
object Decontaminate {

  /** Per-corpus-document count of distinct n-grams that appear anywhere in
    * the benchmark set, plus the `count >= minHits` contamination flag.
    * Gram construction matches [[graft.dedup.Dedup.shingles]] (lowercased
    * whitespace words, truncated tail gram for short docs).
    */
  def flag(corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      k: Int = 5, minHits: Long = 3L): DataFrame = {
    val benchGrams = bench
      .select(explode(array_distinct(Dedup.shingles(col(textCol), k))).as("gram"))
      .distinct()
    // the gram explode + broadcast probe is compute-dense and map-side —
    // spread a starved single-split scan so it parallelizes (stats-gated
    // no-op at real scale)
    val corpusGrams = graft.ops.Scan
      .spreadIfStarved(corpus.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(array_distinct(Dedup.shingles(col(textCol), k))).as("gram"))
    val hits = corpusGrams.join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("__hits"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__hits"), lit(0L)).as("contaminated_grams"),
        (coalesce(col("__hits"), lit(0L)) >= minHits).as("is_contaminated"))
  }
}

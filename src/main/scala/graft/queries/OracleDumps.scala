package graft.queries

import graft.ann.Ann
import graft.dedup.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle side-dumps: Spark-computed intermediates written next to the
  * domain fixtures ([[DomainOracles.FixturesDir]]) so the DuckDB oracles can
  * verify pipelines whose FIRST stage no other engine reproduces —
  * xxhash64 signatures (dd2/dd3), xxhash64-seeded LSH buckets (ann2) and the
  * seeded isolation-forest fit (x4b).
  *
  * The split is deliberate: the non-portable stage is dumped, everything
  * downstream of it (banding, bucket collision, jaccard/hamming verify,
  * cosine ranking, tree-walk scoring) is re-derived independently in SQL.
  * The dumped stage itself is not unchecked — each has an engine-portable
  * twin (dd2b/dd3b/ann2b) verifying the same algorithm end-to-end, plus
  * ScalaTest bit-identity specs for the native expressions; the dump closes
  * the remaining gap, the default-path pipeline AFTER the hash.
  *
  * Called by [[graft.Verify]] right after the domain fixtures; like them,
  * the dumps live OUTSIDE the verify outDir (the compare harness treats
  * every outDir subdirectory as a query result).
  */
object OracleDumps {

  def writeAll(spark: SparkSession, dir: String): Unit = {
    // dd2: 64-hash MinHash signatures over the exact dd2 query corpus.
    write(Dedup.minhashSignatures(LlmQueries.dd2Corpus(spark, dir), "doc_id", "text",
      numHashes = 64), "dd2_sigs")
    // dd3: 64-bit SimHash signatures over the exact dd3 query corpus.
    write(Dedup.simhashSignatures(LlmQueries.dd3Corpus(spark, dir), "doc_id", "text"),
      "dd3_sigs")
    // ann2: hyperplane-LSH bucket per vector (8 planes, query defaults).
    write(Tables.embeddings(spark, dir)
      .select(col("vec_id"), Ann.lshBucket(col("embedding"), planes = 8).as("bucket")),
      "ann2_buckets")
    // x4b: the fitted isolation forest, flattened to one row per node.
    val daily = graft.quality.AnomalyDetection.dailyFeatures(Tables.events(spark, dir))
    val forest = graft.quality.AnomalyDetection.fittedForest(daily)
    import spark.implicits._
    write(graft.quality.IsolationForestModel.flatten(forest).toDF(), "x4b_forest")
  }

  private def write(df: DataFrame, name: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .parquet(s"${DomainOracles.FixturesDir}/$name")
}

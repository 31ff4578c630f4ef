package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries + their DuckDB oracle SQL (driver contract —
  * see SparkEntry). Query names carry the SURVEY.md §2 operator ids so the
  * coverage audit is a string match.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def defs: Map[String, Q]
  def oracles: Map[String, String]
}

object QueryModule {
  /** DuckDB twin of [[graft.ops.Sampling.unitHash]] (no salt): first 60 bits
    * of md5 / 2^60 — shared by every oracle that replays hash-membership
    * sampling (sp1/sp2/sp4 in SamplingQueries, sp4b in LlmQueries).
    */
  val duckUnitHash: String =
    "(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) / 1152921504606846976.0)"
}

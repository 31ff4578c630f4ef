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

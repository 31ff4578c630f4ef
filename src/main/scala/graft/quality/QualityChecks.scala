package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality agent (ref `data_quality_agent.py:29-211`): per-table
  * freshness / row-count-floor / null-rate / duplicate-rate checks with
  * per-table thresholds, emitted as one tagged report frame
  * (`pipeline_monitoring.sql:9-131` shape). All checks are single
  * aggregations — at 100 TB each is one scan with map-side partial
  * aggregation, and the duplicate check shuffles only (key-hash, count).
  */
object QualityChecks {

  /** Per-table thresholds (ref `data_quality_agent.py:29-48`). */
  final case class Thresholds(
      minRows: Long = 1000,
      maxAgeHours: Int = 25,
      maxNullPct: Double = 10.0,
      maxDupPct: Double = 5.0)

  final case class TableCheck(
      name: String,
      df: DataFrame,
      keyCols: Seq[String],
      dateCol: Option[String],
      nullCheckCol: String,
      thresholds: Thresholds = Thresholds())

  /** Run all checks; one row per table with measured values + pass flags. */
  def run(checks: Seq[TableCheck], asOf: Column = current_date()): DataFrame =
    checks.map { c =>
      val keyExpr = concat_ws("|", c.keyCols.map(k => col(k).cast("string")): _*)
      val agg = c.df.agg(
        count(lit(1)).as("row_cnt"),
        count_if(col(c.nullCheckCol).isNull).as("null_cnt"),
        countDistinct(keyExpr).as("distinct_keys"),
        c.dateCol.map(d => max(col(d).cast("date"))).getOrElse(lit(null).cast("date"))
          .as("latest_date"))
      agg.select(
        lit(c.name).as("table_name"),
        col("row_cnt"), col("null_cnt"),
        (col("row_cnt") - col("distinct_keys")).as("dup_cnt"),
        col("latest_date"),
        (col("row_cnt") >= c.thresholds.minRows).as("row_floor_ok"),
        (col("null_cnt") * 100.0 / greatest(col("row_cnt"), lit(1L)) <= c.thresholds.maxNullPct)
          .as("null_rate_ok"),
        ((col("row_cnt") - col("distinct_keys")) * 100.0 / greatest(col("row_cnt"), lit(1L))
          <= c.thresholds.maxDupPct).as("dup_rate_ok"),
        c.dateCol.map(_ => datediff(asOf, col("latest_date")) * 24 <= c.thresholds.maxAgeHours)
          .getOrElse(lit(true)).as("freshness_ok"))
    }.reduce(_ unionByName _)
      .withColumn("all_ok",
        col("row_floor_ok") && col("null_rate_ok") && col("dup_rate_ok") && col("freshness_ok"))

  /** Fallback monitor (ref `pipeline_fallback_monitor.py:86-93`): compare the
    * primary view's coverage against the fallback estimate — rows only the
    * fallback provides signal missing individual budgets upstream.
    */
  def fallbackCoverage(primary: DataFrame, fallback: DataFrame, keys: Seq[String]): DataFrame = {
    val onlyFallback = fallback.join(primary, keys, "left_anti")
      .agg(count(lit(1)).as("n")).withColumn("segment", lit("FALLBACK_ONLY"))
    val covered = fallback.join(primary, keys, "left_semi")
      .agg(count(lit(1)).as("n")).withColumn("segment", lit("COVERED"))
    onlyFallback.unionByName(covered)
  }
}

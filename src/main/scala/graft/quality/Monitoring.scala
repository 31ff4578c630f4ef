package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's daily monitoring dashboard (`pipeline_monitoring.sql:9-131`)
  * as one report frame: per-table freshness with day-lag alert ladder,
  * data-quality issue counts, assembled into the three-section tagged union
  * the dashboard renders. `asOf` replaces CURRENT_DATE()/CURRENT_DATETIME()
  * so the report is reproducible under test (ReferenceSqlSpec proves the
  * verbatim SQL equals this plan).
  */
object Monitoring {

  private val defaultAsOf: Column = lit("2025-09-01 00:00:00").cast("timestamp_ntz")

  def report(details: DataFrame, timeEntries: DataFrame, v4: DataFrame,
      asOf: Column = defaultAsOf): DataFrame = {
    val asDate = to_date(asOf)

    def health(df: DataFrame, name: String, keyCol: String): DataFrame =
      df.agg(
        max(col("REPORTING_DATE")).as("latest_date"),
        count(lit(1)).as("total_records"),
        countDistinct(col(keyCol)).as("unique_work_items"))
        .select(lit(name).as("table_name"), col("latest_date"), col("total_records"),
          col("unique_work_items"), asDate.as("check_date"),
          datediff(asDate, col("latest_date")).as("days_behind"))

    val pipelineHealth =
      health(details, "WORK_ITEM_DETAILS_BQ", "WORK_ITEM_ID")
        .unionByName(health(v4, "WORK_ITEM_BUDGET_TIME_TRACKING_VIEW_V4", "WORK_ITEM_ID"))
        .unionByName(health(timeEntries, "USER_TIME_ENTRY_BQ", "USER_ID"))

    def issues(df: DataFrame, name: String, checkType: String, pred: Column): DataFrame =
      df.filter(pred).agg(count(lit(1)).as("issue_count"))
        .select(lit(name).as("table_name"), lit(checkType).as("check_type"), col("issue_count"))

    val dataQuality =
      issues(details, "WORK_ITEM_DETAILS_BQ", "NULL_WORK_ITEM_ID",
        col("WORK_ITEM_ID").isNull || col("WORK_ITEM_ID") === "")
        .unionByName(issues(v4, "WORK_ITEM_BUDGET_TIME_TRACKING_VIEW_V4", "NULL_CLIENT_ID",
          col("CLIENT_ID").isNull || col("CLIENT_ID") === ""))
        .unionByName(issues(timeEntries, "USER_TIME_ENTRY_BQ", "FUTURE_DATES",
          col("REPORTING_DATE") > asDate))

    val alerts = pipelineHealth.select(
      col("table_name"), col("latest_date"), col("total_records"), col("days_behind"),
      when(col("days_behind") > 3, "CRITICAL")
        .when(col("days_behind") > 1, "WARNING")
        .otherwise("OK").as("alert_level"),
      when(col("days_behind") > 3, "Data is more than 3 days old - investigate pipeline")
        .when(col("days_behind") > 1, "Data is more than 1 day old - monitor closely")
        .otherwise("Data freshness is acceptable").as("alert_message"))

    val header = details.sparkSession.range(1).select(
      lit("🔍 PIPELINE HEALTH REPORT").as("report_section"),
      asOf.as("report_timestamp"),
      lit("").as("table_name"),
      lit(null).cast("date").as("latest_date"),
      lit(null).cast("long").as("total_records"),
      lit(null).cast("int").as("days_behind"),
      lit("").as("alert_level"),
      lit("Generated automatically for daily monitoring").as("alert_message"))

    val freshness = alerts.select(
      lit("📊 DATA FRESHNESS").as("report_section"),
      asOf.as("report_timestamp"),
      col("table_name"), col("latest_date"), col("total_records"), col("days_behind"),
      col("alert_level"), col("alert_message"))

    val quality = dataQuality.select(
      lit("⚠️ DATA QUALITY ISSUES").as("report_section"),
      asOf.as("report_timestamp"),
      col("table_name"),
      lit(null).cast("date").as("latest_date"),
      col("issue_count").as("total_records"),
      lit(null).cast("int").as("days_behind"),
      when(col("issue_count") > 0, "WARNING").otherwise("OK").as("alert_level"),
      concat(col("check_type"), lit(": "), col("issue_count").cast("string"),
        lit(" issues found")).as("alert_message"))

    header.unionByName(freshness).unionByName(quality)
  }
}

package graft.quality

import graft.merge.Dml
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-system reconciliation runner on the reference's own table names
  * (`snowflake_bq_deduplication_sync.py:234-314`): distinct work-item key
  * sets from both systems, orphaned = target − source, missing = source −
  * target, then a per-table cleanup over the three fact tables
  * (`:95-165`) with dry-run and live modes.
  *
  * Spark-first deltas from the reference: the key sets stay distributed
  * (anti-joins, never Python set difference or a quoted `IN ('…')` list —
  * the reference's comma-joined key string breaks past query-length limits),
  * and live cleanup is a left-semi rewrite per table. At 100 TB the only
  * shuffles are on WORK_ITEM_ID.
  */
object Reconciliation {

  final case class Tables(
      details: DataFrame, budget: DataFrame, timeEntries: DataFrame)

  private val cleanupOrder = Seq(
    "WORK_ITEM_DETAILS_BQ", "WORK_ITEM_BUDGET_VS_ACTUAL_BQ", "USER_TIME_ENTRY_BQ")

  private def byName(t: Tables): Map[String, DataFrame] = Map(
    "WORK_ITEM_DETAILS_BQ" -> t.details,
    "WORK_ITEM_BUDGET_VS_ACTUAL_BQ" -> t.budget,
    "USER_TIME_ENTRY_BQ" -> t.timeEntries)

  /** The analysis frame (`:270-276`): one row of system-level counts. */
  def analyze(sourceIds: DataFrame, targetIds: DataFrame): DataFrame = {
    val sf = sourceIds.select(col("WORK_ITEM_ID")).distinct()
    val bq = targetIds.select(col("WORK_ITEM_ID")).distinct()
    val orphaned = bq.join(sf, Seq("WORK_ITEM_ID"), "left_anti")
    val missing = sf.join(bq, Seq("WORK_ITEM_ID"), "left_anti")
    sf.agg(count(lit(1)).as("snowflake_work_items"))
      .crossJoin(bq.agg(count(lit(1)).as("bigquery_work_items")))
      .crossJoin(orphaned.agg(count(lit(1)).as("orphaned_in_bigquery")))
      .crossJoin(missing.agg(count(lit(1)).as("missing_in_bigquery")))
  }

  /** Per-table cleanup report (`:95-165`): how many rows each fact table
    * would lose (dry run) — the same frame a live run deletes. */
  def cleanupReport(sourceIds: DataFrame, tables: Tables): DataFrame = {
    val sf = sourceIds.select(col("WORK_ITEM_ID")).distinct()
    cleanupOrder.map { name =>
      val df = byName(tables)(name)
      val orphanRows = df.filter(col("WORK_ITEM_ID").isNotNull)
        .join(sf, Seq("WORK_ITEM_ID"), "left_anti")
      orphanRows.agg(count(lit(1)).as("records_would_delete"))
        .select(lit(name).as("table_name"), col("records_would_delete"))
    }.reduce(_ unionByName _)
  }

  /** Live mode: remove orphaned work items from all three fact tables.
    * NULL WORK_ITEM_ID rows are never treated as orphans (they are dirty
    * data for the quality checks, not cross-system drift). */
  def cleanup(sourceIds: DataFrame, tables: Tables): Tables = {
    val sf = sourceIds.select(col("WORK_ITEM_ID")).distinct()
    def clean(df: DataFrame): DataFrame =
      df.filter(col("WORK_ITEM_ID").isNull)
        .unionByName(Dml.orphanCleanup(df.filter(col("WORK_ITEM_ID").isNotNull), sf, "WORK_ITEM_ID"))
    Tables(clean(tables.details), clean(tables.budget), clean(tables.timeEntries))
  }
}

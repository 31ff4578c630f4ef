package graft.views

import graft.ops.Core
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's view DAG on its OWN column names — the surface a user of
  * `paulrichardson-ux/snowflake_to_bq_pipeline` migrates onto. Each function
  * reproduces one view file; ViewDag holds the same logic transposed to the
  * benchmark star schema.
  *
  * Minutes are the canonical duration (`/60.0` to hours happens here, ref
  * `…view_v5.sql:17-18`); the 2025 monthly pivot keeps the reference's
  * hard-coded layout with the year as a parameter (`…view_v5.sql:23-34`).
  */
object DomainViews {

  /** `work_item_details_latest_view.sql:58-62`: correlated max-per-key,
    * tie-keeping. */
  def workItemDetailsLatest(details: DataFrame): DataFrame =
    Core.latestSnapshot(details, Seq("WORK_ITEM_ID"), "REPORTING_DATE", keepTies = true)

  /** `…view_v5.sql:11-37` IndividualTimeEntrySummary: per (work item, user)
    * billable/total hours + the monthly pivot. */
  def individualTimeEntrySummary(timeEntries: DataFrame, pivotYear: Int = 2025): DataFrame = {
    val pivots = (1 to 12).map { m =>
      (sum(when(year(col("REPORTING_DATE")) === pivotYear && month(col("REPORTING_DATE")) === m,
        col("MINUTES")).otherwise(lit(0L))) / 60.0).as(f"hours_${pivotYear}_$m%02d")
    }
    val aggs = Seq(
      (sum(col("MINUTES")) / 60.0).as("individual_hours_logged_actual"),
      (sum(when(col("IS_BILLABLE") === true, col("MINUTES")).otherwise(lit(0L))) / 60.0)
        .as("individual_billable_hours"),
      min(col("REPORTING_DATE")).as("first_time_entry_date"),
      max(col("REPORTING_DATE")).as("last_time_entry_date")) ++ pivots
    timeEntries
      .filter(col("USER_NAME").isNotNull)
      .groupBy(col("WORK_ITEM_ID"), col("USER_NAME"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** `…view_v5.sql:39-51` WorkItemTimeEntrySummary. */
  def workItemTimeEntrySummary(timeEntries: DataFrame): DataFrame =
    timeEntries.groupBy(col("WORK_ITEM_ID"))
      .agg((sum(col("MINUTES")) / 60.0).as("work_item_total_hours"),
        countDistinct(col("USER_NAME")).as("unique_contributors"))

  /** `…view_v5.sql:56-104` IndividualBudgetSummary: the 7-column window
    * dedup (keep the latest sync's row per allocation) then rollup.
    * Predicate `USER_NAME IS NOT NULL AND BUDGETED_MINUTES > 0` from `:83-84`.
    */
  def individualBudgetSummary(budget: DataFrame): DataFrame = {
    val deduped = Core.dedupByKey(
      budget.filter(col("USER_NAME").isNotNull && col("BUDGETED_MINUTES") > 0),
      Seq("WORK_ITEM_ID", "USER_NAME", "TASK_TYPE", "ROLE_NAME"),
      Seq(col("REPORTING_DATE").desc, col("BUDGETED_MINUTES").desc))
    deduped.groupBy(col("WORK_ITEM_ID"), col("USER_NAME"))
      .agg((sum(col("BUDGETED_MINUTES")) / 60.0).as("individual_budgeted_hours"),
        countDistinct(col("TASK_TYPE"), col("ROLE_NAME")).as("allocation_count"))
  }

  /** `…view_v5.sql:114-136` AllWorkItemUsers: budget users ∪ time users. */
  def allWorkItemUsers(its: DataFrame, ibs: DataFrame): DataFrame =
    ibs.select(col("WORK_ITEM_ID"), col("USER_NAME"))
      .union(its.select(col("WORK_ITEM_ID"), col("USER_NAME")))
      .distinct()

  /** `work_item_individual_budget_time_tracking_view_v5.sql` main select:
    * latest-filtered details INNER JOIN the user universe, LEFT JOIN the
    * summaries + dims (user dim under assigned/created/completed roles,
    * `…v4.sql:271-273`), ~30 derived columns.
    */
  def v5(timeEntries: DataFrame, details: DataFrame, budget: DataFrame,
      clientDim: DataFrame, userDim: DataFrame, pivotYear: Int = 2025): DataFrame = {
    val its = individualTimeEntrySummary(timeEntries, pivotYear)
    val wts = workItemTimeEntrySummary(timeEntries)
    val ibs = individualBudgetSummary(budget)
    val universe = allWorkItemUsers(its, ibs)
    val latest = workItemDetailsLatest(details)

    val assigned = userDim.select(col("USER_ID").as("au_id"), col("USER_NAME").as("assigned_to_name"))
    val created = userDim.select(col("USER_ID").as("cu_id"), col("USER_NAME").as("created_by_name"))
    val completed = userDim.select(col("USER_ID").as("xu_id"), col("USER_NAME").as("completed_by_name"))
    val cd = clientDim.select(col("CLIENT_ID").as("cd_client_id"),
      col("CLIENT_TYPE"), col("CLIENT_OWNER_USER_NAME"), col("CLIENT_MANAGER_USER_NAME"))

    val hrs = coalesce(col("individual_hours_logged_actual"), lit(0.0))
    val bud = col("individual_budgeted_hours")

    latest
      .join(universe, Seq("WORK_ITEM_ID"), "inner")
      .join(its, Seq("WORK_ITEM_ID", "USER_NAME"), "left")
      .join(wts, Seq("WORK_ITEM_ID"), "left")
      .join(ibs, Seq("WORK_ITEM_ID", "USER_NAME"), "left")
      .join(broadcast(cd), col("CLIENT_ID") === col("cd_client_id"), "left")
      .join(broadcast(assigned), col("ASSIGNED_TO_ID") === col("au_id"), "left")
      .join(broadcast(created), col("CREATED_BY_ID") === col("cu_id"), "left")
      .join(broadcast(completed), col("COMPLETED_BY_ID") === col("xu_id"), "left")
      .select(
        col("WORK_ITEM_ID"), col("USER_NAME"), col("REPORTING_DATE"),
        col("WORK_TITLE"), col("CLIENT_ID"), col("CLIENT"), col("CLIENT_TYPE"),
        col("CLIENT_OWNER_USER_NAME"), col("CLIENT_MANAGER_USER_NAME"),
        col("PRIMARY_STATUS"), col("SECONDARY_STATUS"),
        col("assigned_to_name"), col("created_by_name"), col("completed_by_name"),
        hrs.as("individual_hours_logged_actual"),
        coalesce(col("individual_billable_hours"), lit(0.0)).as("individual_billable_hours"),
        coalesce(col("work_item_total_hours"), lit(0.0)).as("work_item_total_hours"),
        bud.as("individual_budgeted_hours"),
        (coalesce(bud, lit(0.0)) - hrs).as("individual_budget_remaining_hours"),
        Core.safeDivide(hrs * 100.0, bud).as("individual_utilization_pct"),
        Core.safeDivide(hrs * 100.0, col("work_item_total_hours")).as("share_of_work_item_pct"),
        when(bud.isNull, "NO_INDIVIDUAL_BUDGET")
          .when(hrs > bud, "OVER_BUDGET")
          .when(hrs >= bud * 0.8, "NEAR_BUDGET")
          .otherwise("UNDER_BUDGET").as("individual_budget_status"),
        col("first_time_entry_date"), col("last_time_entry_date"),
        col("unique_contributors")
      )
  }

  /** `daily_sync.py:92-107` (M4): the post-merge duplicate cleanup — keep
    * the newest ingestion per (TIME_ENTRY_ID, REPORTING_DATE). */
  def timeEntryDedupCleanup(timeEntries: DataFrame): DataFrame =
    Core.dedupByKey(timeEntries, Seq("TIME_ENTRY_ID", "REPORTING_DATE"),
      Seq(col("bq_ingestion_timestamp").desc, col("row_uuid")))
}

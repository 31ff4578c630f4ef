package graft.views

import graft.ops.Core
import org.apache.spark.sql.{Column, DataFrame}
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

  /** `work_item_budget_vs_actual_corrected_view.sql` on the reference's own
    * column names (abbreviated to the catalog's column set): full-row
    * DISTINCT of the budget fact (`:10-35`), REPORTING_DATE re-exposed as
    * `sync_reporting_date` (`:39`), LEFT JOIN the tie-keeping latest work
    * item snapshot (`:127-129`), then the due-date derivations (`:70-76`),
    * hour/variance/utilization columns (`:94-109`) and the status ladder
    * (`:112-125`). `asOf` replaces CURRENT_TIMESTAMP so `is_past_due` is
    * reproducible under test.
    */
  def corrected(budget: DataFrame, details: DataFrame,
      asOf: Column = lit("2025-09-01 00:00:00").cast("timestamp_ntz")): DataFrame = {
    val deduped = budget.dropDuplicates() // DISTINCT before the join — order is semantic
    val wi = workItemDetailsLatest(details).select(
      col("WORK_ITEM_ID"), col("DUE_DATETIME"), col("PRIMARY_STATUS"),
      col("SECONDARY_STATUS"), col("ASSIGNED_TO_ID"))
    val bm = coalesce(col("BUDGETED_MINUTES"), lit(0L))
    val am = coalesce(col("ACTUAL_MINUTES"), lit(0L))
    deduped.withColumnRenamed("REPORTING_DATE", "sync_reporting_date")
      .join(wi, Seq("WORK_ITEM_ID"), "left")
      .withColumn("due_date", to_date(col("DUE_DATETIME")))
      .withColumn("due_year", year(col("DUE_DATETIME")))
      .withColumn("due_month", month(col("DUE_DATETIME")))
      .withColumn("due_day", dayofmonth(col("DUE_DATETIME")))
      .withColumn("due_month_start", date_trunc("month", col("DUE_DATETIME")))
      .withColumn("due_week_start", date_trunc("week", col("DUE_DATETIME")))
      .withColumn("due_quarter_start", date_trunc("quarter", col("DUE_DATETIME")))
      .withColumn("budgeted_hours", bm / 60.0)
      .withColumn("actual_hours", am / 60.0)
      .withColumn("variance_minutes", bm - am)
      .withColumn("variance_hours", (bm - am) / 60.0)
      .withColumn("budget_utilization_percentage",
        when(bm > 0, (am / col("BUDGETED_MINUTES")) * 100).otherwise(lit(null)))
      .withColumn("budget_status",
        when(bm > 0 && am > col("BUDGETED_MINUTES"), "OVER_BUDGET")
          .when(bm > 0 && am > col("BUDGETED_MINUTES") * 0.8, "APPROACHING_BUDGET")
          .when(bm > 0, "WITHIN_BUDGET")
          .otherwise("NO_BUDGET_SET"))
      .withColumn("has_due_date", col("DUE_DATETIME").isNotNull)
      .withColumn("is_completed", col("PRIMARY_STATUS").isin("Completed", "Closed"))
      .withColumn("is_past_due", coalesce(col("DUE_DATETIME") < asOf, lit(false)))
  }

  /** `work_item_budget_time_tracking_view_v4.sql` on the reference's column
    * names (abbreviated to the catalog's columns): the per-item time rollup
    * CTE (`:7-19`), tie-keeping latest filter (`:276-280`), the 10-join star
    * (productivity + client group + client dim + owner/manager tenant teams
    * + user dim under three roles, `:259-273`), productivity metrics
    * (`:87-119`), budget analytics (`:168-189`), and the W4–W6 rolling
    * windows (`:194-232`) which — exactly as the reference wrote them — run
    * AFTER the latest filter. Deviation for determinism: the client-level
    * window orders by (REPORTING_DATE, WORK_ITEM_ID); the reference's bare
    * REPORTING_DATE leaves tie order to the engine.
    */
  def v4(details: DataFrame, timeEntries: DataFrame, productivity: DataFrame,
      clientGroupDim: DataFrame, clientDim: DataFrame, tenantTeamDim: DataFrame,
      tenantTeamMemberDim: DataFrame, userDim: DataFrame,
      asOf: Column = lit("2025-09-01 00:00:00").cast("timestamp_ntz")): DataFrame = {
    val te = timeEntries.groupBy(col("WORK_ITEM_ID")).agg(
      (sum(when(col("IS_BILLABLE") === true, col("MINUTES")).otherwise(lit(0L))) / 60.0)
        .as("billable_hours_logged"),
      (sum(col("MINUTES")) / 60.0).as("total_hours_logged"),
      count(lit(1)).as("total_time_entries"),
      countDistinct(col("USER_NAME")).as("unique_contributors"),
      min(col("REPORTING_DATE")).as("first_time_entry_date"),
      max(col("REPORTING_DATE")).as("last_time_entry_date"))
    val prod = productivity.select(col("WORK_ITEM_ID"), col("MEASURE_TYPE"), col("POINTS"),
      col("WEIGHTING"), col("TOTAL_POINTS"),
      col("SYNC_TIMESTAMP").as("PRODUCTIVITY_SYNC_TIMESTAMP"),
      col("LAST_MODIFIED_BY").as("PRODUCTIVITY_LAST_MODIFIED_BY"))
    val cg = clientGroupDim.select(col("CLIENT_ID").as("cg_client_id"),
      col("CLIENT_GROUP_ID"), col("CLIENT_GROUP_NAME").as("client_group_name"),
      col("CLIENT_GROUP_MEMBER_TYPE").as("client_group_member_type"),
      col("ACCOUNT_ID").as("client_group_account_id"),
      col("ACCOUNT_NAME").as("client_group_account_name"))
    val cd = clientDim.select(col("CLIENT_ID").as("cd_client_id"), col("CLIENT_TYPE"),
      col("CLIENT_OWNER_USER_ID"), col("CLIENT_OWNER_USER_NAME"),
      col("CLIENT_MANAGER_USER_ID"), col("CLIENT_MANAGER_USER_NAME"))
    val ttm = tenantTeamMemberDim.select(col("USER_ID").as("ttm_user_id"),
      col("TENANT_TEAM_ID").as("client_owner_tenant_team_id"))
    val tt = tenantTeamDim.select(col("TENANT_TEAM_ID").as("tt_id"),
      col("TENANT_TEAM_NAME").as("client_owner_tenant_team_name"))
    val ttmM = tenantTeamMemberDim.select(col("USER_ID").as("ttm_mgr_user_id"),
      col("TENANT_TEAM_ID").as("client_manager_tenant_team_id"))
    val ttM = tenantTeamDim.select(col("TENANT_TEAM_ID").as("tt_mgr_id"),
      col("TENANT_TEAM_NAME").as("client_manager_tenant_team_name"))
    def ud(prefix: String, idAlias: String) = userDim.select(col("USER_ID").as(idAlias),
      col("USER_JOB_TITLE").as(s"${prefix}_job_title"),
      (coalesce(col("EXPECTED_BILLABLE_MINUTES"), lit(0L)) / 60.0)
        .as(s"${prefix}_expected_billable_hours"),
      (coalesce(col("EXPECTED_NONBILLABLE_MINUTES"), lit(0L)) / 60.0)
        .as(s"${prefix}_expected_nonbillable_hours"))

    val bm = coalesce(col("BUDGETED_MINUTES"), lit(0L))
    val hoursLogged = coalesce(col("total_hours_logged"), lit(0.0))
    val varianceExpr = when(bm > 0, col("BUDGETED_MINUTES") / 60.0 - hoursLogged)
      .otherwise(lit(null))
    val wItem = Window.partitionBy(col("WORK_ITEM_ID"))
      .orderBy(col("REPORTING_DATE"), col("WORK_ITEM_ID"))
    val wClient = Window.partitionBy(col("CLIENT_ID"))
      .orderBy(col("REPORTING_DATE"), col("WORK_ITEM_ID"))

    workItemDetailsLatest(details)
      .join(broadcast(prod), Seq("WORK_ITEM_ID"), "left")
      .join(te, Seq("WORK_ITEM_ID"), "left")
      .join(broadcast(cg), col("CLIENT_ID") === col("cg_client_id"), "left")
      .join(broadcast(cd), col("CLIENT_ID") === col("cd_client_id"), "left")
      .join(broadcast(ttm), col("CLIENT_OWNER_USER_ID") === col("ttm_user_id"), "left")
      .join(broadcast(tt), col("client_owner_tenant_team_id") === col("tt_id"), "left")
      .join(broadcast(ttmM), col("CLIENT_MANAGER_USER_ID") === col("ttm_mgr_user_id"), "left")
      .join(broadcast(ttM), col("client_manager_tenant_team_id") === col("tt_mgr_id"), "left")
      .join(broadcast(ud("assigned_user", "ud_a_id")), col("ASSIGNED_TO_ID") === col("ud_a_id"), "left")
      .join(broadcast(ud("client_owner", "ud_o_id")), col("CLIENT_OWNER_USER_ID") === col("ud_o_id"), "left")
      .join(broadcast(ud("client_manager", "ud_m_id")), col("CLIENT_MANAGER_USER_ID") === col("ud_m_id"), "left")
      .withColumn("BUDGET_REMAINING_HOURS_CORRECTED",
        when(col("BUDGETED_MINUTES").isNull &&
            (col("TIME_ENTRY_MINUTES").isNull || col("TIME_ENTRY_MINUTES") === 0), lit(null))
          .when(col("BUDGETED_MINUTES").isNull, -Core.safeDivide(col("TIME_ENTRY_MINUTES"), lit(60)))
          .otherwise(Core.safeDivide(col("BUDGETED_MINUTES"), lit(60)) -
            Core.safeDivide(col("TIME_ENTRY_MINUTES"), lit(60))))
      .withColumn("POINTS_PER_HOUR_ACTUAL",
        when(col("POINTS").isNotNull && col("TIME_ENTRY_MINUTES").isNotNull &&
          col("TIME_ENTRY_MINUTES") > 0,
          Core.safeDivide(col("POINTS"), Core.safeDivide(col("TIME_ENTRY_MINUTES"), lit(60.0)))))
      .withColumn("POINTS_PER_HOUR_BUDGETED",
        when(col("POINTS").isNotNull && col("BUDGETED_MINUTES").isNotNull &&
          col("BUDGETED_MINUTES") > 0,
          Core.safeDivide(col("POINTS"), Core.safeDivide(col("BUDGETED_MINUTES"), lit(60.0)))))
      .withColumn("TOTAL_POINTS_PER_HOUR_ACTUAL",
        when(col("TOTAL_POINTS").isNotNull && col("TIME_ENTRY_MINUTES").isNotNull &&
          col("TIME_ENTRY_MINUTES") > 0,
          Core.safeDivide(col("TOTAL_POINTS"), Core.safeDivide(col("TIME_ENTRY_MINUTES"), lit(60.0)))))
      .withColumn("HAS_PRODUCTIVITY_DATA", col("MEASURE_TYPE").isNotNull)
      .withColumn("IS_PRODUCTIVITY_TASK",
        coalesce(col("MEASURE_TYPE").isin("Productivity", "Productivity SLA"), lit(false)))
      .withColumn("IS_SLA_TASK",
        coalesce(col("MEASURE_TYPE") === "SLA" || col("MEASURE_TYPE") === "Productivity SLA", lit(false)))
      .withColumn("total_hours_logged_summary", hoursLogged)
      .withColumn("billable_hours_logged_summary", coalesce(col("billable_hours_logged"), lit(0.0)))
      .withColumn("budget_utilization_percentage",
        when(bm > 0, hoursLogged / (col("BUDGETED_MINUTES") / 60.0) * 100).otherwise(lit(null)))
      .withColumn("budget_remaining_hours_calculated",
        when(bm > 0, col("BUDGETED_MINUTES") / 60.0 - hoursLogged).otherwise(lit(null)))
      .withColumn("budget_status",
        when(bm > 0 && hoursLogged > col("BUDGETED_MINUTES") / 60.0, "OVER_BUDGET")
          .when(bm > 0 && hoursLogged > col("BUDGETED_MINUTES") / 60.0 * 0.8, "APPROACHING_BUDGET")
          .when(bm > 0, "WITHIN_BUDGET")
          .otherwise("NO_BUDGET_SET"))
      // W6 guard + W4 trailing frame, post-latest-filter exactly like the SQL
      .withColumn("avg_budget_variance_3_months_hours",
        when(stddev(hoursLogged).over(wItem.rowsBetween(-3, 0)) > 0.01,
          avg(varianceExpr).over(wItem.rowsBetween(-3, -1)))
          .otherwise(varianceExpr))
      // W5: client-grain trailing frame
      .withColumn("client_avg_budget_variance_3_months_hours",
        avg(varianceExpr).over(wClient.rowsBetween(-3, -1)))
      .withColumn("schedule_status",
        when(col("DUE_DATETIME").isNotNull && col("DUE_DATETIME") < asOf &&
          !col("PRIMARY_STATUS").isin("Completed", "Closed"), "OVERDUE")
          .when(col("DUE_DATETIME").isNotNull &&
            col("DUE_DATETIME") <= asOf + expr("INTERVAL 3 DAY") &&
            !col("PRIMARY_STATUS").isin("Completed", "Closed"), "DUE_SOON")
          .otherwise("ON_TRACK"))
      .withColumn("client_name", col("CLIENT"))
      .withColumn("budget_hours", bm / 60.0)
      .withColumn("actual_hours_from_work_item", coalesce(col("TIME_ENTRY_MINUTES"), lit(0L)) / 60.0)
      .withColumn("work_item_reporting_date", col("REPORTING_DATE"))
      .drop("cg_client_id", "cd_client_id", "ttm_user_id", "tt_id",
        "ttm_mgr_user_id", "tt_mgr_id", "ud_a_id", "ud_o_id", "ud_m_id")
  }

  /** `work_item_individual_budget_time_tracking_view_v5_fallback.sql` on the
    * reference's column names: per-user time rollups with the July-2025
    * pivot (`:7-22`), per-item rollups (`:24-34`), actual individual budgets
    * from the corrected view (`:36-56`), proportional fallback budgets for
    * items without them (`:58-93` — work-item budget × user's share of
    * logged hours), the provenance-tagged UNION (`:95-132`), and the main
    * select with the disjunctive join `cbs.USER_NAME = ite.USER_NAME OR
    * cbs.USER_NAME IS NULL` (`:180-182`, J12) and the either-side-present
    * filter (`:196`).
    */
  def v5Fallback(timeEntries: DataFrame, details: DataFrame, correctedView: DataFrame): DataFrame = {
    val its = timeEntries.groupBy(col("WORK_ITEM_ID"), col("USER_NAME"), col("USER_ID"))
      .agg(
        (sum(when(col("IS_BILLABLE") === true, col("MINUTES")).otherwise(lit(0L))) / 60.0)
          .as("billable_hours_logged"),
        (sum(col("MINUTES")) / 60.0).as("total_hours_logged"),
        count(lit(1)).as("total_time_entries"),
        min(col("REPORTING_DATE")).as("first_time_entry_date"),
        max(col("REPORTING_DATE")).as("last_time_entry_date"),
        (sum(when(year(col("REPORTING_DATE")) === 2025 && month(col("REPORTING_DATE")) === 7,
          col("MINUTES")).otherwise(lit(0L))) / 60.0).as("hours_logged_jul_2025"))
    val wits = timeEntries.groupBy(col("WORK_ITEM_ID"))
      .agg(
        (sum(when(col("IS_BILLABLE") === true, col("MINUTES")).otherwise(lit(0L))) / 60.0)
          .as("work_item_billable_hours_logged"),
        (sum(col("MINUTES")) / 60.0).as("work_item_total_hours_logged"),
        count(lit(1)).as("work_item_total_time_entries"),
        countDistinct(col("USER_NAME")).as("unique_contributors"))
    val ibs = correctedView
      .filter(col("USER_NAME").isNotNull && col("BUDGETED_MINUTES") > 0)
      .groupBy(col("WORK_ITEM_ID"), col("USER_ID"), col("USER_NAME"))
      .agg(
        sum(col("BUDGETED_MINUTES")).cast("double").as("total_individual_budgeted_minutes"),
        first(col("WORK_TITLE"), ignoreNulls = true).as("work_title"),
        first(col("CLIENT"), ignoreNulls = true).as("client"),
        first(col("due_date"), ignoreNulls = true).as("due_date"))
    val latest = workItemDetailsLatest(details)
    val fallback = latest
      .join(its.select(col("WORK_ITEM_ID"), col("USER_ID"), col("USER_NAME"),
        col("total_hours_logged")), Seq("WORK_ITEM_ID"), "inner")
      .join(wits.select(col("WORK_ITEM_ID"), col("work_item_total_hours_logged")),
        Seq("WORK_ITEM_ID"), "inner")
      .join(ibs.select(col("WORK_ITEM_ID")).distinct(), Seq("WORK_ITEM_ID"), "left_anti")
      .select(col("WORK_ITEM_ID"), col("USER_ID"), col("USER_NAME"),
        when(col("work_item_total_hours_logged") > 0,
          col("BUDGETED_MINUTES") * (col("total_hours_logged") / col("work_item_total_hours_logged")))
          .otherwise(lit(0.0)).as("total_individual_budgeted_minutes"),
        col("WORK_TITLE").as("work_title"), col("CLIENT").as("client"),
        to_date(col("DUE_DATETIME")).as("due_date"))
    val combined = ibs
      .select(col("WORK_ITEM_ID"), col("USER_ID"), col("USER_NAME"),
        col("total_individual_budgeted_minutes"), col("work_title"), col("client"),
        col("due_date"), lit("ACTUAL_INDIVIDUAL_BUDGET").as("budget_source"))
      .unionByName(fallback.select(col("WORK_ITEM_ID"), col("USER_ID"), col("USER_NAME"),
        col("total_individual_budgeted_minutes"), col("work_title"), col("client"),
        col("due_date"), lit("ESTIMATED_FROM_TIME_LOGGED").as("budget_source")))

    val cbs = combined.select(col("WORK_ITEM_ID"), col("USER_ID").as("cbs_user_id"),
      col("USER_NAME").as("cbs_user_name"),
      col("total_individual_budgeted_minutes"), col("budget_source"))
    val ite = its.select(col("WORK_ITEM_ID").as("ite_item_id"),
      col("USER_ID").as("ite_user_id"), col("USER_NAME").as("ite_user_name"),
      col("total_hours_logged"), col("billable_hours_logged"),
      col("total_time_entries"), col("hours_logged_jul_2025"))

    val budgeted = coalesce(col("total_individual_budgeted_minutes"), lit(0.0))
    val logged = coalesce(col("total_hours_logged"), lit(0.0))
    latest
      .join(cbs, Seq("WORK_ITEM_ID"), "left")
      .join(ite, col("WORK_ITEM_ID") === col("ite_item_id") &&
        (col("cbs_user_name") === col("ite_user_name") || col("cbs_user_name").isNull), "left")
      .join(wits.select(col("WORK_ITEM_ID"), col("work_item_total_hours_logged")),
        Seq("WORK_ITEM_ID"), "left")
      .filter(col("cbs_user_id").isNotNull || col("ite_user_id").isNotNull)
      .select(
        col("WORK_ITEM_ID"), col("REPORTING_DATE"), col("WORK_TITLE"),
        col("CLIENT_ID"), col("CLIENT"), col("DUE_DATETIME"), col("PRIMARY_STATUS"),
        col("ASSIGNED_TO_ID"),
        coalesce(col("cbs_user_id"), col("ite_user_id")).as("budget_user_id"),
        coalesce(col("cbs_user_name"), col("ite_user_name")).as("budget_user_name"),
        budgeted.as("individual_budgeted_minutes"),
        (budgeted / 60.0).as("individual_budgeted_hours"),
        col("budget_source"),
        logged.as("individual_hours_logged_actual"),
        coalesce(col("billable_hours_logged"), lit(0.0)).as("individual_billable_hours_logged"),
        coalesce(col("total_time_entries"), lit(0L)).as("individual_time_entries_count"),
        coalesce(col("hours_logged_jul_2025"), lit(0.0)).as("hours_logged_jul_2025"),
        (budgeted - logged * 60).as("individual_budget_variance_minutes"),
        (budgeted / 60.0 - logged).as("individual_budget_variance_hours"),
        col("BUDGETED_MINUTES").as("work_item_total_budgeted_minutes"),
        (coalesce(col("BUDGETED_MINUTES"), lit(0L)) / 60.0).as("work_item_total_budget_hours"),
        coalesce(col("work_item_total_hours_logged"), lit(0.0))
          .as("work_item_total_hours_logged_summary"),
        col("cbs_user_id").isNotNull.as("has_individual_budget"),
        col("ite_user_id").isNotNull.as("has_individual_time_logged"),
        coalesce(col("budget_source") === "ACTUAL_INDIVIDUAL_BUDGET", lit(false))
          .as("has_actual_individual_budget"))
  }
}

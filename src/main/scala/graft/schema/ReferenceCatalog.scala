package graft.schema

import org.apache.spark.sql.types._

/** The reference's table registry (SURVEY §1.4, FIXTURES.md): the three fact
  * tables, five dimensions, and three control tables, with their declared
  * schemas. Dimension schemas are fixed/declared in the reference
  * (`client_dimension_…_full/main.py:31-70` etc.); fact schemas are the
  * column sets the views consume plus the audit columns the syncs add.
  */
object ReferenceCatalog {

  private def s(names: String*) = names.map(StructField(_, StringType))

  /** USER_TIME_ENTRY_BQ (`daily_sync.py:83-90`, `…view_v5.sql:11-51`). */
  val userTimeEntry: StructType = StructType(
    s("TIME_ENTRY_ID") ++ Seq(
      StructField("REPORTING_DATE", DateType),
      StructField("WORK_ITEM_ID", StringType),
      StructField("USER_ID", StringType),
      StructField("USER_NAME", StringType),
      StructField("MINUTES", LongType),
      StructField("IS_BILLABLE", BooleanType),
      StructField("row_uuid", StringType),
      StructField("bq_ingestion_timestamp", TimestampNTZType)))

  /** WORK_ITEM_DETAILS_BQ — snapshot fact, the full column set the V4/V5
    * view texts project (`…view_v5.sql:140-179`; `…view_v4.sql:23-67`). */
  val workItemDetails: StructType = StructType(Seq(
    StructField("WORK_ITEM_ID", StringType),
    StructField("REPORTING_DATE", DateType),
    StructField("WORK_TITLE", StringType),
    StructField("CLIENT_ID", StringType),
    StructField("CLIENT", StringType),
    StructField("CLIENT_TYPE", StringType),
    StructField("INTERNAL_CLIENT_ID", StringType),
    StructField("INTERNAL_CLIENT", StringType),
    StructField("ACCOUNT_ID", StringType),
    StructField("ACCOUNT_NAME", StringType),
    StructField("WORK_TYPE_ID", StringType),
    StructField("WORK_TYPE", StringType),
    StructField("PRIMARY_STATUS_ID", StringType),
    StructField("SECONDARY_STATUS_ID", StringType),
    StructField("PRIMARY_STATUS", StringType),
    StructField("SECONDARY_STATUS", StringType),
    StructField("SECONDARY_STATUS_ORDER", LongType),
    StructField("CURRENT_STATUS_ENTRY_DATE", TimestampNTZType),
    StructField("REPEAT_SCHEDULE", StringType),
    StructField("CREATED_DATETIME", TimestampNTZType),
    StructField("CREATED_BY_ID", StringType),
    StructField("CREATED_BY", StringType),
    StructField("START_DATETIME", TimestampNTZType),
    StructField("ASSIGNED_TO_ID", StringType),
    StructField("ASSIGNED_TO", StringType),
    StructField("DUE_DATETIME", TimestampNTZType),
    StructField("DEADLINE_DATETIME", TimestampNTZType),
    StructField("COMPLETED_DATETIME", TimestampNTZType),
    StructField("COMPLETED_BY_ID", StringType),
    StructField("COMPLETED_BY", StringType),
    StructField("USER_DEFINED_CLIENT_ID", StringType),
    StructField("WORK_TEMPLATE_ID", StringType),
    StructField("WORK_TEMPLATE", StringType),
    StructField("WORK_DESCRIPTION", StringType),
    StructField("FIXED_FEE_ESTIMATED_COST", LongType),
    StructField("BUDGETED_MINUTES", LongType),
    StructField("BUDGETED_COST", LongType),
    StructField("EXPENSE_AMOUNT", LongType),
    StructField("BILLABLE_EXPENSE_AMOUNT", LongType),
    StructField("TIME_ENTRY_MINUTES", LongType),
    StructField("TIME_ENTRY_COST", LongType),
    StructField("BUDGET_REMAINING_HOURS", DoubleType),
    StructField("INTERNAL_TASKS_COMPLETED_COUNT", LongType),
    StructField("INTERNAL_TASKS_PENDING_COUNT", LongType),
    StructField("IS_WORK_ITEM_OVERDUE", BooleanType)))

  /** WORK_ITEM_BUDGET_VS_ACTUAL_BQ — the full corrected-view input column
    * set (`corrected_view.sql:11-34`). */
  val workItemBudgetVsActual: StructType = StructType(Seq(
    StructField("REPORTING_DATE", DateType),
    StructField("WORK_ITEM_ID", StringType),
    StructField("WORK_TITLE", StringType),
    StructField("WORK_TYPE_ID", StringType),
    StructField("WORK_TYPE", StringType),
    StructField("TASK_TYPE_ID", StringType),
    StructField("TASK_TYPE", StringType),
    StructField("TASK_TYPE_BILLABLE_FLAG", StringType),
    StructField("ROLE_ID", StringType),
    StructField("ROLE_NAME", StringType),
    StructField("ACCOUNT_ID", StringType),
    StructField("ACCOUNT_NAME", StringType),
    StructField("USER_ID", StringType),
    StructField("USER_NAME", StringType),
    StructField("INTERNAL_CLIENT_ID", StringType),
    StructField("INTERNAL_CLIENT", StringType),
    StructField("CLIENT_ID", StringType),
    StructField("CLIENT", StringType),
    StructField("BUDGETED_MINUTES", LongType),
    StructField("ACTUAL_MINUTES", LongType),
    StructField("BUDGETED_COST", LongType),
    StructField("ACTUAL_COST", LongType)))

  /** PRODUCTIVITY_REPEATS_SYNC — the columns V4 consumes
    * (`work_item_budget_time_tracking_view_v4.sql:77-84`). */
  val productivityRepeats: StructType = StructType(Seq(
    StructField("WORK_ITEM_ID", StringType),
    StructField("CATEGORY", StringType),
    StructField("PROJECT", StringType),
    StructField("MEASURE_TYPE", StringType),
    StructField("POINTS", DecimalType(18, 2)),
    StructField("WEIGHTING", DecimalType(18, 2)),
    StructField("TOTAL_POINTS", DecimalType(18, 2)),
    StructField("SYNC_TIMESTAMP", TimestampNTZType),
    StructField("LAST_MODIFIED_BY", StringType)))

  /** DIMN_CLIENT — 35 declared columns in the reference; the analytically
    * live subset here (`client_dimension_…_full/main.py:31-70`). */
  val clientDimension: StructType = StructType(
    s("CLIENT_ID", "CLIENT", "CLIENT_TYPE", "CLIENT_SUBTYPE", "CLIENT_OWNER_USER_ID",
      "CLIENT_OWNER_USER_NAME", "CLIENT_MANAGER_USER_ID", "CLIENT_MANAGER_USER_NAME",
      "PRIMARY_ADDRESS_COUNTRY_CODE", "PRIMARY_ADDRESS_STATE_PROVINCE_COUNTY",
      "PRIMARY_ADDRESS_CITY",
      "ACCOUNT_ID", "ACCOUNT_NAME") :+ StructField("DATE_CREATED", TimestampNTZType))

  /** DIMN_USER (`user_dimension_…_full/main.py:34-49`). */
  val userDimension: StructType = StructType(
    s("USER_NAME", "USER_ID", "USER_JOB_TITLE", "USER_EMAIL_ADDRESS",
      "CREATED_DATE", "ACTIVATED_DATE", "STATUS") ++ Seq(
      StructField("EXPECTED_BILLABLE_MINUTES", LongType),
      StructField("EXPECTED_NONBILLABLE_MINUTES", LongType),
      StructField("IS_SUPPORT_USER", BooleanType)) ++ s("ACCOUNT_ID", "ACCOUNT_NAME"))

  /** DIMN_TENANT_TEAM (`tenant_team_dimension_…_full/main.py:36-42`). */
  val tenantTeamDimension: StructType = StructType(
    s("TENANT_TEAM_ID", "TENANT_TEAM_NAME", "PARENT_TENANT_TEAM_ID",
      "PARENT_TENANT_TEAM_NAME", "ACCOUNT_ID", "ACCOUNT_NAME"))

  /** DIMN_TENANT_TEAM_MEMBER (`tenant_team_member_…_full/main.py:34-42`). */
  val tenantTeamMemberDimension: StructType = StructType(
    s("TENANT_TEAM_MEMBER_ID", "TENANT_TEAM_ID", "USER_ID", "ACCOUNT_ID", "ACCOUNT_NAME"))

  /** DIMN_CLIENT_GROUP (`client_group_dimension_…_full/main.py:36-43`). */
  val clientGroupDimension: StructType = StructType(
    s("CLIENT_GROUP_ID", "CLIENT_GROUP_NAME", "CLIENT_ID", "CLIENT",
      "CLIENT_GROUP_MEMBER_TYPE", "ACCOUNT_ID", "ACCOUNT_NAME"))

  /** time_sync_tracker (`snowflake_bq_sync Time details/main.py:42-48`). */
  val timeSyncTracker: StructType = StructType(Seq(
    StructField("unique_id", StringType, nullable = false),
    StructField("time_entry_id", StringType, nullable = false),
    StructField("reporting_date", DateType, nullable = false)))

  /** work_item_budget_vs_actual_sync_tracker (`…_daily/main.py:79-95`). */
  val budgetSyncTracker: StructType = StructType(Seq(
    StructField("unique_id", StringType, nullable = false),
    StructField("work_item_id", StringType, nullable = false),
    StructField("reporting_date", DateType, nullable = false),
    StructField("sync_timestamp", TimestampNTZType, nullable = false),
    StructField("sync_type", StringType)))

  /** time_entry_sync_state (`main_paginated.py:78-99`). */
  val timeEntrySyncState: StructType = StructType(Seq(
    StructField("sync_id", StringType, nullable = false),
    StructField("start_date", DateType, nullable = false),
    StructField("end_date", DateType, nullable = false),
    StructField("status", StringType),
    StructField("created_at", TimestampNTZType, nullable = false),
    StructField("updated_at", TimestampNTZType, nullable = false),
    StructField("rows_processed", LongType),
    StructField("error_message", StringType)))

  val all: Map[String, StructType] = Map(
    "USER_TIME_ENTRY_BQ" -> userTimeEntry,
    "WORK_ITEM_DETAILS_BQ" -> workItemDetails,
    "WORK_ITEM_BUDGET_VS_ACTUAL_BQ" -> workItemBudgetVsActual,
    "PRODUCTIVITY_REPEATS_SYNC" -> productivityRepeats,
    "CLIENT_DIMENSION" -> clientDimension,
    "USER_DIMENSION" -> userDimension,
    "TENANT_TEAM_DIMENSION" -> tenantTeamDimension,
    "TENANT_TEAM_MEMBER_DIMENSION" -> tenantTeamMemberDimension,
    "CLIENT_GROUP_DIMENSION" -> clientGroupDimension,
    "time_sync_tracker" -> timeSyncTracker,
    "work_item_budget_vs_actual_sync_tracker" -> budgetSyncTracker,
    "time_entry_sync_state" -> timeEntrySyncState)
}

package graft.queries

/** DuckDB oracle SQL for the reference-named domain-view DAG
  * (`ref_corrected_domain`, `ref_v4_domain`, `ref_v5_domain`,
  * `ref_v5_fallback_domain`) — independent re-implementations of
  * `views/DomainViews.scala` over the parquet dump of the FixtureGen tables
  * that `Verify` writes to [[FixturesDir]] on every run.
  *
  * Cross-engine exactness notes (the conventions that keep the hash compare
  * green):
  *  - Every aggregate here sums LONG minutes — exact in both engines — and
  *    divides by a DOUBLE literal afterwards, so no float-summation-order
  *    issue exists anywhere except V4's two windowed averages of doubles,
  *    which are ROUND(x, 6)-ed on BOTH sides (the Spark side rounds in its
  *    ViewQueries projection).
  *  - DuckDB types SUM(BIGINT) as HUGEINT (→ float64 in pandas): every
  *    integer SUM that reaches the output is wrapped in CAST(... AS BIGINT).
  *  - Decimal literals are written CAST(x AS DOUBLE) so DuckDB's DECIMAL
  *    arithmetic never replaces the double arithmetic Spark performs.
  *  - DECIMAL(18,2) productivity columns are CAST to DOUBLE on both sides
  *    (pandas reads parquet decimals as objects, DuckDB fetches them as
  *    float64 — the raw types can't hash-compare).
  *  - Spark's `desc` ordering is NULLS LAST; spelled explicitly.
  *  - Uppercase identifiers are double-quoted: the driver's compare is
  *    case-sensitive on column names.
  */
object DomainOracles {

  /** Fixed absolute path (outside the verify outDir — the compare harness
    * treats outDir subdirectories as query results). Verify re-writes the
    * seed-fixed fixtures here before every dump.
    */
  // User-scoped (and env-overridable) so concurrent verify runs on a shared
  // machine don't race on one world-shared /tmp path. Resolved once per JVM,
  // so the Verify dump and the oracle SQL it emits always agree.
  val FixturesDir: String = sys.env.getOrElse("GRAFT_FIXTURES_DIR",
    s"${System.getProperty("java.io.tmpdir")}/graft_fixtures_${System.getProperty("user.name", "anon")}")

  private def fx(t: String) = s"read_parquet('$FixturesDir/$t/*.parquet')"

  private val months =
    Seq("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec")

  private val asOf = "TIMESTAMP '2025-09-01 00:00:00'"

  // `daily_sync.py:92-107` cleanup: newest ingestion per (entry, date).
  private val TE_CLEAN =
    s"""te AS (SELECT * EXCLUDE (__rn) FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY "TIME_ENTRY_ID", "REPORTING_DATE"
       |    ORDER BY bq_ingestion_timestamp DESC NULLS LAST, row_uuid) AS __rn
       |  FROM ${fx("time_entries")}) WHERE __rn = 1)""".stripMargin

  // dropDuplicates(WORK_ITEM_ID, REPORTING_DATE): the planted snapshot dups
  // are full-row identical, so DISTINCT * is the same relation.
  private val DETAILS =
    s"""details AS (SELECT DISTINCT * FROM ${fx("work_item_details")})"""

  // tie-keeping latest snapshot (correlated-max semantics).
  private val LATEST =
    """latest AS (SELECT * EXCLUDE (__maxd) FROM (
      |  SELECT *, MAX("REPORTING_DATE") OVER (PARTITION BY "WORK_ITEM_ID") AS __maxd
      |  FROM details) WHERE "REPORTING_DATE" = __maxd)""".stripMargin

  // ---- shared star-join dimension CTEs (V4/V5) -----------------------------
  private val DIMS =
    s"""cg AS (SELECT "CLIENT_ID" AS cg_client_id, "CLIENT_GROUP_ID",
       |  "CLIENT_GROUP_NAME" AS client_group_name,
       |  "CLIENT_GROUP_MEMBER_TYPE" AS client_group_member_type,
       |  "ACCOUNT_ID" AS client_group_account_id,
       |  "ACCOUNT_NAME" AS client_group_account_name FROM ${fx("client_group_dim")}),
       |cd AS (SELECT "CLIENT_ID" AS cd_client_id, "CLIENT_SUBTYPE",
       |  "CLIENT_OWNER_USER_ID", "CLIENT_OWNER_USER_NAME",
       |  "CLIENT_MANAGER_USER_ID", "CLIENT_MANAGER_USER_NAME",
       |  "PRIMARY_ADDRESS_COUNTRY_CODE", "PRIMARY_ADDRESS_STATE_PROVINCE_COUNTY",
       |  "PRIMARY_ADDRESS_CITY" FROM ${fx("client_dim")}),
       |ttmo AS (SELECT "USER_ID" AS ttm_user_id,
       |  "TENANT_TEAM_ID" AS client_owner_tenant_team_id FROM ${fx("tenant_team_member_dim")}),
       |tto AS (SELECT "TENANT_TEAM_ID" AS tt_id,
       |  "TENANT_TEAM_NAME" AS client_owner_tenant_team_name FROM ${fx("tenant_team_dim")}),
       |ttmm AS (SELECT "USER_ID" AS ttm_mgr_user_id,
       |  "TENANT_TEAM_ID" AS client_manager_tenant_team_id FROM ${fx("tenant_team_member_dim")}),
       |ttmt AS (SELECT "TENANT_TEAM_ID" AS tt_mgr_id,
       |  "TENANT_TEAM_NAME" AS client_manager_tenant_team_name FROM ${fx("tenant_team_dim")}),
       |uda AS (SELECT "USER_ID" AS ud_a_id, "USER_JOB_TITLE" AS assigned_user_job_title,
       |  COALESCE("EXPECTED_BILLABLE_MINUTES", 0) / CAST(60.0 AS DOUBLE) AS assigned_user_expected_billable_hours,
       |  COALESCE("EXPECTED_NONBILLABLE_MINUTES", 0) / CAST(60.0 AS DOUBLE) AS assigned_user_expected_nonbillable_hours
       |  FROM ${fx("user_dim")}),
       |udo AS (SELECT "USER_ID" AS ud_o_id, "USER_JOB_TITLE" AS client_owner_job_title,
       |  COALESCE("EXPECTED_BILLABLE_MINUTES", 0) / CAST(60.0 AS DOUBLE) AS client_owner_expected_billable_hours,
       |  COALESCE("EXPECTED_NONBILLABLE_MINUTES", 0) / CAST(60.0 AS DOUBLE) AS client_owner_expected_nonbillable_hours
       |  FROM ${fx("user_dim")}),
       |udm AS (SELECT "USER_ID" AS ud_m_id, "USER_JOB_TITLE" AS client_manager_job_title,
       |  COALESCE("EXPECTED_BILLABLE_MINUTES", 0) / CAST(60.0 AS DOUBLE) AS client_manager_expected_billable_hours,
       |  COALESCE("EXPECTED_NONBILLABLE_MINUTES", 0) / CAST(60.0 AS DOUBLE) AS client_manager_expected_nonbillable_hours
       |  FROM ${fx("user_dim")})""".stripMargin

  /** Star-join column list for a base aliased `b`. */
  private val STAR_SELECT =
    """  p."MEASURE_TYPE", CAST(p."POINTS" AS DOUBLE) AS "POINTS",
      |  CAST(p."WEIGHTING" AS DOUBLE) AS "WEIGHTING",
      |  CAST(p."TOTAL_POINTS" AS DOUBLE) AS "TOTAL_POINTS",
      |  p."PRODUCTIVITY_SYNC_TIMESTAMP", p."PRODUCTIVITY_LAST_MODIFIED_BY",
      |  cg."CLIENT_GROUP_ID", cg.client_group_name, cg.client_group_member_type,
      |  cg.client_group_account_id, cg.client_group_account_name,
      |  cd."CLIENT_SUBTYPE", cd."CLIENT_OWNER_USER_ID", cd."CLIENT_OWNER_USER_NAME",
      |  cd."CLIENT_MANAGER_USER_ID", cd."CLIENT_MANAGER_USER_NAME",
      |  cd."PRIMARY_ADDRESS_COUNTRY_CODE", cd."PRIMARY_ADDRESS_STATE_PROVINCE_COUNTY",
      |  cd."PRIMARY_ADDRESS_CITY",
      |  ttmo.client_owner_tenant_team_id, tto.client_owner_tenant_team_name,
      |  ttmm.client_manager_tenant_team_id, ttmt.client_manager_tenant_team_name,
      |  uda.assigned_user_job_title, uda.assigned_user_expected_billable_hours,
      |  uda.assigned_user_expected_nonbillable_hours,
      |  udo.client_owner_job_title, udo.client_owner_expected_billable_hours,
      |  udo.client_owner_expected_nonbillable_hours,
      |  udm.client_manager_job_title, udm.client_manager_expected_billable_hours,
      |  udm.client_manager_expected_nonbillable_hours""".stripMargin

  private def starJoins(b: String) =
    s"""LEFT JOIN prod p ON $b."WORK_ITEM_ID" = p."WORK_ITEM_ID"
       |LEFT JOIN cg ON $b."CLIENT_ID" = cg.cg_client_id
       |LEFT JOIN cd ON $b."CLIENT_ID" = cd.cd_client_id
       |LEFT JOIN ttmo ON cd."CLIENT_OWNER_USER_ID" = ttmo.ttm_user_id
       |LEFT JOIN tto ON ttmo.client_owner_tenant_team_id = tto.tt_id
       |LEFT JOIN ttmm ON cd."CLIENT_MANAGER_USER_ID" = ttmm.ttm_mgr_user_id
       |LEFT JOIN ttmt ON ttmm.client_manager_tenant_team_id = ttmt.tt_mgr_id
       |LEFT JOIN uda ON $b."ASSIGNED_TO_ID" = uda.ud_a_id
       |LEFT JOIN udo ON cd."CLIENT_OWNER_USER_ID" = udo.ud_o_id
       |LEFT JOIN udm ON cd."CLIENT_MANAGER_USER_ID" = udm.ud_m_id""".stripMargin

  // productivity metrics over a single-relation alias `j` (POINTS/TOTAL_POINTS
  // already DOUBLE in the joined CTE). safeDivide's inner guard collapses:
  // the outer WHEN already ensures minutes > 0.
  private val PROD_METRICS =
    """CASE WHEN j."POINTS" IS NOT NULL AND j."TIME_ENTRY_MINUTES" IS NOT NULL AND j."TIME_ENTRY_MINUTES" > 0
      |  THEN j."POINTS" / (j."TIME_ENTRY_MINUTES" / CAST(60.0 AS DOUBLE)) END AS "POINTS_PER_HOUR_ACTUAL",
      |CASE WHEN j."POINTS" IS NOT NULL AND j."BUDGETED_MINUTES" IS NOT NULL AND j."BUDGETED_MINUTES" > 0
      |  THEN j."POINTS" / (j."BUDGETED_MINUTES" / CAST(60.0 AS DOUBLE)) END AS "POINTS_PER_HOUR_BUDGETED",
      |CASE WHEN j."TOTAL_POINTS" IS NOT NULL AND j."TIME_ENTRY_MINUTES" IS NOT NULL AND j."TIME_ENTRY_MINUTES" > 0
      |  THEN j."TOTAL_POINTS" / (j."TIME_ENTRY_MINUTES" / CAST(60.0 AS DOUBLE)) END AS "TOTAL_POINTS_PER_HOUR_ACTUAL",
      |j."MEASURE_TYPE" IS NOT NULL AS "HAS_PRODUCTIVITY_DATA",
      |COALESCE(j."MEASURE_TYPE" IN ('Productivity', 'Productivity SLA'), FALSE) AS "IS_PRODUCTIVITY_TASK",
      |COALESCE(j."MEASURE_TYPE" = 'SLA' OR j."MEASURE_TYPE" = 'Productivity SLA', FALSE) AS "IS_SLA_TASK"""".stripMargin

  private val REMAINING_CORRECTED =
    """CASE WHEN j."BUDGETED_MINUTES" IS NULL AND (j."TIME_ENTRY_MINUTES" IS NULL OR j."TIME_ENTRY_MINUTES" = 0) THEN NULL
      |  WHEN j."BUDGETED_MINUTES" IS NULL THEN -(j."TIME_ENTRY_MINUTES" / CAST(60 AS DOUBLE))
      |  ELSE (j."BUDGETED_MINUTES" / CAST(60 AS DOUBLE)) - (j."TIME_ENTRY_MINUTES" / CAST(60 AS DOUBLE)) END""".stripMargin

  // `NOT (x IN (...))` kept un-coalesced: NULL status must fall through the
  // CASE exactly as Spark's three-valued `!isin` does.
  private val SCHEDULE_STATUS =
    s"""CASE WHEN j."DUE_DATETIME" IS NOT NULL AND j."DUE_DATETIME" < $asOf
       |    AND NOT (j."PRIMARY_STATUS" IN ('Completed', 'Closed')) THEN 'OVERDUE'
       |  WHEN j."DUE_DATETIME" IS NOT NULL AND j."DUE_DATETIME" <= $asOf + INTERVAL 3 DAY
       |    AND NOT (j."PRIMARY_STATUS" IN ('Completed', 'Closed')) THEN 'DUE_SOON'
       |  ELSE 'ON_TRACK' END AS schedule_status""".stripMargin

  /** `work_item_budget_vs_actual_corrected_view.sql` (DomainViews.corrected):
    * full-row DISTINCT budget fact, tie-keeping latest details LEFT JOIN,
    * due-date/hour/variance/utilization/status derivations. All scalar
    * per-row arithmetic — bit-exact cross-engine, no rounding needed.
    */
  val corrected: String =
    s"""WITH $DETAILS, $LATEST,
       |bud AS (SELECT DISTINCT * FROM ${fx("budget_vs_actual")}),
       |wi AS (SELECT "WORK_ITEM_ID", "DUE_DATETIME", "DEADLINE_DATETIME", "START_DATETIME",
       |  "CREATED_DATETIME", "COMPLETED_DATETIME", "PRIMARY_STATUS_ID", "SECONDARY_STATUS_ID",
       |  "PRIMARY_STATUS", "SECONDARY_STATUS", "ASSIGNED_TO_ID", "ASSIGNED_TO",
       |  "CREATED_BY_ID", "CREATED_BY", "COMPLETED_BY_ID", "COMPLETED_BY",
       |  "WORK_TEMPLATE_ID", "WORK_TEMPLATE", "WORK_DESCRIPTION" FROM latest)
       |SELECT b.* EXCLUDE ("REPORTING_DATE"),
       |  b."REPORTING_DATE" AS sync_reporting_date,
       |  w.* EXCLUDE ("WORK_ITEM_ID"),
       |  CAST(w."DUE_DATETIME" AS DATE) AS due_date,
       |  CAST(EXTRACT(YEAR FROM w."DUE_DATETIME") AS INT) AS due_year,
       |  CAST(EXTRACT(MONTH FROM w."DUE_DATETIME") AS INT) AS due_month,
       |  CAST(EXTRACT(DAY FROM w."DUE_DATETIME") AS INT) AS due_day,
       |  DATE_TRUNC('month', w."DUE_DATETIME") AS due_month_start,
       |  DATE_TRUNC('week', w."DUE_DATETIME") AS due_week_start,
       |  DATE_TRUNC('quarter', w."DUE_DATETIME") AS due_quarter_start,
       |  COALESCE(b."BUDGETED_MINUTES", 0) / CAST(60.0 AS DOUBLE) AS budgeted_hours,
       |  COALESCE(b."ACTUAL_MINUTES", 0) / CAST(60.0 AS DOUBLE) AS actual_hours,
       |  COALESCE(b."BUDGETED_COST", 0) AS budgeted_cost_calculated,
       |  COALESCE(b."ACTUAL_COST", 0) AS actual_cost_calculated,
       |  COALESCE(b."BUDGETED_MINUTES", 0) - COALESCE(b."ACTUAL_MINUTES", 0) AS variance_minutes,
       |  (COALESCE(b."BUDGETED_MINUTES", 0) - COALESCE(b."ACTUAL_MINUTES", 0)) / CAST(60.0 AS DOUBLE) AS variance_hours,
       |  COALESCE(b."BUDGETED_COST", 0) - COALESCE(b."ACTUAL_COST", 0) AS variance_cost,
       |  CASE WHEN COALESCE(b."BUDGETED_MINUTES", 0) > 0
       |    THEN (COALESCE(b."ACTUAL_MINUTES", 0) / CAST(b."BUDGETED_MINUTES" AS DOUBLE)) * 100 END
       |    AS budget_utilization_percentage,
       |  CASE WHEN COALESCE(b."BUDGETED_MINUTES", 0) > 0 AND COALESCE(b."ACTUAL_MINUTES", 0) > b."BUDGETED_MINUTES" THEN 'OVER_BUDGET'
       |    WHEN COALESCE(b."BUDGETED_MINUTES", 0) > 0 AND COALESCE(b."ACTUAL_MINUTES", 0) > b."BUDGETED_MINUTES" * CAST(0.8 AS DOUBLE) THEN 'APPROACHING_BUDGET'
       |    WHEN COALESCE(b."BUDGETED_MINUTES", 0) > 0 THEN 'WITHIN_BUDGET'
       |    ELSE 'NO_BUDGET_SET' END AS budget_status,
       |  w."DUE_DATETIME" IS NOT NULL AS has_due_date,
       |  w."PRIMARY_STATUS" IN ('Completed', 'Closed') AS is_completed,
       |  COALESCE(w."DUE_DATETIME" < $asOf, FALSE) AS is_past_due
       |FROM bud b LEFT JOIN wi w ON b."WORK_ITEM_ID" = w."WORK_ITEM_ID"""".stripMargin

  private val V4_VARIANCE =
    """CASE WHEN COALESCE(j."BUDGETED_MINUTES", 0) > 0
      |  THEN j."BUDGETED_MINUTES" / CAST(60.0 AS DOUBLE) - COALESCE(j.total_hours_logged, CAST(0 AS DOUBLE)) END""".stripMargin

  /** `work_item_budget_time_tracking_view_v4.sql` (DomainViews.v4). The two
    * windowed averages of doubles are ROUND(x, 6) — matched by the Spark
    * projection in ViewQueries.
    */
  val v4: String = {
    s"""WITH $TE_CLEAN, $DETAILS, $LATEST,
       |teagg AS (SELECT "WORK_ITEM_ID",
       |  SUM(CASE WHEN "IS_BILLABLE" = TRUE THEN "MINUTES" ELSE 0 END) / CAST(60.0 AS DOUBLE) AS billable_hours_logged,
       |  SUM("MINUTES") / CAST(60.0 AS DOUBLE) AS total_hours_logged,
       |  COUNT(*) AS te_total_time_entries,
       |  COUNT(DISTINCT "USER_NAME") AS te_unique_contributors,
       |  MIN("REPORTING_DATE") AS first_time_entry_date,
       |  MAX("REPORTING_DATE") AS last_time_entry_date
       | FROM te GROUP BY 1),
       |prod AS (SELECT "WORK_ITEM_ID", "MEASURE_TYPE", "POINTS", "WEIGHTING", "TOTAL_POINTS",
       |  "SYNC_TIMESTAMP" AS "PRODUCTIVITY_SYNC_TIMESTAMP",
       |  "LAST_MODIFIED_BY" AS "PRODUCTIVITY_LAST_MODIFIED_BY" FROM ${fx("productivity_repeats")}),
       |$DIMS,
       |joined AS (SELECT l.*,
       |  t.billable_hours_logged, t.total_hours_logged, t.te_total_time_entries,
       |  t.te_unique_contributors, t.first_time_entry_date, t.last_time_entry_date,
       |$STAR_SELECT
       | FROM latest l
       | LEFT JOIN teagg t ON l."WORK_ITEM_ID" = t."WORK_ITEM_ID"
       | ${starJoins("l")})
       |SELECT * EXCLUDE (billable_hours_logged, total_hours_logged, te_total_time_entries, te_unique_contributors)
       |FROM (SELECT j.*,
       |$PROD_METRICS,
       |$REMAINING_CORRECTED AS "BUDGET_REMAINING_HOURS_CORRECTED",
       |COALESCE(j.total_hours_logged, CAST(0 AS DOUBLE)) AS total_hours_logged_summary,
       |COALESCE(j.billable_hours_logged, CAST(0 AS DOUBLE)) AS billable_hours_logged_summary,
       |COALESCE(j.te_total_time_entries, 0) AS total_time_entries,
       |COALESCE(j.te_unique_contributors, 0) AS unique_contributors,
       |CASE WHEN COALESCE(j."BUDGETED_MINUTES", 0) > 0
       |  THEN COALESCE(j.total_hours_logged, CAST(0 AS DOUBLE)) / (j."BUDGETED_MINUTES" / CAST(60.0 AS DOUBLE)) * 100 END
       |  AS budget_utilization_percentage,
       |$V4_VARIANCE AS budget_remaining_hours_calculated,
       |CASE WHEN COALESCE(j."BUDGETED_MINUTES", 0) > 0 AND COALESCE(j.total_hours_logged, CAST(0 AS DOUBLE)) > j."BUDGETED_MINUTES" / CAST(60.0 AS DOUBLE) THEN 'OVER_BUDGET'
       |  WHEN COALESCE(j."BUDGETED_MINUTES", 0) > 0 AND COALESCE(j.total_hours_logged, CAST(0 AS DOUBLE)) > j."BUDGETED_MINUTES" / CAST(60.0 AS DOUBLE) * CAST(0.8 AS DOUBLE) THEN 'APPROACHING_BUDGET'
       |  WHEN COALESCE(j."BUDGETED_MINUTES", 0) > 0 THEN 'WITHIN_BUDGET'
       |  ELSE 'NO_BUDGET_SET' END AS budget_status,
       |ROUND(CASE WHEN STDDEV(COALESCE(j.total_hours_logged, CAST(0 AS DOUBLE))) OVER wg > CAST(0.01 AS DOUBLE)
       |  THEN AVG($V4_VARIANCE) OVER wt
       |  ELSE $V4_VARIANCE END, 6) AS avg_budget_variance_3_months_hours,
       |ROUND(AVG($V4_VARIANCE) OVER wc, 6) AS client_avg_budget_variance_3_months_hours,
       |$SCHEDULE_STATUS,
       |j."COMPLETED_DATETIME" AS completion_date,
       |j."ASSIGNED_TO" AS assignee,
       |j."CLIENT" AS client_name,
       |COALESCE(j."BUDGETED_MINUTES", 0) / CAST(60.0 AS DOUBLE) AS budget_hours,
       |COALESCE(j."TIME_ENTRY_MINUTES", 0) / CAST(60.0 AS DOUBLE) AS actual_hours_from_work_item,
       |COALESCE(j."TIME_ENTRY_COST", 0) AS actual_cost_from_work_item,
       |COALESCE(j."BUDGET_REMAINING_HOURS", CAST(0 AS DOUBLE)) AS budget_remaining_hours_from_work_item,
       |j."REPORTING_DATE" AS work_item_reporting_date,
       |j."CREATED_DATETIME" AS work_item_created_date
       |FROM joined j
       |WINDOW wg AS (PARTITION BY j."WORK_ITEM_ID" ORDER BY j."REPORTING_DATE", j."WORK_ITEM_ID" ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
       |  wt AS (PARTITION BY j."WORK_ITEM_ID" ORDER BY j."REPORTING_DATE", j."WORK_ITEM_ID" ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING),
       |  wc AS (PARTITION BY j."CLIENT_ID" ORDER BY j."REPORTING_DATE", j."WORK_ITEM_ID" ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING))""".stripMargin
  }

  private val monthPivotAggs = months.zipWithIndex.map { case (nm, i) =>
    s"""SUM(CASE WHEN EXTRACT(YEAR FROM "REPORTING_DATE") = 2025 AND EXTRACT(MONTH FROM "REPORTING_DATE") = ${i + 1} THEN "MINUTES" ELSE 0 END) / CAST(60.0 AS DOUBLE) AS hours_logged_${nm}_2025"""
  }.mkString(",\n  ")

  /** `…view_v5.sql` (DomainViews.v5): the individual/work-item time
    * summaries, the 7-column window dedup over the corrected view, the
    * budget∪time user universe, the V4 star, ~118 derived columns. The
    * corrected CTE is slimmed to the columns the IndividualBudgetSummary
    * consumes — its details join can't change row multiplicity (latest is
    * unique per item after the snapshot dedup) and none of its derived
    * columns are read here.
    */
  val v5: String = {
    val basePivots = months.map(nm => s"t.hours_logged_${nm}_2025").mkString(", ")
    val finalPivots = months.map(nm =>
      s"""COALESCE(j.hours_logged_${nm}_2025, CAST(0 AS DOUBLE)) AS hours_logged_${nm}_2025""")
      .mkString(",\n")
    s"""WITH $TE_CLEAN, $DETAILS, $LATEST,
       |corr AS (SELECT b."WORK_ITEM_ID", b."USER_ID", b."USER_NAME", b."TASK_TYPE_ID", b."ROLE_ID",
       |  b."BUDGETED_MINUTES", b."BUDGETED_COST", b."ACTUAL_MINUTES", b."ACTUAL_COST",
       |  b."REPORTING_DATE" AS sync_reporting_date
       | FROM (SELECT DISTINCT * FROM ${fx("budget_vs_actual")}) b),
       |ibsd AS (SELECT * FROM (SELECT c.*, ROW_NUMBER() OVER (
       |    PARTITION BY "WORK_ITEM_ID", "USER_ID", "USER_NAME", "TASK_TYPE_ID", "ROLE_ID", "BUDGETED_MINUTES", "BUDGETED_COST"
       |    ORDER BY sync_reporting_date DESC NULLS LAST) AS __rn
       |  FROM corr c WHERE "USER_NAME" IS NOT NULL AND "BUDGETED_MINUTES" > 0) WHERE __rn = 1),
       |ibs AS (SELECT "WORK_ITEM_ID", "USER_ID", "USER_NAME",
       |  CAST(SUM("BUDGETED_MINUTES") AS BIGINT) AS total_individual_budgeted_minutes,
       |  CAST(SUM("ACTUAL_MINUTES") AS BIGINT) AS total_individual_actual_minutes_from_budget_data,
       |  CAST(SUM("BUDGETED_COST") AS BIGINT) AS total_individual_budgeted_cost,
       |  CAST(SUM("ACTUAL_COST") AS BIGINT) AS total_individual_actual_cost
       | FROM ibsd GROUP BY 1, 2, 3),
       |its AS (SELECT "WORK_ITEM_ID", "USER_NAME", "USER_ID",
       |  SUM(CASE WHEN "IS_BILLABLE" = TRUE THEN "MINUTES" ELSE 0 END) / CAST(60.0 AS DOUBLE) AS billable_hours_logged,
       |  SUM("MINUTES") / CAST(60.0 AS DOUBLE) AS total_hours_logged,
       |  COUNT(*) AS total_time_entries,
       |  MIN("REPORTING_DATE") AS first_time_entry_date,
       |  MAX("REPORTING_DATE") AS last_time_entry_date,
       |  $monthPivotAggs
       | FROM te GROUP BY 1, 2, 3),
       |wits AS (SELECT "WORK_ITEM_ID",
       |  SUM(CASE WHEN "IS_BILLABLE" = TRUE THEN "MINUTES" ELSE 0 END) / CAST(60.0 AS DOUBLE) AS work_item_billable_hours_logged,
       |  SUM("MINUTES") / CAST(60.0 AS DOUBLE) AS work_item_total_hours_logged,
       |  COUNT(*) AS work_item_total_time_entries,
       |  COUNT(DISTINCT "USER_NAME") AS unique_contributors,
       |  MIN("REPORTING_DATE") AS first_time_entry_date,
       |  MAX("REPORTING_DATE") AS last_time_entry_date
       | FROM te GROUP BY 1),
       |awu AS (SELECT DISTINCT "WORK_ITEM_ID", "USER_ID" AS awu_user_id, "USER_NAME" AS awu_user_name FROM (
       |  SELECT "WORK_ITEM_ID", "USER_ID", "USER_NAME" FROM ibs
       |  UNION ALL SELECT "WORK_ITEM_ID", "USER_ID", "USER_NAME" FROM its)),
       |prod AS (SELECT "WORK_ITEM_ID", "CATEGORY", "PROJECT", "MEASURE_TYPE", "POINTS", "WEIGHTING", "TOTAL_POINTS",
       |  "SYNC_TIMESTAMP" AS "PRODUCTIVITY_SYNC_TIMESTAMP",
       |  "LAST_MODIFIED_BY" AS "PRODUCTIVITY_LAST_MODIFIED_BY" FROM ${fx("productivity_repeats")}),
       |$DIMS,
       |base AS (SELECT l.*, a.awu_user_id, a.awu_user_name,
       |  i."USER_ID" AS ibs_user_id,
       |  i.total_individual_budgeted_minutes, i.total_individual_actual_minutes_from_budget_data,
       |  i.total_individual_budgeted_cost, i.total_individual_actual_cost,
       |  t."USER_ID" AS ite_user_id,
       |  t.billable_hours_logged, t.total_hours_logged, t.total_time_entries,
       |  t.first_time_entry_date AS individual_first_time_entry,
       |  t.last_time_entry_date AS individual_last_time_entry,
       |  $basePivots,
       |  w.work_item_billable_hours_logged, w.work_item_total_hours_logged,
       |  w.work_item_total_time_entries, w.unique_contributors,
       |  w.first_time_entry_date AS work_item_first_time_entry_date,
       |  w.last_time_entry_date AS work_item_last_time_entry_date
       | FROM latest l
       | JOIN awu a ON l."WORK_ITEM_ID" = a."WORK_ITEM_ID"
       | LEFT JOIN ibs i ON l."WORK_ITEM_ID" = i."WORK_ITEM_ID" AND a.awu_user_name = i."USER_NAME"
       | LEFT JOIN its t ON l."WORK_ITEM_ID" = t."WORK_ITEM_ID" AND a.awu_user_name = t."USER_NAME"
       | LEFT JOIN wits w ON l."WORK_ITEM_ID" = w."WORK_ITEM_ID"),
       |joined AS (SELECT b.*, p."CATEGORY", p."PROJECT",
       |$STAR_SELECT
       | FROM base b
       | ${starJoins("b")})
       |SELECT
       |j."WORK_ITEM_ID", j."REPORTING_DATE", j."WORK_TITLE", j."CLIENT_ID", j."CLIENT", j."CLIENT_TYPE",
       |j."INTERNAL_CLIENT_ID", j."INTERNAL_CLIENT", j."ACCOUNT_ID", j."ACCOUNT_NAME",
       |j."WORK_TYPE_ID", j."WORK_TYPE", j."PRIMARY_STATUS_ID", j."SECONDARY_STATUS_ID",
       |j."PRIMARY_STATUS", j."SECONDARY_STATUS", j."SECONDARY_STATUS_ORDER",
       |j."CURRENT_STATUS_ENTRY_DATE", j."REPEAT_SCHEDULE",
       |j."CREATED_DATETIME", j."CREATED_BY_ID", j."CREATED_BY",
       |j."START_DATETIME", j."ASSIGNED_TO_ID", j."ASSIGNED_TO",
       |j."DUE_DATETIME", j."DEADLINE_DATETIME", j."COMPLETED_DATETIME",
       |j."COMPLETED_BY_ID", j."COMPLETED_BY",
       |j."USER_DEFINED_CLIENT_ID", j."WORK_TEMPLATE_ID", j."WORK_TEMPLATE",
       |j."WORK_DESCRIPTION", j."FIXED_FEE_ESTIMATED_COST",
       |j."EXPENSE_AMOUNT", j."BILLABLE_EXPENSE_AMOUNT",
       |j."INTERNAL_TASKS_COMPLETED_COUNT", j."INTERNAL_TASKS_PENDING_COUNT",
       |j."IS_WORK_ITEM_OVERDUE",
       |j.awu_user_id AS budget_user_id,
       |j.awu_user_name AS budget_user_name,
       |COALESCE(j.total_individual_budgeted_minutes, 0) AS individual_budgeted_minutes,
       |COALESCE(j.total_individual_actual_minutes_from_budget_data, 0) AS individual_actual_minutes_from_budget_data,
       |COALESCE(j.total_individual_budgeted_cost, 0) AS individual_budgeted_cost,
       |COALESCE(j.total_individual_actual_cost, 0) AS individual_actual_cost,
       |COALESCE(j.total_individual_budgeted_minutes, 0) / CAST(60.0 AS DOUBLE) AS individual_budgeted_hours,
       |COALESCE(j.total_individual_actual_minutes_from_budget_data, 0) / CAST(60.0 AS DOUBLE) AS individual_actual_hours_from_budget_data,
       |COALESCE(j.total_individual_budgeted_cost, 0) AS individual_budgeted_cost_calculated,
       |COALESCE(j.total_individual_actual_cost, 0) AS individual_actual_cost_calculated,
       |CASE WHEN j.ibs_user_id IS NOT NULL THEN 'INDIVIDUAL_BUDGET' ELSE 'NO_BUDGET' END AS budget_source,
       |COALESCE(j.total_hours_logged, CAST(0 AS DOUBLE)) AS individual_hours_logged_actual,
       |COALESCE(j.billable_hours_logged, CAST(0 AS DOUBLE)) AS individual_billable_hours_logged,
       |COALESCE(j.total_time_entries, 0) AS individual_time_entries_count,
       |j.individual_first_time_entry, j.individual_last_time_entry,
       |$finalPivots,
       |COALESCE(j.total_individual_budgeted_minutes, 0) - COALESCE(j.total_hours_logged, CAST(0 AS DOUBLE)) * 60 AS individual_budget_variance_minutes,
       |COALESCE(j.total_individual_budgeted_minutes, 0) / CAST(60.0 AS DOUBLE) - COALESCE(j.total_hours_logged, CAST(0 AS DOUBLE)) AS individual_budget_variance_hours,
       |CASE WHEN COALESCE(j.total_individual_budgeted_minutes, 0) > 0
       |  THEN (COALESCE(j.total_hours_logged, CAST(0 AS DOUBLE)) / (COALESCE(j.total_individual_budgeted_minutes, 0) / CAST(60.0 AS DOUBLE))) * 100 END
       |  AS individual_budget_utilization_percentage,
       |CASE WHEN COALESCE(j.total_individual_budgeted_minutes, 0) > 0 AND COALESCE(j.total_hours_logged, CAST(0 AS DOUBLE)) > COALESCE(j.total_individual_budgeted_minutes, 0) / CAST(60.0 AS DOUBLE) THEN 'OVER_BUDGET'
       |  WHEN COALESCE(j.total_individual_budgeted_minutes, 0) > 0 AND COALESCE(j.total_hours_logged, CAST(0 AS DOUBLE)) > COALESCE(j.total_individual_budgeted_minutes, 0) / CAST(60.0 AS DOUBLE) * CAST(0.8 AS DOUBLE) THEN 'APPROACHING_BUDGET'
       |  WHEN COALESCE(j.total_individual_budgeted_minutes, 0) > 0 THEN 'WITHIN_BUDGET'
       |  ELSE 'NO_INDIVIDUAL_BUDGET_SET' END AS individual_budget_status,
       |j."BUDGETED_MINUTES" AS work_item_total_budgeted_minutes,
       |j."BUDGETED_COST" AS work_item_total_budgeted_cost,
       |j."TIME_ENTRY_MINUTES" AS work_item_total_time_entry_minutes,
       |j."TIME_ENTRY_COST" AS work_item_total_time_entry_cost,
       |j."BUDGET_REMAINING_HOURS" AS work_item_budget_remaining_hours,
       |COALESCE(j."BUDGETED_MINUTES", 0) / CAST(60.0 AS DOUBLE) AS work_item_total_budget_hours,
       |COALESCE(j."TIME_ENTRY_MINUTES", 0) / CAST(60.0 AS DOUBLE) AS work_item_total_actual_hours,
       |COALESCE(j.work_item_total_hours_logged, CAST(0 AS DOUBLE)) AS work_item_total_hours_logged_summary,
       |COALESCE(j.work_item_billable_hours_logged, CAST(0 AS DOUBLE)) AS work_item_billable_hours_logged_summary,
       |COALESCE(j.work_item_total_time_entries, 0) AS work_item_total_time_entries,
       |COALESCE(j.unique_contributors, 0) AS work_item_unique_contributors,
       |j.work_item_first_time_entry_date, j.work_item_last_time_entry_date,
       |$REMAINING_CORRECTED AS work_item_budget_remaining_hours_corrected,
       |j."CATEGORY", j."PROJECT", j."MEASURE_TYPE", j."POINTS", j."WEIGHTING", j."TOTAL_POINTS",
       |j."PRODUCTIVITY_SYNC_TIMESTAMP", j."PRODUCTIVITY_LAST_MODIFIED_BY",
       |$PROD_METRICS,
       |j."CLIENT_GROUP_ID", j.client_group_name, j.client_group_member_type,
       |j."CLIENT_SUBTYPE",
       |j."CLIENT_OWNER_USER_NAME", j."CLIENT_OWNER_USER_ID",
       |j."CLIENT_MANAGER_USER_NAME", j."CLIENT_MANAGER_USER_ID",
       |j."PRIMARY_ADDRESS_COUNTRY_CODE", j."PRIMARY_ADDRESS_STATE_PROVINCE_COUNTY",
       |j."PRIMARY_ADDRESS_CITY",
       |j.client_owner_tenant_team_id, j.client_owner_tenant_team_name,
       |j.client_manager_tenant_team_id, j.client_manager_tenant_team_name,
       |j.assigned_user_job_title, j.assigned_user_expected_billable_hours,
       |j.assigned_user_expected_nonbillable_hours,
       |j.client_owner_job_title, j.client_owner_expected_billable_hours,
       |j.client_owner_expected_nonbillable_hours,
       |j.client_manager_job_title, j.client_manager_expected_billable_hours,
       |j.client_manager_expected_nonbillable_hours,
       |CASE WHEN COALESCE(j."BUDGETED_MINUTES", 0) > 0
       |  THEN COALESCE(j.work_item_total_hours_logged, CAST(0 AS DOUBLE)) / (j."BUDGETED_MINUTES" / CAST(60.0 AS DOUBLE)) * 100 END
       |  AS work_item_budget_utilization_percentage,
       |CASE WHEN COALESCE(j."BUDGETED_MINUTES", 0) > 0
       |  THEN j."BUDGETED_MINUTES" / CAST(60.0 AS DOUBLE) - COALESCE(j.work_item_total_hours_logged, CAST(0 AS DOUBLE)) END
       |  AS work_item_budget_remaining_hours_calculated,
       |CASE WHEN COALESCE(j."BUDGETED_MINUTES", 0) > 0 AND COALESCE(j.work_item_total_hours_logged, CAST(0 AS DOUBLE)) > j."BUDGETED_MINUTES" / CAST(60.0 AS DOUBLE) THEN 'OVER_BUDGET'
       |  WHEN COALESCE(j."BUDGETED_MINUTES", 0) > 0 AND COALESCE(j.work_item_total_hours_logged, CAST(0 AS DOUBLE)) > j."BUDGETED_MINUTES" / CAST(60.0 AS DOUBLE) * CAST(0.8 AS DOUBLE) THEN 'APPROACHING_BUDGET'
       |  WHEN COALESCE(j."BUDGETED_MINUTES", 0) > 0 THEN 'WITHIN_BUDGET'
       |  ELSE 'NO_BUDGET_SET' END AS work_item_budget_status,
       |$SCHEDULE_STATUS,
       |j.client_group_account_id, j.client_group_account_name,
       |j."DUE_DATETIME" IS NOT NULL AS has_due_date,
       |j."PRIMARY_STATUS" IN ('Completed', 'Closed') AS is_completed,
       |COALESCE(j."DUE_DATETIME" < $asOf, FALSE) AS is_past_due,
       |j.ibs_user_id IS NOT NULL AS has_individual_budget,
       |j.ite_user_id IS NOT NULL AS has_individual_time_logged,
       |j.ibs_user_id IS NOT NULL AS has_actual_individual_budget
       |FROM joined j""".stripMargin
  }

  /** `work_item_x_user_time_view.sql` second view
    * (DomainViews.workItemUserTimeDetail): exactly-one-latest snapshot
    * (row_number — unique per key here since the snapshot dedup ran) LEFT
    * JOINed under each cleaned time entry.
    */
  val userTimeDetail: String =
    s"""WITH $TE_CLEAN, $DETAILS,
       |lat AS (SELECT * EXCLUDE (__rn) FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY "WORK_ITEM_ID"
       |    ORDER BY "REPORTING_DATE" DESC NULLS LAST) AS __rn FROM details) WHERE __rn = 1),
       |wi AS (SELECT "WORK_ITEM_ID" AS wi_item_id, "WORK_TITLE",
       |  "CLIENT" AS client_name, "WORK_TYPE", "PRIMARY_STATUS" AS status,
       |  "BUDGETED_MINUTES" / CAST(60.0 AS DOUBLE) AS budget_hours FROM lat)
       |SELECT t."WORK_ITEM_ID", w."WORK_TITLE", w.client_name, w."WORK_TYPE", w.status,
       |  w.budget_hours, t."USER_NAME", t."REPORTING_DATE" AS time_entry_date,
       |  t."IS_BILLABLE", t."MINUTES" / CAST(60.0 AS DOUBLE) AS hours_logged
       |FROM te t LEFT JOIN wi w ON t."WORK_ITEM_ID" = w.wi_item_id""".stripMargin

  /** `snowflake_bq_deduplication_sync.py:95-165` (Reconciliation
    * .cleanupReport): per-table would-delete counts for work items missing
    * from the simulated source (every 41st id dropped, as the query does).
    */
  val reconciliation: String =
    s"""WITH $DETAILS,
       |src AS (SELECT DISTINCT "WORK_ITEM_ID" FROM details
       |  WHERE NOT (CAST(substr("WORK_ITEM_ID", 2, 3) AS INT) % 41 = 0)),
       |bud AS (SELECT * FROM ${fx("budget_vs_actual")}),
       |ter AS (SELECT * FROM ${fx("time_entries")})
       |SELECT 'WORK_ITEM_DETAILS_BQ' AS table_name,
       |  (SELECT COUNT(*) FROM details d WHERE d."WORK_ITEM_ID" IS NOT NULL
       |   AND NOT EXISTS (SELECT 1 FROM src s WHERE s."WORK_ITEM_ID" = d."WORK_ITEM_ID")) AS records_would_delete
       |UNION ALL
       |SELECT 'WORK_ITEM_BUDGET_VS_ACTUAL_BQ',
       |  (SELECT COUNT(*) FROM bud d WHERE d."WORK_ITEM_ID" IS NOT NULL
       |   AND NOT EXISTS (SELECT 1 FROM src s WHERE s."WORK_ITEM_ID" = d."WORK_ITEM_ID"))
       |UNION ALL
       |SELECT 'USER_TIME_ENTRY_BQ',
       |  (SELECT COUNT(*) FROM ter d WHERE d."WORK_ITEM_ID" IS NOT NULL
       |   AND NOT EXISTS (SELECT 1 FROM src s WHERE s."WORK_ITEM_ID" = d."WORK_ITEM_ID"))""".stripMargin

  // Slim V5 projection shared by the check-summary oracle: only the columns
  // the verification checks read — none come from the star dimensions, so
  // the star joins (all ×1) are omitted.
  private val V5_SLIM =
    """v5slim AS (SELECT l."WORK_ITEM_ID", l."WORK_TITLE",
      |  a.awu_user_id AS budget_user_id, a.awu_user_name AS budget_user_name,
      |  l."BUDGETED_MINUTES" AS work_item_total_budgeted_minutes,
      |  COALESCE(i.total_individual_budgeted_minutes, 0) AS individual_budgeted_minutes,
      |  COALESCE(w.work_item_total_hours_logged, CAST(0 AS DOUBLE)) AS work_item_total_hours_logged_summary,
      |  COALESCE(t.total_hours_logged, CAST(0 AS DOUBLE)) AS individual_hours_logged_actual
      | FROM latest l
      | JOIN awu a ON l."WORK_ITEM_ID" = a."WORK_ITEM_ID"
      | LEFT JOIN ibs i ON l."WORK_ITEM_ID" = i."WORK_ITEM_ID" AND a.awu_user_name = i."USER_NAME"
      | LEFT JOIN its t ON l."WORK_ITEM_ID" = t."WORK_ITEM_ID" AND a.awu_user_name = t."USER_NAME"
      | LEFT JOIN wits w ON l."WORK_ITEM_ID" = w."WORK_ITEM_ID")""".stripMargin

  /** `verify_view_deduplication.sql` reduced to flagged-row counts
    * (ViewVerification.summary): snapshot dup groups, 7-column budget
    * restatements, V5 grain dups, budget/time consistency variances.
    */
  val viewCheckSummary: String =
    s"""WITH $TE_CLEAN, $DETAILS, $LATEST,
       |corr AS (SELECT b."WORK_ITEM_ID", b."USER_ID", b."USER_NAME", b."TASK_TYPE_ID", b."ROLE_ID",
       |  b."BUDGETED_MINUTES", b."BUDGETED_COST", b."ACTUAL_MINUTES", b."ACTUAL_COST",
       |  b."REPORTING_DATE" AS sync_reporting_date
       | FROM (SELECT DISTINCT * FROM ${fx("budget_vs_actual")}) b),
       |ibsd AS (SELECT * FROM (SELECT c.*, ROW_NUMBER() OVER (
       |    PARTITION BY "WORK_ITEM_ID", "USER_ID", "USER_NAME", "TASK_TYPE_ID", "ROLE_ID", "BUDGETED_MINUTES", "BUDGETED_COST"
       |    ORDER BY sync_reporting_date DESC NULLS LAST) AS __rn
       |  FROM corr c WHERE "USER_NAME" IS NOT NULL AND "BUDGETED_MINUTES" > 0) WHERE __rn = 1),
       |ibs AS (SELECT "WORK_ITEM_ID", "USER_ID", "USER_NAME",
       |  CAST(SUM("BUDGETED_MINUTES") AS BIGINT) AS total_individual_budgeted_minutes
       | FROM ibsd GROUP BY 1, 2, 3),
       |its AS (SELECT "WORK_ITEM_ID", "USER_NAME", "USER_ID",
       |  SUM("MINUTES") / CAST(60.0 AS DOUBLE) AS total_hours_logged
       | FROM te GROUP BY 1, 2, 3),
       |wits AS (SELECT "WORK_ITEM_ID",
       |  SUM("MINUTES") / CAST(60.0 AS DOUBLE) AS work_item_total_hours_logged
       | FROM te GROUP BY 1),
       |awu AS (SELECT DISTINCT "WORK_ITEM_ID", "USER_ID" AS awu_user_id, "USER_NAME" AS awu_user_name FROM (
       |  SELECT "WORK_ITEM_ID", "USER_ID", "USER_NAME" FROM ibs
       |  UNION ALL SELECT "WORK_ITEM_ID", "USER_ID", "USER_NAME" FROM its)),
       |$V5_SLIM
       |SELECT 'WORK_ITEM_DETAILS_BQ_DUPLICATES' AS check_name,
       |  (SELECT COUNT(*) FROM (SELECT "WORK_ITEM_ID" FROM details GROUP BY 1 HAVING COUNT(*) > 1)) AS flagged
       |UNION ALL SELECT 'BUDGET_VS_ACTUAL_DUPLICATES',
       |  (SELECT COUNT(*) FROM (SELECT 1 FROM corr WHERE "USER_NAME" IS NOT NULL AND "BUDGETED_MINUTES" > 0
       |    GROUP BY "WORK_ITEM_ID", "USER_ID", "USER_NAME", "TASK_TYPE_ID", "ROLE_ID", "BUDGETED_MINUTES", "BUDGETED_COST"
       |    HAVING COUNT(*) > 1))
       |UNION ALL SELECT 'V5_VIEW_USER_WORK_ITEM_DUPLICATES',
       |  (SELECT COUNT(*) FROM (SELECT 1 FROM v5slim
       |    GROUP BY "WORK_ITEM_ID", budget_user_id, budget_user_name HAVING COUNT(*) > 1))
       |UNION ALL SELECT 'BUDGET_CONSISTENCY_NOT_CONSISTENT',
       |  (SELECT COUNT(*) FROM (
       |    SELECT "WORK_ITEM_ID", "WORK_TITLE", work_item_total_budgeted_minutes,
       |      work_item_total_budgeted_minutes - SUM(individual_budgeted_minutes) AS budget_difference
       |    FROM v5slim GROUP BY 1, 2, 3 HAVING work_item_total_budgeted_minutes > 0)
       |   WHERE NOT (CASE WHEN ABS(budget_difference) > 60 THEN 'SIGNIFICANT_VARIANCE'
       |     WHEN budget_difference <> 0 THEN 'MINOR_VARIANCE' ELSE 'CONSISTENT' END = 'CONSISTENT'))
       |UNION ALL SELECT 'TIME_TRACKING_CONSISTENCY',
       |  (SELECT COUNT(*) FROM (
       |    SELECT "WORK_ITEM_ID", "WORK_TITLE", work_item_total_hours_logged_summary,
       |      work_item_total_hours_logged_summary - SUM(individual_hours_logged_actual) AS time_difference
       |    FROM v5slim GROUP BY 1, 2, 3 HAVING work_item_total_hours_logged_summary > 0)
       |   WHERE ABS(time_difference) > CAST(0.1 AS DOUBLE))""".stripMargin

  /** `pipeline_monitoring.sql:9-131` (Monitoring.report): three-section
    * tagged-union health report. The V4 rows reduce to the latest-snapshot
    * relation: every star join is ×1 on these dimensions, so V4's row set,
    * REPORTING_DATE, WORK_ITEM_ID and CLIENT_ID are latest's own.
    */
  val pipelineMonitoring: String =
    s"""WITH $TE_CLEAN, $DETAILS, $LATEST,
       |health AS (
       |  SELECT 'WORK_ITEM_DETAILS_BQ' AS table_name, MAX("REPORTING_DATE") AS latest_date,
       |    COUNT(*) AS total_records, COUNT(DISTINCT "WORK_ITEM_ID") AS unique_work_items FROM details
       |  UNION ALL
       |  SELECT 'WORK_ITEM_BUDGET_TIME_TRACKING_VIEW_V4', MAX("REPORTING_DATE"),
       |    COUNT(*), COUNT(DISTINCT "WORK_ITEM_ID") FROM latest
       |  UNION ALL
       |  SELECT 'USER_TIME_ENTRY_BQ', MAX("REPORTING_DATE"),
       |    COUNT(*), COUNT(DISTINCT "USER_ID") FROM te),
       |alerts AS (SELECT table_name, latest_date, total_records,
       |  CAST(DATE_DIFF('day', latest_date, DATE '2025-09-01') AS INT) AS days_behind
       | FROM health),
       |quality AS (
       |  SELECT 'WORK_ITEM_DETAILS_BQ' AS table_name, 'NULL_WORK_ITEM_ID' AS check_type,
       |    COUNT(*) FILTER (WHERE "WORK_ITEM_ID" IS NULL OR "WORK_ITEM_ID" = '') AS issue_count FROM details
       |  UNION ALL
       |  SELECT 'WORK_ITEM_BUDGET_TIME_TRACKING_VIEW_V4', 'NULL_CLIENT_ID',
       |    COUNT(*) FILTER (WHERE "CLIENT_ID" IS NULL OR "CLIENT_ID" = '') FROM latest
       |  UNION ALL
       |  SELECT 'USER_TIME_ENTRY_BQ', 'FUTURE_DATES',
       |    COUNT(*) FILTER (WHERE "REPORTING_DATE" > DATE '2025-09-01') FROM te)
       |SELECT '🔍 PIPELINE HEALTH REPORT' AS report_section, $asOf AS report_timestamp,
       |  '' AS table_name, CAST(NULL AS DATE) AS latest_date, CAST(NULL AS BIGINT) AS total_records,
       |  CAST(NULL AS INT) AS days_behind, '' AS alert_level,
       |  'Generated automatically for daily monitoring' AS alert_message
       |UNION ALL
       |SELECT '📊 DATA FRESHNESS', $asOf, table_name, latest_date, total_records, days_behind,
       |  CASE WHEN days_behind > 3 THEN 'CRITICAL' WHEN days_behind > 1 THEN 'WARNING' ELSE 'OK' END,
       |  CASE WHEN days_behind > 3 THEN 'Data is more than 3 days old - investigate pipeline'
       |    WHEN days_behind > 1 THEN 'Data is more than 1 day old - monitor closely'
       |    ELSE 'Data freshness is acceptable' END
       |FROM alerts
       |UNION ALL
       |SELECT '⚠️ DATA QUALITY ISSUES', $asOf, table_name, CAST(NULL AS DATE), issue_count,
       |  CAST(NULL AS INT),
       |  CASE WHEN issue_count > 0 THEN 'WARNING' ELSE 'OK' END,
       |  check_type || ': ' || CAST(issue_count AS VARCHAR) || ' issues found'
       |FROM quality""".stripMargin

  /** `…v5_fallback.sql` (DomainViews.v5Fallback): actual individual budgets
    * (plain rollup, no window dedup) ∪ proportional estimates for items
    * without them, under the disjunctive `cbs.USER_NAME = ite.USER_NAME OR
    * cbs.USER_NAME IS NULL` join and the either-side-present filter.
    */
  val v5Fallback: String =
    s"""WITH $TE_CLEAN, $DETAILS, $LATEST,
       |its AS (SELECT "WORK_ITEM_ID", "USER_NAME", "USER_ID",
       |  SUM(CASE WHEN "IS_BILLABLE" = TRUE THEN "MINUTES" ELSE 0 END) / CAST(60.0 AS DOUBLE) AS billable_hours_logged,
       |  SUM("MINUTES") / CAST(60.0 AS DOUBLE) AS total_hours_logged,
       |  COUNT(*) AS total_time_entries,
       |  MIN("REPORTING_DATE") AS first_time_entry_date,
       |  MAX("REPORTING_DATE") AS last_time_entry_date,
       |  SUM(CASE WHEN EXTRACT(YEAR FROM "REPORTING_DATE") = 2025 AND EXTRACT(MONTH FROM "REPORTING_DATE") = 7 THEN "MINUTES" ELSE 0 END) / CAST(60.0 AS DOUBLE) AS hours_logged_jul_2025
       | FROM te GROUP BY 1, 2, 3),
       |wits AS (SELECT "WORK_ITEM_ID",
       |  SUM("MINUTES") / CAST(60.0 AS DOUBLE) AS work_item_total_hours_logged
       | FROM te GROUP BY 1),
       |ibs AS (SELECT "WORK_ITEM_ID", "USER_ID", "USER_NAME",
       |  CAST(SUM("BUDGETED_MINUTES") AS DOUBLE) AS total_individual_budgeted_minutes
       | FROM (SELECT DISTINCT * FROM ${fx("budget_vs_actual")})
       | WHERE "USER_NAME" IS NOT NULL AND "BUDGETED_MINUTES" > 0
       | GROUP BY 1, 2, 3),
       |fb AS (SELECT l."WORK_ITEM_ID", i."USER_ID", i."USER_NAME",
       |  CASE WHEN w.work_item_total_hours_logged > 0
       |    THEN l."BUDGETED_MINUTES" * (i.total_hours_logged / w.work_item_total_hours_logged)
       |    ELSE CAST(0 AS DOUBLE) END AS total_individual_budgeted_minutes
       | FROM latest l
       | JOIN its i ON l."WORK_ITEM_ID" = i."WORK_ITEM_ID"
       | JOIN wits w ON l."WORK_ITEM_ID" = w."WORK_ITEM_ID"
       | WHERE NOT EXISTS (SELECT 1 FROM ibs x WHERE x."WORK_ITEM_ID" = l."WORK_ITEM_ID")),
       |cbs AS (
       | SELECT "WORK_ITEM_ID", "USER_ID" AS cbs_user_id, "USER_NAME" AS cbs_user_name,
       |   total_individual_budgeted_minutes, 'ACTUAL_INDIVIDUAL_BUDGET' AS budget_source FROM ibs
       | UNION ALL
       | SELECT "WORK_ITEM_ID", "USER_ID", "USER_NAME",
       |   total_individual_budgeted_minutes, 'ESTIMATED_FROM_TIME_LOGGED' FROM fb),
       |ite AS (SELECT "WORK_ITEM_ID" AS ite_item_id, "USER_ID" AS ite_user_id, "USER_NAME" AS ite_user_name,
       |  total_hours_logged, billable_hours_logged, total_time_entries, hours_logged_jul_2025 FROM its)
       |SELECT l."WORK_ITEM_ID", l."REPORTING_DATE", l."WORK_TITLE",
       |  l."CLIENT_ID", l."CLIENT", l."DUE_DATETIME", l."PRIMARY_STATUS",
       |  l."ASSIGNED_TO", l."ASSIGNED_TO_ID",
       |  COALESCE(c.cbs_user_id, t.ite_user_id) AS budget_user_id,
       |  COALESCE(c.cbs_user_name, t.ite_user_name) AS budget_user_name,
       |  COALESCE(c.total_individual_budgeted_minutes, CAST(0 AS DOUBLE)) AS individual_budgeted_minutes,
       |  COALESCE(c.total_individual_budgeted_minutes, CAST(0 AS DOUBLE)) / CAST(60.0 AS DOUBLE) AS individual_budgeted_hours,
       |  c.budget_source,
       |  COALESCE(t.total_hours_logged, CAST(0 AS DOUBLE)) AS individual_hours_logged_actual,
       |  COALESCE(t.billable_hours_logged, CAST(0 AS DOUBLE)) AS individual_billable_hours_logged,
       |  COALESCE(t.total_time_entries, 0) AS individual_time_entries_count,
       |  COALESCE(t.hours_logged_jul_2025, CAST(0 AS DOUBLE)) AS hours_logged_jul_2025,
       |  COALESCE(c.total_individual_budgeted_minutes, CAST(0 AS DOUBLE)) - COALESCE(t.total_hours_logged, CAST(0 AS DOUBLE)) * 60 AS individual_budget_variance_minutes,
       |  COALESCE(c.total_individual_budgeted_minutes, CAST(0 AS DOUBLE)) / CAST(60.0 AS DOUBLE) - COALESCE(t.total_hours_logged, CAST(0 AS DOUBLE)) AS individual_budget_variance_hours,
       |  l."BUDGETED_MINUTES" AS work_item_total_budgeted_minutes,
       |  COALESCE(l."BUDGETED_MINUTES", 0) / CAST(60.0 AS DOUBLE) AS work_item_total_budget_hours,
       |  COALESCE(w.work_item_total_hours_logged, CAST(0 AS DOUBLE)) AS work_item_total_hours_logged_summary,
       |  c.cbs_user_id IS NOT NULL AS has_individual_budget,
       |  t.ite_user_id IS NOT NULL AS has_individual_time_logged,
       |  COALESCE(c.budget_source = 'ACTUAL_INDIVIDUAL_BUDGET', FALSE) AS has_actual_individual_budget
       |FROM latest l
       |LEFT JOIN cbs c ON l."WORK_ITEM_ID" = c."WORK_ITEM_ID"
       |LEFT JOIN ite t ON l."WORK_ITEM_ID" = t.ite_item_id
       |  AND (c.cbs_user_name = t.ite_user_name OR c.cbs_user_name IS NULL)
       |LEFT JOIN wits w ON l."WORK_ITEM_ID" = w."WORK_ITEM_ID"
       |WHERE c.cbs_user_id IS NOT NULL OR t.ite_user_id IS NOT NULL""".stripMargin
}

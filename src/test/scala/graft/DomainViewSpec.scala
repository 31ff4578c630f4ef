package graft

import graft.sources.FixtureGen
import graft.views.DomainViews
import org.apache.spark.sql.functions._

/** End-to-end run of the reference-named view DAG over the domain fixtures —
  * the migration surface: same table names, same column names, same
  * pathologies (dup ingestions, replicated budget syncs, NULL users/dates),
  * and the invariants the reference's verification SQL asserts.
  */
class DomainViewSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rawTe = FixtureGen.timeEntries(spark)
  private lazy val te = DomainViews.timeEntryDedupCleanup(rawTe)
  private lazy val details = FixtureGen.workItemDetails(spark)
    .dropDuplicates("WORK_ITEM_ID", "REPORTING_DATE")
  private lazy val budget = FixtureGen.budgetVsActual(spark)
  private lazy val v5 = DomainViews.v5(te, details, budget,
    FixtureGen.clientDimension(spark), FixtureGen.userDimension(spark))

  test("dedup cleanup keeps exactly one row per (TIME_ENTRY_ID, REPORTING_DATE), newest ingestion") {
    assert(rawTe.count() > te.count()) // fixtures plant dup ingestions
    assert(te.groupBy("TIME_ENTRY_ID", "REPORTING_DATE").count()
      .filter(col("count") > 1).isEmpty)
    // the duplicated keys must resolve to the *newer* ingestion (uuid-dup-*)
    val dupKeys = rawTe.groupBy("TIME_ENTRY_ID", "REPORTING_DATE").count()
      .filter(col("count") > 1).select("TIME_ENTRY_ID", "REPORTING_DATE")
    val winners = te.join(dupKeys, Seq("TIME_ENTRY_ID", "REPORTING_DATE"))
    assert(winners.filter(!col("row_uuid").startsWith("uuid-dup-")).isEmpty)
  }

  test("latest view keeps ties at the max snapshot date (raw) and is unique after cleanup") {
    val rawDetails = FixtureGen.workItemDetails(spark)
    val latestRaw = DomainViews.workItemDetailsLatest(rawDetails)
    // planted tie items (every 37th) produce two rows at the max date
    assert(latestRaw.groupBy("WORK_ITEM_ID").count().filter(col("count") > 1).count() > 0)
    val latestClean = DomainViews.workItemDetailsLatest(details)
    assert(latestClean.groupBy("WORK_ITEM_ID").count().filter(col("count") > 1).isEmpty)
  }

  test("v5 grain is (WORK_ITEM_ID, USER_NAME) with no duplicates") {
    assert(v5.groupBy("WORK_ITEM_ID", "USER_NAME").count().filter(col("count") > 1).isEmpty)
  }

  test("sum of individual hours equals the work-item total (verify_view_deduplication.sql:164-194)") {
    // work_item_total_hours sums ALL entries incl. NULL USER_NAME;
    // individual rows exclude them — compare against the same filter.
    val expected = te.filter(col("USER_NAME").isNotNull && col("WORK_ITEM_ID").isNotNull)
      .groupBy("WORK_ITEM_ID").agg((sum("MINUTES") / 60.0).as("exp_total"))
    val got = v5.groupBy("WORK_ITEM_ID")
      .agg(sum("individual_hours_logged_actual").as("got_total"))
    val joined = expected.join(got, Seq("WORK_ITEM_ID"), "inner")
    assert(joined.filter(abs(col("exp_total") - col("got_total")) > 0.01).isEmpty)
  }

  test("budget dedup: replicated sync rows collapse to the latest allocation set") {
    val ibs = DomainViews.individualBudgetSummary(budget)
    // expected winner per allocation: lexicographic max of (sync date, minutes)
    // — an independent spelling of the window dedup's (date DESC, minutes DESC)
    val expected = budget
      .filter(col("USER_NAME").isNotNull && col("BUDGETED_MINUTES") > 0)
      .groupBy("WORK_ITEM_ID", "USER_NAME", "TASK_TYPE", "ROLE_NAME")
      .agg(max(struct(
        coalesce(col("REPORTING_DATE"), lit("1900-01-01").cast("date")).as("d"),
        col("BUDGETED_MINUTES").as("m"))).getField("m").as("m"))
      .groupBy("WORK_ITEM_ID", "USER_NAME")
      .agg((sum("m") / 60.0).as("exp_hours"))
    val joined = ibs.join(expected, Seq("WORK_ITEM_ID", "USER_NAME"), "full_outer")
    assert(joined.filter(col("individual_budgeted_hours").isNull || col("exp_hours").isNull ||
      abs(col("individual_budgeted_hours") - col("exp_hours")) > 1e-9).isEmpty)
  }

  test("NULL USER_NAME rows are excluded from summaries (…v5.sql:83-84)") {
    assert(v5.filter(col("USER_NAME").isNull).isEmpty)
  }

  test("budget-only users appear with NO time and time-only users with NO_INDIVIDUAL_BUDGET") {
    val budgetOnly = v5.filter(col("individual_hours_logged_actual") === 0.0 &&
      col("individual_budgeted_hours").isNotNull)
    val timeOnly = v5.filter(col("individual_budget_status") === "NO_INDIVIDUAL_BUDGET" &&
      col("individual_hours_logged_actual") > 0)
    assert(budgetOnly.count() > 0 && timeOnly.count() > 0)
  }

  test("utilization and status ladder agree on the domain shape") {
    val bad = v5.filter(
      (col("individual_budget_status") === "OVER_BUDGET" && col("individual_utilization_pct") <= 100.0) ||
        (col("individual_budget_status") === "UNDER_BUDGET" && col("individual_utilization_pct") >= 80.0))
    assert(bad.isEmpty)
  }

  private lazy val corrected = DomainViews.corrected(budget, details)
  private lazy val v4 = DomainViews.v4(details, te,
    FixtureGen.productivityRepeats(spark), FixtureGen.clientGroupDimension(spark),
    FixtureGen.clientDimension(spark), FixtureGen.tenantTeamDimension(spark),
    FixtureGen.tenantTeamMemberDimension(spark), FixtureGen.userDimension(spark))
  private lazy val fallback = DomainViews.v5Fallback(te, details, corrected)

  test("corrected view: full-row DISTINCT holds and variance arithmetic is consistent") {
    assert(corrected.count() == corrected.distinct().count())
    assert(corrected.columns.contains("sync_reporting_date") &&
      !corrected.columns.contains("REPORTING_DATE"))
    val bad = corrected.filter(
      abs(col("variance_hours") - (col("budgeted_hours") - col("actual_hours"))) > 1e-9 ||
        (col("budget_status") === "OVER_BUDGET" && col("budget_utilization_percentage") <= 100.0) ||
        (col("budget_status") === "NO_BUDGET_SET" && col("budget_utilization_percentage").isNotNull))
    assert(bad.isEmpty)
    // due-date flags track DUE_DATETIME presence (corrected_view.sql:70-76,123)
    assert(corrected.filter(col("DUE_DATETIME").isNull &&
      (col("has_due_date") || col("is_past_due") || col("due_year").isNotNull)).isEmpty)
    assert(corrected.filter(col("DUE_DATETIME").isNotNull && !col("has_due_date")).isEmpty)
  }

  test("v4: one row per work item after latest filter; windows degrade to point value (…v4.sql:194-217)") {
    assert(v4.groupBy("WORK_ITEM_ID").count().filter(col("count") > 1).isEmpty)
    // post-latest-filter each item partition is a single row, so the stddev
    // guard can never exceed 0.01 and W6 must select the point variance
    val bad = v4.filter(
      !(col("avg_budget_variance_3_months_hours") <=> col("budget_remaining_hours_calculated")))
    assert(bad.isEmpty)
  }

  test("v4: productivity flags and star-join enrichment are consistent") {
    assert(v4.filter(col("IS_PRODUCTIVITY_TASK") && !col("HAS_PRODUCTIVITY_DATA")).isEmpty)
    assert(v4.filter(col("IS_SLA_TASK") && !col("HAS_PRODUCTIVITY_DATA")).isEmpty)
    // every client owner is on a team in the fixture → team name enriched
    assert(v4.filter(col("CLIENT_OWNER_USER_ID").isNotNull &&
      col("client_owner_tenant_team_name").isNull).isEmpty)
    assert(v4.filter(col("HAS_PRODUCTIVITY_DATA")).count() > 0)
    val ppha = v4.filter(col("POINTS_PER_HOUR_ACTUAL").isNotNull)
    assert(ppha.count() > 0)
    assert(ppha.filter(abs(col("POINTS_PER_HOUR_ACTUAL") -
      col("POINTS") / (col("TIME_ENTRY_MINUTES") / lit(60.0))) > 1e-9).isEmpty)
  }

  test("fallback: estimated budgets redistribute the work-item budget proportionally (…v5_fallback.sql:58-93)") {
    // Items with anonymous (NULL-user) entries are excluded: their estimate
    // row re-attaches to every contributor via the OR-IS-NULL join branch,
    // which double-counts by design in the reference — tested separately.
    val nullUserItems = te.filter(col("USER_NAME").isNull && col("WORK_ITEM_ID").isNotNull)
      .select("WORK_ITEM_ID").distinct()
    val est = fallback.filter(col("budget_source") === "ESTIMATED_FROM_TIME_LOGGED" &&
      col("work_item_total_budgeted_minutes").isNotNull &&
      col("work_item_total_hours_logged_summary") > 0 &&
      col("budget_user_name").isNotNull)
      .join(nullUserItems, Seq("WORK_ITEM_ID"), "left_anti")
    assert(est.count() > 0)
    // Σ user estimates = the work-item budget (shares sum to 1)
    val sums = est.groupBy("WORK_ITEM_ID", "work_item_total_budgeted_minutes")
      .agg(sum("individual_budgeted_minutes").as("sum_est"))
    assert(sums.filter(abs(col("sum_est") - col("work_item_total_budgeted_minutes")) > 0.01).isEmpty)
  }

  test("fallback: provenance and the disjunctive join branch (J12) both surface") {
    // actual + estimated sources are mutually exclusive per work item
    val mixed = fallback.filter(col("budget_source").isNotNull)
      .groupBy("WORK_ITEM_ID").agg(countDistinct(col("budget_source")).as("n"))
      .filter(col("n") > 1)
    assert(mixed.isEmpty)
    assert(fallback.filter(col("budget_source") === "ACTUAL_INDIVIDUAL_BUDGET").count() > 0)
    assert(fallback.filter(!col("has_actual_individual_budget") &&
      col("budget_source") === "ACTUAL_INDIVIDUAL_BUDGET").isEmpty)
    // NULL-user fallback rows take the OR-IS-NULL join branch: budget row
    // without a user attaches to every contributor's time row
    val orBranch = fallback.filter(col("budget_source").isNotNull &&
      !col("has_individual_budget") && col("has_individual_time_logged"))
    assert(orBranch.count() > 0)
    // every surviving row has a budget or logged time (…v5_fallback.sql:196)
    assert(fallback.filter(!col("has_individual_budget") &&
      !col("has_individual_time_logged")).isEmpty)
  }
}

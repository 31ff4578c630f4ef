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
  private lazy val corrected = DomainViews.corrected(budget, details)
  private lazy val v5 = DomainViews.v5(te, details, corrected,
    FixtureGen.productivityRepeats(spark), FixtureGen.clientGroupDimension(spark),
    FixtureGen.clientDimension(spark), FixtureGen.tenantTeamDimension(spark),
    FixtureGen.tenantTeamMemberDimension(spark), FixtureGen.userDimension(spark))

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

  test("v5 grain is (WORK_ITEM_ID, budget_user_name) with no duplicates") {
    assert(v5.groupBy("WORK_ITEM_ID", "budget_user_name").count()
      .filter(col("count") > 1).isEmpty)
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

  test("budget dedup: the 7-column window keeps one row per allocation amount (…v5.sql:78-81)") {
    val ibs = DomainViews.individualBudgetSummary(corrected)
    // independent spelling: identical (item/user/task/role/budget-amount)
    // tuples collapse to one regardless of how many syncs re-stated them,
    // and BUDGETED_MINUTES being a partition key makes the sum key-stable
    val expected = corrected
      .filter(col("USER_NAME").isNotNull && col("BUDGETED_MINUTES") > 0)
      .select("WORK_ITEM_ID", "USER_ID", "USER_NAME", "TASK_TYPE_ID", "ROLE_ID",
        "BUDGETED_MINUTES", "BUDGETED_COST")
      .distinct()
      .groupBy("WORK_ITEM_ID", "USER_NAME")
      .agg(sum("BUDGETED_MINUTES").as("exp_minutes"))
    val joined = ibs.join(expected, Seq("WORK_ITEM_ID", "USER_NAME"), "full_outer")
    assert(joined.filter(col("total_individual_budgeted_minutes").isNull ||
      col("exp_minutes").isNull ||
      col("total_individual_budgeted_minutes") =!= col("exp_minutes")).isEmpty)
  }

  test("anonymous (NULL-user) time rows surface in v5 but their time attaches to no one") {
    // the reference's summaries keep the NULL-user group; the name-equality
    // joins then drop its hours — the variance the diagnostics hunt for
    val anon = v5.filter(col("budget_user_name").isNull)
    assert(anon.count() > 0)
    assert(anon.filter(col("individual_hours_logged_actual") =!= 0.0 ||
      col("has_individual_budget") || col("has_individual_time_logged")).isEmpty)
  }

  test("budget-only users appear with NO time and time-only users with NO_BUDGET") {
    val budgetOnly = v5.filter(col("has_individual_budget") &&
      col("individual_hours_logged_actual") === 0.0)
    val timeOnly = v5.filter(col("budget_source") === "NO_BUDGET" &&
      col("individual_hours_logged_actual") > 0)
    assert(budgetOnly.count() > 0 && timeOnly.count() > 0)
  }

  test("utilization and status ladder agree on the domain shape") {
    val bad = v5.filter(
      (col("individual_budget_status") === "OVER_BUDGET" &&
        col("individual_budget_utilization_percentage") <= 100.0) ||
        (col("individual_budget_status") === "WITHIN_BUDGET" &&
          col("individual_budget_utilization_percentage") > 80.0) ||
        (col("individual_budget_status") === "NO_INDIVIDUAL_BUDGET_SET" &&
          col("individual_budget_utilization_percentage").isNotNull))
    assert(bad.isEmpty)
  }

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

  test("verification corpus: checks flag exactly the planted pathologies (verify_view_deduplication.sql)") {
    import graft.quality.ViewVerification
    // check 4: the deduplicated V5 grain is clean
    assert(ViewVerification.v5GrainDups(v5).isEmpty)
    // check 3: the replicated-sync pathology IS flagged pre-dedup
    assert(ViewVerification.budgetDupRows(corrected).count() > 0)
    // check 7: items flagged for time variance are exactly those with
    // anonymous (NULL-user) entries — the hours the name-joins drop
    val anonItems = te.filter(col("USER_NAME").isNull && col("WORK_ITEM_ID").isNotNull)
      .select(col("WORK_ITEM_ID")).distinct()
    val flagged = ViewVerification.timeConsistency(v5).select("WORK_ITEM_ID")
    assert(flagged.join(anonItems, Seq("WORK_ITEM_ID"), "left_anti").isEmpty)
    assert(flagged.count() > 0)
    // check 10: the status census partitions every record
    val h = ViewVerification.healthSummary(v5).head()
    val statuses = Seq("over_budget_count", "approaching_budget_count",
      "within_budget_count", "no_budget_count").map(c => h.getAs[Long](c)).sum
    assert(statuses == h.getAs[Long]("total_records"))
    // checks 1/8/9 run and return rows
    assert(ViewVerification.freshness(details, te, corrected).count() == 3)
    assert(ViewVerification.coverageSummary(v5).count() == 1)
    assert(ViewVerification.recentActivity(v5).count() > 0)
    assert(ViewVerification.detailsDupGroups(details).count() > 0)
    assert(ViewVerification.budgetConsistency(v5).count() > 0)
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

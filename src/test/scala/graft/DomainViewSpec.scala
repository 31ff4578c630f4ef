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
}

package graft

import graft.views.ViewDag
import org.apache.spark.sql.functions._

/** The reference's SQL verification corpus re-expressed as invariants
  * (`verify_view_deduplication.sql:1-273`): no duplicate keys after dedup,
  * individual-vs-work-item consistency, coverage of the user universe.
  */
class ViewInvariantSpec extends SparkSuite {

  private lazy val li = sf("lineitem")
  private lazy val orders = sf("orders")
  private lazy val v5 = ViewDag.v5View(li, orders, sf("customer"), sf("nation"),
    sf("region"), sf("supplier"))

  test("v5 has no duplicate (work_item_id, user_id) rows — the V5 dedup goal") {
    val dups = v5.groupBy("work_item_id", "user_id").count().filter(col("count") > 1)
    assert(dups.isEmpty)
  }

  test("sum of individual hours equals work-item total hours (verify…sql:164-194 analog)") {
    val bad = v5.groupBy("work_item_id")
      .agg(sum(col("hours_logged").cast("decimal(18,2)")).cast("double").as("sum_ind"),
        max("work_item_total_hours").as("item_total"))
      .filter(abs(col("sum_ind") - col("item_total")) > 0.01)
    assert(bad.isEmpty)
  }

  test("every time-entry user appears in v5 (user-universe coverage)") {
    val teUsers = ViewDag.timeEntries(li).select("work_item_id", "user_id").distinct()
    val missing = teUsers.join(v5.select("work_item_id", "user_id"),
      Seq("work_item_id", "user_id"), "left_anti")
    assert(missing.isEmpty)
  }

  test("latest view keeps exactly the max reporting date per work item") {
    val lv = ViewDag.latestView(li, orders)
    val snapMax = ViewDag.workItemSnapshots(li)
      .groupBy("work_item_id").agg(max("reporting_date").as("max_d"))
    val joined = lv.join(snapMax, Seq("work_item_id"))
    assert(joined.filter(col("reporting_date") =!= col("max_d")).isEmpty)
    assert(lv.groupBy("work_item_id").count().filter(col("count") > 1).isEmpty)
  }

  test("corrected view: budget_variance = budgeted_hours - hours_logged (exact)") {
    val cv = ViewDag.correctedView(li, orders)
    val bad = cv.filter(
      abs(col("budget_variance") -
        (col("budgeted_hours").cast("decimal(18,4)") -
          col("hours_logged").cast("decimal(18,2)")).cast("double")) > 1e-9)
    assert(bad.isEmpty)
  }

  test("v5 monthly pivot columns sum to at most hours_logged") {
    val pivotSum = (1 to 12).map(m => col(f"hours_m_$m%02d")).reduce(_ + _)
    val bad = v5.filter(pivotSum > col("hours_logged") + 1e-6)
    assert(bad.isEmpty)
  }

  test("v5 budget status ladder is consistent with utilization") {
    val bad = v5.filter(
      (col("budget_status") === "OVER_BUDGET" && col("utilization_pct") <= 100.0) ||
        (col("budget_status") === "UNDER_BUDGET" && col("utilization_pct") >= 80.0))
    assert(bad.isEmpty)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational primitives shared by the view DAG and the sync pipelines
  * (SURVEY.md §7.2). Pure `DataFrame => DataFrame` / `Column` combinators —
  * everything here stays inside Catalyst so pushdown, partial aggregation and
  * whole-stage codegen apply.
  */
object Core {

  /** SAFE_DIVIDE (ref: `work_item_budget_time_tracking_view_v4.sql:71-74`):
    * null on zero/null denominator instead of an error.
    */
  def safeDivide(num: Column, den: Column): Column =
    when(den.isNull || den === 0, lit(null)).otherwise(num / den)

  /** Latest-snapshot-per-key filter (ref: `work_item_details_latest_view.sql:58-62`
    * — correlated `MAX(REPORTING_DATE)` subquery — and
    * `work_item_x_user_time_view.sql:33-35` — `ROW_NUMBER()=1`).
    *
    * The reference uses BOTH semantics: the correlated-max form keeps every
    * row tied at the max date (`keepTies = true`), the row_number form keeps
    * exactly one (`keepTies = false`, which then needs `tieBreak` columns for
    * a total order — never rely on nondeterministic tie resolution).
    *
    * Implemented as a window max / row_number rather than a self-join
    * aggregate: one shuffle on the partition keys instead of two, and at
    * 100 TB the window runs as a single sort within each hash partition.
    */
  def latestSnapshot(
      df: DataFrame,
      keys: Seq[String],
      dateCol: String,
      keepTies: Boolean = true,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    if (keepTies) {
      df.withColumn("__max_d", max(col(dateCol)).over(w))
        .filter(col(dateCol) === col("__max_d"))
        .drop("__max_d")
    } else {
      val ord = (col(dateCol).desc +: tieBreak)
      df.withColumn("__rn", row_number().over(w.orderBy(ord: _*)))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }
  }

  /** W1-style window dedup: keep the first row per key under `order` (ref:
    * `work_item_individual_budget_time_tracking_view_v5.sql:78-103`, 7-column
    * dup key ordered by sync_reporting_date DESC). `order` must be a total
    * order within each key group for deterministic results.
    */
  def dedupByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    df.withColumn("__rn", row_number().over(Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** STRING_AGG(DISTINCT x, sep ORDER BY x) (ref:
    * `verify_view_deduplication.sql:70,88,143`): collect_set → array_sort →
    * array_join. Distributive (set union merges map-side), unlike a naive
    * sort-by-group.
    */
  def stringAggDistinct(c: Column, sep: String): Column =
    array_join(array_sort(collect_set(c)), sep)

  /** STRING_AGG(x, sep ORDER BY y, x): order by a *different* column —
    * collect structs, sort lexicographically by (y, x), project x.
    */
  def stringAggOrdered(c: Column, orderBy: Column, sep: String): Column =
    array_join(
      transform(array_sort(collect_list(struct(orderBy.as("o"), c.as("v")))), s => s("v")),
      sep)

  /** Static monthly pivot (ref: `…view_v5.sql:23-34`: 12 hard-coded
    * `SUM(CASE WHEN EXTRACT(YEAR)=2025 AND EXTRACT(MONTH)=m …)` columns).
    * Generates the same shape for an arbitrary year. Exact decimal sums.
    */
  def monthlyPivotCols(dateCol: Column, valueCol: Column, pivotYear: Int, prefix: String): Seq[Column] =
    (1 to 12).map { m =>
      sum(when(year(dateCol) === pivotYear && month(dateCol) === m, Exact.d2(valueCol))
        .otherwise(Exact.d2(lit(0))))
        .cast("double")
        .as(f"${prefix}_$m%02d")
    }

  /** X5/J13: keyed tolerance comparison (ref: `dashboard/main.py:2088-2110`,
    * 0.01 absolute tolerance). Full-outer join so coverage gaps surface as
    * MISSING_* rows, exactly like the dashboard's reconciliation report.
    */
  def toleranceCompare(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      valueCols: Seq[String],
      tol: Double): DataFrame = {
    val l = valueCols.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"${c}_l"))
    val r = valueCols.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"${c}_r"))
    val joined = l.join(r, keys, "full_outer")
    val withDiffs = valueCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_diff", abs(Exact.d2(col(s"${c}_l")) - Exact.d2(col(s"${c}_r"))).cast("double"))
        .withColumn(s"${c}_match", coalesce(col(s"${c}_diff") <= tol, lit(false)))
    }
    val status = when(valueCols.map(c => col(s"${c}_l").isNull).reduce(_ && _), lit("MISSING_LEFT"))
      .when(valueCols.map(c => col(s"${c}_r").isNull).reduce(_ && _), lit("MISSING_RIGHT"))
      .when(valueCols.map(c => col(s"${c}_match")).reduce(_ && _), lit("MATCH"))
      .otherwise(lit("MISMATCH"))
    withDiffs.withColumn("compare_status", status)
  }
}

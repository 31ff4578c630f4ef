package graft.queries

import graft.ops.{Core, Exact}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** SURVEY §2.4 aggregations (A1–A15). All money/qty sums go through exact
  * decimal casts (see [[graft.ops.Exact]]) so results are order-independent
  * and reproducible on any engine — the property the oracle harness checks.
  */
object AggQueries extends QueryModule {

  // DuckDB spelling of Exact.sum2, reused across oracles.
  private def S(c: String) = s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  val defs: Map[String, Q] = Map(
    // A1: hash aggregation with SUM/COUNT/MIN/MAX (`…v5.sql:11-37`).
    "a1_groupby_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Exact.sum2(col("l_quantity")).as("sum_qty"),
          Exact.sum2(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("cnt"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          min(col("l_shipdate").cast("date")).as("first_ship"),
          max(col("l_shipdate").cast("date")).as("last_ship"))),

    // A16: CUBE + grouping_id — all four grouping-set combinations of the
    // A1 rollup in one pass (Spark expands the sets map-side; one shuffle).
    "a16_cube_grouping" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          Exact.sum2(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
          col("sum_qty"), col("cnt"))),

    // A17: exact interpolated percentiles per group — both engines use the
    // same index = p·(n−1) linear interpolation on sorted doubles, so the
    // quartiles compare bit-for-bit.
    "a17_percentiles" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.25)).as("q25"),
          percentile(col("l_quantity"), lit(0.5)).as("q50"),
          percentile(col("l_quantity"), lit(0.75)).as("q75"),
          count(lit(1)).as("cnt"))),

    // A18: UNPIVOT — the inverse of A3's pivot: melt a wide per-year
    // aggregate back to long form (the report-export reshape). Spark 3.4+
    // `DataFrame.unpivot` keeps null cells, matching the UNION ALL oracle.
    "a18_unpivot" -> ((s, dir) => {
      val wide = Tables.lineitem(s, dir)
        .withColumn("yr", year(col("l_shipdate").cast("date")))
        .filter(col("yr").between(1996, 1998))
        .groupBy(col("l_suppkey")).pivot("yr", Seq(1996, 1997, 1998))
        .agg(Exact.sum2(col("l_quantity")))
      wide.unpivot(Array(col("l_suppkey")),
        Array(col("1996"), col("1997"), col("1998")), "yr", "sum_qty")
    }),

    // A19: explicit GROUPING SETS — the report shape between A1's flat
    // group-by and A16's full cube: per-(flag,status) detail plus per-flag
    // subtotals plus one grand total, computed in ONE pass (Catalyst expands
    // to a single Expand + hash-agg; three separate group-bys would scan the
    // fact three times).
    "a19_grouping_sets" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          Exact.sum2(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
          col("sum_qty"), col("cnt"))),

    // X5: HLL sketch distinct-count with RE-AGGREGATION — the 100 TB
    // distinct-count pattern: per-month sketches (map-side partial, fixed
    // ~KB state per group) are UNIONED up to quarters without touching the
    // fact again, then estimated. The oracle-checked contract is the
    // tolerance gate: the estimate must land within 5% of the exact count
    // (lgConfigK=12 → ~1.6% RSE, so 5% is a >3σ deterministic margin), plus
    // the exact count itself; the sketch bytes are engine-native and stay
    // internal. At scale the exact COUNT(DISTINCT) leg disappears and only
    // the sketch path runs — it exists here to power the gate.
    "x5_sketch_distinct" -> ((s, dir) => {
      val monthly = Tables.orders(s, dir)
        .withColumn("mo", date_trunc("month", col("o_orderdate").cast("date")))
        .groupBy(col("mo"))
        .agg(hll_sketch_agg(col("o_custkey"), lit(12)).as("sk"))
      val quarterly = monthly
        .withColumn("qtr", date_trunc("quarter", col("mo")).cast("date"))
        .groupBy(col("qtr"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
      Tables.orders(s, dir)
        .withColumn("qtr", date_trunc("quarter", col("o_orderdate").cast("date")).cast("date"))
        .groupBy(col("qtr"))
        .agg(countDistinct(col("o_custkey")).as("exact_cnt"))
        .join(quarterly, Seq("qtr"))
        .select(col("qtr"), col("exact_cnt"),
          (abs(col("est") - col("exact_cnt")) <= col("exact_cnt") * lit(0.05))
            .as("within_tol"))
    }),

    // X6: approximate percentile with the same tolerance-gate contract as
    // X5 — percentile_approx (Greenwald-Khanna, mergeable partial state,
    // never a global sort) must land within 1% of A17's exact interpolated
    // median. The exact leg exists to power the gate; at 100 TB only the
    // sketch runs.
    "x6_approx_percentile" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_extendedprice"), lit(0.5)).as("exact_p50"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("ap"),
          count(lit(1)).as("cnt"))
        .select(col("l_returnflag"), col("exact_p50"), col("cnt"),
          (abs(col("ap") - col("exact_p50")) <= abs(col("exact_p50")) * lit(0.01))
            .as("within_tol"))),

    // X7: distribution-drift detection (PSI) between two periods — the
    // monitoring op a pipeline runs before trusting an incremental batch:
    // fixed-width buckets, Laplace-smoothed rates, population stability
    // index Σ (p−q)·ln(p/q). One scan + one 10-row window; bucket counts
    // are exact cross-engine, psi is rounded to 6 dp (ln is not
    // IEEE-correctly-rounded, engines may differ in the last ulp) and the
    // drift verdict thresholds at the conventional 0.2.
    "x7_drift_psi" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val buckets = Tables.orders(s, dir)
        .withColumn("yr", year(col("o_orderdate").cast("date")))
        .filter(col("yr").isin(1996, 1997))
        .withColumn("bucket",
          least(floor(col("o_totalprice") / 50000).cast("long"), lit(9L)))
        .groupBy(col("bucket"))
        .agg(
          sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("n_base"),
          sum(when(col("yr") === 1997, 1L).otherwise(0L)).as("n_curr"))
      val w = Window.partitionBy(lit(1))
      val p = (col("n_base") + 1).cast("double") / sum((col("n_base") + 1).cast("double")).over(w)
      val q = (col("n_curr") + 1).cast("double") / sum((col("n_curr") + 1).cast("double")).over(w)
      buckets
        .withColumn("psi", round(sum((p - q) * log(p / q)).over(w), 6))
        .select(col("bucket"), col("n_base"), col("n_curr"), col("psi"),
          (col("psi") > 0.2).as("drift_detected"))
    }),

    // X12: one-pass table profile — the stats report a pipeline runs over
    // an unknown table before trusting it (null fractions, cardinalities,
    // value ranges per column). ONE scan computes every column's stats
    // simultaneously: exact null counts and min/max (cheap, associative)
    // plus approx_count_distinct (HLL++, one mergeable sketch per column —
    // the only cardinality that's computable for ALL columns in one pass
    // at 100 TB). The exact COUNT(DISTINCT) leg exists to power the
    // tolerance gate, same contract as x5/x6: at scale only the sketch
    // runs. Output reshapes the single stats row into one row per column
    // via an inline array of structs (no shuffle beyond the global agg).
    "x12_table_profile" -> ((s, dir) =>
      graft.quality.Profiling.profile(Tables.orders(s, dir),
        Seq("o_orderkey", "o_custkey", "o_orderstatus"))),

    // X13: incremental aggregate maintenance — the daily report served by
    // FOLDING a batch's partials into a persisted partial table instead of
    // re-aggregating the fact (materialized-view maintenance; the dd11b
    // artifact economics applied to aggregation). Money columns ride
    // Exact.cents longs, so the fold is bit-identical to the from-scratch
    // recompute the oracle runs, at any fold depth. The base/increment
    // split is content-keyed (l_orderkey % 4) so it is deterministic at
    // every SF; the spec pins that serving never re-reads the base.
    "x13_incremental_agg" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val keys = Seq("l_returnflag", "l_linestatus")
      val sums = Seq(
        "qty_cents" -> Exact.cents(col("l_quantity")),
        "price_cents" -> Exact.cents(col("l_extendedprice")))
      val base = li.filter(pmod(col("l_orderkey"), lit(4)) =!= 0)
      val inc = li.filter(pmod(col("l_orderkey"), lit(4)) === 0)
      val path = QueryModule.processScopedDir("x13_partials", dir) // per-process + shutdown-hook-cleaned (QueryModule)
      graft.ops.IncrementalAgg.writePartials(base, keys, sums, path)
      graft.ops.IncrementalAgg.serveWithIncrement(s, path, inc, keys, sums)
    }),

    // A2: conditional aggregation — billable-minutes pattern (`…v5.sql:17`).
    "a2_conditional_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey").as("user_id"))
        .agg(
          (sum(when(col("l_returnflag") === "N", Exact.d2(col("l_quantity")))
            .otherwise(Exact.d2(lit(0)))).cast("double") / 60.0).as("billable_hours"),
          (Exact.sum2(col("l_quantity")) / 60.0).as("total_hours"))),

    // A3: static monthly pivot — 12 SUM(CASE WHEN year/month) columns
    // (`…v5.sql:23-34`, transposed to shipdate year 1996).
    "a3_monthly_pivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey").as("user_id"))
        .agg(
          Core.monthlyPivotCols(col("l_shipdate"), col("l_quantity"), 1996, "qty").head,
          Core.monthlyPivotCols(col("l_shipdate"), col("l_quantity"), 1996, "qty").tail: _*)),

    // A4: COUNT(DISTINCT x) (`…v4.sql:14` unique_contributors).
    "a4_count_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("distinct_parts"),
          countDistinct(col("l_suppkey")).as("distinct_suppliers"))),

    // A5: multi-column distinct via CONCAT (`verify_view_deduplication.sql:24,34`).
    "a5_multicol_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(
          concat_ws("-", col("l_orderkey").cast("string"), col("l_partkey").cast("string"),
            col("l_suppkey").cast("string"))).as("distinct_triples"))),

    // A6: ANY_VALUE over a per-group-constant column (`…v5.sql:96-101`).
    "a6_any_value" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_custkey"))
        .agg(any_value(col("c_name")).as("client_name"),
          count(lit(1)).as("order_cnt"))
    }),

    // A7: COUNTIF (`data_quality_agent.py:129-131`).
    "a7_countif" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          count_if(col("l_discount") > 0.05).as("high_discount_cnt"),
          count_if(col("l_quantity") >= 40).as("bulk_cnt"))),

    // A8: STRING_AGG(DISTINCT x ORDER BY x) (`verify_view_deduplication.sql:70`).
    "a8_string_agg_distinct" -> ((s, dir) =>
      Tables.nation(s, dir)
        .groupBy(col("n_regionkey"))
        .agg(Core.stringAggDistinct(col("n_name"), ", ").as("nation_list"))),

    // X2: STRING_AGG ordered by a different column (exact ordering semantics,
    // `verify_view_deduplication.sql:70` ORDER-BY-y variant).
    "x2_string_agg_ordered" -> ((s, dir) =>
      Tables.nation(s, dir)
        .groupBy(col("n_regionkey"))
        .agg(Core.stringAggOrdered(col("n_name"), col("n_nationkey"), ", ")
          .as("nations_by_key"))),

    // A9: AVG/STDDEV population stats (`anomaly_detection_agent.py:53-54`) —
    // computed from exact sums so any engine reproduces them bit-for-bit.
    "a9_avg_stddev" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          Exact.avg2(col("l_quantity")).as("avg_qty"),
          Exact.stddevExact(col("l_quantity")).as("std_qty"),
          Exact.varPopExact(col("l_quantity")).as("varpop_qty"))),

    // A10: SAFE_DIVIDE in aggregated metrics (`…v4.sql:71-74`).
    "a10_safe_divide" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey").as("user_id"))
        .agg(
          Exact.sum2(col("l_extendedprice")).as("sum_price"),
          sum(when(col("l_returnflag") === "R", Exact.d2(col("l_quantity")))
            .otherwise(Exact.d2(lit(0)))).cast("double").as("returned_qty"))
        .select(col("user_id"), col("sum_price"), col("returned_qty"),
          Core.safeDivide(col("sum_price"), col("returned_qty")).as("price_per_returned_unit"))),

    // A12: GROUP BY date daily metric series (`anomaly_detection_agent.py:45-83`).
    "a12_daily_series" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("ts").cast("date").as("event_date"))
        .agg(
          count(lit(1)).as("event_cnt"),
          Exact.sum2(col("value")).as("total_value"),
          countDistinct(col("user_id")).as("active_users"))),

    // A13: HAVING post-aggregation filter (`verify_view_deduplication.sql:73`).
    "a13_having" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("line_cnt"), Exact.sum2(col("l_quantity")).as("sum_qty"))
        .filter(col("line_cnt") > 5)),

    // A14: global no-group aggregate (`verify_view_deduplication.sql:218-227`).
    "a14_global_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .agg(
          count(lit(1)).as("row_cnt"),
          countDistinct(col("l_orderkey")).as("order_cnt"),
          Exact.sum2(col("l_quantity")).as("sum_qty"),
          min(col("l_shipdate").cast("date")).as("min_ship"),
          max(col("l_shipdate").cast("date")).as("max_ship"))),

    // X8: funnel analysis (beyond-reference) — the ordered-sequence query
    // every event-analytics engine ships: of the users who VIEWed, who went
    // on to CLICK after that view, and then PURCHASE after that click?
    // Step k's timestamp = MIN(ts of step-k events strictly after step
    // k-1's timestamp) — first-touch attribution, deterministic with no
    // tiebreak (MIN over timestamps). Three filtered aggregations joined on
    // user_id: each step's join key repartitioning is reused by the next,
    // and no step ever scans more than its own event type.
    "x8_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val s2 = ev.filter(col("event_type") === "click").join(s1, Seq("user_id"))
        .filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val s3 = ev.filter(col("event_type") === "purchase").join(s2, Seq("user_id"))
        .filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      s1.join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
          (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
            + when(col("t_purchase").isNotNull, 1).otherwise(0)).cast("int").as("stage"))
    }),

    // X9: weekly retention cohorts (beyond-reference) — users bucketed by
    // first-activity week, activity counted per week-of-age: the retention
    // matrix. Week arithmetic is integer epoch-day division, so cohort and
    // age keys are engine-exact; the matrix is two shuffles (first-touch
    // agg + cohort agg) at any corpus size.
    "x9_retention_cohorts" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("d"))
      val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("first_day"))
      val epochDays = (c: org.apache.spark.sql.Column) =>
        datediff(c, lit("1970-01-01").cast("date"))
      ev.join(first, Seq("user_id"))
        .groupBy(
          floor(epochDays(col("first_day")) / 7).cast("int").as("cohort_week"),
          floor(datediff(col("d"), col("first_day")) / 7).cast("int").as("age_weeks"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    }),

    // A11: partial/merge aggregation surfaced as its own driver row (the
    // map-side-combine physical shape every groupBy here gets from Catalyst;
    // PlanSpec asserts the partial_* + final HashAggregate pair on exactly
    // this query). Semantically a plain per-status rollup of the time fact.
    "a11_partial_merge_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_linestatus"))
        .agg(
          count(lit(1)).as("line_cnt"),
          Exact.sum2(col("l_extendedprice")).as("sum_price")))
  )

  val oracles: Map[String, String] = Map(
    "x8_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t_view FROM events
        | WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
        | JOIN s1 ON e.user_id = s1.user_id
        | WHERE e.event_type = 'click' AND e.ts > s1.t_view GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e
        | JOIN s2 ON e.user_id = s2.user_id
        | WHERE e.event_type = 'purchase' AND e.ts > s2.t_click GROUP BY e.user_id)
        |SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase,
        |CAST(1 + CASE WHEN s2.t_click IS NULL THEN 0 ELSE 1 END
        | + CASE WHEN s3.t_purchase IS NULL THEN 0 ELSE 1 END AS INT) AS stage
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin,
    "x9_retention_cohorts" ->
      """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, MIN(d) AS first_day FROM d GROUP BY user_id)
        |SELECT CAST((f.first_day - DATE '1970-01-01') // 7 AS INT) AS cohort_week,
        |CAST((d.d - f.first_day) // 7 AS INT) AS age_weeks,
        |COUNT(DISTINCT d.user_id) AS n_active
        |FROM d JOIN f ON d.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,
    "a11_partial_merge_agg" ->
      s"""SELECT l_linestatus, COUNT(*) AS line_cnt, ${S("l_extendedprice")} AS sum_price
         |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "a1_groupby_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, ${S("l_quantity")} AS sum_qty,
         |${S("l_extendedprice")} AS sum_price, COUNT(*) AS cnt,
         |MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
         |MIN(CAST(l_shipdate AS DATE)) AS first_ship, MAX(CAST(l_shipdate AS DATE)) AS last_ship
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "a16_cube_grouping" ->
      s"""SELECT l_returnflag, l_linestatus,
         |CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |${S("l_quantity")} AS sum_qty, COUNT(*) AS cnt
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "a17_percentiles" ->
      """SELECT l_returnflag,
        |quantile_cont(l_quantity, 0.25) AS q25,
        |quantile_cont(l_quantity, 0.5) AS q50,
        |quantile_cont(l_quantity, 0.75) AS q75,
        |COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a18_unpivot" ->
      s"""WITH wide AS (
         |  SELECT l_suppkey,
         |  ${S("CASE WHEN year(CAST(l_shipdate AS DATE)) = 1996 THEN l_quantity END")} AS y1996,
         |  ${S("CASE WHEN year(CAST(l_shipdate AS DATE)) = 1997 THEN l_quantity END")} AS y1997,
         |  ${S("CASE WHEN year(CAST(l_shipdate AS DATE)) = 1998 THEN l_quantity END")} AS y1998
         |  FROM lineitem WHERE year(CAST(l_shipdate AS DATE)) BETWEEN 1996 AND 1998
         |  GROUP BY l_suppkey)
         |SELECT l_suppkey, '1996' AS yr, y1996 AS sum_qty FROM wide
         |UNION ALL SELECT l_suppkey, '1997', y1997 FROM wide
         |UNION ALL SELECT l_suppkey, '1998', y1998 FROM wide""".stripMargin,
    "a19_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |${S("l_quantity")} AS sum_qty, COUNT(*) AS cnt
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,
    "x5_sketch_distinct" ->
      """SELECT CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS qtr,
        |COUNT(DISTINCT o_custkey) AS exact_cnt, TRUE AS within_tol
        |FROM orders GROUP BY 1""".stripMargin,
    "x6_approx_percentile" ->
      """SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS exact_p50,
        |COUNT(*) AS cnt, TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // x13: the from-scratch recompute over the FULL fact — the fold must
    // be indistinguishable from never having split the table.
    "x13_incremental_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
        |CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    // x12: exact stats per column + the x5-style gate assertion that the
    // HLL++ estimate landed within tolerance of the exact cardinality.
    "x12_table_profile" ->
      """SELECT p.col_name, p.dtype, s.n_rows, p.n_nulls, p.n_distinct,
        |TRUE AS approx_within_tol, p.min_str, p.max_str
        |FROM (SELECT COUNT(*) AS n_rows FROM orders) s, (
        |  SELECT 'o_orderkey' AS col_name, 'bigint' AS dtype,
        |    COUNT(*) - COUNT(o_orderkey) AS n_nulls,
        |    COUNT(DISTINCT o_orderkey) AS n_distinct,
        |    CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
        |    CAST(MAX(o_orderkey) AS VARCHAR) AS max_str FROM orders
        |  UNION ALL SELECT 'o_custkey', 'bigint',
        |    COUNT(*) - COUNT(o_custkey), COUNT(DISTINCT o_custkey),
        |    CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', 'string',
        |    COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
        |    MIN(o_orderstatus), MAX(o_orderstatus) FROM orders) p""".stripMargin,
    "x7_drift_psi" ->
      """WITH b AS (
        |  SELECT LEAST(CAST(floor(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
        |         EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS yr
        |  FROM orders
        |  WHERE EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) IN (1996, 1997)),
        |c AS (SELECT bucket,
        |  CAST(SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
        |  CAST(SUM(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS BIGINT) AS n_curr
        |  FROM b GROUP BY bucket),
        |t AS (SELECT CAST(SUM(n_base + 1) AS DOUBLE) AS tb,
        |             CAST(SUM(n_curr + 1) AS DOUBLE) AS tc FROM c)
        |SELECT bucket, n_base, n_curr,
        |  round(SUM((CAST(n_base + 1 AS DOUBLE) / tb - CAST(n_curr + 1 AS DOUBLE) / tc)
        |    * ln((CAST(n_base + 1 AS DOUBLE) / tb) / (CAST(n_curr + 1 AS DOUBLE) / tc)))
        |    OVER (), 6) AS psi,
        |  round(SUM((CAST(n_base + 1 AS DOUBLE) / tb - CAST(n_curr + 1 AS DOUBLE) / tc)
        |    * ln((CAST(n_base + 1 AS DOUBLE) / tb) / (CAST(n_curr + 1 AS DOUBLE) / tc)))
        |    OVER (), 6) > 0.2 AS drift_detected
        |FROM c CROSS JOIN t""".stripMargin,
    "a2_conditional_agg" ->
      """SELECT l_suppkey AS user_id,
        |CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2))
        |ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) / 60.0 AS billable_hours,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / 60.0 AS total_hours
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,
    "a3_monthly_pivot" -> {
      val cols = (1 to 12).map { m =>
        f"""CAST(SUM(CASE WHEN EXTRACT(YEAR FROM l_shipdate) = 1996 AND EXTRACT(MONTH FROM l_shipdate) = $m
           |THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_$m%02d""".stripMargin
      }.mkString(",\n")
      s"SELECT l_suppkey AS user_id,\n$cols\nFROM lineitem GROUP BY l_suppkey"
    },
    "a4_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS distinct_parts,
        |COUNT(DISTINCT l_suppkey) AS distinct_suppliers FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a5_multicol_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || '-' ||
        |CAST(l_partkey AS VARCHAR) || '-' || CAST(l_suppkey AS VARCHAR)) AS distinct_triples
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a6_any_value" ->
      """SELECT o_custkey, ANY_VALUE(c_name) AS client_name, COUNT(*) AS order_cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY o_custkey""".stripMargin,
    "a7_countif" ->
      """SELECT l_returnflag, COUNT(*) FILTER (WHERE l_discount > 0.05) AS high_discount_cnt,
        |COUNT(*) FILTER (WHERE l_quantity >= 40) AS bulk_cnt FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a8_string_agg_distinct" ->
      """SELECT n_regionkey, array_to_string(list_sort(list_distinct(list(n_name))), ', ') AS nation_list
        |FROM nation GROUP BY n_regionkey""".stripMargin,
    "x2_string_agg_ordered" ->
      """SELECT n_regionkey, string_agg(n_name, ', ' ORDER BY n_nationkey) AS nations_by_key
        |FROM nation GROUP BY n_regionkey""".stripMargin,
    "a9_avg_stddev" ->
      s"""SELECT l_returnflag,
         |(${S("l_quantity")} / COUNT(l_quantity)) AS avg_qty,
         |CASE WHEN COUNT(l_quantity) > 1 THEN
         |  sqrt((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         |    - ${S("l_quantity")} * ${S("l_quantity")} / CAST(COUNT(l_quantity) AS DOUBLE))
         |   / (CAST(COUNT(l_quantity) AS DOUBLE) - 1))
         |ELSE NULL END AS std_qty,
         |CASE WHEN COUNT(l_quantity) > 0 THEN
         |  (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         |    - ${S("l_quantity")} * ${S("l_quantity")} / CAST(COUNT(l_quantity) AS DOUBLE))
         |   / CAST(COUNT(l_quantity) AS DOUBLE)
         |ELSE NULL END AS varpop_qty
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a10_safe_divide" ->
      s"""SELECT l_suppkey AS user_id, ${S("l_extendedprice")} AS sum_price,
         |CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2))
         |ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS returned_qty,
         |CASE WHEN CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2))
         |ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) = 0 THEN NULL
         |ELSE ${S("l_extendedprice")} / CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2))
         |ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) END AS price_per_returned_unit
         |FROM lineitem GROUP BY l_suppkey""".stripMargin,
    "a12_daily_series" ->
      s"""SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS event_cnt,
         |${S("value")} AS total_value, COUNT(DISTINCT user_id) AS active_users
         |FROM events GROUP BY CAST(ts AS DATE)""".stripMargin,
    "a13_having" ->
      s"""SELECT l_orderkey, COUNT(*) AS line_cnt, ${S("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 5""".stripMargin,
    "a14_global_agg" ->
      s"""SELECT COUNT(*) AS row_cnt, COUNT(DISTINCT l_orderkey) AS order_cnt,
         |${S("l_quantity")} AS sum_qty, MIN(CAST(l_shipdate AS DATE)) AS min_ship,
         |MAX(CAST(l_shipdate AS DATE)) AS max_ship FROM lineitem""".stripMargin
  )
}

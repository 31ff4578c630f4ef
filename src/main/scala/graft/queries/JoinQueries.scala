package graft.queries

import graft.ops.{Core, Exact}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** SURVEY §2.3 joins (J1–J13). Dimension sides are tiny (region 5, nation 25,
  * supplier 1k, customer 15k at sf0.1) and are explicitly `broadcast()`-ed so
  * the star enrichments never shuffle the fact table — the property that
  * keeps the V5-analog plan a single fact scan at 100 TB.
  */
object JoinQueries extends QueryModule {

  val defs: Map[String, Q] = Map(
    // J1: multi-way LEFT JOIN star at line grain (`…v5.sql:399-450`).
    "j1_star_left_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      val su = Tables.supplier(s, dir)
      val sn = Tables.nation(s, dir).select(
        col("n_nationkey").as("sn_nationkey"), col("n_name").as("supp_nation"))
      li.join(o, col("l_orderkey") === col("o_orderkey"), "left")
        .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"), "left")
        .join(broadcast(sn), col("s_nationkey") === col("sn_nationkey"), "left")
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("o_orderstatus").as("order_status"),
          col("c_name").as("client_name"),
          col("n_name").as("client_nation"),
          col("r_name").as("client_region"),
          col("s_name").as("supp_name"),
          col("supp_nation"))
    }),

    // J2: star at work-item grain — aggregate then enrich (`…v4.sql:257-273`).
    "j2_star_workitem" -> ((s, dir) => {
      val perOrder = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(
          Exact.sum2(col("l_quantity")).as("total_qty"),
          count(lit(1)).as("line_cnt"),
          countDistinct(col("l_suppkey")).as("unique_contributors"))
      Tables.orders(s, dir)
        .join(perOrder, col("o_orderkey") === col("l_orderkey"), "left")
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"), "left")
        .select(
          col("o_orderkey").as("work_item_id"),
          col("o_totalprice").as("budget"),
          coalesce(col("total_qty"), lit(0.0)).as("total_qty"),
          coalesce(col("line_cnt"), lit(0L)).as("line_cnt"),
          coalesce(col("unique_contributors"), lit(0L)).as("unique_contributors"),
          col("c_name").as("client_name"))
    }),

    // J3: INNER join fact → derived user universe (`…v5.sql:402-403`).
    "j3_inner_universe" -> ((s, dir) => {
      val universe = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, dir)
        .join(universe, col("s_suppkey") === col("l_suppkey"), "inner")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
    }),

    // J4: two-column composite equi-join (`…v5.sql:406-413`).
    "j4_composite_join" -> ((s, dir) => {
      val summary = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(Exact.sum2(col("l_quantity")).as("pair_qty"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_linenumber"), col("l_quantity"))
        .join(summary, Seq("l_orderkey", "l_suppkey"), "left")
    }),

    // J5: one dimension under three roles (`…v4.sql:271-273` user-dim as
    // assignee/owner/manager) — nation under client/supplier/part-origin roles.
    "j5_role_self_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_linenumber"),
        col("l_suppkey"), col("l_partkey"))
      val su = Tables.supplier(s, dir)
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val n1 = Tables.nation(s, dir).select(col("n_nationkey").as("k1"), col("n_name").as("cust_nation"))
      val n2 = Tables.nation(s, dir).select(col("n_nationkey").as("k2"), col("n_name").as("supp_nation"))
      val n3 = Tables.nation(s, dir).select(col("n_nationkey").as("k3"), col("n_name").as("origin_nation"))
      li.join(o, col("l_orderkey") === col("o_orderkey"), "left")
        .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left")
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"), "left")
        .join(broadcast(n1), col("c_nationkey") === col("k1"), "left")
        .join(broadcast(n2), col("s_nationkey") === col("k2"), "left")
        .join(broadcast(n3), pmod(col("l_partkey"), lit(25)) === col("k3"), "left")
        .select(col("l_orderkey"), col("l_linenumber"), col("cust_nation"),
          col("supp_nation"), col("origin_nation"))
    }),

    // J7: FULL OUTER coverage diff (`dashboard/date_analysis_queries.sql:131`).
    "j7_full_outer_diff" -> ((s, dir) => {
      val all = Tables.orders(s, dir).groupBy(col("o_custkey").as("custkey_a"))
        .agg(count(lit(1)).as("orders_all"))
      val filtered = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("custkey_f"))
        .agg(count(lit(1)).as("orders_finished"))
      all.join(filtered, col("custkey_a") === col("custkey_f"), "full_outer")
        .select(
          coalesce(col("custkey_a"), col("custkey_f")).as("custkey"),
          coalesce(col("orders_all"), lit(0L)).as("orders_all"),
          coalesce(col("orders_finished"), lit(0L)).as("orders_finished"),
          (coalesce(col("orders_all"), lit(0L)) - coalesce(col("orders_finished"), lit(0L))).as("diff"))
    }),

    // J8: CROSS JOIN of two one-row aggregates (`…validation_queries.sql:173`).
    "j8_cross_join_totals" -> ((s, dir) => {
      val a = Tables.lineitem(s, dir).agg(Exact.sum2(col("l_quantity")).as("lineitem_qty"))
      val b = Tables.orders(s, dir).agg(count(lit(1)).as("order_cnt"))
      a.crossJoin(b).select(col("lineitem_qty"), col("order_cnt"),
        (col("lineitem_qty") / col("order_cnt")).as("qty_per_order"))
    }),

    // J9: anti-join via NOT IN subquery (`…v5_fallback.sql:89-92`).
    "j9_not_in_subquery" -> ((s, dir) => {
      val negativeBal = Tables.customer(s, dir).filter(col("c_acctbal") < 0)
        .select(col("c_custkey"))
      Tables.orders(s, dir).join(negativeBal, col("o_custkey") === col("c_custkey"), "left_anti")
    }),

    // J10: orphaned ids = target-set minus source-set (`snowflake_bq_deduplication_sync.py:270-271`).
    "j10_orphan_ids" -> ((s, dir) => {
      val target = Tables.lineitem(s, dir).select(col("l_partkey")).distinct()
      val source = Tables.part(s, dir).filter(col("p_size") <= 40).select(col("p_partkey"))
      target.join(source, col("l_partkey") === col("p_partkey"), "left_anti")
    }),

    // J11: semi-join via IN subquery (`daily_sync.py:93-106`).
    "j11_semi_join" -> ((s, dir) => {
      val in1997 = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
      Tables.customer(s, dir).join(in1997, col("c_custkey") === col("o_custkey"), "left_semi")
    }),

    // J12: disjunctive join predicate `a = b OR a IS NULL` (`…v5_fallback.sql:180-182`).
    "j12_disjunctive_join" -> ((s, dir) => {
      val rr = Tables.region(s, dir)
        .select(col("r_regionkey").cast("int").as("rk"), col("r_name"))
        .unionByName(s.range(1).select(lit(null).cast("int").as("rk"), lit("UNASSIGNED").as("r_name")))
      Tables.nation(s, dir)
        .join(rr, col("rk") === col("n_regionkey") || col("rk").isNull, "inner")
        .select(col("n_nationkey"), col("n_name"), col("r_name").as("region_or_default"))
    }),

    // A15: summary stats over the comparison frame (`dashboard/main.py:2148-2157`).
    "a15_compare_stats" -> ((s, dir) => {
      val bySupplier = Tables.lineitem(s, dir).groupBy(col("l_suppkey").as("user_id"))
        .agg(Exact.sum2(col("l_quantity")).as("hours"))
      val filtered = Tables.lineitem(s, dir).filter(col("l_returnflag") =!= "A")
        .groupBy(col("l_suppkey").as("user_id"))
        .agg(Exact.sum2(col("l_quantity")).as("hours"))
      Core.toleranceCompare(bySupplier, filtered, Seq("user_id"), Seq("hours"), 0.01)
        .groupBy(col("compare_status"))
        .agg(count(lit(1)).as("n"),
          sum(Exact.d2(col("hours_diff"))).cast("double").as("total_abs_diff"))
    }),

    // J13/X5: keyed tolerance comparison (`dashboard/main.py:2068-2140`) —
    // same revenue computed two ways, compared at 0.01 abs tolerance.
    "j13_tolerance_compare" -> ((s, dir) => {
      val bySupplier = Tables.lineitem(s, dir).groupBy(col("l_suppkey").as("user_id"))
        .agg(Exact.sum2(col("l_quantity")).as("hours"))
      val byNBillable = Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey").as("user_id"))
        .agg((sum(when(col("l_returnflag") =!= "X", Exact.d2(col("l_quantity")))
          .otherwise(Exact.d2(lit(0))))).cast("double").as("hours"))
      Core.toleranceCompare(bySupplier, byNBillable, Seq("user_id"), Seq("hours"), 0.01)
    }),

    // J14: salted skew join — output ≡ the plain inner join (the oracle IS
    // the plain join), but the shuffle key is (key, salt) so a whale
    // order-key's rows spread across 8 reducers instead of one straggler.
    "j14_salted_skew_join" -> ((s, dir) =>
      graft.ops.Skew.saltedJoin(
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_linenumber"), col("l_quantity")),
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderdate")),
        "l_orderkey", "o_orderkey", salts = 8,
        saltFrom = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"))),

    // J15: as-of join — each click gets the user's latest view at-or-before
    // it. Union-tag single-window formulation: one shuffle, no range
    // explosion (see ops/AsofJoin). DuckDB verifies with its native
    // ASOF LEFT JOIN.
    "j15_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      graft.ops.AsofJoin.asofJoin(clicks, views, keys = Seq("user_id"),
          leftTs = "ts", rightTs = "ts",
          rightVals = Seq("event_id", "value"), tieBreak = Some("event_id"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("asof_event_id"), col("asof_value"))
    }),

    // J16: point-in-interval join, bucketized to an equi join (see
    // ops/IntervalJoin) — events against overlapping 7-day report windows,
    // aggregated per window.
    "j16_interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts").cast("date").as("d"))
      val win = s.range(12).select(col("id").as("window_id"),
          date_add(to_date(lit("2024-01-01")), (col("id") * 3).cast("int")).as("w_start"))
        .withColumn("w_end", date_add(col("w_start"), 6))
      graft.ops.IntervalJoin.pointInInterval(ev, "d", win, "w_start", "w_end",
          bucketDays = 7)
        .groupBy(col("window_id"), col("w_start"), col("w_end"))
        .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
    }),

    // j17: bloom-filter semi-join reduction (ops/BloomPrune.scala) — the
    // fact side is pre-filtered by a bloom over the selective dim's keys
    // BEFORE the join exchange. No false negatives + exact final join ⇒
    // output is bit-identical to the plain join, which is what the oracle
    // states. The merge hint forces the shuffle join the operator exists
    // for (with a broadcastable dim the prune would be moot locally — at
    // scale the filtered dim outgrows the broadcast threshold first).
    "j17_bloom_prune" -> ((s, dir) => {
      val fact = Tables.lineitem(s, dir)
      val dim = Tables.part(s, dir).filter(col("p_size") <= 5)
        .select(col("p_partkey"), col("p_brand"), col("p_size")).hint("merge")
      // auto-sized bloom (counted from the filtered dim): a pinned
      // expectedItems constant saturates silently at larger SF — see
      // BloomPrune.buildFilter's no-silent-caps note
      graft.ops.BloomPrune.pruneJoin(fact, "l_partkey", dim, "p_partkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), col("p_brand"), col("p_size"))
    })
  )

  val oracles: Map[String, String] = Map(
    // j17: the bloom pre-filter admits every true match (no false
    // negatives) and the exact join removes false positives, so the plain
    // join IS the oracle.
    "j17_bloom_prune" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, p_brand, p_size
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 5""".stripMargin,
    "j15_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts, event_id, value FROM (
        |  SELECT user_id, ts, event_id, value,
        |  ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'view') WHERE rn = 1)
        |SELECT l.event_id, l.user_id, l.ts, l.value,
        |r.event_id AS asof_event_id, r.value AS asof_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,
    "j16_interval_join" ->
      """WITH win AS (SELECT k AS window_id,
        |  DATE '2024-01-01' + CAST(k*3 AS INTEGER) AS w_start,
        |  DATE '2024-01-01' + CAST(k*3 + 6 AS INTEGER) AS w_end
        |  FROM (SELECT unnest(range(0, 12)) AS k)),
        |e AS (SELECT event_id, user_id, CAST(ts AS DATE) AS d FROM events)
        |SELECT window_id, w_start, w_end, CAST(COUNT(*) AS BIGINT) AS n_events,
        |CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM e JOIN win ON d BETWEEN w_start AND w_end
        |GROUP BY window_id, w_start, w_end""".stripMargin,
    "j1_star_left_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_orderstatus AS order_status,
        |c_name AS client_name, cn.n_name AS client_nation, r_name AS client_region,
        |s_name AS supp_name, sn.n_name AS supp_nation
        |FROM lineitem
        |LEFT JOIN orders ON l_orderkey = o_orderkey
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation cn ON c_nationkey = cn.n_nationkey
        |LEFT JOIN region ON cn.n_regionkey = r_regionkey
        |LEFT JOIN supplier ON l_suppkey = s_suppkey
        |LEFT JOIN nation sn ON s_nationkey = sn.n_nationkey""".stripMargin,
    "j2_star_workitem" ->
      """WITH per_order AS (
        |SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
        |COUNT(*) AS line_cnt, COUNT(DISTINCT l_suppkey) AS unique_contributors
        |FROM lineitem GROUP BY l_orderkey)
        |SELECT o_orderkey AS work_item_id, o_totalprice AS budget,
        |COALESCE(total_qty, 0.0) AS total_qty, COALESCE(line_cnt, 0) AS line_cnt,
        |COALESCE(unique_contributors, 0) AS unique_contributors, c_name AS client_name
        |FROM orders
        |LEFT JOIN per_order ON o_orderkey = l_orderkey
        |LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "j3_inner_universe" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |JOIN (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_returnflag = 'R') u
        |ON s_suppkey = u.l_suppkey""".stripMargin,
    "j4_composite_join" ->
      """WITH summary AS (
        |SELECT l_orderkey, l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS pair_qty
        |FROM lineitem GROUP BY l_orderkey, l_suppkey)
        |SELECT l.l_orderkey, l.l_suppkey, l.l_linenumber, l.l_quantity, summary.pair_qty
        |FROM lineitem l LEFT JOIN summary
        |ON l.l_orderkey = summary.l_orderkey AND l.l_suppkey = summary.l_suppkey""".stripMargin,
    "j5_role_self_join" ->
      """SELECT l_orderkey, l_linenumber, n1.n_name AS cust_nation, n2.n_name AS supp_nation,
        |n3.n_name AS origin_nation
        |FROM lineitem
        |LEFT JOIN orders ON l_orderkey = o_orderkey
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN supplier ON l_suppkey = s_suppkey
        |LEFT JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |LEFT JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |LEFT JOIN nation n3 ON l_partkey % 25 = n3.n_nationkey""".stripMargin,
    "j7_full_outer_diff" ->
      """WITH a AS (SELECT o_custkey AS custkey_a, COUNT(*) AS orders_all FROM orders GROUP BY o_custkey),
        |f AS (SELECT o_custkey AS custkey_f, COUNT(*) AS orders_finished FROM orders
        |WHERE o_orderstatus = 'F' GROUP BY o_custkey)
        |SELECT COALESCE(custkey_a, custkey_f) AS custkey,
        |COALESCE(orders_all, 0) AS orders_all, COALESCE(orders_finished, 0) AS orders_finished,
        |COALESCE(orders_all, 0) - COALESCE(orders_finished, 0) AS diff
        |FROM a FULL OUTER JOIN f ON custkey_a = custkey_f""".stripMargin,
    "j8_cross_join_totals" ->
      """SELECT lineitem_qty, order_cnt, lineitem_qty / order_cnt AS qty_per_order FROM
        |(SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS lineitem_qty FROM lineitem)
        |CROSS JOIN (SELECT COUNT(*) AS order_cnt FROM orders)""".stripMargin,
    "j9_not_in_subquery" ->
      """SELECT * FROM orders WHERE o_custkey NOT IN
        |(SELECT c_custkey FROM customer WHERE c_acctbal < 0)""".stripMargin,
    "j10_orphan_ids" ->
      """SELECT l_partkey FROM (SELECT DISTINCT l_partkey FROM lineitem) t
        |WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_size <= 40 AND p_partkey = t.l_partkey)""".stripMargin,
    "j11_semi_join" ->
      """SELECT * FROM customer WHERE c_custkey IN
        |(SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997)""".stripMargin,
    "j12_disjunctive_join" ->
      """WITH rr AS (SELECT CAST(r_regionkey AS INT) AS rk, r_name FROM region
        |UNION ALL SELECT NULL, 'UNASSIGNED')
        |SELECT n_nationkey, n_name, r_name AS region_or_default FROM nation
        |JOIN rr ON rk = n_regionkey OR rk IS NULL""".stripMargin,
    "a15_compare_stats" ->
      """WITH l AS (SELECT l_suppkey AS user_id, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS hours_l
        |FROM lineitem GROUP BY l_suppkey),
        |r AS (SELECT l_suppkey AS user_id, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS hours_r
        |FROM lineitem WHERE l_returnflag <> 'A' GROUP BY l_suppkey),
        |cmp AS (SELECT COALESCE(l.user_id, r.user_id) AS user_id, hours_l, hours_r,
        |CAST(ABS(CAST(hours_l AS DECIMAL(18,2)) - CAST(hours_r AS DECIMAL(18,2))) AS DOUBLE) AS hours_diff,
        |CASE WHEN hours_l IS NULL THEN 'MISSING_LEFT'
        |WHEN hours_r IS NULL THEN 'MISSING_RIGHT'
        |WHEN COALESCE(CAST(ABS(CAST(hours_l AS DECIMAL(18,2)) - CAST(hours_r AS DECIMAL(18,2))) AS DOUBLE) <= 0.01, FALSE)
        |THEN 'MATCH' ELSE 'MISMATCH' END AS compare_status
        |FROM l FULL OUTER JOIN r ON l.user_id = r.user_id)
        |SELECT compare_status, COUNT(*) AS n,
        |CAST(SUM(CAST(hours_diff AS DECIMAL(18,2))) AS DOUBLE) AS total_abs_diff
        |FROM cmp GROUP BY compare_status""".stripMargin,
    "j13_tolerance_compare" ->
      """WITH l AS (SELECT l_suppkey AS user_id, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS hours_l
        |FROM lineitem GROUP BY l_suppkey),
        |r AS (SELECT l_suppkey AS user_id, CAST(SUM(CASE WHEN l_returnflag <> 'X'
        |THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS hours_r
        |FROM lineitem GROUP BY l_suppkey)
        |SELECT COALESCE(l.user_id, r.user_id) AS user_id, hours_l, hours_r,
        |CAST(ABS(CAST(hours_l AS DECIMAL(18,2)) - CAST(hours_r AS DECIMAL(18,2))) AS DOUBLE) AS hours_diff,
        |COALESCE(CAST(ABS(CAST(hours_l AS DECIMAL(18,2)) - CAST(hours_r AS DECIMAL(18,2))) AS DOUBLE) <= 0.01, FALSE) AS hours_match,
        |CASE WHEN hours_l IS NULL THEN 'MISSING_LEFT'
        |WHEN hours_r IS NULL THEN 'MISSING_RIGHT'
        |WHEN COALESCE(CAST(ABS(CAST(hours_l AS DECIMAL(18,2)) - CAST(hours_r AS DECIMAL(18,2))) AS DOUBLE) <= 0.01, FALSE)
        |THEN 'MATCH' ELSE 'MISMATCH' END AS compare_status
        |FROM l FULL OUTER JOIN r ON l.user_id = r.user_id""".stripMargin,
    "j14_salted_skew_join" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |o_orderkey, o_orderstatus, o_orderdate
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin
  )
}

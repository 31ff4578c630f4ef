package graft.queries

import graft.ops.Exact
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** SURVEY §2.6 sorts/limits (O1–O4) + §2.7 set operations (U1–U5). */
object SetOrderQueries extends QueryModule {

  val defs: Map[String, Q] = Map(
    // U1: UNION ALL then DISTINCT — the V5 user universe (`…v5.sql:114-136`).
    "u1_union_distinct" -> ((s, dir) => {
      val fromBudget = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .select(col("l_suppkey").as("user_id"))
      val fromTime = Tables.lineitem(s, dir).filter(col("l_quantity") > 30)
        .select(col("l_suppkey").as("user_id"))
      fromBudget.union(fromTime).distinct()
    }),

    // U2: UNION ALL with literal source tags — multi-table freshness report
    // (`pipeline_monitoring.sql:9-131`).
    "u2_union_tagged" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).agg(
        count(lit(1)).as("row_cnt"), max(col("l_shipdate").cast("date")).as("latest_date"))
        .select(lit("lineitem").as("table_name"), col("row_cnt"), col("latest_date"))
      val o = Tables.orders(s, dir).agg(
        count(lit(1)).as("row_cnt"), max(col("o_orderdate").cast("date")).as("latest_date"))
        .select(lit("orders").as("table_name"), col("row_cnt"), col("latest_date"))
      val e = Tables.events(s, dir).agg(
        count(lit(1)).as("row_cnt"), max(col("ts").cast("date")).as("latest_date"))
        .select(lit("events").as("table_name"), col("row_cnt"), col("latest_date"))
      li.unionByName(o).unionByName(e)
    }),

    // U3: UNION ALL with provenance column — actual vs estimated budgets
    // (`…v5_fallback.sql:95-132`).
    "u3_union_provenance" -> ((s, dir) => {
      val actual = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("work_item_id"), col("o_totalprice").as("budget"),
          lit("ACTUAL_INDIVIDUAL_BUDGET").as("budget_source"))
      val estimated = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("work_item_id"))
        .agg(sum(Exact.discounted(col("l_extendedprice"), col("l_discount"))).cast("double").as("budget"))
        .withColumn("budget_source", lit("ESTIMATED_FROM_TIME_LOGGED"))
      actual.unionByName(estimated)
    }),

    // U4: SELECT DISTINCT full-row dedup (`…corrected_view.sql:10-35`).
    "u4_distinct_rows" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"), year(col("l_shipdate")).as("ship_year"))
        .distinct()),

    // U5: INTERSECT / EXCEPT on key sets (`dashboard/main.py:2072`).
    "u5_intersect_keys" -> ((s, dir) => {
      val y96 = Tables.orders(s, dir).filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      val y97 = Tables.orders(s, dir).filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
      y96.intersect(y97)
    }),
    "u5_except_keys" -> ((s, dir) => {
      val y96 = Tables.orders(s, dir).filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      val y97 = Tables.orders(s, dir).filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
      y96.except(y97)
    }),

    // O1: multi-column global ORDER BY (`…v5.sql:460`). The driver compare is
    // order-insensitive; the ordering is still part of the physical plan
    // (range partitioning + sort) and is benchmarked.
    "o1_multi_orderby" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate").cast("date").as("order_date"),
          col("o_totalprice"))
        .orderBy(col("order_date").desc, col("o_custkey"), col("o_orderkey"))),

    // O2: ORDER BY + LIMIT top-k → TakeOrderedAndProject (`verify…sql:74-75`).
    "o2_topk" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey"))
        .agg(sum(Exact.discounted(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_suppkey"))
        .limit(15)),

    // O3: DESC NULLS LAST (`dashboard/date_analysis_queries.sql:134`).
    "o3_desc_nulls_last" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "P", lit(null).cast("double"))
            .otherwise(col("o_totalprice")).as("maybe_price"))
        .orderBy(col("maybe_price").desc_nulls_last, col("o_orderkey"))
        .limit(100)),

    // O4: deterministic LIMIT/OFFSET pagination (`snowflake_bq_sync Time
    // details/main.py:118-119`) — DataFrame.offset directly (Spark ≥3.4);
    // the unique sort key makes the page well-defined. Exists for semantic
    // parity: at scale pagination is replaced by partitioned scans
    // (Tables.page documents the same).
    "o4_offset_page" -> ((s, dir) =>
      Tables.page(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        Seq("o_orderkey"), 2500, 100))
  )

  val oracles: Map[String, String] = Map(
    "u1_union_distinct" ->
      """SELECT DISTINCT user_id FROM (
        |SELECT l_suppkey AS user_id FROM lineitem WHERE l_returnflag = 'R'
        |UNION ALL SELECT l_suppkey AS user_id FROM lineitem WHERE l_quantity > 30)""".stripMargin,
    "u2_union_tagged" ->
      """SELECT 'lineitem' AS table_name, COUNT(*) AS row_cnt, MAX(CAST(l_shipdate AS DATE)) AS latest_date FROM lineitem
        |UNION ALL
        |SELECT 'orders', COUNT(*), MAX(CAST(o_orderdate AS DATE)) FROM orders
        |UNION ALL
        |SELECT 'events', COUNT(*), MAX(CAST(ts AS DATE)) FROM events""".stripMargin,
    "u3_union_provenance" ->
      """SELECT o_orderkey AS work_item_id, o_totalprice AS budget,
        |'ACTUAL_INDIVIDUAL_BUDGET' AS budget_source FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT l_orderkey, CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE),
        |'ESTIMATED_FROM_TIME_LOGGED' FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "u4_distinct_rows" ->
      """SELECT DISTINCT l_returnflag, l_linestatus,
        |CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS ship_year FROM lineitem""".stripMargin,
    "u5_intersect_keys" ->
      """SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997""".stripMargin,
    "u5_except_keys" ->
      """SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997""".stripMargin,
    "o1_multi_orderby" ->
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        |FROM orders ORDER BY order_date DESC, o_custkey, o_orderkey""".stripMargin,
    "o2_topk" ->
      """SELECT l_suppkey, CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY l_suppkey ORDER BY revenue DESC, l_suppkey LIMIT 15""".stripMargin,
    "o3_desc_nulls_last" ->
      """SELECT o_orderkey, CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS maybe_price
        |FROM orders ORDER BY maybe_price DESC NULLS LAST, o_orderkey LIMIT 100""".stripMargin,
    "o4_offset_page" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_orderkey LIMIT 100 OFFSET 2500""".stripMargin
  )
}

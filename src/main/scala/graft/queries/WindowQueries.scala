package graft.queries

import graft.ops.{Core, Exact}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.5 window functions (W1–W6) + the J6 latest-snapshot filter.
  *
  * Every window ordering includes a unique tie-break (the reference orders
  * only by the snapshot date, which is nondeterministic under ties — we keep
  * the semantics but make the choice stable).
  *
  * Scale note: each query shuffles once on its partition key; the partition
  * keys (orderkey / partkey+suppkey / suppkey) are high-cardinality, so the
  * sort-within-partition scales linearly and needs no salting.
  */
object WindowQueries extends QueryModule {

  val defs: Map[String, Q] = Map(
    // W1: 7-col-key window dedup keep rn=1 (`…v5.sql:78-103`).
    "w1_window_dedup" -> ((s, dir) =>
      Core.dedupByKey(
        Tables.lineitem(s, dir),
        Seq("l_partkey", "l_suppkey"),
        Seq(col("l_shipdate").desc, col("l_orderkey"), col("l_linenumber")))),

    // W2: latest-record-per-key via row_number (`work_item_x_user_time_view.sql:33-35`).
    "w2_latest_row_number" -> ((s, dir) =>
      Core.latestSnapshot(Tables.lineitem(s, dir), Seq("l_orderkey"), "l_shipdate",
        keepTies = false,
        tieBreak = Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")))),

    // J6: correlated max-per-key latest snapshot, tie-keeping form
    // (`work_item_details_latest_view.sql:58-62`).
    "j6_latest_keep_ties" -> ((s, dir) =>
      Core.latestSnapshot(Tables.lineitem(s, dir), Seq("l_orderkey"), "l_shipdate", keepTies = true)),

    // W3/M4: window dedup expressed as a DELETE of rn>1 (`daily_sync.py:92-107`)
    // over a deliberately duplicated frame (union of two "extract days").
    "w3_dedup_delete" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val day1 = li.withColumn("extract_tag", lit(1))
      val day2 = li.filter(col("l_quantity") > 25).withColumn("extract_tag", lit(2))
      Core.dedupByKey(day1.unionByName(day2),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
        Seq(col("extract_tag").desc))
    }),

    // W4: trailing frame ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING
    // (`…v4.sql:200-217` budget-variance trend, excluding current row).
    // l_quantity is whole-valued so the frame average is exact.
    "w4_rolling_trail_avg" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .rowsBetween(-3, -1)
      Tables.lineitem(s, dir).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        avg(col("l_quantity")).over(w).as("trailing_avg"))
    }),

    // W5: same trailing frame at the client grain over an exact derived
    // order-revenue fact (`…v4.sql:222-232`).
    "w5_rolling_client" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(Exact.discounted(col("l_extendedprice"), col("l_discount"))).cast("double").as("order_rev"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate").cast("date").as("order_date"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("order_date"), col("o_orderkey"))
      val frame = w.rowsBetween(-3, -1)
      o.join(rev, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_custkey"), col("o_orderkey"), col("order_date"),
          coalesce(col("order_rev"), lit(0.0)).as("order_rev"))
        .select(col("o_custkey"), col("o_orderkey"), col("order_date"), col("order_rev"),
          (sum(Exact.d4(col("order_rev"))).over(frame).cast("double") /
            Exact.nullIfZero(count(col("order_rev")).over(frame))).as("trailing_client_avg"))
    }),

    // W6: guard window — rolling value only when recent stddev says the
    // series is noisy, else the point value (`…v4.sql:195-217`). The stddev
    // is computed from exact windowed sums so the guard decision is
    // reproducible bit-for-bit.
    "w6_guard_window" -> ((s, dir) => {
      val ord = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      val guard = ord.rowsBetween(-3, 0)
      val trail = ord.rowsBetween(-3, -1)
      val n = count(col("l_quantity")).over(guard).cast("double")
      val sm = sum(Exact.d2(col("l_quantity"))).over(guard).cast("double")
      val sq = sum(Exact.d2(col("l_quantity")) * Exact.d2(col("l_quantity"))).over(guard).cast("double")
      val stddevGuard = when(n > 1, sqrt((sq - sm * sm / n) / (n - lit(1.0)))).otherwise(lit(null))
      Tables.lineitem(s, dir).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        when(stddevGuard > 0.01,
          sum(Exact.d2(col("l_quantity"))).over(trail).cast("double") /
            Exact.nullIfZero(count(col("l_quantity")).over(trail)))
          .otherwise(col("l_quantity")).as("trend_value"))
    }),

    // W7: gaps-and-islands — consecutive-active-day streaks per user (the
    // classic island id: day minus row_number is constant within a run).
    // Two keyed windows + one aggregation, all on (user_id): one shuffle.
    "w7_streaks" -> ((s, dir) => {
      val days = Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
      val rn = row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("d")))
      days.withColumn("__island", date_sub(col("d"), rn))
        .groupBy(col("user_id"), col("__island"))
        .agg(min(col("d")).as("streak_start"), max(col("d")).as("streak_end"),
          count(lit(1)).as("streak_days"))
        .select(col("user_id"), col("streak_start"), col("streak_end"),
          col("streak_days"))
    }),

    // W8: time-RANGE trailing window (beyond-reference) — 30-day revenue
    // and order count per customer. w4/w5 are ROW frames; a RANGE frame
    // aggregates every peer inside the trailing INTERVAL regardless of row
    // count, which also makes it tie-robust: same-day orders are frame
    // peers, so no tiebreak column is needed for determinism. The order key
    // is an integer epoch-day, the frame is numeric (-29..0), and the sums
    // go through decimal(18,4) — identical semantics in any engine.
    "w8_range_window" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(Exact.discounted(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("order_rev"))
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("order_date"))
        .join(rev, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_custkey"), col("o_orderkey"), col("order_date"),
          coalesce(col("order_rev"), lit(0.0)).as("order_rev"),
          datediff(col("order_date"), lit("1970-01-01").cast("date")).as("__epoch_day"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("__epoch_day"))
        .rangeBetween(-29, 0)
      base.select(col("o_custkey"), col("o_orderkey"), col("order_date"),
        col("order_rev"),
        sum(Exact.d4(col("order_rev"))).over(w).cast("double").as("rev_30d"),
        count(lit(1)).over(w).as("n_orders_30d"))
    }),

    // W9: explicit LAG — inter-event think time per user in microseconds
    // (beyond-reference; w7 uses lag internally, this surfaces the offset
    // family as its own row). The (ts, event_id) order is total, so the
    // previous-row reference is deterministic; the delta is integer
    // microseconds via unix_micros (the session is pinned UTC, so the
    // ntz→instant cast is engine-identical).
    "w9_event_deltas" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir).select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("delta_us",
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")))
    }),

    // W10: time-series gap-fill (beyond-reference) — the regularization step
    // a metrics/feature pipeline runs before any rolling computation: one
    // row per (user, day) across each user's observed span, last observation
    // carried forward (LOCF) and linear interpolation between surrounding
    // observations. Per-day observation = last event of the day by the
    // (ts, event_id) total order.
    //
    // 100 TB story: the spine explode is per-user arithmetic (no join, no
    // shuffle beyond the daily aggregate's); LOCF and the forward-looking
    // next-observation window share ONE (user_id, day ASC) sort — same
    // partitioning, same ordering, only the frames differ — so the whole
    // fill costs one exchange + one sort. Interpolation arithmetic is two
    // doubles and exact integer day distances: bit-identical cross-engine.
    "w10_gap_fill" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("day"),
          col("ts"), col("event_id"), col("value"))
      // per-day observation: last event of the day (total order)
      val daily = ev
        .withColumn("__rn", row_number().over(Window
          .partitionBy(col("user_id"), col("day"))
          .orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("day"), col("value").as("v_obs"))
      // spine: every day in [min_day, max_day] per user
      val spine = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
        .select(col("user_id"),
          explode(sequence(lit(0), datediff(col("__d1"), col("__d0")))).as("__i"),
          col("__d0"))
        .select(col("user_id"), date_add(col("__d0"), col("__i")).as("day"))
      val wBack = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFwd = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("locf", last(col("v_obs"), ignoreNulls = true).over(wBack))
        .withColumn("__pd", last(when(col("v_obs").isNotNull, col("day")),
          ignoreNulls = true).over(wBack))
        .withColumn("__nv", first(col("v_obs"), ignoreNulls = true).over(wFwd))
        .withColumn("__nd", first(when(col("v_obs").isNotNull, col("day")),
          ignoreNulls = true).over(wFwd))
        .select(col("user_id"), col("day"), col("v_obs"),
          col("locf"),
          when(col("v_obs").isNotNull, col("v_obs"))
            .otherwise(col("locf") + (col("__nv") - col("locf")) *
              (datediff(col("day"), col("__pd")).cast("double") /
                datediff(col("__nd"), col("__pd")).cast("double"))).as("v_interp"),
          col("v_obs").isNull.as("is_gap"))
    }),

    // O5: the full rank family over one deterministic total order —
    // row_number / rank / dense_rank / percent_rank / cume_dist / ntile.
    // percent_rank and cume_dist are exact rationals (k/n) so the doubles
    // compare bit-for-bit cross-engine.
    "o5_rank_family" -> ((s, dir) => {
      // deterministic functions (row_number, ntile) use the unique total
      // order; tie-stable ones (rank, dense_rank, percent_rank, cume_dist)
      // rank by quantity alone so tie semantics are actually exercised.
      // Same partitioning for both windows: one shuffle, two sorts.
      val wU = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_partkey"),
          col("l_suppkey"), col("l_linenumber"))
      val wQ = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      Tables.lineitem(s, dir).select(
        col("l_returnflag"), col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
        row_number().over(wU).as("rn"),
        ntile(4).over(wU).as("quartile"),
        rank().over(wQ).as("rnk"),
        dense_rank().over(wQ).as("drnk"),
        percent_rank().over(wQ).as("prnk"),
        cume_dist().over(wQ).as("cd"))
    })
  )

  private val liCols = "l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"

  val oracles: Map[String, String] = Map(
    "w7_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |i AS (SELECT user_id, d,
        |  d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS island
        |  FROM days)
        |SELECT user_id, MIN(d) AS streak_start, MAX(d) AS streak_end,
        |COUNT(*) AS streak_days
        |FROM i GROUP BY user_id, island""".stripMargin,
    "o5_rank_family" ->
      """SELECT l_returnflag, l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |CAST(ROW_NUMBER() OVER wu AS INTEGER) AS rn,
        |CAST(NTILE(4) OVER wu AS INTEGER) AS quartile,
        |CAST(RANK() OVER wq AS INTEGER) AS rnk,
        |CAST(DENSE_RANK() OVER wq AS INTEGER) AS drnk,
        |PERCENT_RANK() OVER wq AS prnk,
        |CUME_DIST() OVER wq AS cd
        |FROM lineitem
        |WINDOW wu AS (PARTITION BY l_returnflag
        |  ORDER BY l_quantity, l_orderkey, l_partkey, l_suppkey, l_linenumber),
        |wq AS (PARTITION BY l_returnflag ORDER BY l_quantity)""".stripMargin,
    "w1_window_dedup" ->
      s"""SELECT $liCols FROM (
         |SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey, l_suppkey
         |ORDER BY l_shipdate DESC, l_orderkey, l_linenumber) AS rn FROM lineitem) WHERE rn = 1""".stripMargin,
    "w2_latest_row_number" ->
      s"""SELECT $liCols FROM (
         |SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
         |ORDER BY l_shipdate DESC, l_linenumber, l_partkey, l_suppkey) AS rn FROM lineitem) WHERE rn = 1""".stripMargin,
    "j6_latest_keep_ties" ->
      """SELECT * FROM lineitem l WHERE l_shipdate =
        |(SELECT MAX(l2.l_shipdate) FROM lineitem l2 WHERE l2.l_orderkey = l.l_orderkey)""".stripMargin,
    "w3_dedup_delete" ->
      s"""WITH unioned AS (
         |SELECT *, 1 AS extract_tag FROM lineitem
         |UNION ALL
         |SELECT *, 2 AS extract_tag FROM lineitem WHERE l_quantity > 25)
         |SELECT $liCols, extract_tag FROM (
         |SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey, l_suppkey, l_linenumber
         |ORDER BY extract_tag DESC) AS rn FROM unioned) WHERE rn = 1""".stripMargin,
    "w4_rolling_trail_avg" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |AVG(l_quantity) OVER (PARTITION BY l_suppkey
        |ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS trailing_avg FROM lineitem""".stripMargin,
    "w9_event_deltas" ->
      """SELECT user_id, event_id, ts,
        |LAG(ts) OVER w AS prev_ts,
        |CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT) AS delta_us
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    // w10: the same spine arithmetic, LOCF/next-obs windows and
    // interpolation formula — day distances via date_diff, both value
    // operands bit-identical doubles.
    "w10_gap_fill" ->
      """WITH daily AS (SELECT user_id, d AS day, value AS v_obs FROM (
        |  SELECT user_id, CAST(ts AS DATE) AS d, value, ROW_NUMBER() OVER (
        |    PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1),
        |sp AS (SELECT user_id, min_d,
        |  unnest(range(0, CAST(date_diff('day', min_d, max_d) AS BIGINT) + 1)) AS i
        |  FROM (SELECT user_id, MIN(day) AS min_d, MAX(day) AS max_d FROM daily GROUP BY user_id)),
        |spine AS (SELECT user_id, min_d + CAST(i AS INTEGER) AS day FROM sp),
        |f AS (SELECT s.user_id, s.day, d.v_obs,
        |  last_value(d.v_obs IGNORE NULLS) OVER wb AS locf,
        |  last_value(CASE WHEN d.v_obs IS NOT NULL THEN s.day END IGNORE NULLS) OVER wb AS pd,
        |  first_value(d.v_obs IGNORE NULLS) OVER wf AS nv,
        |  first_value(CASE WHEN d.v_obs IS NOT NULL THEN s.day END IGNORE NULLS) OVER wf AS nd
        | FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
        | WINDOW wb AS (PARTITION BY s.user_id ORDER BY s.day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY s.user_id ORDER BY s.day
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day, v_obs, locf,
        | CASE WHEN v_obs IS NOT NULL THEN v_obs
        |      ELSE locf + (nv - locf) * (CAST(date_diff('day', pd, day) AS DOUBLE)
        |        / CAST(date_diff('day', pd, nd) AS DOUBLE)) END AS v_interp,
        | v_obs IS NULL AS is_gap
        |FROM f""".stripMargin,
    "w8_range_window" ->
      """WITH rev AS (
        |SELECT l_orderkey, CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS order_rev
        |FROM lineitem GROUP BY l_orderkey),
        |base AS (
        |SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |COALESCE(rev.order_rev, 0.0) AS order_rev,
        |CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS epoch_day
        |FROM orders LEFT JOIN rev ON o_orderkey = rev.l_orderkey)
        |SELECT o_custkey, o_orderkey, order_date, order_rev,
        |CAST(SUM(CAST(order_rev AS DECIMAL(18,4))) OVER w AS DOUBLE) AS rev_30d,
        |COUNT(*) OVER w AS n_orders_30d
        |FROM base WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_day
        |RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)""".stripMargin,
    "w5_rolling_client" ->
      """WITH rev AS (
        |SELECT l_orderkey, CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS order_rev
        |FROM lineitem GROUP BY l_orderkey),
        |base AS (
        |SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |COALESCE(rev.order_rev, 0.0) AS order_rev
        |FROM orders LEFT JOIN rev ON o_orderkey = rev.l_orderkey)
        |SELECT o_custkey, o_orderkey, order_date, order_rev,
        |CAST(SUM(CAST(order_rev AS DECIMAL(18,4))) OVER w AS DOUBLE) /
        |NULLIF(COUNT(order_rev) OVER w, 0) AS trailing_client_avg
        |FROM base WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey
        |ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)""".stripMargin,
    "w6_guard_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |CASE WHEN (CASE WHEN CAST(COUNT(l_quantity) OVER g AS DOUBLE) > 1 THEN
        |sqrt((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) OVER g AS DOUBLE)
        | - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER g AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER g AS DOUBLE)
        |   / CAST(COUNT(l_quantity) OVER g AS DOUBLE))
        | / (CAST(COUNT(l_quantity) OVER g AS DOUBLE) - 1.0))
        |ELSE NULL END) > 0.01 THEN
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER t AS DOUBLE) / NULLIF(COUNT(l_quantity) OVER t, 0)
        |ELSE l_quantity END AS trend_value
        |FROM lineitem
        |WINDOW g AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
        |t AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)""".stripMargin
  )
}

package graft.queries

import graft.schema.SchemaMapper
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** SURVEY §2.1 scans (S1–S4) + §2.2 projections/row transforms (P1–P7) +
  * §2.8 scalar-function families (F1–F6), each as a named query with a
  * DuckDB oracle.
  */
object ScanProjQueries extends QueryModule {

  /** Deterministic uuid-shaped string from a hash (F6/P6 test form — prod
    * path uses `uuid()`, ref `daily_sync.py:268`).
    */
  private def uuidShaped(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))

  val defs: Map[String, Q] = Map(
    // S1/O4: keyset-ordered page — reference paginates `ORDER BY key LIMIT/OFFSET`
    // (`snowflake_bq_sync Time details/main.py:103-126`).
    "s1_keyset_page" -> ((s, dir) =>
      Tables.page(Tables.lineitem(s, dir),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"), 1000, 500)),

    // S2: date-windowed incremental scan; filter is pushed to parquet.
    "s2_date_window" -> ((s, dir) =>
      Tables.dateWindow(Tables.lineitem(s, dir), "l_shipdate", "1996-01-01", "1996-12-31")),

    // S3: schema introspection (information_schema.columns analog) — no SQL
    // oracle (engine-specific type names); driver does rows-only check.
    "s3_schema_introspect" -> ((s, dir) =>
      SchemaMapper.introspect(s, s"$dir/lineitem.parquet")),

    // S4: whole-table dimension scan.
    "s4_whole_table" -> ((s, dir) => Tables.customer(s, dir)),

    // P1: star projection with aliases (`…v4.sql:21-255` re-projects 40-90 cols).
    "p1_star_projection" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey").as("order_id"),
        col("o_custkey").as("client_id"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").as("total_price"),
        col("o_orderdate").cast("date").as("order_date"),
        col("o_orderpriority").as("priority"))),

    // P2: SELECT * EXCEPT(col) (`work_item_x_user_time_view.sql:31`).
    "p2_except_column" -> ((s, dir) => Tables.lineitem(s, dir).drop("l_tax")),

    // P3: row-wise type normalization (ISO-string transport casts,
    // `snowflake_bq_sync Time details/main.py:169-180`).
    "p3_type_normalize" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey").cast("string").as("orderkey_str"),
        col("l_quantity").cast("int").as("quantity_int"),
        col("l_shipdate").cast("date").as("ship_date"),
        col("l_extendedprice").cast("decimal(18,2)").cast("string").as("price_str"))),

    // P4: NULL-imputation of the partition key (`…budget…daily/main.py:230-233`).
    "p4_null_impute" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey").as("order_id"),
        coalesce(
          when(col("o_orderstatus") === "P", lit(null).cast("date"))
            .otherwise(col("o_orderdate").cast("date")),
          lit("1998-01-01").cast("date")).as("reporting_date"))),

    // P5: predicate filters (`…v5.sql:83-84` pattern).
    "p5_filters" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") > 40 && col("l_returnflag") === "N" && col("l_discount").isNotNull)),

    // P6: generated audit columns — deterministic form (prod uses uuid() +
    // current_timestamp(), ref `daily_sync.py:266-268`).
    "p6_audit_columns" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        md5(concat_ws("|", col("l_orderkey").cast("string"), col("l_linenumber").cast("string")))
          .as("row_uuid"),
        lit("2025-01-01 00:00:00").cast("timestamp_ntz").as("bq_ingestion_timestamp"))),

    // P7: key-list escaping → distributed anti-join (kills the reference's
    // 1000-key NOT IN truncation, `…budget…daily/main.py:374-378`).
    "p7_keylist_antijoin" -> ((s, dir) => {
      val keys = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      Tables.orders(s, dir).join(keys, col("o_custkey") === col("c_custkey"), "left_anti")
    }),

    // F1: date/time function family.
    "f1_datetime_funcs" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        col("ts").cast("date").as("event_date"),
        year(col("ts")).as("y"),
        month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"),
        hour(col("ts")).as("h"),
        dayofweek(col("ts")).as("dow1"),
        date_trunc("month", col("ts")).cast("date").as("month_start"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("days_since"),
        date_add(col("ts").cast("date"), 7).as("plus_week"),
        date_sub(col("ts").cast("date"), 30).as("minus_30"))),

    // F2: conditional family (CASE ladders + COALESCE, `…v5.sql:235-243`).
    "f2_conditional_funcs" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") >= 40, "HIGH")
          .when(col("l_quantity") >= 20, "MEDIUM")
          .when(col("l_quantity") >= 10, "LOW")
          .otherwise("MINIMAL").as("qty_band"),
        coalesce(
          when(col("l_returnflag") === "A", lit(null).cast("string")).otherwise(col("l_returnflag")),
          col("l_linestatus"), lit("UNKNOWN")).as("flag_or_status"))),

    // F3: math family (round/abs/floor/ceil/mod; exact decimal product).
    "f3_math_funcs" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice").cast("decimal(18,2)") * col("l_discount").cast("decimal(18,2)"), 2)
          .cast("double").as("disc_amount"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        floor(col("l_quantity") / 10).as("qty_decile"),
        ceil(col("l_quantity") / 10).as("qty_decile_hi"),
        (col("l_orderkey") % 7).as("key_mod"))),

    // F4: string family.
    "f4_string_funcs" -> ((s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        length(col("p_name")).as("name_len"),
        col("p_name").like("%red%").as("is_red"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        trim(col("p_name")).as("name_trim"))),

    // F5: boolean predicate family.
    "f5_boolean_funcs" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        col("o_totalprice").between(50000, 150000).as("in_band"),
        col("o_orderstatus").isin("F", "O").as("known_status"),
        col("o_orderpriority").isNotNull.as("has_priority"),
        (!col("o_orderstatus").isin("P")).as("not_pending"))),

    // F6: generative family — deterministic uuid-shaped ids (prod: uuid()).
    "f6_generated_ids" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        uuidShaped(md5(col("o_orderkey").cast("string"))).as("row_uuid"))),

    // F7: semi-structured schema-on-read — JSON path extraction from the
    // events props payload (per-row, codegen'd, no shuffle).
    "f7_json_extract" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
        .withColumn("k_decile", expr("k div 10")))
  )

  val oracles: Map[String, String] = Map(
    "f7_json_extract" ->
      """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k,
        |CAST(props->>'k' AS BIGINT) // 10 AS k_decile FROM events""".stripMargin,
    "s1_keyset_page" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber LIMIT 500 OFFSET 1000",
    "s2_date_window" ->
      "SELECT * FROM lineitem WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'",
    // S3: DuckDB's DESCRIBE with its type names mapped onto Spark's SQL type
    // names (both engines read the same parquet footer)
    "s3_schema_introspect" ->
      """SELECT column_name,
        |CASE column_type WHEN 'VARCHAR' THEN 'STRING' WHEN 'INTEGER' THEN 'INT'
        |WHEN 'TIMESTAMP' THEN 'TIMESTAMP_NTZ' ELSE column_type END AS data_type,
        |CAST(ROW_NUMBER() OVER () AS BIGINT) AS ordinal_position,
        |"null" = 'YES' AS is_nullable
        |FROM (DESCRIBE SELECT * FROM lineitem)""".stripMargin,
    "s4_whole_table" -> "SELECT * FROM customer",
    "p1_star_projection" ->
      """SELECT o_orderkey AS order_id, o_custkey AS client_id, o_orderstatus AS status,
        |o_totalprice AS total_price, CAST(o_orderdate AS DATE) AS order_date,
        |o_orderpriority AS priority FROM orders""".stripMargin,
    "p2_except_column" -> "SELECT * EXCLUDE (l_tax) FROM lineitem",
    "p3_type_normalize" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS orderkey_str, CAST(l_quantity AS INT) AS quantity_int,
        |CAST(l_shipdate AS DATE) AS ship_date,
        |CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str FROM lineitem""".stripMargin,
    "p4_null_impute" ->
      """SELECT o_orderkey AS order_id,
        |COALESCE(CASE WHEN o_orderstatus = 'P' THEN NULL ELSE CAST(o_orderdate AS DATE) END,
        |DATE '1998-01-01') AS reporting_date FROM orders""".stripMargin,
    "p5_filters" ->
      "SELECT * FROM lineitem WHERE l_quantity > 40 AND l_returnflag = 'N' AND l_discount IS NOT NULL",
    "p6_audit_columns" ->
      """SELECT l_orderkey, l_linenumber,
        |md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)) AS row_uuid,
        |TIMESTAMP '2025-01-01 00:00:00' AS bq_ingestion_timestamp FROM lineitem""".stripMargin,
    "p7_keylist_antijoin" ->
      """SELECT * FROM orders WHERE NOT EXISTS (
        |SELECT 1 FROM customer WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey)""".stripMargin,
    "f1_datetime_funcs" ->
      """SELECT event_id, CAST(ts AS DATE) AS event_date,
        |CAST(EXTRACT(YEAR FROM ts) AS INT) AS y, CAST(EXTRACT(MONTH FROM ts) AS INT) AS m,
        |CAST(EXTRACT(DAY FROM ts) AS INT) AS d, CAST(EXTRACT(HOUR FROM ts) AS INT) AS h,
        |CAST(EXTRACT(DOW FROM ts) + 1 AS INT) AS dow1,
        |CAST(DATE_TRUNC('month', ts) AS DATE) AS month_start,
        |CAST(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS days_since,
        |CAST(ts AS DATE) + 7 AS plus_week, CAST(ts AS DATE) - 30 AS minus_30 FROM events""".stripMargin,
    "f2_conditional_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |CASE WHEN l_quantity >= 40 THEN 'HIGH' WHEN l_quantity >= 20 THEN 'MEDIUM'
        |WHEN l_quantity >= 10 THEN 'LOW' ELSE 'MINIMAL' END AS qty_band,
        |COALESCE(CASE WHEN l_returnflag = 'A' THEN NULL ELSE l_returnflag END,
        |l_linestatus, 'UNKNOWN') AS flag_or_status FROM lineitem""".stripMargin,
    "f3_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)), 2) AS DOUBLE) AS disc_amount,
        |ABS(l_quantity - 25) AS qty_dev,
        |CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_decile,
        |CAST(CEIL(l_quantity / 10) AS BIGINT) AS qty_decile_hi,
        |l_orderkey % 7 AS key_mod FROM lineitem""".stripMargin,
    "f4_string_funcs" ->
      """SELECT p_partkey, UPPER(p_name) AS name_upper, LOWER(p_brand) AS brand_lower,
        |SUBSTRING(p_type, 1, 5) AS type_prefix, CAST(LENGTH(p_name) AS INT) AS name_len,
        |p_name LIKE '%red%' AS is_red,
        |CONCAT_WS('-', p_brand, p_type) AS brand_type, TRIM(p_name) AS name_trim FROM part""".stripMargin,
    "f5_boolean_funcs" ->
      """SELECT o_orderkey, o_totalprice BETWEEN 50000 AND 150000 AS in_band,
        |o_orderstatus IN ('F','O') AS known_status, o_orderpriority IS NOT NULL AS has_priority,
        |o_orderstatus NOT IN ('P') AS not_pending FROM orders""".stripMargin,
    "f6_generated_ids" ->
      """SELECT o_orderkey,
        |substr(h,1,8) || '-' || substr(h,9,4) || '-' || substr(h,13,4) || '-' || substr(h,17,4) || '-' || substr(h,21,12) AS row_uuid
        |FROM (SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS h FROM orders)""".stripMargin
  )
}

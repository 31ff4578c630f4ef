package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling (x12) and the schema/stat drift report built on
  * it (dq7) — the pair of checks a pipeline runs before trusting an unknown
  * or newly-arrived table version: what are the columns, how null, how
  * distinct, what ranges; and did any of that MOVE since the last snapshot.
  *
  * Scale shape: [[profile]] is ONE scan computing every column's stats
  * simultaneously — exact null counts and min/max (associative), plus
  * `approx_count_distinct` (HLL++, one mergeable sketch per column; the only
  * all-columns cardinality computable in one pass at 100 TB). The exact
  * COUNT(DISTINCT) leg exists to power the x5-style tolerance gate and
  * drops out at scale. The stats row reshapes to a row per column with an
  * inline struct array (no shuffle beyond the global aggregate), and
  * [[schemaDrift]] joins two such profiles full-outer on column name —
  * column-count-sized frames, control-plane cheap no matter the table size.
  */
object Profiling {

  /** Per-column stats of `df` restricted to `cols`: one output row per
    * column — (col_name, dtype, n_rows, n_nulls, n_distinct,
    * approx_within_tol, min_str, max_str). `n_distinct` is exact;
    * `approx_within_tol` gates the HLL++ estimate against it (10% or ±4,
    * whichever is larger — >3σ at the default rsd).
    *
    * `df` MUST be deterministic: the plain and exact-distinct aggregates
    * run as two independent passes over its lineage (see the split note
    * below), so a non-deterministic input could yield an internally
    * inconsistent row (n_rows from one evaluation, n_distinct from
    * another). Pinning the input would cost a table-sized cache per
    * profile call at 100 TB for a check that is otherwise two streams —
    * the determinism requirement is the cheaper contract, and every graft
    * profile source (parquet tables, derived projections) meets it.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val dtypes = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    cols.foreach(c => require(dtypes.contains(c), s"no such column: $c"))
    // The plain (hash-friendly buffers aside — see below) and the
    // exact-distinct aggregates are computed in SEPARATE passes and
    // cross-joined (1 row × 1 row). Fused, the multi-column COUNT(DISTINCT)
    // expands every row (cols+1)-way AND drags the string-typed min/max
    // buffers with it — string agg buffers are immutable, so the whole
    // expanded partial stage falls back to SORT-based aggregation (r19
    // sampled profile of dq7: UnsafeExternalRowSorter + SortAggregateExec
    // dominating ~70 s of CPU at sf0.1). Split, the expanded pass carries
    // only long count buffers (pure codegen hash aggregation) and the
    // string buffers ride the unexpanded single-group pass.
    val plainAggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_nn"),
        approx_count_distinct(col(c)).as(s"${c}_ad"),
        min(col(c)).cast("string").as(s"${c}_mn"),
        max(col(c)).cast("string").as(s"${c}_mx"))
    }
    val distinctAggs = cols.map(c => countDistinct(col(c)).as(s"${c}_nd"))
    // The stats-gated spread parallelizes the expansion over a
    // single-row-group parquet scan (1 task, unsplittable — the whole
    // expansion ran serially before it); a no-op at real scale, where the
    // scan splits on its own.
    val spread = graft.ops.Scan.spreadIfStarved(df)
    spread.agg(plainAggs.head, plainAggs.tail: _*)
      .crossJoin(spread.agg(distinctAggs.head, distinctAggs.tail: _*))
      .select(col("n_rows"), explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), lit(dtypes(c)).as("dtype"),
          (col("n_rows") - col(s"${c}_nn")).as("n_nulls"),
          col(s"${c}_nd").as("n_distinct"),
          (abs(col(s"${c}_ad") - col(s"${c}_nd")) <=
            greatest(col(s"${c}_nd") * lit(0.1), lit(4.0))).as("approx_within_tol"),
          col(s"${c}_mn").as("min_str"), col(s"${c}_mx").as("max_str"))
      }: _*)).as("p"))
      .select(col("p.col_name"), col("p.dtype"), col("n_rows"),
        col("p.n_nulls"), col("p.n_distinct"), col("p.approx_within_tol"),
        col("p.min_str"), col("p.max_str"))
  }

  /** Schema + stat drift between two profiled snapshots: one row per column
    * appearing in EITHER profile — status added/dropped/type_changed/common,
    * both sides' null fractions in exact basis points (integer `div`, no
    * float ratio drift), and a drift verdict when the null rate moved more
    * than `nullBpsTol` basis points or the type changed. The frames are
    * column-count-sized; everything here is control-plane cheap.
    */
  def schemaDrift(prev: DataFrame, curr: DataFrame,
      nullBpsTol: Long = 100L): DataFrame = {
    def side(p: DataFrame, tag: String): DataFrame =
      p.select(col("col_name"), col("dtype").as(s"dtype_$tag"),
        // n_rows = 0 guarded BEFORE the div: under ANSI mode (Spark 4
        // default) an unguarded div-by-zero throws mid-job; CaseWhen
        // evaluates the div branch only when the guard holds
        when(col("n_rows") > 0, expr("n_nulls * 10000 div n_rows"))
          .as(s"null_bps_$tag"),
        col("n_distinct").as(s"n_distinct_$tag"),
        col("n_rows").as(s"n_rows_$tag"))
    side(prev, "prev").join(side(curr, "curr"), Seq("col_name"), "full_outer")
      .withColumn("status",
        when(col("dtype_prev").isNull, lit("added"))
          .when(col("dtype_curr").isNull, lit("dropped"))
          .when(col("dtype_prev") =!= col("dtype_curr"), lit("type_changed"))
          .otherwise(lit("common")))
      .withColumn("drift_detected",
        col("status") =!= "common" ||
          // an EMPTY snapshot has no null-rate basis (the div above is
          // NULL): that is drift to investigate, never a NULL verdict
          col("n_rows_prev") === 0 || col("n_rows_curr") === 0 ||
          abs(col("null_bps_prev") - col("null_bps_curr")) > nullBpsTol)
      .select(col("col_name"), col("status"), col("dtype_prev"),
        col("dtype_curr"), col("null_bps_prev"), col("null_bps_curr"),
        col("n_distinct_prev"), col("n_distinct_curr"), col("drift_detected"))
  }
}

package graft.queries

import graft.ops.ZOrder
import graft.sources.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Data-layout operators (ZO family, beyond-reference): Z-order (Morton)
  * clustering for multi-dimensional file skipping — the `OPTIMIZE ZORDER BY`
  * capability, as a plain Column combinator + range-partitioned write. The
  * reference clusters its BigQuery facts on (entity, REPORTING_DATE) for the
  * same reason (skip on either predicate); z-order is the general form. The
  * pruning payoff is MEASURED in ZOrderSpec (row-group skipping via scan
  * metrics, per-file min/max tightness), not assumed; these queries pin the
  * value math and the layout roundtrip to the DuckDB oracle.
  */
object LayoutQueries extends QueryModule {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** lineitem's two cluster dims: every query here layouts on
    * (l_partkey, l_suppkey) — the "filter by product OR by supplier"
    * two-predicate workload z-order exists for.
    */
  private val dims = Seq("l_partkey", "l_suppkey")
  private val bits = 12

  val defs: Map[String, Q] = Map(
    // ZO1: the Morton value itself — affine rank per dim from the true
    // min/max (the one-pass stats read every layout job performs), exact
    // integer division (ZOrder.idiv), bit interleave. Oracle recomputes
    // every z bit-for-bit with hugeint `//` from its own min/max CTE.
    "zo1_zvalue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val st = li.agg(
        min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey"))).head
      val stats = Seq((st.getLong(0), st.getLong(1)), (st.getLong(2), st.getLong(3)))
      li.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"),
        ZOrder.zValue(dims.map(col), stats, bits).as("zval"))
    }),

    // ZO2: the layout roundtrip — range-partition + sort on z, write
    // parquet with small row groups (so sf-scale data spans many skipping
    // units), read back under a two-dim predicate. The oracle is the same
    // predicate over the ORIGINAL table with the same recomputed z: proves
    // the clustered layout is lossless and the z math survives the
    // write/read. The skipping itself (scan rows out under pushed filters,
    // z-layout vs linear-sort layout) is asserted in ZOrderSpec and
    // measured in PERF_NOTES.
    "zo2_zorder_layout" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"))
      val st = li.agg(
        min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey"))).head
      val stats = Seq((st.getLong(0), st.getLong(1)), (st.getLong(2), st.getLong(3)))
      val path = tmp("graft_zo2") + "/t"
      ZOrder.layoutWrite(li, dims.map(col), stats, bits, path,
        nFiles = 16, blockBytes = 64L << 10)
      s.read.parquet(path)
        .filter(col("l_partkey").between(100, 400) &&
          col("l_suppkey").between(10, 40))
        .withColumn("zval", ZOrder.zValue(dims.map(col), stats, bits))
    }),

    // ST16: streaming ingest + z-order compaction — the maintenance loop a
    // streamed lakehouse table needs: micro-batch appends accumulate SMALL
    // FILES with no layout (each batch writes its own shard set — the
    // small-files problem), and a periodic compaction pass rewrites the
    // accumulated table clustered (zo2's layout) so downstream scans get
    // the min/max pruning the raw append stream never has. The stream is
    // real (readStream + maxFilesPerTrigger forces multiple micro-batches
    // through foreachBatch); the compaction is ZOrder.layoutWrite over the
    // accumulated table. Oracle = the full original selection: compaction
    // must be exactly lossless. File-count reduction and post-compaction
    // clustering are asserted in ZOrderSpec (st16 leg).
    "st16_stream_compaction" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = tmp("graft_st16")
      val li = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"))
      (0 until 3).foreach { i =>
        li.filter(pmod(col("l_orderkey"), lit(3)) === i)
          .repartition(4)
          .write.mode("append").parquet(s"$base/src")
      }
      val schema = s.read.parquet(s"$base/src").schema
      s.readStream.schema(schema).option("maxFilesPerTrigger", 4)
        .parquet(s"$base/src")
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.repartition(4).write.mode("append").parquet(s"$base/table")
        }
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      val acc = s.read.parquet(s"$base/table")
      val st = acc.agg(
        min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey"))).head
      val stats = Seq((st.getLong(0), st.getLong(1)), (st.getLong(2), st.getLong(3)))
      ZOrder.layoutWrite(acc, dims.map(col), stats, bits,
        s"$base/compacted", nFiles = 4, blockBytes = 64L << 10)
      s.read.parquet(s"$base/compacted")
    }))

  // the oracle's stats CTE mirrors the query's driver-side stats pass
  private val statsCte =
    """st AS (SELECT min(l_partkey) AS mn1, max(l_partkey) AS mx1,
      |min(l_suppkey) AS mn2, max(l_suppkey) AS mx2 FROM lineitem)""".stripMargin
  private val zSql = ZOrder.zValueSql(dims,
    Seq(("st.mn1", "st.mx1"), ("st.mn2", "st.mx2")), bits)

  val oracles: Map[String, String] = Map(
    "zo1_zvalue" ->
      s"""WITH $statsCte
         |SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
         |CAST($zSql AS BIGINT) AS zval FROM lineitem, st""".stripMargin,
    "zo2_zorder_layout" ->
      s"""WITH $statsCte
         |SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
         |CAST($zSql AS BIGINT) AS zval FROM lineitem, st
         |WHERE l_partkey BETWEEN 100 AND 400 AND l_suppkey BETWEEN 10 AND 40""".stripMargin,
    // st16: stream-append + compact must be exactly lossless
    "st16_stream_compaction" ->
      "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity FROM lineitem")
}

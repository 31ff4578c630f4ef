package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import graft.sources.Tables

/** Regression coverage for the two `events.parquet` ts encodings the fixture
  * has shipped (INT64 nanos read as LongType, and native timestamp[us]).
  * The loader must branch on the observed type; see `sources/Tables.scala`.
  */
class TablesSpec extends SparkSuite {

  test("events loader handles native timestamp fixture (live encoding)") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType === TimestampNTZType)
    assert(df.count() > 0)
    // ts must be usable in arithmetic — the r08 breakage was an analysis-time
    // DATATYPE_MISMATCH when timestamp_micros() was applied to a timestamp.
    val d = df.select(max(col("ts")).as("m")).collect()(0)
    assert(d.get(0) != null)
  }

  test("events loader handles legacy INT64-nanos encoding") {
    import spark.implicits._
    val dir = tmpDir()
    // 2024-01-02T03:04:05.123456789 as epoch nanos; loader truncates to micros.
    val nanos = 1704164645123456789L
    Seq((1L, nanos, "click"))
      .toDF("event_id", "ts", "etype")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampNTZType)
    val got = df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")).as[String].collect()(0)
    assert(got === "2024-01-02 03:04:05.123456")
  }
}

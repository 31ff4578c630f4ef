package graft

import graft.multimodal.Multimodal
import graft.schema.SchemaMapper
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SchemaMapper (§1.2 type table), sink partitioning (S9), DDL-ish lifecycle
  * (S7/S8), and the multimodal decode batch shape.
  */
class SchemaAndSinkSpec extends SparkSuite {
  import spark.implicits._

  test("Snowflake type names map per the reference table, parametrized types truncate") {
    assert(SchemaMapper.sparkType("VARCHAR(255)") == StringType)
    assert(SchemaMapper.sparkType("NUMBER(38,0)") == DecimalType(38, 9))
    assert(SchemaMapper.sparkType("text") == StringType)
    assert(SchemaMapper.sparkType("INT") == LongType)
    assert(SchemaMapper.sparkType("FLOAT") == DoubleType)
    assert(SchemaMapper.sparkType("BOOLEAN") == BooleanType)
    assert(SchemaMapper.sparkType("DATE") == DateType)
    assert(SchemaMapper.sparkType("TIMESTAMP_NTZ") == TimestampNTZType)
    assert(SchemaMapper.sparkType("TIMESTAMP_TZ") == TimestampType)
    assert(SchemaMapper.sparkType("GEOGRAPHY") == StringType) // unknown → STRING
  }

  test("introspect returns (column_name, data_type, ordinal) like information_schema") {
    val out = SchemaMapper.introspect(spark, "/root/testdata/sf0.001/nation.parquet")
      .as[(String, String, Long, Boolean)].collect()
    assert(out.map(_._1).toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(out.map(_._3).toSeq == Seq(1L, 2L, 3L))
  }

  test("castTo coerces ISO-string transport columns into the declared schema") {
    val raw = Seq(("2024-01-02", "12.50", "7")).toDF("d", "amt", "n")
    val schema = StructType(Seq(
      StructField("d", DateType), StructField("amt", DecimalType(18, 2)),
      StructField("n", LongType)))
    val out = SchemaMapper.castTo(raw, schema)
    assert(out.schema == schema)
    val r = out.head()
    assert(r.getDate(0).toString == "2024-01-02" && r.getLong(2) == 7L)
  }

  test("S9: date-partitioned sink prunes partitions on read") {
    val path = tmpDir() + "/partitioned"
    val li = sf("lineitem").withColumn("ship_date", col("l_shipdate").cast("date"))
    li.write.partitionBy("ship_date").parquet(path)
    val pruned = spark.read.parquet(path).filter(col("ship_date") === lit("1996-03-13").cast("date"))
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must appear as a partition filter, not a data filter
    assert(plan.contains("PartitionFilters") && plan.contains("ship_date"))
    assert(pruned.count() ==
      li.filter(col("ship_date") === lit("1996-03-13").cast("date")).count())
  }

  test("partition-scoped merge leaves untouched partitions byte-identical") {
    import graft.merge.{Dml, MergeInto}
    import java.sql.Date
    val path = tmpDir() + "/pmerge"
    val target = Seq(
      (1L, Date.valueOf("2024-01-01"), "a"),
      (2L, Date.valueOf("2024-01-02"), "b"),
      (3L, Date.valueOf("2024-01-03"), "c")).toDF("id", "d", "v")
    Dml.overwritePartitions(target, path, Seq("d"))
    def files(day: String): Set[(String, Long, Long)] =
      new java.io.File(s"$path/d=$day").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length, f.lastModified)).toSet
    val before01 = files("2024-01-01"); val before03 = files("2024-01-03")
    assert(before01.nonEmpty && before03.nonEmpty)

    // merge touches only the 2024-01-02 partition: one update + one insert
    val src = Seq(
      (2L, Date.valueOf("2024-01-02"), "b2"),
      (9L, Date.valueOf("2024-01-02"), "i")).toDF("id", "d", "v")
    MergeInto.mergePartitioned(spark, path, src, Seq("id", "d"), "d")

    // untouched partition directories: same file names, sizes, mtimes
    assert(files("2024-01-01") == before01 && files("2024-01-03") == before03)
    val out = spark.read.parquet(path)
    assert(out.count() == 4)
    assert(out.filter(col("id") === 2L).select("v").as[String].head() == "b2")
    assert(out.filter(col("d") === lit("2024-01-01").cast("date")).count() == 1)
  }

  test("partition-scoped merge detects an unpartitioned legacy target and converts it") {
    import graft.merge.MergeInto
    import java.sql.Date
    val path = tmpDir() + "/pmerge_legacy"
    // legacy layout: written UNPARTITIONED (root-level parquet files)
    val target = Seq(
      (1L, Date.valueOf("2024-01-01"), "a"),
      (2L, Date.valueOf("2024-01-02"), "b"),
      (3L, Date.valueOf("2024-01-03"), "c")).toDF("id", "d", "v")
    target.write.parquet(path)
    val src = Seq(
      (2L, Date.valueOf("2024-01-02"), "b2"),
      (9L, Date.valueOf("2024-01-02"), "i")).toDF("id", "d", "v")
    // dynamic overwrite on this layout would leave the root files in place
    // and double-count rows 1–3; the layout guard must full-rewrite instead
    MergeInto.mergePartitioned(spark, path, src, Seq("id", "d"), "d")
    val out = spark.read.parquet(path)
    assert(out.count() == 4)
    assert(out.filter(col("id") === 2L).select("v").as[String].head() == "b2")
    // and the target is now in partitioned layout, so the next merge prunes
    assert(new java.io.File(s"$path/d=2024-01-01").isDirectory)
    assert(!new java.io.File(path).listFiles().exists(f =>
      f.isFile && f.getName.endsWith(".parquet")))
  }

  test("S7/S8: temp-view staging lifecycle + create-if-not-exists semantics") {
    val df = sf("region")
    df.createOrReplaceTempView("staging_region")
    assert(spark.catalog.tableExists("staging_region"))
    assert(spark.sql("SELECT COUNT(*) c FROM staging_region").as[Long].head() == df.count())
    spark.catalog.dropTempView("staging_region")
    assert(!spark.catalog.tableExists("staging_region"))
  }

  test("multimodal resize + frame sampling: map-side batch shapes, deterministic") {
    val media = Multimodal.mediaTable(sf("documents"))
    val thumbs = Multimodal.resizeStub(spark, media, outBytes = 8).toDF()
    assert(thumbs.filter(col("thumb_bytes") =!= 8).count() == 0)
    assert(thumbs.count() == media.count())
    assert(thumbs.exceptAll(Multimodal.resizeStub(spark, media, outBytes = 8).toDF()).isEmpty)
    val frames = Multimodal.frameSampleStub(spark, media, frames = 4).toDF()
    val nVideo = media.filter(col("media_type") === "video").count()
    assert(frames.count() == nVideo * 4)
    assert(frames.groupBy("doc_id").count().filter(col("count") =!= 4).isEmpty)
    // no shuffle in the fan-out: plan has no Exchange
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("image codec: real PNG bytes round-trip through ImageIO decode and resize") {
    val imgs = Multimodal.imageTable(spark, sf("documents"))
    // payloads are genuine PNGs: magic bytes \x89PNG
    val firstBytes = imgs.limit(5).collect()
    assert(firstBytes.nonEmpty)
    firstBytes.foreach { r =>
      assert((r.payload(0) & 0xff) == 0x89 && r.payload(1) == 'P' &&
        r.payload(2) == 'N' && r.payload(3) == 'G')
      assert(r.n_bytes > 50) // a real encoded image, not a 16-byte stub hash
    }
    // decode recovers the generator's dimensions from the bytes alone
    val dec = Multimodal.decodeImage(spark, imgs).toDF()
    assert(dec.filter(col("width") =!= (lit(8) + pmod(col("doc_id"), lit(16)))).count() == 0)
    assert(dec.filter(col("height") =!= (lit(8) + pmod(col("doc_id"), lit(12)))).count() == 0)
    assert(dec.filter(col("channels") =!= 3).count() == 0)
    // resize halves both dimensions and re-encodes a valid, smaller PNG
    val th = Multimodal.resizeImage(spark, imgs).toDF()
    assert(th.filter(col("thumb_width") =!= (col("width") / 2).cast("int")).count() == 0)
    assert(th.filter(col("thumb_height") =!= (col("height") / 2).cast("int")).count() == 0)
    val one = Multimodal.resizeImage(spark, imgs).head()
    val reDecoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(one.thumb))
    assert(reDecoded.getWidth == one.thumb_width && reDecoded.getHeight == one.thumb_height)
    // decode + resize are map-side: no Exchange in either plan
    assert(!dec.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(!th.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("multimodal decode: batch shape is per-partition, features deterministic") {
    val media = Multimodal.mediaTable(sf("documents"))
    val feats = Multimodal.decodeStub(spark, media)
    val twice = Multimodal.decodeStub(spark, media)
    assert(feats.toDF().exceptAll(twice.toDF()).isEmpty)
    val f = feats.toDF()
    assert(f.filter(col("n_bytes") =!= 16).count() == 0) // md5 payloads: 16 bytes
    assert(f.select("media_type").distinct().count() == 3)
    assert(f.filter(size(col("feat")) =!= 8).count() == 0)
  }

  test("events fixture: nanos timestamps surface as microsecond TIMESTAMP_NTZ") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampNTZType)
    assert(ev.select(min(col("ts")).cast("string")).head().getString(0).startsWith("2024-01-01"))
  }
}

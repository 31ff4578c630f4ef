package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off profiler for the DV read tax (not part of the library). */
object DvProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- DSv2 planning cost vs accumulated victim count (round 19):
    // partitions carry sidecar PATHS, so planning must stay FLAT as the
    // victim count grows 100x — the driver never materializes a position.
    {
      def planSec(root: String): Double = {
        def once(): Double = {
          val t0 = System.nanoTime()
          val df = spark.read
            .format(classOf[graft.streaming.VersionedStreamSource].getName)
            .option("path", root).load()
          val n = df.queryExecution.toRdd.partitions.length
          require(n > 0)
          (System.nanoTime() - t0) / 1e9
        }
        once(); (1 to 5).map(_ => once()).sorted.apply(2)
      }
      def mk(victims: Long): String = {
        val root = java.nio.file.Files.createTempDirectory("dvplan").toString + "/t"
        graft.merge.Versioned.appendWithStats(
          spark.range(1, 1000001).select(col("id").as("k"), (col("id") * 2).as("v"))
            .repartitionByRange(16, col("k")), root, "k")
        graft.merge.Versioned.deleteWhereDV(spark, root, col("k") <= victims)
        root
      }
      val small = planSec(mk(1000L))
      val large = planSec(mk(100000L))
      println(f"[dvprof] plan_1k_victims ${small}%.4f s  plan_100k_victims ${large}%.4f s  " +
        f"ratio ${large / small}%.2f (flat = executor-side DV application)")
    }

    val dir = "/tmp/graft_scale_30x"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir))) {
      println(s"[dvprof] $dir absent; skipping read-tax section")
      spark.stop(); return
    }
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val root = java.nio.file.Files.createTempDirectory("dvprof").toString + "/t"
    graft.merge.Versioned.appendWithStats(
      o.repartitionByRange(16, col("o_orderkey")), root, Seq("o_orderkey"))
    val kst = o.agg(min(col("o_orderkey")), max(col("o_orderkey"))).head
    val wlo = kst.getLong(1) - (kst.getLong(1) - kst.getLong(0)) / 16
    graft.merge.Versioned.deleteWhereDV(spark, root,
      col("o_orderkey") >= wlo && pmod(col("o_orderkey"), lit(16)) === 0)
    def med(f: => Unit): Double = {
      f; (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val v = graft.merge.Versioned.currentVersion(root).get
    val paths = v.files.map(f => java.nio.file.Paths.get(root).resolve(f).toString)
    val plain = med(noop(spark.read.parquet(paths: _*)))
    val withMeta = med(noop(spark.read.parquet(paths: _*)
      .select(col("*"), col("_metadata.row_index").as("p"))))
    val withKey = med(noop(spark.read.parquet(paths: _*)
      .select(col("*"),
        regexp_extract(col("_metadata.file_path"), "([^/]+/[^/]+)$", 1).as("k"),
        col("_metadata.row_index").as("p"))))
    val withSub = med(noop(spark.read.parquet(paths: _*)
      .select(col("*"),
        substring_index(col("_metadata.file_path"), "/", -2).as("k"),
        col("_metadata.row_index").as("p"))))
    val full = med(noop(graft.merge.Versioned.read(spark, root)))
    println(f"[dvprof] plain $plain%.2f  +row_index $withMeta%.2f  " +
      f"+regex_key $withKey%.2f  +subidx_key $withSub%.2f  dv_read $full%.2f")
    spark.stop()
  }
}

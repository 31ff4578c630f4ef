package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement-adjudication harness (not library surface): run ONE
  * registered query at SEVERAL corpus points, interleaved rep-by-rep so
  * every point shares the same ambient-noise window, bracketed by the
  * Bench calibration probe so "was the host quiet" is data, not memory.
  * Exists for the r17 brief items: pinning down single-shot scale-leg
  * numbers (v5's 100x point, w9's zipf ratio) that moved round-over-round
  * on unchanged code.
  *
  * usage: runMain graft.tools.QuietReps <query> <reps> <label=dir>[,<label=dir>...]
  */
object QuietReps {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args(1).toInt
    val dirs: Seq[(String, String)] = args(2).split(",").toSeq
      .map(_.split("=", 2)).map(a => (a(0), a(1)))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def isolate(): Unit = {
      graft.ops.PinnedCaches.release(blocking = true)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }

    // Bench's ambient-noise calibration probe, verbatim shape (Bench.scala):
    // same ~20M-row parquet round-trip + hash exchange, median-of-3
    def calProbe(tag: String): Unit = {
      val dir = java.nio.file.Files.createTempDirectory("graft_cal").toString
      def pass(): Double = {
        val t0 = System.nanoTime()
        spark.range(0L, 20000000L, 1L, 32)
          .select(col("id"), pmod(col("id") * 2654435761L, lit(1000000L)).as("k"),
            (col("id") % 97).cast("double").as("v"))
          .write.mode("overwrite").parquet(s"$dir/probe")
        spark.read.parquet(s"$dir/probe")
          .repartition(col("k")).groupBy("k")
          .agg(sum("v").as("sv"), count(lit(1)).as("c"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      pass()
      val runs = (1 to 3).map(_ => pass())
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      isolate()
      println(f"[cal-$tag] ${runs.map(r => f"$r%.2f").mkString(", ")} " +
        f"(median ${runs.sorted.apply(1)}%.2f)")
    }

    val fn = graft.SparkEntry.queries(name)
    def once(dir: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      isolate()
      dt
    }

    calProbe("pre")
    // one untimed warm-up per point (JIT + page cache, Bench's policy)
    dirs.foreach { case (lbl, d) =>
      val w = once(d); println(f"[warm] $lbl $w%.2f s (untimed)")
    }
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { r =>
      dirs.foreach { case (lbl, d) => // interleave: shared noise window
        val dt = once(d)
        times(lbl) = times(lbl) :+ dt
        println(f"[rep $r] $lbl $dt%.2f s")
      }
    }
    calProbe("post")
    dirs.foreach { case (lbl, _) =>
      val xs = times(lbl).sorted
      println(f"[median] $name $lbl ${xs(xs.length / 2)}%.2f s " +
        f"(min ${xs.head}%.2f max ${xs.last}%.2f)")
    }
    val meds = dirs.map { case (lbl, _) =>
      lbl -> times(lbl).sorted.apply(times(lbl).length / 2) }
    if (meds.length == 2)
      println(f"[ratio] ${meds(1)._1}/${meds(0)._1} = ${meds(1)._2 / meds(0)._2}%.2f")
    spark.stop()
  }
}

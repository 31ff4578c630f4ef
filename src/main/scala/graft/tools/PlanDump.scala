package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch tool: write `.explain("formatted")` of registered queries to
  * files — the plans/r<n>/<query>_<tag>.txt evidence an optimization round
  * commits. One JVM for the whole list. Not part of the library surface.
  *
  * usage: runMain graft.tools.PlanDump <outDir> <tag> <query>[,<query>...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // the formatted EXPLAIN string, exactly what .explain("formatted") prints
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), txt)
      System.err.println(s"[plandump] wrote $outDir/${name}_$tag.txt")
      // plan-construction side effects (eager checkpoints, pinned caches)
      // must not leak across queries
      graft.ops.PinnedCaches.release(blocking = true)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}

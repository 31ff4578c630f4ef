package graft

import graft.ops.{Exact, IncrementalAgg}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental aggregate maintenance: fold ≡ full recompute at any depth,
  * and serving never re-reads the base fact (the artifact economics).
  */
class IncrementalAggSpec extends SparkSuite {

  private val keys = Seq("g")
  private def sums = Seq("v_cents" -> Exact.cents(col("v")))

  test("serve(partials(base), inc) equals the from-scratch aggregate") {
    import spark.implicits._
    val base = Seq(("a", 1.25), ("a", 2.50), ("b", 0.75)).toDF("g", "v")
    val inc = Seq(("a", 0.25), ("c", 9.00)).toDF("g", "v")
    val path = Files.createTempDirectory("graft_x13_spec").toString + "/p"
    IncrementalAgg.writePartials(base, keys, sums, path)
    val served = IncrementalAgg.serveWithIncrement(spark, path, inc, keys, sums)
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val full = IncrementalAgg.partials(base.unionByName(inc), keys, sums)
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(served.toSeq === full.toSeq)
    assert(served.toSeq === Seq(("a", 3L, 400L), ("b", 1L, 75L), ("c", 1L, 900L)))
  }

  test("folds compose: two artifact updates equal one big recompute") {
    import spark.implicits._
    val b0 = Seq(("a", 1.00)).toDF("g", "v")
    val b1 = Seq(("a", 2.00), ("b", 1.00)).toDF("g", "v")
    val b2 = Seq(("b", 0.50), ("c", 4.00)).toDF("g", "v")
    val path = Files.createTempDirectory("graft_x13_fold").toString + "/p"
    IncrementalAgg.writePartials(b0, keys, sums, path)
    IncrementalAgg.foldIntoPartials(spark, path, b1, keys, sums)
    IncrementalAgg.foldIntoPartials(spark, path, b2, keys, sums)
    val artifact = spark.read.parquet(path)
      .orderBy("g").collect().map(r =>
        (r.getAs[String]("g"), r.getAs[Long]("n_rows"), r.getAs[Long]("v_cents")))
    val full = IncrementalAgg.partials(b0.unionByName(b1).unionByName(b2), keys, sums)
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(artifact.toSeq === full.toSeq)
  }

  test("serving scans only the artifact and the increment — never the base files") {
    import spark.implicits._
    val baseDir = Files.createTempDirectory("graft_x13_base").toString + "/b"
    Seq(("a", 1.00), ("b", 2.00)).toDF("g", "v").write.parquet(baseDir)
    val base = spark.read.parquet(baseDir)
    val inc = Seq(("a", 0.50)).toDF("g", "v")
    val path = Files.createTempDirectory("graft_x13_plan").toString + "/p"
    IncrementalAgg.writePartials(base, keys, sums, path)
    val served = IncrementalAgg.serveWithIncrement(spark, path, inc, keys, sums)
    assert(served.inputFiles.forall(!_.contains("graft_x13_base")))
    assert(served.inputFiles.exists(_.contains("graft_x13_plan")))
  }
}

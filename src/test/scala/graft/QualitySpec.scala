package graft

import graft.quality.{AnomalyDetection, QualityChecks}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Quality agent + ML anomaly scoring behavior. */
class QualitySpec extends SparkSuite {
  import spark.implicits._

  test("quality checks flag row-floor, null-rate, dup-rate and freshness breaches") {
    val good = Seq.tabulate(50)(i => (i.toLong, s"v$i", "2024-01-30"))
      .toDF("k", "v", "d").withColumn("d", col("d").cast("date"))
    val dirty = (Seq.tabulate(10)(i => (i.toLong, null: String, "2023-06-01")) ++
      Seq.tabulate(10)(i => (i.toLong, s"v$i", "2023-06-01")))
      .toDF("k", "v", "d").withColumn("d", col("d").cast("date"))
    val report = QualityChecks.run(Seq(
      QualityChecks.TableCheck("good", good, Seq("k"), Some("d"), "v",
        QualityChecks.Thresholds(minRows = 10, maxAgeHours = 48)),
      QualityChecks.TableCheck("dirty", dirty, Seq("k"), Some("d"), "v",
        QualityChecks.Thresholds(minRows = 100, maxAgeHours = 24))),
      asOf = lit("2024-01-31").cast("date"))
    val rows = report.collect().map(r => r.getString(0) -> r).toMap
    assert(rows("good").getAs[Boolean]("all_ok"))
    val d = rows("dirty")
    assert(!d.getAs[Boolean]("row_floor_ok")) // 20 < 100
    assert(!d.getAs[Boolean]("null_rate_ok")) // 50% nulls
    assert(!d.getAs[Boolean]("dup_rate_ok")) // duplicated keys
    assert(!d.getAs[Boolean]("freshness_ok")) // stale by months
  }

  test("fallback coverage splits FALLBACK_ONLY vs COVERED") {
    val primary = Seq((1, "a"), (2, "a")).toDF("k", "u")
    val fallback = Seq((1, "a"), (2, "a"), (3, "a")).toDF("k", "u")
    val out = QualityChecks.fallbackCoverage(primary, fallback, Seq("k", "u"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "FALLBACK_ONLY", 2L -> "COVERED"))
  }

  test("anomaly scoring flags the contaminated fraction, planted outlier first") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val daily = AnomalyDetection.dailyFeatures(ev)
    // plant an extreme day
    val outlier = Seq(("2024-03-01", 50000.0, 9000.0, 1e7, 90.0, 24.0))
      .toDF("event_date", "event_cnt", "active_users", "total_value", "error_pct", "active_hours")
      .withColumn("event_date", col("event_date").cast("date"))
    val scored = AnomalyDetection.score(daily.unionByName(outlier), k = 3, contamination = 0.1)
    val n = scored.count()
    val flagged = scored.filter(col("is_anomaly")).count()
    assert(flagged == math.max(1L, math.round(n * 0.1)))
    val top = scored.orderBy(col("anomaly_score").desc).select("event_date").head().getDate(0)
    assert(top.toString == "2024-03-01")
  }
}

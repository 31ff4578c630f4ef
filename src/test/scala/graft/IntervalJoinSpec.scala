package graft

import graft.ops.IntervalJoin
import java.sql.Date
import org.apache.spark.sql.functions._

/** j16: bucketized point-in-interval join — containment semantics, no
  * duplicate matches, equivalence with the naive theta join, and the
  * equi-join plan shape.
  */
class IntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("containment is inclusive on both ends; outside points match nothing") {
    val pts = Seq((1L, d("2024-01-05")), (2L, d("2024-01-11")),
      (3L, d("2024-01-12")), (4L, d("2023-12-31"))).toDF("id", "pt")
    val iv = Seq((10L, d("2024-01-05"), d("2024-01-11"))).toDF("iv_id", "s", "e")
    val out = IntervalJoin.pointInInterval(pts, "pt", iv, "s", "e", bucketDays = 7)
      .select("id", "iv_id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (2L, 10L))) // 5th and 11th in; 12th and Dec out
  }

  test("a long interval spanning many buckets still matches each point once") {
    val pts = Seq((1L, d("2024-02-15"))).toDF("id", "pt")
    val iv = Seq((10L, d("2024-01-01"), d("2024-03-31"))).toDF("iv_id", "s", "e")
    val out = IntervalJoin.pointInInterval(pts, "pt", iv, "s", "e", bucketDays = 7)
    assert(out.count() === 1L) // interval explodes to ~13 buckets, 1 match
  }

  test("bucketized equals the naive theta join on real events x windows") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("ts").cast("date").as("d"))
    val win = spark.range(12).select(col("id").as("window_id"),
        date_add(to_date(lit("2024-01-01")), (col("id") * 3).cast("int")).as("w_start"))
      .withColumn("w_end", date_add(col("w_start"), 6))
    val fast = IntervalJoin.pointInInterval(ev, "d", win, "w_start", "w_end", 7)
      .select("event_id", "window_id")
    val naive = ev.join(win,
        col("d") >= col("w_start") && col("d") <= col("w_end"))
      .select("event_id", "window_id")
    assert(fast.count() > 0)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("the plan is an equi hash join on the bucket — no nested-loop product") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts").cast("date").as("d"))
    val iv = Seq((10L, d("2024-01-01"), d("2024-01-31"))).toDF("iv_id", "s", "e")
    val out = IntervalJoin.pointInInterval(ev, "d", iv, "s", "e", 7)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("HashJoin"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      plan.take(600))
  }
}

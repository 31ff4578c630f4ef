package graft

import graft.ops.AsofJoin
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** j15: as-of join — point-in-time lookup semantics (latest right ≤ left
  * per key), tie handling, no-match nulls, and equivalence with the naive
  * range-join formulation on the events fixture.
  */
class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("each left row gets the latest right row at-or-before it, per key") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00"), 5.0),
      (2L, "u1", ts("2024-01-01 12:00:00"), 6.0),
      (3L, "u2", ts("2024-01-01 11:00:00"), 7.0),
      (4L, "u3", ts("2024-01-01 09:00:00"), 8.0)) // u3 has no right rows
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (101L, "u1", ts("2024-01-01 09:30:00"), 1.0),
      (102L, "u1", ts("2024-01-01 11:59:00"), 2.0),
      (103L, "u1", ts("2024-01-01 13:00:00"), 3.0), // after every left row
      (104L, "u2", ts("2024-01-01 11:00:00"), 4.0)) // exactly at left ts
      .toDF("event_id", "user_id", "ts", "value")
    val out = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "ts",
        Seq("event_id", "value"))
      .select("event_id", "asof_event_id", "asof_value")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.get(2))))).toMap
    assert(out(1L) === ((Some(101L), Some(1.0))))
    assert(out(2L) === ((Some(102L), Some(2.0)))) // latest prior, not just any
    assert(out(3L) === ((Some(104L), Some(4.0)))) // same-instant right matches
    assert(out(4L) === ((None, None)))            // no prior -> nulls
  }

  test("a matched right row's NULL payload stays NULL — attach is row-atomic, no stale carry") {
    val left = Seq((1L, "u", ts("2024-01-01 12:00:00"), 0.0))
      .toDF("event_id", "user_id", "ts", "value")
    // the LATEST right row (event 8) legitimately carries a NULL value; a
    // per-column ignoreNulls carry would smuggle 1.0 in from event 7 and
    // emit the impossible row (asof_event_id=8, asof_value=1.0)
    val right = Seq(
      (7L, "u", ts("2024-01-01 09:00:00"), Some(1.0)),
      (8L, "u", ts("2024-01-01 11:00:00"), None: Option[Double]))
      .toDF("event_id", "user_id", "ts", "value")
    val out = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("event_id", "value")).select("asof_event_id", "asof_value").collect().head
    assert(out.getLong(0) === 8L)
    assert(out.isNullAt(1), s"expected NULL asof_value, got ${out.get(1)}")
  }

  test("same-instant right duplicates resolve to the max tie-break row") {
    val left = Seq((1L, "u", ts("2024-01-01 10:00:00"), 0.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (7L, "u", ts("2024-01-01 09:00:00"), 1.0),
      (9L, "u", ts("2024-01-01 09:00:00"), 2.0),
      (8L, "u", ts("2024-01-01 09:00:00"), 3.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("event_id", "value"), tieBreak = Some("event_id"))
      .select("asof_event_id").collect().head
    assert(out.getLong(0) === 9L)
  }

  test("the as-of join compiles to union+window: no join operator, key-only shuffles") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val out = AsofJoin.asofJoin(clicks, views, Seq("user_id"), "ts", "ts",
      Seq("event_id", "value"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // no pair-materializing operator anywhere — the "join" is union+window
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"), plan.take(800))
    // every exchange hash-partitions on the key (one per union branch; each
    // row crosses the wire exactly once)
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toVector
    assert(exchanges.nonEmpty && exchanges.forall(_.contains("hashpartitioning(user_id")),
      exchanges.mkString("\n"))
  }

  test("property: union-tag equals the naive range join on random keyed series") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small key/time domains force heavy collisions: same-instant matches,
    // multiple rights per left, keys with no rights at all; ~1/4 of right
    // payload values are NULL so row-atomic attach (a matched row's NULL must
    // not be papered over by a stale earlier value) is exercised too
    val genSide = Gen.listOfN(25, for {
      key <- Gen.choose(0, 3); t <- Gen.choose(0, 9)
      v <- Gen.frequency(3 -> Gen.choose(0, 99).map(x => Some(x): Option[Int]),
        1 -> Gen.const(None: Option[Int]))
    } yield (key, t, v))
    val p = Prop.forAll(genSide, genSide) { (l, r) =>
      val left = l.zipWithIndex
        .map { case ((k, t, v), i) => (i.toLong, k, t.toLong, v.map(_.toDouble)) }
        .toDF("event_id", "user_id", "ts", "value")
      val right = r.zipWithIndex
        .map { case ((k, t, v), i) => (1000L + i, k, t.toLong, v.map(_.toDouble)) }
        .toDF("event_id", "user_id", "ts", "value")
      val fast = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "ts",
          Seq("event_id", "value"), tieBreak = Some("event_id"))
        .select(col("event_id"), col("asof_event_id"), col("asof_value"))
      val naive = left.as("l")
        .join(right.as("r"),
          col("l.user_id") === col("r.user_id") && col("l.ts") >= col("r.ts"), "left")
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("l.event_id"))
            .orderBy(col("r.ts").desc_nulls_last, col("r.event_id").desc_nulls_last)))
        .filter(col("__rn") === 1)
        .select(col("l.event_id"), col("r.event_id").as("asof_event_id"),
          col("r.value").as("asof_value"))
      fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  test("union-tag result equals the naive range-join formulation on real events") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val fast = AsofJoin.asofJoin(clicks, views, Seq("user_id"), "ts", "ts",
        Seq("event_id", "value"), tieBreak = Some("event_id"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("asof_event_id"), col("asof_value"))
    // naive: range join, then keep the latest (ties: max event_id)
    val naive = clicks.as("l")
      .join(views.as("r"),
        col("l.user_id") === col("r.user_id") && col("l.ts") >= col("r.ts"), "left")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l.event_id"))
          .orderBy(col("r.ts").desc_nulls_last, col("r.event_id").desc_nulls_last)))
      .filter(col("__rn") === 1)
      .select(col("l.event_id"), col("l.user_id"), col("l.ts"), col("l.value"),
        col("r.event_id").as("asof_event_id"), col("r.value").as("asof_value"))
    assert(fast.count() === clicks.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    // and some rows actually matched
    assert(fast.filter(col("asof_event_id").isNotNull).count() > 0)
  }
}

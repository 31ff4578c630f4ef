package graft

import graft.ops.{Core, Exact}
import org.apache.spark.sql.functions._

/** Core primitive semantics — esp. the latest-snapshot tie divergence the
  * reference itself carries (correlated-max keeps ties, row_number keeps
  * one; SURVEY §4.2.3).
  */
class CoreOpsSpec extends SparkSuite {
  import spark.implicits._

  private val snaps = Seq(
    (1, "2024-01-01", "a"), (1, "2024-01-02", "b"), (1, "2024-01-02", "c"),
    (2, "2024-03-05", "d")).toDF("id", "d", "v")
    .withColumn("d", col("d").cast("date"))

  test("latestSnapshot keepTies=true keeps all rows tied at the max date") {
    val out = Core.latestSnapshot(snaps, Seq("id"), "d", keepTies = true)
      .select("v").as[String].collect().toSet
    assert(out === Set("b", "c", "d"))
  }

  test("latestSnapshot keepTies=false keeps exactly one row per key") {
    val out = Core.latestSnapshot(snaps, Seq("id"), "d", keepTies = false,
      tieBreak = Seq(col("v")))
      .select("v").as[String].collect().toSet
    assert(out === Set("b", "d")) // tie broken by v ascending
  }

  test("dedupByKey keeps the first row under the given total order") {
    val df = Seq((1, 2, "x"), (1, 5, "y"), (2, 1, "z")).toDF("k", "seq", "v")
    val out = Core.dedupByKey(df, Seq("k"), Seq(col("seq").desc))
      .select("v").as[String].collect().toSet
    assert(out === Set("y", "z"))
  }

  test("safeDivide: null on zero or null denominator") {
    val df = Seq((10.0, 2.0), (1.0, 0.0)).toDF("n", "d")
      .select(Core.safeDivide(col("n"), col("d")).as("q"))
    assert(df.as[Option[Double]].collect().toSet === Set(Some(5.0), None))
  }

  test("stringAggOrdered orders by a different column") {
    val df = Seq((1, "b", 3), (1, "a", 1), (1, "c", 2)).toDF("g", "v", "o")
    val out = df.groupBy("g").agg(Core.stringAggOrdered(col("v"), col("o"), ",").as("s"))
      .select("s").as[String].head()
    assert(out === "a,c,b")
  }

  test("monthlyPivotCols produces 12 exact per-month sums") {
    val df = Seq(("2024-01-15", 1.5), ("2024-01-20", 2.5), ("2024-12-31", 4.0), ("2023-01-01", 9.0))
      .toDF("d", "v").withColumn("d", col("d").cast("date"))
    val cols = Core.monthlyPivotCols(col("d"), col("v"), 2024, "m")
    val row = df.agg(cols.head, cols.tail: _*).head()
    assert(row.getDouble(0) === 4.0)   // m_01
    assert(row.getDouble(11) === 4.0)  // m_12
    assert((1 to 10).forall(i => row.getDouble(i) === 0.0))
  }

  test("toleranceCompare labels MATCH/MISMATCH/MISSING correctly") {
    val l = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "v")
    val r = Seq((1, 10.005), (2, 25.0), (4, 40.0)).toDF("k", "v")
    val out = Core.toleranceCompare(l, r, Seq("k"), Seq("v"), 0.01)
      .select("k", "compare_status").as[(Int, String)].collect().toMap
    assert(out === Map(1 -> "MATCH", 2 -> "MISMATCH", 3 -> "MISSING_RIGHT", 4 -> "MISSING_LEFT"))
  }

  test("exact decimal sums are order-independent (repartition invariance)") {
    val df = sf("lineitem")
    val a = df.agg(Exact.sum2(col("l_extendedprice"))).head().getDouble(0)
    val b = df.repartition(7).agg(Exact.sum2(col("l_extendedprice"))).head().getDouble(0)
    val c = df.coalesce(1).agg(Exact.sum2(col("l_extendedprice"))).head().getDouble(0)
    assert(a == b && b == c)
  }

  test("x8 funnel: step order is strict — a click BEFORE the first view does not count") {
    val rows = Seq(
      // user 1: full ordered funnel -> stage 3
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      // user 2: click precedes the first view -> stage stops at 1
      (2L, "click", "2024-01-01 09:00:00"), (2L, "view", "2024-01-01 10:00:00"),
      // user 3: view then click, purchase before the click -> stage 2
      (3L, "view", "2024-01-01 08:00:00"), (3L, "purchase", "2024-01-01 08:30:00"),
      (3L, "click", "2024-01-01 09:00:00"),
      // user 4: never viewed -> not in the funnel at all
      (4L, "purchase", "2024-01-01 07:00:00"))
      .toDF("user_id", "event_type", "ts_s")
      .select(col("user_id"), col("event_type"),
        col("ts_s").cast("timestamp_ntz").as("ts"))
    val dir = tmpDir()
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.AggQueries.defs("x8_funnel")(spark, dir)
      .select("user_id", "stage").as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 3, 2L -> 1, 3L -> 2))
  }
}

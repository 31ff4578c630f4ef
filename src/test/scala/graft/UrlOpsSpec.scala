package graft

import graft.text.UrlOps
import org.apache.spark.sql.functions._

/** URL parsing + blocklist semantics on handcrafted cases. */
class UrlOpsSpec extends SparkSuite {
  import spark.implicits._

  test("host and registrable domain extract correctly across URL shapes") {
    val cases = Seq(
      ("https://cdn.example-a.org/docs/1?x=1", "cdn.example-a.org", "example-a.org"),
      ("http://example-b.net/path", "example-b.net", "example-b.net"),
      ("https://a.b.c.example-c.io?q=2", "a.b.c.example-c.io", "example-c.io"),
      ("https://single/nopath", "single", ""),
      ("ftp://deep.example-d.org#frag", "deep.example-d.org", "example-d.org"))
      .toDF("url", "want_host", "want_dom")
    val got = cases.select(col("url"), col("want_host"), col("want_dom"),
      UrlOps.host(col("url")).as("host"))
      .withColumn("dom", UrlOps.registrableDomain(col("host")))
    assert(got.filter(col("host") =!= col("want_host")).isEmpty)
    assert(got.filter(col("dom") =!= col("want_dom")).isEmpty)
  }

  test("blocklist flags exactly the listed domains") {
    val df = Seq("bad.org", "good.org", "worse.net").toDF("domain")
    val out = df.withColumn("b", UrlOps.isBlocked(col("domain"), Seq("bad.org", "worse.net")))
    assert(out.filter(col("b")).count() === 2)
    assert(out.filter(col("domain") === "good.org" && col("b")).isEmpty)
  }

  test("m9 SCD2 history: contiguous intervals, sequential versions, one current row per user") {
    val out = graft.queries.DmlQueries.defs("m9_scd2_history")(
      spark, "/root/testdata/sf0.001").cache()
    // exactly one open (is_current) interval per user
    val perUser = out.groupBy(col("user_id")).agg(
      sum(when(col("is_current"), 1L).otherwise(0L)).as("n_open"),
      max(col("version")).as("maxv"), count(lit(1)).as("n_runs"),
      sum(col("n_events")).as("n_events_total"))
    assert(perUser.filter(col("n_open") =!= 1).isEmpty)
    // versions are 1..n_runs with no gaps
    assert(perUser.filter(col("maxv") =!= col("n_runs")).isEmpty)
    // intervals tile: valid_to equals the next version's valid_from
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("version"))
    val tiled = out.withColumn("nx", lead(col("valid_from"), 1).over(w))
      .filter(coalesce(col("valid_to") =!= col("nx"),
        col("valid_to").isNotNull =!= col("nx").isNotNull))
    assert(tiled.isEmpty)
    // consecutive runs never share a state (else they'd be one run)
    val same = out.withColumn("pv", lag(col("state"), 1).over(w))
      .filter(col("pv").isNotNull && col("pv") === col("state"))
    assert(same.isEmpty)
    // run event counts partition each user's events
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_ev"))
    assert(perUser.join(ev, Seq("user_id"))
      .filter(col("n_events_total") =!= col("n_ev")).isEmpty)
    out.unpersist()
  }
}

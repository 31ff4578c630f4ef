package graft

import graft.text.LineDedup
import org.apache.spark.sql.functions._

/** tx10: cross-document line dedup — keep-first semantics, order
  * preservation, scope isolation, and the all-lines-dropped edge.
  */
class LineDedupSpec extends SparkSuite {
  import spark.implicits._

  private val delim = "\n"

  test("a boilerplate line survives only in the first document") {
    val docs = Seq(
      (1L, "s", "cookie banner\nunique one"),
      (2L, "s", "cookie banner\nunique two"),
      (3L, "s", "unique three\ncookie banner")).toDF("doc_id", "source", "text")
    val out = LineDedup.dropDuplicateLines(docs, "doc_id", "text", Seq("source"))
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === (("cookie banner\nunique one", 2L, 0L)))
    assert(out(2L) === (("unique two", 1L, 1L)))
    assert(out(3L) === (("unique three", 1L, 1L)))
  }

  test("surviving lines keep their original order") {
    val docs = Seq(
      (1L, "s", "dup"),
      (2L, "s", "zz last\ndup\naa first")).toDF("doc_id", "source", "text")
    val out = LineDedup.dropDuplicateLines(docs, "doc_id", "text", Seq("source"))
      .filter(col("doc_id") === 2L).collect().head
    assert(out.getString(2) === "zz last\naa first") // positional, not sorted
  }

  test("the same line in two scopes survives in both; one scope dedups") {
    val docs = Seq(
      (1L, "a", "shared"),
      (2L, "b", "shared"),
      (3L, "a", "shared")).toDF("doc_id", "source", "text")
    val out = LineDedup.dropDuplicateLines(docs, "doc_id", "text", Seq("source"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("a document whose every line is boilerplate rebuilds to empty text") {
    val docs = Seq(
      (1L, "s", "x\ny"),
      (2L, "s", "x\ny")).toDF("doc_id", "source", "text")
    val out = LineDedup.dropDuplicateLines(docs, "doc_id", "text", Seq("source"))
      .filter(col("doc_id") === 2L).collect().head
    assert(out.getString(2) === "")
    assert(out.getLong(3) === 0L && out.getLong(4) === 2L)
  }

  test("corpus query shape: every doc keeps its body; 24 of 25 headers drop per source") {
    val docs = sf("documents")
      .withColumn("text", concat(lit("HEADER for "), col("source"), lit("\n"), col("text")))
    val out = LineDedup.dropDuplicateLines(docs, "doc_id", "text", Seq("source"))
    assert(out.count() === docs.count())
    val perSource = out.groupBy(col("source"))
      .agg(sum(col("lines_dropped")).as("d"), count(lit(1)).as("n")).collect()
    perSource.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) - 1, s"source ${r.getString(0)}")
    }
  }
}

package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

/** tx11: overlapping token-window chunking — coverage, overlap width,
  * short-doc and exact-fit edges.
  */
class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  test("windows advance by stride and overlap by winLen - stride") {
    // 10 tokens, winLen 4, stride 3 -> chunks at 0,3,6 -> last is full,
    // plus coverage of token 10 requires start 9? ceil((10-4)/3)=2 -> 3 chunks
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val out = TextOps.chunk(df, "doc_id", "text", winLen = 4, stride = 3)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getString(2)).toSeq === Seq(
      "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"))
    assert(out.map(_.getLong(3)).toSeq === Seq(4L, 4L, 4L))
  }

  test("a document shorter than one window yields exactly one full-doc chunk") {
    val df = Seq((1L, "a b"), (2L, "only")).toDF("doc_id", "text")
    val out = TextOps.chunk(df, "doc_id", "text", winLen = 16, stride = 12)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out === Map(1L -> ((0L, "a b")), 2L -> ((0L, "only"))))
  }

  test("the tail chunk runs short; every token is covered") {
    val df = Seq((1L, (0 until 23).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextOps.chunk(df, "doc_id", "text", winLen = 8, stride = 6)
      .orderBy("chunk_id").collect()
    // ceil((23-8)/6) = 3 -> 4 chunks, starts 0,6,12,18; last has 5 tokens
    assert(out.length === 4)
    assert(out.last.getString(2) === "w18 w19 w20 w21 w22")
    assert(out.last.getLong(3) === 5L)
    val covered = out.flatMap(_.getString(2).split(" ")).toSet
    assert(covered === (0 until 23).map(i => s"w$i").toSet)
  }

  test("an exact multiple of the window does not emit an empty tail") {
    // 8 tokens, winLen 8 -> mx = 0 -> exactly one chunk
    val df = Seq((1L, (0 until 8).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    assert(TextOps.chunk(df, "doc_id", "text", winLen = 8, stride = 6).count() === 1L)
  }
}

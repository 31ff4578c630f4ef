package graft

import graft.functions.GopherNgramStats
import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** tx7b: the fused Gopher n-gram statistics vs an independent naive
  * reference, plus closed-form fixtures for the top/dup semantics.
  */
class NgramStatsSpec extends SparkSuite {

  // naive reference: per n, build gram lists the obvious way
  private def ref(text: String): Map[String, Long] = {
    val words = text.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq
    val total = words.map(_.length.toLong).sum
    val out = scala.collection.mutable.Map("total_chars" -> total)
    for (n <- 2 to 10) {
      val grams = words.sliding(n).filter(_.length == n).toSeq
        .map(g => g.mkString(" ") -> g.map(_.length.toLong).sum)
      val byGram = grams.groupBy(_._1).map { case (g, occ) =>
        g -> (occ.length.toLong, occ.map(_._2).sum)
      }
      val v =
        if (n < 5) (0L +: byGram.values.map(_._2).toSeq).max
        else byGram.values.filter(_._1 >= 2).map(_._2).sum
      out(if (n < 5) s"top$n" else s"dup$n") = v
    }
    out.toMap
  }

  private def computed(text: String): Map[String, Long] = {
    val row = GopherNgramStats.compute(UTF8String.fromString(text))
    GopherNgramStats.fieldNames.zipWithIndex.map { case (f, i) => f -> row.getLong(i) }.toMap
  }

  test("closed-form fixtures") {
    // "a b a b a" : 2-grams = [a b, b a, a b, b a] -> top2 covers 2+2=4 chars
    val m = computed("a b a b a")
    assert(m("total_chars") === 5)
    assert(m("top2") === 4)
    assert(m("top3") === 6) // "a b a" twice x 3 chars
    assert(m("dup5") === 0) // only one 5-gram, not duplicated
    val rep = computed(("x y z w v u t s q r " * 3).trim) // 30 words, 10-word cycle
    assert(rep("dup10") > 0) // the repeated 10-gram is caught
    assert(computed("")("total_chars") === 0)
    assert(computed("one")("top2") === 0) // fewer words than n
  }

  test("fused pass equals the naive reference on corpus text") {
    val docs = sf("documents").select("text").collect().map(_.getString(0))
    assert(docs.nonEmpty)
    docs.foreach { t => assert(computed(t) === ref(t), s"mismatch on: ${t.take(60)}") }
  }

  test("ngramRepetitionFlags: ratios divide the exact longs; pass composes") {
    val df = TextOps.ngramRepetitionFlags(sf("documents"), "text")
    val row = df.select(col("doc_id"), col("top2_ratio"), col("ngram_pass"))
      .orderBy(col("doc_id")).limit(1).collect()(0)
    val t = sf("documents").orderBy(col("doc_id")).limit(1).collect()(0)
    val m = ref(t.getString(t.fieldIndex("text")))
    val expected = m("top2").toDouble / math.max(m("total_chars"), 1L).toDouble
    assert(row.getDouble(1) === expected)
    // flags agree with thresholds
    val all = df.collect()
    val idx = df.columns.zipWithIndex.toMap
    all.foreach { r =>
      val pass = TextOps.ngramThresholds.forall { case (f, th) =>
        r.getDouble(idx(s"${f}_ratio")) <= th }
      assert(r.getBoolean(idx("ngram_pass")) === pass)
    }
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram repetition statistics for the Gopher n-gram rules
  * (Rae et al. 2021 §A1.1, tx7b): the top-n-gram character fraction
  * (n = 2..4) and the duplicate-n-gram character fraction (n = 5..10).
  *
  * Returns INTEGER NUMERATORS plus the character total, never ratios: both
  * engines divide the same exact longs, so the fractions hash identically
  * cross-engine (the tx6 convention). Fields:
  *   - `total_chars`: Σ length(word) over whitespace words (no whitespace);
  *   - `top{2,3,4}`: max over n-grams of occurrences × n-gram word-char
  *     length (the characters covered by the most frequent n-gram,
  *     overlap-counted);
  *   - `dup{5..10}`: Σ over n-grams occurring ≥ 2× of occurrences ×
  *     word-char length (characters covered by any repeated n-gram,
  *     overlap-counted — an upper bound of the paper's marked-char sweep,
  *     the common open-source simplification).
  *
  * Why an Expression: the declarative form needs, per n, an
  * `array_distinct` × `filter` count — O(G²) string compares per row per n
  * (9 such passes) — or an explode plus two shuffled aggregations per n at
  * cluster scale. This computes all 9 statistics in ONE pass over the words
  * with per-n hash counters, map-side, no shuffle, no explode.
  */
case class GopherNgramStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherNgramStats.schema
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_ngram_stats expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    GopherNgramStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static singleton reference — nothing rides the serialized plan
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"graft.functions.GopherNgramStats$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "gopher_ngram_stats"
}

object GopherNgramStats {

  val fieldNames: Seq[String] =
    Seq("total_chars", "top2", "top3", "top4") ++ (5 to 10).map(n => s"dup$n")

  val schema: StructType =
    StructType(fieldNames.map(f => StructField(f, LongType, nullable = false)))

  // engine-portable whitespace class — see BpeMatcher.isWs for why vertical
  // tab (\u000B) is excluded
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** All 10 statistics in one pass over the words. Word splitting matches
    * the regex-\s+ contract of the whitespace tokenizer and the oracle.
    */
  def compute(utf8: UTF8String): InternalRow = {
    val text = utf8.toString
    val words = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val len = text.length
    while (i < len) {
      if (isWs(text.charAt(i))) i += 1
      else {
        var end = i
        while (end < len && !isWs(text.charAt(end))) end += 1
        words += text.substring(i, end)
        i = end
      }
    }
    val w = words.length
    // prefix char sums: gram char len = pre(s+n) - pre(s) — O(1) per gram
    val pre = new Array[Long](w + 1)
    var k = 0
    while (k < w) { pre(k + 1) = pre(k) + words(k).length; k += 1 }
    val out = new Array[Long](10)
    out(0) = pre(w)
    var n = 2
    while (n <= 10) {
      val slot = n - 1
      if (w >= n) {
        // per-gram cell: (occurrences, covered chars over all occurrences)
        val counts = new java.util.HashMap[String, Array[Long]]()
        val sb = new java.lang.StringBuilder()
        var s = 0
        while (s + n <= w) {
          sb.setLength(0)
          var j = s
          while (j < s + n) {
            if (j > s) sb.append(' ')
            sb.append(words(j)); j += 1
          }
          val g = sb.toString
          val covered = pre(s + n) - pre(s)
          val cell = counts.get(g)
          if (cell == null) counts.put(g, Array(1L, covered))
          else { cell(0) += 1L; cell(1) += covered }
          s += 1
        }
        var acc = 0L
        val it = counts.values().iterator()
        if (n < 5) { // top-n-gram: max covered
          while (it.hasNext) { val c = it.next(); if (c(1) > acc) acc = c(1) }
        } else { // duplicate-n-gram: Σ covered over grams with ≥ 2 hits
          while (it.hasNext) { val c = it.next(); if (c(0) >= 2L) acc += c(1) }
        }
        out(slot) = acc
      }
      n += 1
    }
    new GenericInternalRow(out.map(v => v: Any))
  }
}

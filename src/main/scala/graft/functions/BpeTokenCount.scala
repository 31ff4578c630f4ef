package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization against a merges vocab,
  * shared by the interpreted and codegen paths of [[BpeTokenCount]].
  *
  * Semantics (mirrored exactly by the tx3b DuckDB oracle's recursive CTE):
  * the text splits into words on ASCII whitespace runs; within a word the
  * cursor repeatedly consumes the LONGEST vocab token starting at the
  * cursor, or one codepoint when nothing matches; every consumption is one
  * token. Codepoint (not UTF-16-unit) fallback keeps counts identical to
  * engines that index strings by codepoint.
  *
  * The lookup set is `@transient lazy` — serialized plans carry only the
  * vocab array; each executor materializes its own hash set once.
  */
class BpeMatcher(val vocab: Array[String]) extends Serializable {
  private val maxLen: Int = if (vocab.isEmpty) 0 else vocab.iterator.map(_.length).max
  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add); s
  }

  // The explicit engine-portable whitespace class [\t\n\f\r ]: RE2 (DuckDB's
  // regexp engine) excludes vertical tab (\u000B) from \s while Java includes
  // it, so the split contract is pinned to the intersection rather than either
  // engine's \s. Must stay in lockstep with TextOps.tokens and the oracle's
  // regexp_split_to_array('\s+') (RE2 semantics).
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  def countTokens(utf8: UTF8String): Long = {
    val text = utf8.toString
    val n = text.length
    var i = 0
    var count = 0L
    while (i < n) {
      if (isWs(text.charAt(i))) i += 1
      else {
        var end = i
        while (end < n && !isWs(text.charAt(end))) end += 1
        var pos = i
        while (pos < end) {
          var step = 0
          var l = math.min(maxLen, end - pos)
          while (l >= 1 && step == 0) {
            if (set.contains(text.substring(pos, pos + l))) step = l
            l -= 1
          }
          if (step == 0) step = Character.charCount(text.codePointAt(pos))
          pos += step
          count += 1
        }
        i = end
      }
    }
    count
  }
}

/** Native token-count expression: `bpe_token_count(text)` — one fused
  * per-row loop over the text, no explode, no shuffle, scan-speed at 100 TB
  * (tx3b; same design rationale as [[MinHashSignature]]). The declarative
  * alternative (fold over positions with `aggregate` + an `array_contains`
  * per candidate length) runs an O(|vocab|) array scan per character; this
  * expression does ≤ maxTokenLen hash probes per consumed token.
  */
case class BpeTokenCount(child: Expression, vocab: Seq[String]) extends UnaryExpression {

  @transient private lazy val matcher = new BpeMatcher(vocab.toArray)

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    matcher.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the matcher rides the plan as a reference object; its hash set is
    // rebuilt lazily executor-side (transient), never serialized
    val ref = ctx.addReferenceObj("bpeMatcher", matcher,
      classOf[BpeMatcher].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countTokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_token_count"
}

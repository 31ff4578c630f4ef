package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** tx12: Unicode NFC normalization as a native Catalyst expression — the
  * corpus-cleaning step that canonicalizes combining sequences (`e` +
  * U+0301 → `é`) so that hashing, dedup fingerprints, and tokenization see
  * one byte form per grapheme. Spark has no normalization built-in; a Scala
  * UDF would break whole-stage codegen and the engine's zero-UDF rule, so
  * this wraps `java.text.Normalizer` (constant-folding friendly, codegen'd,
  * per-row, no shuffle).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and true
  * for virtually every real-world string (ASCII is always NFC), so the
  * allocating normalize call runs only on the rare decomposed row.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize expects string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** Shared by the interpreted and generated paths — one implementation,
    * bit-identical results on both.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

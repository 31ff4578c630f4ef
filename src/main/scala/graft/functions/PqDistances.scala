package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fused PQ distance table (ann4): quantize the embedding to integer micros
  * and compute ALL m×k subspace-to-centroid squared distances in one tight
  * loop per row — the flat ADC lookup table. Replaces an `aggregate`/
  * `zip_with` formulation whose higher-order functions run interpreted
  * (outside whole-stage codegen, no CSE): at 100 TB the per-row lambda
  * dispatch and intermediate arrays dominate the scan.
  *
  * Quantization is bit-identical to `Pq.quantize`'s `round(v·10⁶)` column
  * (Spark's Round = BigDecimal HALF_UP on the double value — replayed here
  * verbatim), so the LUT, the derived argmin codes, and the DuckDB oracle
  * all agree exactly.
  */
class PqLutComputer(val m: Int, val k: Int, val subDim: Int,
    flatCodebooks: Array[Long]) extends Serializable {

  require(flatCodebooks.length == m * k * subDim)

  private def quantize(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1000000d)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def lut(emb: ArrayData): ArrayData = {
    val dim = m * subDim
    val e = new Array[Long](dim)
    var i = 0
    while (i < dim) { e(i) = quantize(emb.getFloat(i).toDouble); i += 1 }
    val out = new Array[Long](m * k)
    var mi = 0
    while (mi < m) {
      val off = mi * subDim
      var j = 0
      while (j < k) {
        val coff = (mi * k + j) * subDim
        var d = 0L
        var t = 0
        while (t < subDim) {
          val diff = e(off + t) - flatCodebooks(coff + t)
          d += diff * diff
          t += 1
        }
        out(mi * k + j) = d
        j += 1
      }
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class PqDistances(child: Expression, m: Int, k: Int, subDim: Int,
    flatCodebooks: Seq[Long]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_distances expects array<float>, got $other")
  }

  @transient private lazy val computer =
    new PqLutComputer(m, k, subDim, flatCodebooks.toArray)

  override protected def nullSafeEval(input: Any): Any =
    computer.lut(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reuse the interpreted path's computer: one codebook-array copy per
    // expression instance, one construction site for both execution modes
    val ref = ctx.addReferenceObj("pqLut", computer,
      classOf[PqLutComputer].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.lut($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_distances"
}

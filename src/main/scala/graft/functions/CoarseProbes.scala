package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** The `nprobe` nearest coarse-quantizer lists for a vector (ann7, true
  * IVF): quantize to integer micros, compute all `nlist` full-dimension
  * squared distances, and select the top-`nprobe` list ids ascending by
  * (distance, id) — one fused loop per row inside whole-stage codegen.
  *
  * Selection is O(nlist · nprobe) with a strict `<` scan, so ties keep the
  * smaller list id — the same first-minimum rule `Pq.train`'s assignment
  * and the DuckDB oracle's `ROW_NUMBER() OVER (ORDER BY d, block)` use.
  * With `nprobe = 1` this is exactly the home-list assignment the corpus
  * side stores.
  *
  * Quantization is bit-identical to [[PqLutComputer]]'s (BigDecimal
  * HALF_UP on the double value, replaying Spark's `round(v·10⁶)`).
  */
class CoarseProbeComputer(val nlist: Int, val dim: Int, val nprobe: Int,
    flatCentroids: Array[Long]) extends Serializable {

  require(flatCentroids.length == nlist * dim,
    s"centroid array ${flatCentroids.length} != nlist $nlist * dim $dim")
  require(nprobe >= 1 && nprobe <= nlist, s"nprobe $nprobe not in [1, $nlist]")

  private def quantize(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1000000d)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def probes(emb: ArrayData): ArrayData = {
    val e = new Array[Long](dim)
    var i = 0
    while (i < dim) { e(i) = quantize(emb.getFloat(i).toDouble); i += 1 }
    val d = new Array[Long](nlist)
    var j = 0
    while (j < nlist) {
      val off = j * dim
      var acc = 0L
      var t = 0
      while (t < dim) {
        val diff = e(t) - flatCentroids(off + t)
        acc += diff * diff
        t += 1
      }
      d(j) = acc
      j += 1
    }
    val out = new Array[Int](nprobe)
    var p = 0
    while (p < nprobe) {
      var best = -1
      var bestD = Long.MaxValue
      var jj = 0
      while (jj < nlist) {
        if (d(jj) < bestD) { bestD = d(jj); best = jj }
        jj += 1
      }
      d(best) = Long.MaxValue // exclude from the next selection pass
      out(p) = best
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class CoarseProbes(child: Expression, nlist: Int, dim: Int, nprobe: Int,
    flatCentroids: Seq[Long]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"coarse_probes expects array<float>, got $other")
  }

  @transient private lazy val computer =
    new CoarseProbeComputer(nlist, dim, nprobe, flatCentroids.toArray)

  override protected def nullSafeEval(input: Any): Any =
    computer.probes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reuse the interpreted path's computer: one centroid-array copy per
    // expression instance, one construction site for both execution modes
    val ref = ctx.addReferenceObj("coarseProbes", computer,
      classOf[CoarseProbeComputer].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "coarse_probes"
}

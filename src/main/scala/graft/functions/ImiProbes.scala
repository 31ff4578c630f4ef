package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** The `nprobe` nearest INVERTED-MULTI-INDEX lists for a vector (ann10;
  * Babenko & Lempitsky 2012, "The Inverted Multi-Index"): the vector splits
  * into two halves, each half gets its own `k`-centroid quantizer, and the
  * list universe is their product — `k²` lists for `k + k` centroids of
  * training. Because squared L2 decomposes across the halves
  * (`d(list (i,j)) = d0(i) + d1(j)`), distances to all `k²` lists cost
  * `2·k·(dim/2)` multiplies plus `k²` adds — one fused loop per row inside
  * whole-stage codegen, never a `k²`-centroid table.
  *
  * This is what removes [[graft.ann.Pq.adaptiveNlist]]'s cap: a flat
  * quantizer's driver Lloyd can't afford more centroids than its bounded
  * sample (the measured 100x knee — past nlist 1024 per-list depth grows as
  * n/1024 and the scored-pair count turns quadratic), while the IMI reaches
  * nlist = k² = 65k lists from two k = 256 trainings on the same sample.
  *
  * List id = i·k + j (half-0 major). Selection is O(k²·nprobe) strict-`<`
  * scan over the composed distances, ties to the smaller list id — the same
  * first-minimum rule every trainer/oracle in this repo uses; with
  * `nprobe = 1` it is exactly the home-list assignment the corpus side
  * stores (argmin decomposes: (argmin d0, argmin d1) with lexicographic tie
  * order matching i·k + j order). Quantization is bit-identical to
  * [[PqLutComputer]]'s (BigDecimal HALF_UP replaying Spark's
  * `round(v·10⁶)`).
  */
class ImiProbeComputer(val k: Int, val subDim: Int, val nprobe: Int,
    flatCentroids: Array[Long]) extends Serializable {

  require(flatCentroids.length == 2 * k * subDim,
    s"centroid array ${flatCentroids.length} != 2 * k $k * subDim $subDim")
  require(nprobe >= 1 && nprobe <= k * k, s"nprobe $nprobe not in [1, ${k * k}]")

  private def quantize(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1000000d)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def probes(emb: ArrayData): ArrayData = {
    val dim = 2 * subDim
    val e = new Array[Long](dim)
    var i = 0
    while (i < dim) { e(i) = quantize(emb.getFloat(i).toDouble); i += 1 }
    // per-half distances: k centroids x subDim each; half h's centroid j
    // lives at flatCentroids[(h*k + j) * subDim ..)
    val d0 = new Array[Long](k)
    val d1 = new Array[Long](k)
    var j = 0
    while (j < k) {
      var acc0 = 0L; var acc1 = 0L
      val off0 = j * subDim
      val off1 = (k + j) * subDim
      var t = 0
      while (t < subDim) {
        val f0 = e(t) - flatCentroids(off0 + t)
        val f1 = e(subDim + t) - flatCentroids(off1 + t)
        acc0 += f0 * f0
        acc1 += f1 * f1
        t += 1
      }
      d0(j) = acc0
      d1(j) = acc1
      j += 1
    }
    // nprobe = 1 is the corpus-side HOME-LIST assignment, executed once per
    // row at encode/append time: the composed argmin decomposes into the
    // two half argmins (strict < keeps the FIRST minimum in each half,
    // and (first-min d0)·k + (first-min d1) is exactly the composed-grid
    // scan's first minimum under its i·k + j tie order — if d0[a]+d1[b] is
    // minimal with a > a0 or b > b0 then d0[a0]+d1[b0] is ≤ it with a
    // smaller id). Two O(k) scans instead of the k² grid pass: at k = 256
    // that is 512 compares, not ~65k adds, per vector.
    if (nprobe == 1) {
      var a0 = 0; var b0 = 0
      var t2 = 1
      while (t2 < k) {
        if (d0(t2) < d0(a0)) a0 = t2
        if (d1(t2) < d1(b0)) b0 = t2
        t2 += 1
      }
      return UnsafeArrayData.fromPrimitiveArray(Array(a0 * k + b0))
    }
    // top-nprobe of the composed k x k grid, ascending (d0[i]+d1[j], i*k+j).
    // k² adds per selection pass; nprobe passes. (The multi-sequence
    // algorithm does this in O(nprobe log nprobe) — at k ≤ 256 the dumb
    // scan is already branch-predictable and allocation-free.)
    val taken = new java.util.BitSet(k * k)
    val out = new Array[Int](nprobe)
    var p = 0
    while (p < nprobe) {
      var best = -1
      var bestD = Long.MaxValue
      var a = 0
      while (a < k) {
        val da = d0(a)
        var b = 0
        while (b < k) {
          val id = a * k + b
          val d = da + d1(b)
          if (d < bestD && !taken.get(id)) { bestD = d; best = id }
          b += 1
        }
        a += 1
      }
      taken.set(best)
      out(p) = best
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class ImiProbes(child: Expression, k: Int, subDim: Int, nprobe: Int,
    flatCentroids: Seq[Long]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"imi_probes expects array<float>, got $other")
  }

  @transient private lazy val computer =
    new ImiProbeComputer(k, subDim, nprobe, flatCentroids.toArray)

  override protected def nullSafeEval(input: Any): Any =
    computer.probes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reuse the interpreted path's computer: one centroid-array copy per
    // expression instance, one construction site for both execution modes
    val ref = ctx.addReferenceObj("imiProbes", computer,
      classOf[ImiProbeComputer].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "imi_probes"
}

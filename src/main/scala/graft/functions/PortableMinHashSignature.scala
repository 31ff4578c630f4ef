package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The fused per-row computer behind [[PortableMinHashSignature]] —
  * [[MinHashSignature]]'s economics for the PORTABLE (md5-derived) hash
  * family the cross-engine oracles replay.
  *
  * Value-identity contract (asserted in DedupAnnSpec): per shingle and
  * pair p, the declarative formulation computes
  * `conv(substring(md5(concat(shingle, '#p')), off, 15), 16, 10)` with
  * off = 1 for seed 2p−1 and off = 17 for seed 2p — i.e. the first and
  * second 15 HEX CHARACTERS of the digest (60 bits each; nibble 16 and 32
  * are discarded). Hex chars [0,15) are the top 60 bits of the digest's
  * first 8 bytes big-endian, and chars [16,31) the top 60 bits of its
  * last 8 — so the byte-level replay is `bigEndian64(d, 0) >>> 4` and
  * `bigEndian64(d, 8) >>> 4`, never touching a hex string. Both values
  * are < 2⁶⁰, so the long is nonnegative and min() agrees with the
  * unsigned SQL ordering.
  *
  * Why this exists: the declarative portable path explodes one row per
  * (doc, shingle) (~150× document count), runs numHashes/2 md5
  * EXPRESSIONS per shingle each of which hex-encodes the digest, takes
  * two SUBSTRING string allocations and two CONV decimal-string parses
  * per digest, and funnels numHashes aggregate-buffer min updates per
  * shingle through the aggregate codepath. This computer does the same
  * digests (MessageDigest is the same MD5) and none of the string work,
  * in one fused loop per document row — no explode, no aggregation, no
  * shuffle for the signature stage.
  *
  * MessageDigest instances are not thread-safe → ThreadLocal (the
  * generated-code reference object is shared across an executor's tasks).
  */
class PortableMinHashComputer(val numHashes: Int) extends Serializable {
  require(numHashes > 0, "numHashes must be positive")

  private val pairs = (numHashes + 1) / 2
  private val salts: Array[Array[Byte]] =
    (1 to pairs).map(p => s"#$p".getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def signature(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val digest = md.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val sb = arr.getUTF8String(i).getBytes
        var p = 0
        while (p < pairs) {
          digest.reset()
          digest.update(sb)
          digest.update(salts(p))
          val d = digest.digest()
          val a = be64(d, 0) >>> 4
          val ia = 2 * p
          if (a < mins(ia)) mins(ia) = a
          val ib = ia + 1
          if (ib < numHashes) {
            val b = be64(d, 8) >>> 4
            if (b < mins(ib)) mins(ib) = b
          }
          p += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  private def be64(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (d(off + k) & 0xffL); k += 1 }
    v
  }
}

/** Native fused MinHash signature over the PORTABLE md5 hash family — the
  * [[MinHashSignature]] twin for every `portableHash = true` pipeline
  * (dd2b/dd11/dd13/dd15/st15/sp7/…), whose oracles replay the salted-md5
  * construction in SQL. See [[PortableMinHashComputer]] for the
  * value-identity contract and the cost argument.
  */
case class PortableMinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"portable_minhash_signature expects array<string>, got $other")
  }

  @transient private lazy val computer = new PortableMinHashComputer(numHashes)

  override protected def nullSafeEval(input: Any): Any =
    computer.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reuse the interpreted path's computer: one salt-table construction,
    // one code path for both execution modes (the ImiProbes pattern)
    val ref = ctx.addReferenceObj("portableMinhash", computer,
      classOf[PortableMinHashComputer].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.signature($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "portable_minhash_signature"
}

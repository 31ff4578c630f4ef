package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing a full MinHash signature —
  * `numHashes` per-seed minima over a shingle array — in one fused loop
  * per row (ref workload: SURVEY addendum dd2; `Dedup.minhashSignatures`).
  *
  * Why an Expression: the declarative formulation needs `explode` (one row
  * per (doc, shingle)) plus a `numHashes`-column min-aggregate — at 100 TB
  * that materializes ~150× the document count in rows and runs ~64
  * aggregate-buffer updates per shingle through the aggregate codepath.
  * This expression computes the signature map-side per document row: no
  * explode, no aggregation, no shuffle for the signature stage at all, and
  * the nested loop participates in whole-stage codegen.
  *
  * Bit-identical to the SQL formulation it replaces
  * (`min(xxhash64(xxhash64(shingle), lit(seed)))` for seed = 1..numHashes):
  * per shingle, `base = XXH64(utf8, 42)` then `XXH64.hashLong(base, 42)`
  * (the chained first child), and per seed the chained int-literal hash
  * `XXH64.hashInt(seed, ·)` — the exact operation order of Spark's variadic
  * `xxhash64`. Asserted bit-exact in `DedupAnnSpec`.
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val b = XXH64.hashLong(XXH64.hashUTF8String(s, 42L), 42L)
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashInt(j + 1, b)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val mins = ctx.freshName("mins"); val b = ctx.freshName("b"); val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    long $b = $xxh.hashLong($xxh.hashUTF8String($s, 42L), 42L);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $h = $xxh.hashInt($j + 1, $b);
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

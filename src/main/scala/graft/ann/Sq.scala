package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ann8: scalar-quantization ANN (SQ8 — the faiss `SQ` family baseline
  * between raw floats and product quantization): every dimension is
  * affinely mapped to an 8-bit code against the corpus' per-dimension
  * [min, max] range, and search ranks candidates by integer squared L2 on
  * the codes. 4 bytes/dim of float become 1 byte/dim with no codebook
  * training at all — the right first compression step when PQ's Lloyd fit
  * is not worth its complexity.
  *
  * Cross-engine exactness: embeddings go through the integer
  * micro-quantization ([[Pq.quantize]]), the per-dim range is an integer
  * MIN/MAX aggregate, the code is `((v − lo) · 255) DIV (hi − lo)` in
  * pure integer arithmetic (constant-range dims code to 0), and distances
  * are integer sums — every step replays bit-for-bit in SQL.
  *
  * 100 TB story: the range table is 64 rows (one aggregate over the
  * exploded dims, the dq4 centroid shape) broadcast back; encoding is
  * map-side; the search joins CODES (64 bytes/vector), not floats, inside
  * the label block like [[Ann.ivfTopK]] — the shuffled payload is ¼ the
  * float path's, which is the entire point of SQ at scale.
  *
  * Block-depth caveat (the ann4 lesson): [[sqTopK]] pairs within the
  * given block column, so its cost is quadratic in PER-BLOCK depth —
  * fine when blocks are a real coarse quantizer's lists, a scale hazard
  * when they are a fixed low-cardinality label. At corpus scale, compose
  * the SQ codes with [[Pq.coarseTrain]]'s learned lists (ann7), whose
  * `adaptiveNlist` keeps depth bounded; SQ's contribution — code-sized
  * shuffles and integer ADC — is orthogonal to how candidates are blocked.
  */
object Sq {

  /** Per-dim [min, max] of the micro-quantized corpus, as two 64-long
    * arrays on a 1-row frame (broadcast by the caller).
    */
  def ranges(emb: DataFrame, embCol: String): DataFrame =
    emb.select(posexplode(Pq.quantize(col(embCol))))
      .groupBy(col("pos"))
      .agg(min(col("col")).as("lo"), max(col("col")).as("hi"))
      .agg(
        expr("transform(array_sort(collect_list(struct(pos, lo))), x -> x.lo)").as("mn"),
        expr("transform(array_sort(collect_list(struct(pos, hi))), x -> x.hi)").as("mx"))

  /** SQ8 codes for every vector: `(vec_id, block, code[64])`. */
  def encode(emb: DataFrame, idCol: String, embCol: String,
      blockCol: String): DataFrame =
    emb.select(col(idCol).as("vec_id"), col(blockCol).as("block"),
      Pq.quantize(col(embCol)).as("e"))
      .crossJoin(broadcast(ranges(emb, embCol)))
      .select(col("vec_id"), col("block"),
        // Spark SQL [] indexing is 0-based (element_at is the 1-based form)
        expr("transform(sequence(0, 63), i -> CASE WHEN mx[i] = mn[i] THEN 0L " +
          "ELSE ((e[i] - mn[i]) * 255) DIV (mx[i] - mn[i]) END)").as("code"))

  /** Block-scoped SQ8 top-k: every vector queries its own block, ranked by
    * integer code-space squared L2 (ties to the smaller neighbor id).
    */
  def sqTopK(emb: DataFrame, blockCol: String, k: Int): DataFrame = {
    val codes = encode(emb, "vec_id", "embedding", blockCol)
    val a = codes.select(col("vec_id").as("query_id"), col("block"), col("code").as("qc"))
    val b = codes.select(col("vec_id").as("neighbor_id"), col("block"), col("code").as("cc"))
    val scored = a.join(b, Seq("block"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("block"),
        aggregate(zip_with(col("qc"), col("cc"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v).as("d2"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}

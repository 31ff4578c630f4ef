package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
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
  * Block-depth guard (the ann4 lesson, now enforced — not just
  * documented): a fixed block column's per-block depth grows with the
  * corpus, so a self-search workload's scored-pair count grows as
  * n²/nblocks. [[sqTopK]] pre-flights average block depth exactly like
  * [[Pq.ivfPqTopK]]: above `maxAvgBlock` it reroutes candidate blocking
  * through a LEARNED quantizer while SQ codes stay the distance payload —
  * blocking and code payload are orthogonal, which is why the reroute
  * changes the candidate sets but not what crosses the wire (codes, never
  * floats). The reroute tiers like ivfPqTopK's: flat coarse lists
  * ([[sqTopKLearned]], [[Pq.adaptiveNlist]]) below the nlist clamp, the
  * inverted multi-index ([[sqTopKImi]], [[Pq.adaptiveImiK]]) past it — so
  * neither the fixed-block quadratic NOR the flat quantizer's own 100x
  * knee is reachable by default. `contrast = true` pins the fixed-block
  * path for a labeled measured contrast, the only way to reach the
  * quadratic.
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

  /** The affine SQ8 coding expression over a row's quantized `e` and the
    * joined `mn`/`mx` ranges — ONE definition shared by [[encode]] and the
    * guard's search paths, so the fixed/contrast and rerouted routes cannot
    * desynchronize on the code rule (their equality is a test contract).
    * Spark SQL [] indexing is 0-based (element_at is the 1-based form).
    */
  private val codeExpr: Column =
    expr("transform(sequence(0, 63), i -> CASE WHEN mx[i] = mn[i] THEN 0L " +
      "ELSE ((e[i] - mn[i]) * 255) DIV (mx[i] - mn[i]) END)")

  /** SQ8 codes for every vector: `(vec_id, block, code[64])`. */
  def encode(emb: DataFrame, idCol: String, embCol: String,
      blockCol: String): DataFrame =
    emb.select(col(idCol).as("vec_id"), col(blockCol).as("block"),
      Pq.quantize(col(embCol)).as("e"))
      .crossJoin(broadcast(ranges(emb, embCol)))
      .select(col("vec_id"), col("block"), codeExpr.as("code"))

  /** Integer code-space squared L2 between two 64-code arrays. */
  private def codeDist(qc: Column, cc: Column): Column =
    aggregate(zip_with(qc, cc, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Block-scoped SQ8 top-k: every vector queries its own block, ranked by
    * integer code-space squared L2 (ties to the smaller neighbor id).
    *
    * Self-guarded like [[Pq.ivfPqTopK]]: when average block depth exceeds
    * `maxAvgBlock` (one control-plane aggregate — cheap next to the
    * candidate join it guards), candidate blocking reroutes through the
    * learned coarse quantizer ([[sqTopKLearned]]); `block` in the output
    * becomes the learned list id. `contrast = true` pins the fixed-block
    * path — the explicit opt-in a measured scale contrast uses; no default
    * call reaches the per-block quadratic.
    */
  def sqTopK(emb: DataFrame, blockCol: String, k: Int, contrast: Boolean = false,
      maxAvgBlock: Int = 256, idCol: String = "vec_id",
      embCol: String = "embedding", nprobe: Int = 2,
      maxNlist: Int = 1024): DataFrame = {
    if (!contrast) {
      val r = emb.agg(count(lit(1)), countDistinct(col(blockCol))).head()
      val n = r.getLong(0); val nblocks = math.max(r.getLong(1), 1L)
      if (n > maxAvgBlock.toLong * nblocks) {
        val std = emb.select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
        // tiered like Pq.ivfPqTopK: flat lists below the nlist clamp, the
        // inverted multi-index past it (the ann7 100x knee does not come
        // back through this reroute); maxNlist exposed for forced-tier
        // specs. block is cast to string on EVERY path of this guarded
        // entry point (see Pq.ivfPqTopK's schema-stability note) — the
        // output schema must not depend on corpus size.
        if (Pq.nlistClamped(n, maxNlist = maxNlist)) {
          val imi = Pq.train(std, m = 2, k = Pq.adaptiveImiK(n))
          return sqTopKImi(emb, k, imi, nprobe, idCol, embCol)
            .withColumn("block", col("block").cast("string"))
        }
        val cents = Pq.coarseTrain(std, Pq.adaptiveNlist(n, maxNlist = maxNlist))
        return sqTopKLearned(emb, k, cents, nprobe, idCol, embCol)
          .withColumn("block", col("block").cast("string"))
      }
    }
    // spread before encode: the affine coding + integer code-space L2 all
    // run at the scan's partitioning once the block join's small side
    // broadcasts (stats-gated; no-op at real scale)
    val codes = encode(graft.ops.Scan.spreadIfStarved(emb), idCol, embCol, blockCol)
    val a = codes.select(col("vec_id").as("query_id"), col("block"), col("code").as("qc"))
    val b = codes.select(col("vec_id").as("neighbor_id"), col("block"), col("code").as("cc"))
    val scored = a.join(b, Seq("block"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        col("block").cast("string").as("block"),
        codeDist(col("qc"), col("cc")).as("d2"))
    rankTopK(scored, k)
  }

  /** SQ8 search inside LEARNED coarse lists — ann7's blocking with ann8's
    * payload. Corpus vectors carry (home list, 64 int codes); a query
    * probes its `nprobe` nearest lists; candidates rank by integer code
    * L2. Per-list depth is bounded by the [[Pq.adaptiveNlist]] contract, so
    * the scored-pair count per query stays ~targetList·nprobe at any
    * corpus size, and the join shuffles codes (¼ the float payload) plus
    * one int — never embeddings. A neighbor lives in exactly one list, so
    * no pair is scored twice (the [[Pq.ivfPqTopKLearned]] property).
    */
  def sqTopKLearned(emb: DataFrame, k: Int, cents: Array[Array[Long]],
      nprobe: Int = 2, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    sqSearch(emb, k, (e, p) => Pq.probeColumn(e, cents, p), nprobe, idCol, embCol)

  /** SQ8 search inside INVERTED MULTI-INDEX lists — ann10's blocking with
    * ann8's payload. Identical to [[sqTopKLearned]] except home/probe
    * selection composes two half-space quantizers (k² lists for k + k
    * training cost — [[Pq.ivfPqTopKImi]]'s ceiling argument); the depth
    * guard tiers into this path past the flat nlist clamp.
    */
  def sqTopKImi(emb: DataFrame, k: Int, imi: Pq.PqModel,
      nprobe: Int = 2, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    sqSearch(emb, k, (e, p) => Pq.imiProbeColumn(e, imi, p), nprobe, idCol, embCol)

  /** Shared learned-blocking SQ8 search: `probe(emb, nprobe)` yields the
    * nearest list ids under whichever coarse quantizer blocks candidates
    * (flat or IMI); everything else — codes-only join payload, integer L2,
    * (d2, neighbor_id) tie rule — is common.
    */
  private def sqSearch(emb: DataFrame, k: Int,
      probe: (Column, Int) => Column, nprobe: Int,
      idCol: String, embCol: String): DataFrame = {
    val coded = emb
      .select(col(idCol).as("vec_id"), col(embCol).as("__emb"),
        Pq.quantize(col(embCol)).as("e"))
      .crossJoin(broadcast(ranges(emb, embCol)))
      .select(col("vec_id"), col("__emb"), codeExpr.as("code"))
    val corpus = coded.select(col("vec_id").as("neighbor_id"),
      element_at(probe(col("__emb"), 1), 1).as("block"),
      col("code").as("cc"))
    val queries = coded.select(col("vec_id").as("query_id"),
      explode(probe(col("__emb"), nprobe)).as("block"),
      col("code").as("qc"))
    val scored = queries.join(corpus, Seq("block"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("block"),
        codeDist(col("qc"), col("cc")).as("d2"))
    rankTopK(scored, k)
  }
}

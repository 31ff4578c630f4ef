package graft.ann

import graft.ops.Sampling
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ann4: IVF + product quantization (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search") — the 100 TB-standard step
  * past hyperplane LSH. The vector splits into `m` subspaces; each subspace
  * gets a `k`-centroid codebook (Lloyd iterations on a deterministic
  * sample); a corpus vector is stored as `m` small codes; and search ranks
  * candidates by ADC (asymmetric distance computation): the query builds an
  * `m × k` lookup table once, then each candidate costs `m` array lookups
  * instead of a full d-dimensional scan.
  *
  * Scale shape: candidates come from the IVF block (like [[Ann.ivfTopK]]),
  * and the candidate join carries only `(vec_id, block, m codes)` — the PQ
  * compression story: at 64 dims and m=4, the shuffled payload drops from
  * 256 bytes of floats to 4 bytes of codes per row. The codebook trains on
  * a hash-deterministic sample (control-plane-sized at any corpus scale,
  * the standard PQ practice), driver-fit like
  * [[graft.quality.IsolationForestModel]], and rides the plan as literals.
  *
  * Cross-engine exactness (full DuckDB oracle, no rows-only caveat):
  * embeddings quantize to integer micros (`round(v·10⁶)`), Lloyd runs in
  * integer arithmetic with `floor(sum/count)` centroid updates and
  * smallest-index tie-breaks, and ADC distances are integer sums — every
  * step reproduces bit-for-bit in any engine.
  */
object Pq {

  /** Integer micro-quantization of a float embedding. */
  def quantize(emb: Column): Column =
    transform(emb, v => round(v.cast("double") * 1000000d).cast("long"))

  /** codebooks(m)(j) = centroid j of subspace m, in quantized micros. */
  final case class PqModel(m: Int, k: Int, subDim: Int,
      codebooks: Array[Array[Array[Long]]]) extends Serializable

  private def sqDist(a: Array[Long], off: Int, c: Array[Long]): Long = {
    var d = 0L; var i = 0
    while (i < c.length) { val t = a(off + i) - c(i); d += t * t; i += 1 }
    d
  }

  /** Train per-subspace codebooks on the hash-selected sample (collected —
    * control-plane by design), with the exact arithmetic the oracle
    * replays: seeds are the `k` smallest-(hash, vec_id) sample vectors,
    * `iters` Lloyd rounds, integer distances, argmin ties to the smallest
    * centroid index, `floor(sum/count)` updates, empty clusters keep their
    * previous centroid.
    *
    * The driver collect is bounded by COUNT, not rate: a rate-only sample
    * grows linearly with the corpus (a driver OOM at 100×), so the
    * `sampleRate` pre-filter is followed by `orderBy(h, vec_id).limit
    * (maxSample)` — Spark plans it as TakeOrdered (no global sort), the
    * (hash, id) order keeps the selection deterministic at any scale, and
    * the oracle replays the identical cap.
    */
  def train(emb: DataFrame, m: Int = 4, k: Int = 8, iters: Int = 2,
      sampleRate: Double = 0.5, maxSample: Int = 4096): PqModel = {
    val sample = emb
      .select(col("vec_id"), quantize(col("embedding")).as("e"),
        Sampling.unitHash(col("vec_id")).as("h"))
      .filter(col("h") < sampleRate)
      .orderBy(col("h"), col("vec_id"))
      .limit(maxSample)
      .collect()
    require(sample.length >= k, s"PQ sample too small: ${sample.length} < $k")
    val vecs: Array[Array[Long]] = sample.map(_.getSeq[Long](1).toArray)
    val dim = vecs.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val codebooks = Array.tabulate(m) { mi =>
      val off = mi * subDim
      var cents: Array[Array[Long]] =
        Array.tabulate(k)(j => vecs(j).slice(off, off + subDim))
      var t = 0
      while (t < iters) {
        val sums = Array.fill(k, subDim)(0L)
        val cnts = Array.fill(k)(0L)
        vecs.foreach { v =>
          var best = 0; var bestD = Long.MaxValue; var j = 0
          while (j < k) {
            val d = sqDist(v, off, cents(j))
            if (d < bestD) { bestD = d; best = j } // strict: ties keep smaller j
            j += 1
          }
          cnts(best) += 1
          var i = 0
          while (i < subDim) { sums(best)(i) += v(off + i); i += 1 }
        }
        cents = Array.tabulate(k) { j =>
          if (cnts(j) == 0L) cents(j) // empty cluster keeps its centroid
          else Array.tabulate(subDim)(i =>
            math.floor(sums(j)(i).toDouble / cnts(j)).toLong)
        }
        t += 1
      }
      cents
    }
    PqModel(m, k, subDim, codebooks)
  }

  /** The flat m×k ADC lookup table as ONE native fused loop per row
    * ([[graft.functions.PqDistances]]) — quantization and all subspace
    * distances inside whole-stage codegen, no interpreted lambdas.
    */
  private def lutColumn(emb: Column, model: PqModel): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.PqDistances(
      ColumnBridge.expression(emb), model.m, model.k, model.subDim,
      model.codebooks.flatten.flatten.toIndexedSeq))
  }

  /** See [[graft.ops.Scan.spreadIfStarved]]. */
  private def spreadIfStarved(projected: DataFrame): DataFrame =
    graft.ops.Scan.spreadIfStarved(projected)

  /** IVF + PQ approximate top-k: candidates share the query's IVF block;
    * ranking is integer ADC ascending (ties by neighbor id). The corpus
    * side of the join carries codes only.
    *
    * Both sides derive from ONE per-row native LUT ([[lutColumn]]): the
    * corpus takes per-subspace argmins over 8-element slices (cheap
    * codegen'd array ops), the query side ships the LUT itself.
    *
    * Scale guard: a FIXED block column is a quadratic trap — per-block depth
    * grows with the corpus, so a self-search workload's scored-pair count
    * grows as n²/nblocks (measured on the scale curve: 0.5 s @1x → 89 s
    * @30x). When average block depth exceeds `maxAvgBlock`, the call routes
    * through the LEARNED coarse quantizer ([[ivfPqTopKLearned]] with
    * [[adaptiveNlist]] — per-list depth bounded at any corpus size; same
    * output schema, `block` becomes the learned list id). The pre-flight
    * count is one control-plane aggregate over (blockCol) — parquet-stat
    * cheap next to the candidate join it guards. Pass `contrast = true` to
    * pin the fixed-block path regardless of depth — the measured-contrast
    * flag the ann4 bench row opts into; no default path reproduces the
    * quadratic.
    *
    * The reroute itself TIERS (since round 11): a flat learned quantizer
    * has its own knee — [[adaptiveNlist]] clamps at `maxNlist` lists, so
    * past targetList·maxNlist vectors per-list depth resumes growing
    * linearly (the measured ann7 100x creep). When the corpus is past that
    * clamp ([[nlistClamped]]), the guard routes through the inverted
    * multi-index instead ([[ivfPqTopKImi]] with [[adaptiveImiK]] — k² lists
    * for k + k training cost), which moves the ceiling two orders out.
    * `maxNlist` is exposed so specs and contrasts can force the deep tier
    * at unit-test corpus sizes.
    */
  def ivfPqTopK(emb: DataFrame, blockCol: String, k: Int, model: PqModel,
      contrast: Boolean = false, maxAvgBlock: Int = 256,
      maxNlist: Int = 1024): DataFrame = {
    if (!contrast) {
      val r = emb.agg(count(lit(1)), countDistinct(col(blockCol))).head()
      val n = r.getLong(0); val nblocks = math.max(r.getLong(1), 1L)
      if (n > maxAvgBlock.toLong * nblocks) {
        // block is cast to string on EVERY path of this guarded entry
        // point: the fixed path emits the caller's label column, the
        // rerouted tiers an int list id — without the cast the output
        // schema would depend on corpus size, breaking fixed-schema sinks
        // that append batches across the depth threshold. The tier-named
        // functions (ivfPqTopKLearned/Imi) keep their natural int type —
        // their schema never varies.
        if (nlistClamped(n, maxNlist = maxNlist)) {
          val imi = train(emb, m = 2, k = adaptiveImiK(n))
          return ivfPqTopKImi(emb, k, model, imi, nprobe = 2)
            .withColumn("block", col("block").cast("string"))
        }
        val cents = coarseTrain(emb, adaptiveNlist(n, maxNlist = maxNlist))
        return ivfPqTopKLearned(emb, k, model, cents, nprobe = 2)
          .withColumn("block", col("block").cast("string"))
      }
    }
    val base = spreadIfStarved(emb.select(col("vec_id"), col(blockCol), col("embedding")))
      .withColumn("__lut", lutColumn(col("embedding"), model))
    // corpus: m argmin codes per vector (pqCodeCols — the shared encode rule)
    val corpus = base.select(
      (col("vec_id").as("neighbor_id") +: col(blockCol).as("block") +:
        pqCodeCols(model, "__c")): _*)
    val queries = base.select(col("vec_id").as("query_id"), col(blockCol).as("block"),
      col("__lut"))
    val scored = queries.join(corpus, Seq("block"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        col("block").cast("string").as("block"),
        adcCol(model, "__c").as("adc"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Learned coarse quantizer — true IVF (Jégou et al. 2011 §III): `nlist`
    * centroids over the FULL vector. [[train]] with `m = 1, k = nlist` IS
    * that trainer (one subspace spanning the whole dimension), so the
    * sample selection, integer Lloyd arithmetic, tie rules, and the DuckDB
    * oracle replay are all shared with the codebook path.
    */
  def coarseTrain(emb: DataFrame, nlist: Int, iters: Int = 2,
      sampleRate: Double = 0.5, maxSample: Int = 4096): Array[Array[Long]] =
    train(emb, m = 1, k = nlist, iters = iters, sampleRate = sampleRate,
      maxSample = maxSample).codebooks(0)

  /** nlist sized to the corpus (clamped): per-list depth targets
    * ~`targetList` vectors. This is the property that keeps a self-search
    * workload ~linear in corpus size — under a FIXED block column
    * (ann4's `label`), per-block depth grows with the corpus and the
    * scored-pair count grows quadratically (measured: ann4 4.0 s at 10x →
    * 46.3 s at 30x on the scale curve); with nlist ∝ corpus, the pair
    * count per query stays ~`targetList · nprobe` at any scale.
    */
  def adaptiveNlist(n: Long, targetList: Int = 32, maxNlist: Int = 1024): Int =
    math.min(maxNlist.toLong, math.max(16L, (n + targetList - 1) / targetList)).toInt

  /** True iff [[adaptiveNlist]] would hit its clamp at `n` — the boundary
    * past which a FLAT learned quantizer's per-list depth resumes growing
    * (n/maxNlist) and a self-search's scored pairs turn quadratic again.
    * The depth guards use this to tier their reroute: flat lists below the
    * clamp, the inverted multi-index ([[ivfPqTopKImi]]) above it.
    */
  def nlistClamped(n: Long, targetList: Int = 32, maxNlist: Int = 1024): Boolean =
    (n + targetList - 1) / targetList > maxNlist

  /** Top-`nprobe` coarse lists, nearest first, as ONE native fused loop
    * per row ([[graft.functions.CoarseProbes]]) — O(nlist·nprobe)
    * selection inside whole-stage codegen, ties to the smaller list id.
    */
  private[ann] def probeColumn(emb: Column, cents: Array[Array[Long]], nprobe: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.CoarseProbes(
      ColumnBridge.expression(emb), cents.length, cents.head.length, nprobe,
      cents.flatten.toIndexedSeq))
  }

  /** Home list of a vector under a learned coarse quantizer: the argmin
    * centroid by integer L2, first-minimum tie (the trainer's rule) —
    * shared by ann7 search and dd10 SemDeDup clustering.
    */
  def coarseAssign(embCol: Column, cents: Array[Array[Long]]): Column =
    element_at(probeColumn(embCol, cents, 1), 1)

  /** ann7: IVF+PQ with the LEARNED coarse quantizer and multi-probe
    * search. Corpus vectors store their single home list (nearest
    * centroid) beside the m codes; a query probes its `nprobe` nearest
    * lists (recovering the recall a learned partition loses at list
    * boundaries) and ranks candidates by integer ADC exactly like
    * [[ivfPqTopK]]. A neighbor lives in exactly one list, so probed
    * candidate sets are disjoint and no pair is scored twice.
    *
    * Scale shape: the join carries codes + a home-list int on the corpus
    * side and the LUT on the (nprobe-replicated) query side — never raw
    * vectors — and with [[adaptiveNlist]] the per-query candidate count is
    * ~targetList·nprobe regardless of corpus size.
    */
  def ivfPqTopKLearned(emb: DataFrame, k: Int, model: PqModel,
      cents: Array[Array[Long]], nprobe: Int = 2): DataFrame =
    learnedSearch(emb, k, model, (e, p) => probeColumn(e, cents, p), nprobe)

  /** The m argmin-code columns of a row whose `__lut` is bound —
    * first-minimum tie (the trainer's and the oracle's rule). ONE
    * definition shared by every search path and the index write/append:
    * the persisted index and the serving/search plans cannot desynchronize
    * on the encode rule.
    */
  private def pqCodeCols(model: PqModel, prefix: String): Seq[Column] =
    (0 until model.m).map { mi =>
      val d = slice(col("__lut"), mi * model.k + 1, model.k)
      (array_position(d, array_min(d)) - 1).cast("int").as(s"$prefix$mi")
    }

  /** Integer ADC: the query's LUT indexed by the neighbor's codes. */
  private def adcCol(model: PqModel, prefix: String): Column =
    (0 until model.m)
      .map(mi => element_at(col("__lut"), col(s"$prefix$mi") + lit(mi * model.k + 1)))
      .reduce(_ + _)

  /** Shared learned-blocking IVF+PQ search: `probe(emb, nprobe)` yields
    * the nearest list ids under whichever coarse quantizer blocks
    * candidates (flat [[probeColumn]] or IMI [[imiProbeColumn]]);
    * everything else — codes-only corpus payload, ADC, (adc, neighbor_id)
    * tie rule — is common (the [[graft.ann.Sq.sqTopKLearned]] pattern).
    */
  private def learnedSearch(emb: DataFrame, k: Int, model: PqModel,
      probe: (Column, Int) => Column, nprobe: Int): DataFrame = {
    val base = spreadIfStarved(emb.select(col("vec_id"), col("embedding")))
    val corpus = base
      .withColumn("__lut", lutColumn(col("embedding"), model))
      .withColumn("__home", probe(col("embedding"), 1))
      .select((col("vec_id").as("neighbor_id") +:
        element_at(col("__home"), 1).as("block") +: pqCodeCols(model, "__c")): _*)
    val queries = base
      .withColumn("__lut", lutColumn(col("embedding"), model))
      .withColumn("__probes", probe(col("embedding"), nprobe))
      .select(col("vec_id").as("query_id"), explode(col("__probes")).as("block"),
        col("__lut"))
    val scored = queries.join(corpus, Seq("block"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("block"),
        adcCol(model, "__c").as("adc"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IMI grid size: k per half, nlist = k². Targets ~`targetList` vectors
    * per list like [[adaptiveNlist]], but the clamp moves two orders out:
    * a flat quantizer caps at 1024 lists (its driver Lloyd cannot afford
    * more centroids than the bounded training sample — the measured 100x
    * knee: past the cap, per-list depth grows as n/1024 and a self-search's
    * scored pairs turn quadratic), while k = 256 per HALF — still far under
    * the sample bound — composes to 65 536 lists, pushing the knee from
    * ~33k vectors to ~2M at the default target (and at 100 TB the coarse
    * trainer is the thing to distribute, not the index shape).
    */
  def adaptiveImiK(n: Long, targetList: Int = 32, maxK: Int = 256): Int =
    math.min(maxK,
      math.max(4, math.ceil(math.sqrt(n.toDouble / targetList)).toInt))

  private[ann] def imiProbeColumn(emb: Column, imi: PqModel, nprobe: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    require(imi.m == 2, s"an IMI quantizer has exactly 2 halves, got m = ${imi.m}")
    ColumnBridge.column(graft.functions.ImiProbes(
      ColumnBridge.expression(emb), imi.k, imi.subDim, nprobe,
      imi.codebooks.flatten.flatten.toIndexedSeq))
  }

  /** ann10: IVF+PQ under an INVERTED MULTI-INDEX coarse quantizer (Babenko
    * & Lempitsky 2012) — [[ivfPqTopKLearned]] with the flat nlist-centroid
    * quantizer replaced by the product of two half-space quantizers:
    * `imi = train(emb, m = 2, k)` IS the trainer (two subspaces spanning
    * the halves — same sample selection, integer Lloyd, tie rules, oracle
    * replay as every other codebook here), and list id = i·k + j. Search
    * shape is ivfPqTopKLearned's exactly: corpus rows carry (home list,
    * m codes), queries probe their `nprobe` nearest lists by composed
    * distance d0(i)+d1(j) ([[graft.functions.ImiProbes]] — k·dim multiplies
    * plus k² adds per row, fused in codegen), candidates rank by integer
    * ADC, and a neighbor lives in exactly one list so no pair scores twice.
    * What changes is the CEILING: see [[adaptiveImiK]].
    */
  def ivfPqTopKImi(emb: DataFrame, k: Int, model: PqModel, imi: PqModel,
      nprobe: Int = 2): DataFrame =
    learnedSearch(emb, k, model, (e, p) => imiProbeColumn(e, imi, p), nprobe)

  /** ann9 (build half): persist the serving artifact of a production ANN
    * system — the corpus codes `(vec_id, home list, m PQ codes)` plus the
    * trained model itself (codebooks + coarse centroids, flattened into a
    * one-row parquet). Building costs one full corpus pass (train sample +
    * encode); after that, query batches are served by
    * [[ivfPqTopKFromIndex]] without touching corpus embeddings OR
    * retraining — the same persisted-artifact economics
    * [[graft.dedup.Dedup.writeLshIndex]] gives incremental dedup. At
    * 100 TB the codes table is ~(8 + 4 + m) bytes/vector (two orders under
    * the float embeddings), and the model row is control-plane-sized.
    */
  def writeIvfIndex(emb: DataFrame, path: String, model: PqModel,
      cents: Array[Array[Long]]): Unit = {
    // a (re)build is the reclaim point for deletes: clear any tombstones so
    // a rebuilt index serves exactly what it was built from (and bench/
    // verify re-runs that rebuild into the same per-process path stay
    // idempotent — tombstones append, so they'd accumulate otherwise)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$path/tombstones"))
    val base = emb.select(col("vec_id"), col("embedding"))
      .withColumn("__lut", lutColumn(col("embedding"), model))
    base.select((col("vec_id") +:
        element_at(probeColumn(col("embedding"), cents, 1), 1).as("block") +:
        pqCodeCols(model, "c")): _*)
      .write.mode("overwrite").parquet(s"$path/codes")
    val spark = emb.sparkSession
    import spark.implicits._
    Seq((model.m, model.k, model.subDim,
        model.codebooks.flatten.flatten.toSeq,
        cents.length, cents.head.length, cents.flatten.toSeq))
      .toDF("m", "k", "sub_dim", "codebooks", "nlist", "dim", "cents")
      .write.mode("overwrite").parquet(s"$path/model")
  }

  /** ann9 (serve half): answer a query batch from a persisted index
    * ([[writeIvfIndex]]) — the model row is a control-plane collect, the
    * query side computes its LUT + probe lists map-side, and the only
    * corpus-sized input is the CODES parquet. Output is identical to
    * [[ivfPqTopKLearned]] restricted to the query batch (candidate corpus,
    * ADC arithmetic, probe selection and tie rules are all shared), which
    * is what PqSpec asserts; the difference is the plan: serving never
    * re-scans or re-trains on corpus embeddings.
    */
  /** Reconstruct the persisted model + coarse centroids from the one-row
    * model parquet — a control-plane collect, shared by the serve and
    * append halves of the index lifecycle.
    */
  private def readIndexModel(spark: org.apache.spark.sql.SparkSession,
      path: String): (PqModel, Array[Array[Long]]) = {
    val mr = spark.read.parquet(s"$path/model").head()
    val (m, kk, subDim) = (mr.getAs[Int]("m"), mr.getAs[Int]("k"), mr.getAs[Int]("sub_dim"))
    val flat = mr.getSeq[Long](mr.fieldIndex("codebooks")).toArray
    val model = PqModel(m, kk, subDim,
      Array.tabulate(m, kk)((mi, j) =>
        flat.slice((mi * kk + j) * subDim, (mi * kk + j + 1) * subDim)))
    val dim = mr.getAs[Int]("dim")
    val centsFlat = mr.getSeq[Long](mr.fieldIndex("cents")).toArray
    val cents = Array.tabulate(mr.getAs[Int]("nlist"))(j =>
      centsFlat.slice(j * dim, (j + 1) * dim))
    (model, cents)
  }

  /** ann11 (maintain half): append an embedding batch to a persisted index
    * WITHOUT retraining — the index maintenance op every production ANN
    * deployment runs between rebuilds. The increment is encoded with the
    * PERSISTED model (codebooks + coarse centroids from the one-row model
    * parquet — a control-plane collect), its codes parquet-appended to the
    * codes table; the model row is untouched, so a serving query before and
    * after the append reads the same quantizer. Cost is one pass over the
    * INCREMENT only — base embeddings are never re-read, base codes never
    * re-written (the dd11b economics applied to retrieval maintenance).
    *
    * The no-retrain trade is the documented one: vectors the training
    * distribution never saw quantize with higher error until the next
    * rebuild. The honest signal is ann6's recall row against the served
    * index — measurement, not a silent degradation.
    */
  def appendIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      increment: DataFrame): Unit = {
    val (model, cents) = readIndexModel(spark, path)
    increment.select(col("vec_id"), col("embedding"))
      .withColumn("__lut", lutColumn(col("embedding"), model))
      .select((col("vec_id") +:
        element_at(probeColumn(col("embedding"), cents, 1), 1).as("block") +:
        pqCodeCols(model, "c")): _*)
      .write.mode("append").parquet(s"$path/codes")
  }

  /** ann14 (retire half): tombstone-delete vectors from a persisted index
    * WITHOUT rewriting the codes table — the delete op between rebuilds
    * that completes the build (ann9) / append (ann11) / retire lifecycle.
    * Deleted ids parquet-append to `path/tombstones`; serving anti-joins
    * them out of the candidate set, so a retired vector can never be
    * returned as a neighbor while the corpus-sized codes stay immutable
    * (rewriting codes at every delete would be an O(corpus) op for an
    * O(batch) event). Space is reclaimed at the next rebuild — the same
    * deliberate-compaction stance as [[graft.merge.Versioned.vacuum]].
    */
  def deleteFromIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      ids: DataFrame): Unit =
    ids.select(col("vec_id")).write.mode("append").parquet(s"$path/tombstones")

  def ivfPqTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    val (model, cents) = readIndexModel(spark, path)
    val codes = spark.read.parquet(s"$path/codes")
      .withColumnRenamed("vec_id", "neighbor_id")
    // tombstones (if any) leave the candidate set via an anti-join — the
    // tombstone side is delete-batch-sized, so AQE broadcasts it; indexes
    // without deletes keep their exact prior plan (no scan added)
    val corpus =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path, "tombstones")))
        codes.join(
          spark.read.parquet(s"$path/tombstones").withColumnRenamed("vec_id", "neighbor_id"),
          Seq("neighbor_id"), "left_anti")
      else codes
    val q = queries.select(col("vec_id").as("query_id"),
        lutColumn(col("embedding"), model).as("__lut"),
        probeColumn(col("embedding"), cents, nprobe).as("__probes"))
      .select(col("query_id"), col("__lut"), explode(col("__probes")).as("block"))
    val scored = q.join(corpus, Seq("block"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("block"),
        adcCol(model, "c").as("adc"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** ann5: two-stage retrieval — the standard production ANN shape (Jégou
    * et al. 2011 §V: ADC shortlist, exact re-rank). Stage 1 ranks by
    * compressed-code ADC ([[ivfPqTopK]] with `shortlist` ≫ `k`); stage 2
    * recomputes EXACT integer squared L2 on the quantized vectors for the
    * shortlist only and keeps the true top `k`.
    *
    * Scale shape: full vectors are only ever joined against the shortlist
    * (queries × shortlist rows), never the corpus-wide candidate set — the
    * expensive exact math is bounded by the shortlist budget, and the two
    * vector-fetch joins shuffle (id, vector) pairs at shortlist cardinality.
    * Integer arithmetic end-to-end: micros ≤ 2²¹, so a 64-dim squared
    * distance is ≤ 2⁴⁸ — exact in a long, bit-identical in any engine.
    */
  /** Integer squared L2 between quantized vectors bound as `__qe`/`__ne`,
    * and the (d2 asc, neighbor_id) top-k rank — THE distance arithmetic
    * and tie rule every exact leg shares with its DuckDB oracle replay.
    * One definition ([[ivfPqRerankTopK]], [[exactGlobalTopK]],
    * [[exactL2TopK]]): a tweak cannot desynchronize one ground-truth leg
    * from the others or from the oracles.
    */
  private def quantizedD2: Column = {
    // native fused loop (graft.functions.QuantizedL2), not HOFs: zip_with/
    // aggregate lambdas evaluate interpreted per element and allocate the
    // zipped intermediate PER CANDIDATE PAIR — the exact legs' dominant CPU
    // (r20 sampled profile of ann6d: the HOF interpreter frames over the
    // cross join). Bit-identical integer arithmetic, same NULL semantics.
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.QuantizedL2(
      ColumnBridge.expression(col("__qe")), ColumnBridge.expression(col("__ne"))))
  }

  private def rankByD2(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  def ivfPqRerankTopK(emb: DataFrame, blockCol: String, k: Int, shortlist: Int,
      model: PqModel): DataFrame = {
    val cands = ivfPqTopK(emb, blockCol, shortlist, model)
      .select(col("query_id"), col("neighbor_id"), col("block"))
    val q = emb.select(col("vec_id").as("query_id"), quantize(col("embedding")).as("__qe"))
    val n = emb.select(col("vec_id").as("neighbor_id"), quantize(col("embedding")).as("__ne"))
    rankByD2(cands.join(q, Seq("query_id")).join(n, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("block"), quantizedD2.as("d2")), k)
  }

  /** IMI-probed candidates re-ranked EXACTLY — [[ivfPqRerankTopK]]'s
    * two-stage economics under [[ivfPqTopKImi]]'s blocking: the composed
    * index PRUNES (candidates per query ≈ nprobe · list depth, never the
    * corpus), the exact integer-L2 re-rank DISCRIMINATES. Recall against
    * the global exact baseline is then purely PARTITION loss — did the
    * probed lists contain the true neighbors — with no ADC distortion on
    * top, which is what makes it the right leg for characterizing the
    * quantizer itself (ann6d). Re-rank payload is the quantized vector,
    * joined per candidate pair — bounded by the same nprobe · depth that
    * bounds the candidate count.
    */
  def imiExactRerankTopK(emb: DataFrame, k: Int, imi: PqModel,
      nprobe: Int = 2, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val q = emb.select(col(idCol).as("query_id"),
      quantize(col(embCol)).as("__qe"),
      explode(imiProbeColumn(col(embCol), imi, nprobe)).as("block"))
    val c = emb.select(col(idCol).as("neighbor_id"),
      quantize(col(embCol)).as("__ne"),
      element_at(imiProbeColumn(col(embCol), imi, 1), 1).as("block"))
    rankByD2(q.join(c, Seq("block"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("block"),
        quantizedD2.as("d2")), k)
  }

  /** GLOBAL exact integer-L2 top-k — the ground truth for measuring what a
    * learned/IMI partition actually loses (ann6c): unlike [[exactL2TopK]]
    * it ranks against the WHOLE corpus, so missed neighbors in other lists
    * count as misses. All-pairs on the (filtered) query side BY DESIGN — a
    * labeled metric harness for bounded/sampled query batches, never a
    * serving path; at scale you sample queries (the ann6b argument: the
    * estimate's variance falls as 1/√queries, the cost linearly).
    */
  def exactGlobalTopK(emb: DataFrame, k: Int,
      queryFilter: Column, fanout: Int = 16): DataFrame = {
    // spread the query side before the cross join: the sampled query frame
    // is small enough that AQE coalesces it to ONE partition, landing the
    // whole q×n distance compute on one task (profiled: 9.6 s of a 10.7 s
    // run on a single core) — the exactL2TopK salting lesson in cross-join
    // form. Hash-repartitioning queries to `fanout` partitions spreads the
    // compute; the pair set and ranks are unchanged.
    val q = emb.filter(queryFilter)
      .select(col("vec_id").as("query_id"), quantize(col("embedding")).as("__qe"))
      .repartition(fanout, col("query_id"))
    val n = emb.select(col("vec_id").as("neighbor_id"), quantize(col("embedding")).as("__ne"))
    rankByD2(q.crossJoin(n)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), quantizedD2.as("d2")), k)
  }

  /** Exact integer-L2 top-k within the IVF block — the ground truth for
    * recall measurement (ann6), NOT a serving path: the block self-join is
    * brute force by design, the same baseline role [[Ann.bruteForceTopK]]
    * plays for cosine. Block-scoped, so cost is Σ_blocks n_b², never global
    * n²; run it on a sampled query set when blocks are large.
    */
  def exactL2TopK(emb: DataFrame, blockCol: String, k: Int, fanout: Int = 16): DataFrame = {
    // A bare join on `block` parallelizes only to the number of blocks (IVF
    // lists are few by design — profiled: the whole distance compute landed
    // on ONE task). Salt-replicate instead: queries carry salt =
    // query_id mod fanout, neighbors are replicated once per salt, the join
    // keys on (block, salt) — fanout× parallelism, every (q, n) pair formed
    // exactly once, result set unchanged.
    // The salt only buys parallelism if the pair-forming stage has tasks to
    // spread over: when AQE broadcasts the (tiny, fanout-replicated)
    // neighbor side, the join inherits the QUERY side's partitioning — a
    // single-row-group parquet scan = ONE task computing every block's
    // d2 matrix serially (r19 profile: 7.5 s of the row's 9 s in that one
    // task, 31 cores idle). spreadIfStarved widens exactly that case and
    // is a no-op at real scale, where the scan splits on its own.
    val q = spreadIfStarved(emb.select(col("vec_id").as("query_id"),
      col(blockCol).as("block"), quantize(col("embedding")).as("__qe")))
      .withColumn("__salt", pmod(col("query_id"), lit(fanout.toLong)))
    val n = emb.select(col("vec_id").as("neighbor_id"), col(blockCol).as("block"),
      quantize(col("embedding")).as("__ne"))
      .withColumn("__salt", explode(sequence(lit(0L), lit(fanout.toLong - 1))))
    rankByD2(q.join(n, Seq("block", "__salt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("block"), quantizedD2.as("d2")), k)
  }
}

package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed around
  * its 100 TB shuffle story:
  *
  *  - exact:    hash-groupBy on a fingerprint — shuffles (16-byte key, id).
  *  - MinHash:  shingle → signature → LSH band buckets → bucket join. Never
  *    all-pairs: candidate generation shuffles (band_hash, id) only, and the
  *    verify step touches only bucket-colliding pairs.
  *  - SimHash:  64-bit signature → 16-bit band buckets → hamming verify.
  *  - n-gram Jaccard: exact verification on candidate pairs.
  *
  * Everything is built from codegen'd higher-order array functions
  * (transform/aggregate/zip_with) + xxhash64 — no UDFs, no driver loops.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per normalized-text fingerprint. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.ops.Core.dedupByKey(
      df.withColumn("fingerprint", TextOps.fingerprint(col(textCol))),
      Seq("fingerprint"), Seq(col(idCol)))

  /** Word k-shingles of the lowercased text column (pure Column expression). */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = TextOps.tokens(lower(text))
    transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(k))))
  }

  /** MinHash signatures. Default path: the native [[graft.functions.MinHashSignature]]
    * expression — one fused codegen'd loop per document row (shingles ×
    * seeds), no explode, no aggregation, no shuffle for the signature stage
    * at all. Expects one row per document id.
    *
    * `portableHash` swaps xxhash64 for the first 60 bits of per-seed salted
    * md5 — ~3× the hash cost and an explode + per-doc MIN aggregation
    * (map-side combine collapses the explosion before the shuffle) — but
    * reproducible on any engine with md5 (DuckDB:
    * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), which buys the whole
    * MinHash+LSH pipeline a cross-engine oracle.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, k: Int = 3, portableHash: Boolean = false): DataFrame = {
    // Fast path: hash the (variable-length) shingle string ONCE, then derive
    // the `numHashes` family members by hashing the resulting 8-byte long
    // with the seed — ~numHashes× less string hashing and no per-seed concat
    // allocation, same pairwise-independence story. The portable path keeps
    // the salted-md5-per-seed form the cross-engine oracle reproduces.
    if (!portableHash) {
      // Fast path: the native MinHashSignature expression computes the whole
      // signature in one fused per-row loop — no explode, no aggregation, and
      // at scale no shuffle for the signature stage (bit-identical to the
      // explode/agg xxhash64 formulation; asserted in DedupAnnSpec). The same
      // starved-scan spread as the portable path applies: a corpus too small
      // to split (single-row-group parquet) would otherwise serialize the
      // whole signature pass onto 1–2 cores; above ~target×maxPartitionBytes
      // of input the spread is a no-op and the stage stays map-side-only.
      import org.apache.spark.sql.graft.ColumnBridge
      spreadIfStarved(df.select(col(idCol), col(textCol)))
        .select(col(idCol).as("doc"),
          ColumnBridge.column(graft.functions.MinHashSignature(
            ColumnBridge.expression(shingles(col(textCol), k)), numHashes)).as("sig"))
    } else {
      // Portable fast path (round 12): the native PortableMinHashSignature
      // expression — the same fused per-row loop as the xxhash64 path, over
      // the salted-md5 family the cross-engine oracles replay. One md5
      // digest carries two independent 60-bit hashes (hex chars 1-15 and
      // 17-31, read directly off the digest bytes — no hex/substring/conv
      // string work), so seeds 2p-1 and 2p share the digest salted with #p.
      // Value-identical to the declarative explode/agg formulation
      // (minhashSignaturesAggPortable below — kept as the spec's reference;
      // bit-identity asserted in DedupAnnSpec), and to the DuckDB oracle
      // (LlmQueries dd2b) which mirrors the same split.
      import org.apache.spark.sql.graft.ColumnBridge
      spreadIfStarved(df.select(col(idCol), col(textCol)))
        .select(col(idCol).as("doc"),
          ColumnBridge.column(graft.functions.PortableMinHashSignature(
            ColumnBridge.expression(shingles(col(textCol), k)), numHashes)).as("sig"))
    }
  }

  /** The declarative explode/agg formulation of the portable signature —
    * the reference implementation DedupAnnSpec holds the fused
    * [[graft.functions.PortableMinHashSignature]] path bit-identical to
    * (and the shape the DuckDB oracles replay). Not used on any hot path.
    */
  private[graft] def minhashSignaturesAggPortable(df: DataFrame, idCol: String,
      textCol: String, numHashes: Int, k: Int = 3): DataFrame = {
    def h(seed: Int): Column = {
      val pair = (seed + 1) / 2
      val off = if (seed % 2 == 1) 1 else 17
      conv(substring(md5(concat(col("shingle"), lit(s"#$pair"))), off, 15), 16, 10).cast("long")
    }
    val exploded = df.select(col(idCol).as("doc"),
      explode(shingles(col(textCol), k)).as("shingle"))
    val mins = (1 to numHashes).map(s => min(h(s)).as(s"h$s"))
    exploded.groupBy(col("doc"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc"), array((1 to numHashes).map(s => col(s"h$s")): _*).as("sig"))
  }

  /** See [[graft.ops.Scan.spreadIfStarved]] (stats-gated, never touches
    * `.rdd` — materializing the RDD would eagerly execute upstream stages).
    */
  private def spreadIfStarved(projected: DataFrame): DataFrame =
    graft.ops.Scan.spreadIfStarved(projected)

  /** Sub-partition LSH band buckets above `maxBucket` members. The candidate
    * self-join emits O(n²) pairs per n-doc bucket; a templated/boilerplate
    * near-dup cluster of millions of docs — exactly what 100 TB corpora
    * contain — would turn one hot bucket into a 10¹²-row skew stage. Docs in
    * an oversize bucket are split deterministically (by doc-id hash) into
    * ⌈n/maxBucket⌉ sub-buckets and pairs form within a sub-bucket only:
    * per-bucket work is bounded by ~n·maxBucket instead of n², every doc
    * still participates (nothing is silently dropped — unlike a cap-and-drop
    * guard), and the recall cost is only the cross-sub-bucket pairs of
    * already-pathological buckets. Normal buckets (n ≤ maxBucket) are
    * untouched, so the cross-engine oracles — which don't model the guard —
    * stay bit-exact at any SF where no bucket overflows; the skewed-fixture
    * spec in DedupAnnSpec proves the bound. The count window reuses the
    * existing (bucket-key) exchange, and the `observe` metric surfaces how
    * many (doc, bucket) rows were sub-partitioned per the no-silent-caps
    * rule (readable via QueryExecutionListener / Observation).
    */
  /** Metric names must be plan-unique (Spark rejects two observe nodes
    * with one name and different results — hit when two minhashLsh
    * invocations union, e.g. dd15's basePairs ∪ within-batch pairs), so
    * each observation gets an instance suffix; monitors read by prefix.
    */
  private val obsCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  private def subPartitionBuckets(banded: DataFrame, bucketCols: Seq[String],
      maxBucket: Int, portableHash: Boolean, obsName: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(bucketCols.map(col): _*)
    val docHash =
      if (portableHash) conv(substring(md5(col("doc").cast("string")), 1, 15), 16, 10).cast("long")
      else xxhash64(col("doc"))
    banded
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("sub",
        when(col("__n") <= maxBucket, lit(0L))
          .otherwise(pmod(docHash, ceil(col("__n") / lit(maxBucket)).cast("long"))))
      .observe(s"${obsName}_${obsCounter.incrementAndGet()}",
        sum(when(col("__n") > maxBucket, lit(1L)).otherwise(lit(0L))).as("subpartitioned_rows"))
      .drop("__n")
  }

  /** MinHash + LSH near-dup pairs over `df(idCol, textCol)`.
    * bands × rowsPerBand = numHashes; two docs collide when any band of
    * their signatures matches exactly. Returns (id_a, id_b, est_jaccard)
    * with id_a < id_b and estimated Jaccard ≥ `threshold`.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.5, portableHash: Boolean = false,
      maxBucket: Int = 1024): DataFrame =
    minhashLshOnSigs(
      pinnedSignatures(df, idCol, textCol, numHashes, portableHash),
      numHashes, bands, threshold, portableHash, maxBucket)

  /** The pinned `(doc, sig)` frame every multi-consumer MinHash pipeline
    * starts from: signatures computed once, repartitioned by doc (the
    * verify joins' layout), block-level persisted (see [[minhashLsh]]'s
    * cache-lifecycle note). Public so a caller composing SEVERAL legs over
    * ONE batch — the dd15b/st15 shape: index-serve pairs AND a
    * within-batch LSH AND the index fold — pays the signature pass once
    * and feeds all of them ([[minhashLshOnSigs]], the `incSigs` serve
    * variants, [[appendLshIndex]]'s `precomputedSigs`).
    */
  def pinnedSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, portableHash: Boolean): DataFrame =
    graft.ops.PinnedCaches.pin(
      minhashSignatures(df, idCol, textCol, numHashes, portableHash = portableHash)
        .repartition(col("doc")))

  /** [[minhashLsh]] over a PRE-PINNED signature frame ([[pinnedSignatures]]
    * with the same `numHashes`/`portableHash`) — the banding/bucket/verify
    * pipeline with the signature stage factored out so one batch pass can
    * feed multiple legs.
    */
  def minhashLshOnSigs(sigs: DataFrame, numHashes: Int,
      bands: Int, threshold: Double, portableHash: Boolean,
      maxBucket: Int = 1024): DataFrame = {
    val rows = numHashes / bands
    val bandHashFn = if (portableHash) "md5" else "xxhash64"
    // The COMPACT signatures (numHashes longs per doc) feed three consumers:
    // the banding explode and both sides of the verify re-attach. They are
    // the expensive stage (tokenize + shingle + hash the corpus); nothing
    // may recompute them. An explicit repartition anchor alone is NOT
    // enough — round-11 profiling of the same pattern in incrementalLsh
    // showed ReusedExchange failing to fire across the window/banding and
    // merge-join consumers (the signature stage ran once per consumer, the
    // dominant cost duplicated). persist() pins computed-once semantics at
    // block level: signatures are ~(8 + 8·numHashes) B/doc — at any corpus
    // scale two orders under the text they derive from, and exactly the
    // artifact dd11b persists to parquet anyway.
    // Cache lifecycle contract: the blocks stay pinned until the session
    // ends, the caller sweeps (spark.sqlContext.clearCache() — the
    // Bench/BenchScale isolation pattern), or — the deterministic library
    // handle — graft.ops.PinnedCaches.release() unpersists every
    // graft-pinned frame without touching caller-owned caches. Repeat
    // calls over the SAME input frame do NOT stack: CacheManager matches
    // the canonicalized plan and reuses the entry (the "already cached"
    // warning). A long-lived session feeding DIFFERENT batches should
    // prefer the persisted-artifact path (writeLshIndex +
    // incrementalLshFromIndex), whose base side is a parquet read, not a
    // session cache.
    // Banding carries ONLY (doc, band, band_hash): the old shape dragged the
    // full signature array through the 16-way explode — `bands`× the sig
    // bytes through the band shuffle and again through the self-join (39 MB
    // of 78 MB read at bench SF was duplicated sig payload). At 100 TB this
    // is the difference between shuffling ids and shuffling the corpus'
    // signatures 16 times over.
    val banded = subPartitionBuckets(
      sigs.select(col("doc"),
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
          s"$bandHashFn(concat_ws(',', slice(sig, b * $rows + 1, $rows))))")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
        .repartition(col("band"), col("band_hash")),
      Seq("band", "band_hash"), maxBucket, portableHash, "dd2_lsh_bucket_guard")
    val a = banded.select(col("doc").as("id_a"), col("band"), col("band_hash"), col("sub"))
    val b = banded.select(col("doc").as("id_b"), col("band"), col("band_hash"), col("sub"))
    // Dedup colliding pairs BEFORE touching signatures (a near-dup pair
    // collides in up to `bands` bands; the zip comparison should run once
    // per unique pair, not once per collision), then re-attach signatures.
    // merge hints keep AQE from broadcasting the sigs side — a broadcast
    // subtree cannot reuse the shuffle exchange and would recompute the
    // signature stage per join. SMJ rather than shuffled-hash because the
    // sigs side is corpus-sized: a sort streams and spills, a per-partition
    // hash build of every signature does not; sigs is already partitioned
    // by doc so only the small deduped pair set moves.
    val pairs = a.join(b, Seq("band", "band_hash", "sub"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val sa = sigs.select(col("doc").as("id_a"), col("sig").as("sig_a")).hint("merge")
    val sb = sigs.select(col("doc").as("id_b"), col("sig").as("sig_b")).hint("merge")
    pairs.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (sigMatches(col("sig_a"), col("sig_b")).cast("double") / numHashes)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** The verify kernel: positions at which two signatures agree, as ONE
    * fused codegen loop per candidate pair ([[graft.functions.SigMatchCount]]
    * — the HOF chain it replaces evaluated two interpreted lambdas and
    * allocated two intermediates per pair; bit-identical count, see the
    * expression's scaladoc).
    */
  private def sigMatches(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.SigMatchCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Incremental MinHash+LSH dedup: match a NEW batch of documents against
    * an EXISTING corpus without re-pairing the corpus with itself. This is
    * the shape a production ingestion pipeline actually runs — the corpus
    * was deduplicated once; every arriving batch only needs inc→base
    * candidate pairs, never base→base (already resolved) and never
    * inc→inc at corpus cost.
    *
    * Returns one row per increment doc: (doc_id, matched_base, est_jaccard,
    * is_dup) where matched_base is the best base match (highest estimated
    * Jaccard ≥ `threshold`, ties broken to the smallest base id) or NULL.
    *
    * 100 TB story: the base corpus contributes only its signature index —
    * the artifact a real pipeline persists once ([[writeLshIndex]]) and
    * serves every batch from ([[incrementalLshFromIndex]], which never
    * re-scans base text) — while the batch-sized increment is the only
    * side that computes fresh signatures per run. The
    * band join is equi on (band, band_hash), so work is proportional to
    * bucket collisions, never |base|×|inc|. Skew guard: base buckets larger
    * than `maxBucket` are sub-partitioned by doc-id hash (as in
    * [[minhashLsh]]) and the increment row REPLICATES to each sub-bucket —
    * a bounded ⌈n/maxBucket⌉ fan-out on the small side that keeps per-task
    * pair counts ~n·maxBucket without dropping any candidate (exactness
    * preserved, unlike the self-join guard's within-sub-bucket restriction).
    * The bucket-size map join doubles as a semi-join: increment bands whose
    * bucket has no base member carry no candidates and are pruned before
    * the pair stage.
    */
  def incrementalLsh(base: DataFrame, inc: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, threshold: Double = 0.5,
      portableHash: Boolean = true, maxBucket: Int = 1024): DataFrame =
    incrementalLshOnSigs(
      minhashSignatures(base, idCol, textCol, numHashes, portableHash = portableHash),
      inc, idCol, textCol, numHashes, bands, threshold, portableHash, maxBucket)

  /** Persist the reusable base-side artifact of [[incrementalLsh]]: the
    * MinHash signatures `(doc, sig)`, one row per base doc. This is the
    * expensive stage — a full tokenize+shingle+hash pass over the corpus
    * text — and the ONLY thing the incremental path needs from the base:
    * banding is a map-side transform of `sig`, recomputed from the index
    * at serve time for the cost of `bands` hashes per row. A pipeline
    * writes this once per corpus version and serves every arriving batch
    * from it via [[incrementalLshFromIndex]] without touching base text
    * again — the resume economics the reference's tracker pattern gets
    * from its chunk state (`snowflake_bq_sync_daily Time Details/
    * main_paginated.py:101-139`).
    */
  def writeLshIndex(base: DataFrame, idCol: String, textCol: String, path: String,
      numHashes: Int = 16, portableHash: Boolean = true): Unit = {
    // a rebuild must also clear previously APPENDED batch partitions —
    // mode("overwrite") on the base subdir alone would leave them behind
    val sigsPath = new org.apache.hadoop.fs.Path(s"$path/sigs")
    val fs = sigsPath.getFileSystem(
      base.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(sigsPath)) fs.delete(sigsPath, true)
    minhashSignatures(base, idCol, textCol, numHashes, portableHash = portableHash)
      .write.mode("overwrite").parquet(s"$path/sigs/part=base")
    // the serve-side parameters are index FACTS, not choices — persist them
    // so a mismatched serve call fails loud instead of silently deflating
    // est_jaccard (sliced-short signatures band-hash to garbage, no error)
    val spark = base.sparkSession
    import spark.implicits._
    Seq((numHashes, portableHash)).toDF("num_hashes", "portable_hash")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** dd13: fold an arrived batch INTO the persisted index — the
    * maintenance op that closes the incremental-dedup lifecycle (write
    * once → serve batches → append each served batch so the NEXT batch
    * dedups against it too). Signature parameters come FROM the index's
    * meta row, so an append cannot desynchronize the sig construction;
    * cost is one tokenize+shingle+hash pass over the INCREMENT only —
    * base text and base signatures are untouched (the
    * [[graft.ann.Pq.appendIvfIndex]] economics for dedup).
    *
    * Each batch lands in its own partition (`part=<batchTag>`) with
    * OVERWRITE semantics, so replaying a batch — a streaming retry, a
    * restarted job — rewrites its partition instead of duplicating sig
    * rows: the fold is IDEMPOTENT per tag, which is what makes st15's
    * restart-safety claim true rather than asserted. A serve that might
    * run under retry excludes its own tag ([[incrementalLshFromIndex]]'s
    * `excludeTag`) so a half-folded batch never matches itself.
    */
  def appendLshIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      inc: DataFrame, idCol: String, textCol: String, batchTag: String,
      precomputedSigs: Option[(DataFrame, Int, Boolean)] = None): Unit = {
    require(batchTag.nonEmpty && batchTag != "base" &&
      !batchTag.exists(c => c == '/' || c == '=' || c.isWhitespace),
      s"batchTag '$batchTag' must be a plain partition label (not 'base')")
    val meta = spark.read.parquet(s"$path/meta").head()
    val (idxHashes, idxPortable) =
      (meta.getAs[Int]("num_hashes"), meta.getAs[Boolean]("portable_hash"))
    // precomputedSigs: the serve-then-fold shape passes its own
    // pinnedSignatures frame — WITH the (numHashes, portableHash) it was
    // built under — so the batch is minhashed once across both legs. The
    // params are ASSERTED against the index's meta row here: sigs built
    // under different params would silently write incompatible signatures
    // into the persisted index (later serves band-hash them to garbage),
    // so caller discipline is not the contract — the assert is.
    precomputedSigs.foreach { case (_, nh, ph) =>
      require(nh == idxHashes && ph == idxPortable,
        s"appendLshIndex at $path: precomputed signatures were built with " +
          s"numHashes=$nh, portableHash=$ph but the index records " +
          s"numHashes=$idxHashes, portableHash=$idxPortable — folding them would " +
          "corrupt the index; recompute with the index's parameters")
    }
    precomputedSigs.map(_._1).getOrElse(
      minhashSignatures(inc, idCol, textCol, idxHashes, portableHash = idxPortable))
      .write.mode("overwrite").parquet(s"$path/sigs/part=$batchTag")
  }

  /** [[incrementalLsh]] served from a persisted signature index
    * ([[writeLshIndex]]): identical output to the from-text path for the
    * same base corpus (the signatures ARE the base's contribution), but
    * the plan's base side is ONE map-side pass over the narrow (doc, sig)
    * parquet — semi-join-pruned to the batch's own band buckets before
    * anything shuffles (see [[incrementalVerified]]) — and never scans
    * base text. `inc` must be batch-bounded (its signatures and bucket
    * keys broadcast — the incrementalVerified precondition).
    * `numHashes`/`portableHash` are validated
    * against the index's persisted meta row — a mismatch would otherwise
    * produce WRONG results silently (short slices band-hash empty arrays
    * into one shared bucket; the verify re-attach reads absent positions
    * as non-matches and deflates est_jaccard), not an exception.
    */
  def incrementalLshFromIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, inc: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, threshold: Double = 0.5,
      portableHash: Boolean = true, maxBucket: Int = 1024,
      excludeTag: Option[String] = None,
      includeTags: Option[Seq[String]] = None,
      incSigs: Option[DataFrame] = None): DataFrame =
    incrementalLshOnSigs(indexSigs(spark, indexPath, numHashes, portableHash,
        excludeTag, includeTags), inc, idCol,
      textCol, numHashes, bands, threshold, portableHash, maxBucket,
      persistBase = false, incSigs = incSigs)

  /** Meta-validated read of a persisted signature index: the serve-side
    * parameters must match the index's meta row — a mismatch would
    * produce WRONG results silently (short slices band-hash empty arrays
    * into one shared bucket; the verify re-attach reads absent positions
    * as non-matches and deflates est_jaccard), not an exception.
    * excludeTag: a retried serve-then-fold batch skips ITS OWN partition
    * (partition-pruned at planning), so a half-folded batch never matches
    * itself. includeTags: when set, the base side keeps ONLY the listed
    * partitions (also partition-pruned) — a multi-tenant or multi-run
    * index serves each stream against exactly its own lineage (`"base"` +
    * its prior batch tags) while other runs' folded partitions coexist in
    * the same index untouched (st15's shared-index steady-state shape).
    */
  private def indexSigs(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, numHashes: Int, portableHash: Boolean,
      excludeTag: Option[String],
      includeTags: Option[Seq[String]] = None): DataFrame = {
    val meta = spark.read.parquet(s"$indexPath/meta").head()
    val (idxHashes, idxPortable) =
      (meta.getAs[Int]("num_hashes"), meta.getAs[Boolean]("portable_hash"))
    require(idxHashes == numHashes && idxPortable == portableHash,
      s"index at $indexPath was written with numHashes=$idxHashes, " +
        s"portableHash=$idxPortable; serve called with numHashes=$numHashes, " +
        s"portableHash=$portableHash — mismatched parameters would silently " +
        "deflate similarity estimates")
    val sigs0 = spark.read.parquet(s"$indexPath/sigs")
    val sigs = includeTags
      .map(ts => sigs0.filter(col("part").isin(ts: _*))).getOrElse(sigs0)
    excludeTag.map(t => sigs.filter(col("part") =!= lit(t))).getOrElse(sigs)
  }

  /** ALL verified inc→base near-dup pairs — `(id_a, id_b, est_jaccard)`
    * with id_a the increment doc, id_b the base doc, est ≥ threshold.
    * [[incrementalLsh]] reduces this to best-match-per-doc; the full edge
    * set is what [[incrementalDupGroups]] consumes (a group update needs
    * every edge, not just each doc's best one — two edges from one batch
    * doc can MERGE two existing groups).
    */
  def incrementalLshPairs(base: DataFrame, inc: DataFrame, idCol: String,
      textCol: String, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, portableHash: Boolean = true,
      maxBucket: Int = 1024): DataFrame =
    incrementalVerified(
      minhashSignatures(base, idCol, textCol, numHashes, portableHash = portableHash),
      inc, idCol, textCol, numHashes, bands, threshold, portableHash,
      maxBucket, persistBase = true)._1
      .select(col("id_inc").as("id_a"), col("id_base").as("id_b"),
        col("est_jaccard"))

  /** [[incrementalLshPairs]] served from a persisted signature index
    * ([[writeLshIndex]]) — the edge-set twin of
    * [[incrementalLshFromIndex]], for the GROUP update path: identical
    * output to the from-text variant over the same base corpus, but the
    * base side reads narrow sig parquet and never scans base text
    * (persistBase = false for the same reason as the from-index serve).
    * Feed the result (plus a within-batch [[minhashLsh]]) to
    * [[incrementalDupGroups]] over [[readGroups]]' artifact and the whole
    * dedup lifecycle — signatures AND groups — runs at increment cost.
    */
  def incrementalLshPairsFromIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, inc: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, threshold: Double = 0.5,
      portableHash: Boolean = true, maxBucket: Int = 1024,
      excludeTag: Option[String] = None,
      incSigs: Option[DataFrame] = None): DataFrame =
    incrementalVerified(indexSigs(spark, indexPath, numHashes, portableHash,
        excludeTag), inc, idCol, textCol, numHashes, bands, threshold,
      portableHash, maxBucket, persistBase = false, incSigs = incSigs)._1
      .select(col("id_inc").as("id_a"), col("id_base").as("id_b"),
        col("est_jaccard"))

  /** Persist the [[dupGroups]] artifact `(doc_id, group_id)` — the group
    * map half of the incremental lifecycle, written once per corpus
    * version next to the signature index. [[incrementalDupGroups]] folds
    * each batch's edges into [[readGroups]]' frame at affected-subgraph
    * cost; without the artifact every fold pays a from-scratch
    * [[dupGroups]] over the full corpus' pairs just to build its input —
    * the exact rebuild the incremental operator exists to avoid.
    */
  def writeGroups(groups: DataFrame, path: String): Unit =
    groups.select(col("doc_id"), col("group_id"))
      .write.mode("overwrite").parquet(path)

  /** Read a persisted [[writeGroups]] artifact. */
  def readGroups(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  private def incrementalLshOnSigs(baseSigs: DataFrame, inc: DataFrame,
      idCol: String, textCol: String, numHashes: Int, bands: Int,
      threshold: Double, portableHash: Boolean, maxBucket: Int,
      persistBase: Boolean = true, incSigs: Option[DataFrame] = None): DataFrame = {
    val (verified, sigI) = incrementalVerified(baseSigs, inc, idCol, textCol,
      numHashes, bands, threshold, portableHash, maxBucket, persistBase, incSigs)
    // best base match per increment doc: highest jaccard, ties → min base id
    val best = verified
      .groupBy(col("id_inc"))
      .agg(max(struct(col("est_jaccard"), (-col("id_base")).as("__negid"))).as("__best"))
      .select(col("id_inc").as("doc"),
        (-col("__best.__negid")).as("matched_base"),
        col("__best.est_jaccard").as("est_jaccard"))
    sigI.select(col("doc"))
      .join(best, Seq("doc"), "left")
      .select(col("doc").as("doc_id"), col("matched_base"), col("est_jaccard"),
        col("matched_base").isNotNull.as("is_dup"))
  }

  /** The shared candidate+verify core of the incremental paths: banding,
    * batch-scoped bucket prune, bounded-replication skew guard, signature
    * verify — yielding (verified pairs, increment signature frame).
    *
    * SERVE COST IS O(batch), NOT O(index) (r20): only buckets the BATCH's
    * own band hashes touch can produce candidates, so the index's banded
    * rows are semi-joined against the batch's (band, band_hash) set —
    * broadcast, i.e. a map-side filter on the index scan — BEFORE the
    * bucket-size count window. Every shuffle downstream of the scan
    * (window, bucket map, pair join, verify) then carries matched-bucket
    * rows (bounded by batch size × collision rate), never the index. The
    * banded rows also CARRY their signature through the prune: the verify
    * reads `sig_b` off the surviving candidate rows in place, which
    * removes both the second corpus-sized scan of the signature table and
    * the sort-merge shuffle that re-attach paid per serve. The per-serve
    * residual on the base side is exactly one map-side pass over the
    * signature index (scan + band hashes + broadcast-semi probe).
    *
    * PRECONDITION (also the broadcast-safety bound): `inc` is a
    * batch-bounded frame — its signature frame and its distinct bucket-key
    * set are both broadcast. A corpus-sized "increment" belongs on
    * [[minhashLsh]], not here; nothing in the API enforces the bound, so
    * it is a documented contract of every incremental entry point.
    */
  private def incrementalVerified(baseSigs: DataFrame, inc: DataFrame,
      idCol: String, textCol: String, numHashes: Int, bands: Int,
      threshold: Double, portableHash: Boolean, maxBucket: Int,
      persistBase: Boolean, incSigs: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val rows = numHashes / bands
    val bandHashFn = if (portableHash) "md5" else "xxhash64"
    // banding KEEPS the signature column (see the scaladoc: post-prune the
    // surviving rows are batch-bounded, so carrying ~8·numHashes bytes per
    // row is candidate-sized, never index-sized, beyond the map-side scan)
    def banded(sigs: DataFrame): DataFrame =
      sigs.select(col("doc"), col("sig"),
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
          s"$bandHashFn(concat_ws(',', slice(sig, b * $rows + 1, $rows))))")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    // persist the base signatures only on the from-text path, where the
    // frame is a computed signature stage (round-11 100x profile: the
    // signature stage is the dominant cost and must not recompute per
    // consumer). On the from-index path the base side is a narrow parquet
    // read — re-reading beats pinning one cache entry per served batch —
    // and since r20 it is consumed map-side only, so the doc-layout
    // repartition the old merge-join re-attach needed is gone with it.
    val sigB =
      if (persistBase) graft.ops.PinnedCaches.pin(baseSigs.repartition(col("doc")))
      else baseSigs
    // incSigs: a caller composing several legs over one batch (dd15b/st15)
    // passes its pinnedSignatures frame so the batch is minhashed ONCE
    // across the serve, the within-batch LSH, and the index fold
    val sigI = incSigs.getOrElse(
      pinnedSignatures(inc, idCol, textCol, numHashes, portableHash))
    val docHash =
      if (portableHash) conv(substring(md5(col("doc").cast("string")), 1, 15), 16, 10).cast("long")
      else xxhash64(col("doc"))
    val bandedI0 = banded(sigI)
    // the batch's bucket-key universe — batch-bounded (≤ batch rows × bands
    // distinct hashes), broadcast as the semi-join build below. Reading it
    // re-executes only a map-side explode over the PINNED batch signatures.
    val batchBuckets = bandedI0.select(col("band"), col("band_hash")).distinct()
    // base side: prune to batch-touched buckets FIRST (map-side broadcast
    // semi — the count window must not shuffle the full index per serve),
    // then bucket sizes and ⌈n/maxBucket⌉ sub-bucket split over the pruned
    // rows. Pruning is exact: the semi keys on the whole bucket key, so a
    // surviving bucket keeps every index member (its count is unchanged)
    // and a pruned bucket had no batch row to pair with. Pinned because it
    // has two consumers (the bucket map's broadcast build and the pair
    // join) that would otherwise each re-run the scan+prune+window; the
    // broadcast build materializes first, so the pair join reads blocks.
    val bandedB = graft.ops.PinnedCaches.pin(banded(sigB)
      .join(batchBuckets.hint("broadcast"), Seq("band", "band_hash"), "left_semi")
      .withColumn("__nsub",
        greatest(ceil(count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_hash"))) / lit(maxBucket)).cast("long"), lit(1L)))
      .withColumn("sub", pmod(docHash, col("__nsub"))))
    // bucket → nsub map (distinct surviving buckets only — batch-bounded)
    val bucketMap = bandedB.select(col("band"), col("band_hash"), col("__nsub")).distinct()
    // inc side: inner join prunes bucket-misses, explode replicates to subs
    val bandedI = bandedI0.join(bucketMap, Seq("band", "band_hash"))
      .select(col("doc"), col("band"), col("band_hash"),
        explode(sequence(lit(0L), col("__nsub") - 1)).as("sub"))
    // candidate pairs, deduped across colliding bands WITH the base
    // signature in tow (sig_b is functionally dependent on id_base, so the
    // distinct's row set is exactly the old (id_inc, id_base) distinct)
    // shuffle_hash, not sort-merge: both sides are batch-bounded post-prune,
    // so a per-partition hash build is safe at any scale and skips the two
    // per-serve sorts SMJ would pay (AQE upgrades it to broadcast when the
    // runtime sizes allow — either way, no sort)
    val pairs = bandedI.select(col("doc").as("id_inc"), col("band"), col("band_hash"), col("sub"))
      .join(bandedB.select(col("doc").as("id_base"), col("sig").as("sig_b"),
          col("band"), col("band_hash"), col("sub")).hint("shuffle_hash"),
        Seq("band", "band_hash", "sub"))
      .select(col("id_inc"), col("id_base"), col("sig_b")).distinct()
    // verify on full signatures. The INCREMENT side is batch-bounded at any
    // scale and its signature frame is pinned (the broadcast build reads
    // cached blocks, never recomputes the signature stage); the base
    // signatures ride the candidate rows (see above), so no corpus-sized
    // frame joins here at all.
    val si = sigI.select(col("doc").as("id_inc"), col("sig").as("sig_i")).hint("broadcast")
    val verified = pairs.join(si, Seq("id_inc"))
      .select(col("id_inc"), col("id_base"),
        (sigMatches(col("sig_i"), col("sig_b")).cast("double") / numHashes)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
    (verified, sigI)
  }

  /** dd15: update dedup groups from a batch's NEW near-dup edges without
    * recomputing components for the corpus — the incremental half of
    * [[dupGroups]], closing the last from-scratch step in the dedup
    * lifecycle (dd11 finds the batch's edges incrementally; this folds
    * them into the group map incrementally too).
    *
    * Work is bounded by the AFFECTED SUBGRAPH, never the corpus: only
    * groups containing a vertex of some new edge can change, so the
    * propagation runs over (new edges) ∪ (star edges doc→group_id of
    * touched groups' members). The star edges reconstruct the old
    * connectivity exactly — group_id is itself a member (the min), so
    * every old path is represented through it — and the subgraph's
    * min-label equals the full recompute's: a merged component's minimum
    * is the min over all member ids, and every member of a touched group
    * is in the subgraph while untouched groups cannot gain or lose
    * members without an incident new edge (which would have touched
    * them). Hence: `incrementalDupGroups(dupGroups(P0), P1)` ≡
    * `dupGroups(P0 ∪ P1)` — the equivalence the spec asserts directly
    * and dd15's oracle replays from scratch.
    *
    * `groups` is [[dupGroups]] output (doc_id, group_id); `newPairs` is
    * (id_a, id_b) — typically [[incrementalLshPairs]] (batch→base) UNION
    * a within-batch [[minhashLsh]] (batch×batch), per st15's contract
    * note.
    *
    * EAGER AT CALL TIME: the batch's edge list and the touched-group set
    * are materialized by eager localCheckpoints when this method is
    * CALLED (r19 — each would otherwise re-execute the whole LSH
    * candidate+verify pipeline once per broadcast build, 13× in the dd15b
    * profile). Callers that only want a plan (explain, conditional
    * wiring) pay the edge pipeline's execution here; both frames are
    * batch-bounded at any scale.
    */
  def incrementalDupGroups(groups: DataFrame, newPairs: DataFrame): DataFrame = {
    // Materialize the batch's edge list ONCE before the fan-out. It feeds
    // the vertex set, dupGroups' edge union AND (through verts → touched)
    // the build sides of the semi/anti joins below — each of which AQE
    // broadcast-builds in a SEPARATE job that would re-execute the whole
    // LSH candidate+verify pipeline behind `newPairs` (r19 profile of the
    // dd15b serve: the banding/verify subtree ran 13×, one per broadcast
    // build; ~160 stages of pure fixed latency, 17 s wall → 6.5 s with the
    // fold materialized once — a lazy block-level pin was tried and left
    // 1.7 s of concurrent-recompute races + cache serialization on the
    // table). The frame is batch-edge-sized at any scale — exactly what
    // the eager checkpoint of `batch` upstream already assumes. PlanSpec's
    // artifact-only serve audit reads the edge legs' plan BEFORE this
    // truncation point plus the returned plan after it (the checkpoint
    // hides upstream scans from the final plan, not from the audit).
    val np = newPairs.select(col("id_a"), col("id_b")).localCheckpoint(true)
    val verts = np.select(col("id_a").as("doc_id"))
      .unionByName(np.select(col("id_b").as("doc_id"))).distinct()
    // touched has two broadcast-build consumers (members' semi, the final
    // anti); checkpointing it costs one tiny job and stops both from
    // re-running the groups⋈verts semi — it is group-id-sized (bounded by
    // the batch's blast radius, never the corpus).
    val touched = groups.join(verts, Seq("doc_id"), "left_semi")
      .select(col("group_id")).distinct().localCheckpoint(true)
    val members = groups.join(touched, Seq("group_id"), "left_semi")
    val starEdges = members.filter(col("doc_id") =!= col("group_id"))
      .select(col("doc_id").as("id_a"), col("group_id").as("id_b"))
    val sub = dupGroups(np.unionByName(starEdges))
    groups.join(touched, Seq("group_id"), "left_anti")
      .select(col("doc_id"), col("group_id"))
      .unionByName(sub)
  }

  /** SimHash signatures: explode tokens, per-bit ±1 vote sums with
    * map-side combine, pack the sign bits into a bigint. Same scale shape as
    * [[minhashSignatures]]: the shuffle carries one int per bit per doc.
    * Default 64 bits from xxhash64; `portableHash` uses the 60 md5-derived
    * bits any engine can reproduce (see minhashSignatures).
    */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
      portableHash: Boolean = false): DataFrame = {
    if (!portableHash) {
      // Fast path: native fused per-row loop (see MinHashSignature) — no
      // explode, no 64-column vote aggregate, no shuffle. Bit-identity with
      // the explode/agg formulation asserted in DedupAnnSpec.
      import org.apache.spark.sql.graft.ColumnBridge
      return spreadIfStarved(df.select(col(idCol), col(textCol)))
        .select(col(idCol).as("doc"),
        ColumnBridge.column(graft.functions.SimHashSignature(
          ColumnBridge.expression(TextOps.tokens(lower(col(textCol)))))).as("sig"))
    }
    val bits = 60
    val hashCol = conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
    // spread before the tokenize+hash explode (minhashSignatures' policy:
    // the per-row hashing is the dominant CPU and must not run at a
    // single-row-group scan's one-task partitioning; stats-gated no-op at
    // real scale)
    val exploded = spreadIfStarved(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc"), explode(TextOps.tokens(lower(col(textCol)))).as("tok"))
      .select(col("doc"), hashCol.as("h"))
    val votes = (0 until bits).map(j =>
      sum(when(shiftrightunsigned(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$j"))
    val packed = (0 until bits)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    exploded.groupBy(col("doc"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc"), packed.as("sig"))
  }

  /** SimHash near-dup pairs: 4-band bucketing (16 bits per band, 15 in
    * portable mode), verify by hamming distance ≤ maxHamming (bit_count of
    * xor).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3,
      portableHash: Boolean = false, maxBucket: Int = 1024): DataFrame = {
    val bandBits = if (portableHash) 15 else 16
    val mask = (1 << bandBits) - 1
    val sigs = simhashSignatures(df, idCol, textCol, portableHash)
    // same ReusedExchange anchor as minhashLsh: one computation, one shuffle;
    // same oversize-bucket sub-partition guard (see subPartitionBuckets)
    val banded = subPartitionBuckets(
      sigs.select(col("doc"), col("sig"),
        posexplode(expr(
          s"transform(sequence(0, 3), b -> shiftrightunsigned(sig, b * $bandBits) & $mask)")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_bits")
        .repartition(col("band"), col("band_bits")),
      Seq("band", "band_bits"), maxBucket, portableHash, "dd3_simhash_bucket_guard")
    val a = banded.select(col("doc").as("id_a"), col("sig").as("sig_a"), col("band"),
      col("band_bits"), col("sub"))
    val b = banded.select(col("doc").as("id_b"), col("sig").as("sig_b"), col("band"),
      col("band_bits"), col("sub"))
    a.join(b, Seq("band", "band_bits", "sub"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs (verification
    * stage; candidates come from LSH buckets or a blocking key).
    */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    // Only docs that appear in a candidate pair need shingling — at scale the
    // candidate set is a small fraction of the corpus, so a semi-join prune
    // before the (expensive) shingle projection beats shingling everything
    // and discarding at the join. AQE turns this into a broadcast semi-join
    // when the candidate id set is small, i.e. a map-side filter.
    val wanted = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol)).distinct()
    // spread the text side before the (compute-dense) shingle projection:
    // with `wanted` broadcast, the semi join inherits the docs scan's
    // partitioning — over a single-row-group parquet file the whole
    // tokenize+shingle pass runs as one task (stats-gated; no-op at real
    // scale)
    val grams = graft.ops.Scan.spreadIfStarved(docs.select(col(idCol), col(textCol)))
      .join(wanted, Seq(idCol), "left_semi")
      .select(col(idCol).as("doc"),
        array_distinct(shingles(col(textCol), k)).as("grams"))
    pairs
      .join(grams.select(col("doc").as("id_a"), col("grams").as("grams_a")), Seq("id_a"))
      .join(grams.select(col("doc").as("id_b"), col("grams").as("grams_b")), Seq("id_b"))
      // |A∪B| = |A| + |B| − |A∩B| (arrays are distinct): one hash-probe pass
      // per pair instead of two, and no union-array allocation.
      .withColumn("inter", size(array_intersect(col("grams_a"), col("grams_b"))).cast("double"))
      .select(col("id_a"), col("id_b"),
        (col("inter") /
          ((size(col("grams_a")) + size(col("grams_b"))).cast("double") - col("inter")))
          .as("jaccard"))
  }

  /** Connected components over a near-dup pair list — the step that turns
    * pairwise matches into dedup groups (keep one doc per group). Iterative
    * min-label propagation: every round each vertex adopts the smallest
    * label among itself and its neighbors; converges in O(diameter) rounds
    * (near-dup graphs are shallow — cliques and short chains).
    *
    * 100 TB story: no driver-side graph — each round is one shuffle keyed on
    * vertex id, the per-round `isEmpty` convergence probe is an aggregate,
    * and `localCheckpoint` truncates the otherwise-exponential plan lineage.
    * Returns (doc_id, group_id) with group_id = smallest reachable doc id.
    */
  def dupGroups(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // Symmetrize with ONE explode pass, not a self-union: the union form
    // referenced the `pairs` subtree twice, and the candidate+verify
    // pipeline behind it executed once per branch (r19 tx20b profile: the
    // banding/verify stages ran 2× per leg under this checkpoint's job —
    // ReusedExchange does not fire across differently-projected union
    // arms). Same rows, same distinct, half the pair-pipeline executions.
    val edges = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      .distinct()
      // Checkpoint PARTITIONED BY src (LogicalRDD preserves the physical
      // partitioning): every round's edges⋈labels join clusters on src, so
      // the static edge set — the loop's biggest frame at scale — shuffles
      // once here instead of once per round.
      .repartition(col("src"))
      .localCheckpoint(true)
    // LAZY checkpoint: the Σlabel convergence probe below is the action that
    // materializes it, so each round costs ONE job, not two (an eager
    // checkpoint + separate probe doubled the per-round fixed latency that
    // dominates this iterative operator — the data itself is tiny per round).
    // Seed labels with the FIRST neighbor-propagation round closed-form:
    // labels₀(v) = min(v, min of v's neighbors) is one groupBy over the
    // symmetric edge set — no join, no separate vertex-distinct pass — and
    // equals exactly what the old identity seed's first loop round
    // computed (sans doubling). Shallow graphs (near-dup cliques) now
    // converge one full round earlier; the fixpoint is unchanged.
    var labels = edges.groupBy(col("dst").as("id"))
      .agg(min(col("src")).as("__nbr"))
      .select(col("id"), least(col("id"), col("__nbr")).as("label"))
      .localCheckpoint(false)
    // labels only ever decrease, so Σlabel is a strictly decreasing potential
    // until the fixpoint — an unchanged sum IS convergence, probed with one
    // aggregate instead of a self-join per round. SUM over zero rows is NULL,
    // which doubles as the "no near-dup pairs" signal (a normal outcome).
    val sum0 = labels.agg(sum(col("label"))).head().getAs[java.lang.Long](0)
    if (sum0 == null)
      return labels.select(col("id").as("doc_id"), col("label").as("group_id"))
    var prevSum = sum0.longValue
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbr = edges
        .join(labels.select(col("id").as("src"), col("label").as("src_label")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min(col("src_label")).as("nbr_label"))
      // lazy checkpoint: prop feeds BOTH sides of the doubling join under
      // different partitionings (label vs id-as-label), so ReusedExchange
      // can't fire — without this the edges⋈labels propagation would run
      // twice per round. Materialized by the same Σlabel probe job below.
      val prop = labels.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint(false)
      // Pointer doubling: additionally adopt the label OF one's current label
      // (labels are vertex ids, so it's a self-join). Neighbor propagation
      // alone needs O(diameter) rounds — a chain of k near-dup revisions
      // takes k rounds; with doubling the hop distance halves every round,
      // so convergence is O(log diameter). The adopted label is the label of
      // a reachable vertex, so labels still only decrease within components.
      val next = prop.join(
          prop.select(col("id").as("label"), col("label").as("label_of_label")),
          Seq("label"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("label_of_label"), col("label"))).as("label"))
        .localCheckpoint(false)
      val nextSum = next.agg(sum(col("label"))).head().getLong(0)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      i += 1
    }
    // a silent cap would return half-merged groups as if they were final
    if (!converged)
      throw new IllegalStateException(
        s"dupGroups did not converge within $maxIter rounds; raise maxIter " +
          "(graph diameter exceeds the round budget)")
    labels.select(col("id").as("doc_id"), col("label").as("group_id"))
  }

  /** dd8: exact substring duplicate spans (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" §4.1 ExactSubstr, adapted
    * to fixed token windows): every k-token window whose text occurs in at
    * least `minDocs` DISTINCT documents is duplicated, and
    * overlapping/adjacent duplicated windows merge into maximal spans — the
    * regions ExactSubstr would cut. Within-doc repetition is tx7's domain;
    * this op flags cross-document verbatim reuse at word-position
    * granularity, the step between doc-level dedup (dd1/dd2) and nothing.
    *
    * Output: (doc_id, span_start, span_end, span_words) — 0-based inclusive
    * token positions of each maximal duplicated region.
    *
    * Scale shape: one shingle explode (k·corpus tokens), one groupBy on the
    * shingle (map-side combine collapses per-partition repeats before the
    * shuffle), one join of positions against the (small — boilerplate is
    * rare relative to the corpus) duplicated-shingle set, then a per-doc
    * window over marked positions only.
    *
    * `hashedKey = true` is the 100 TB path: the k-word shingle string
    * collapses to its xxhash64 BEFORE the groupBy/join, so both shuffles
    * carry 8-byte longs instead of k words of text (at k = 8 and ~6 bytes
    * per word, ~6× less shuffle payload on the pipeline's dominant
    * exchanges). Output is bit-identical to the string-key run unless two
    * DISTINCT shingles collide in 64 bits (~n²/2⁶⁵ for n distinct shingles
    * — at a trillion shingles, odds ~3%, and a collision only ever
    * over-marks a window as duplicated, never drops a real span). The
    * string-key run (`hashedKey = false`, default) is the cross-engine
    * oracle twin — same rows, oracle-reproducible key.
    * Merge rule: windows at positions p, q (p < q) cover contiguous text
    * iff q - p <= k, so a gap strictly greater than k starts a new span.
    */
  def substringSpans(docs: DataFrame, idCol: String, textCol: String, k: Int,
      minDocs: Int = 2, hashedKey: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = TextOps.tokens(lower(col(textCol)))
    // a doc with fewer than k tokens has no k-window (and can't carry a span)
    val windows = when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))
    val keyed = if (hashedKey) {
      // hash inside the same projection as the explode so the raw string
      // never reaches an exchange
      transform(windows, w => xxhash64(w))
    } else windows
    // spread before the tokenize+window explode — it is the pipeline's
    // dominant CPU, it runs at the scan's partitioning (one task over a
    // single-row-group file), and it has two consumers (the dup groupBy
    // and the position-mark join) so a serial run costs double
    val shingled = graft.ops.Scan.spreadIfStarved(
        docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"), posexplode(keyed).as(Seq("pos", "shingle")))
    val dup = shingled.groupBy(col("shingle"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("shingle"))
    val marked = shingled.join(dup, Seq("shingle")).select(col("doc_id"), col("pos"))
    // Position arithmetic stays in int by a structural bound (round-12
    // audit): pos indexes tokens WITHIN one document, and a single text
    // cell cannot exceed ~2³¹ chars (JVM string/array cap), so pos,
    // pos − prev, max(pos) + k − 1 and the span width are all < 2³¹.
    // The island counter is a window sum — Spark widens int sums to long.
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prev = lag(col("pos"), 1).over(w)
    marked
      .withColumn("__new", when(prev.isNull || col("pos") - prev > k, 1).otherwise(0))
      .withColumn("__island", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__island"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + lit(k - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + lit(1)).as("span_words"))
  }

  /** dd8b: the cleaned corpus — [[substringSpans]] regions excised from
    * every document and the text rebuilt from the surviving tokens. Spans
    * are removed from EVERY occurrence (C4-style boilerplate cut): Lee et
    * al.'s cut-from-all-but-one needs an arbitrary global owner per
    * region, which no two engines would pick identically; remove-everywhere
    * is the deterministic, conservative choice. Output text is the
    * whitespace-normalized lowercase rebuild (the working form at this
    * pipeline stage) for every doc, span-less docs included.
    *
    * Scale shape: spans aggregate to one small per-doc array (broadcast-or
    * shuffle at span cardinality, never token cardinality); the excision
    * itself is a per-row HOF over the token array — no extra shuffle.
    */
  def exciseSpans(docs: DataFrame, spans: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val sp = spans.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    val toks = TextOps.tokens(lower(col(textCol)))
    val spansArr = coalesce(col("__spans"),
      array().cast("array<struct<span_start:int,span_end:int>>"))
    val keptIdx = filter(sequence(lit(0), size(toks) - 1), i =>
      !exists(spansArr, s =>
        i >= s.getField("span_start") && i <= s.getField("span_end")))
    docs.select(col(idCol).as("doc_id"), col(textCol))
      .join(sp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        array_join(transform(keptIdx, i => element_at(toks, i + 1)), " ")
          .as("text_clean"),
        (size(toks) - size(keptIdx)).as("n_removed"))
  }

  /** dd10: SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication") — duplicate MEANING, not
    * duplicate bytes: cluster embeddings with a learned coarse quantizer
    * (k-means, [[graft.ann.Pq.coarseTrain]] — the same trainer, tie rules
    * and oracle replay ann7 uses), call two docs semantic duplicates when
    * their within-cluster cosine ≥ `threshold`, connect duplicates into
    * groups ([[dupGroups]]), and KEEP the group member FARTHEST from its
    * cluster centroid — the paper's choice: the least-typical example
    * carries the most training signal; the near-centroid copies are the
    * redundant ones.
    *
    * Output: every input vector, tagged (block, group_id, group_size,
    * kept). Filtering `kept` yields the pruned corpus.
    *
    * Scale shape: candidate pairs form within a coarse list only (never
    * global all-pairs), and with `adaptiveNlist` per-list depth is bounded
    * as the corpus grows — the ann7 property. Centroids join back as a
    * BROADCAST table (nlist rows) for the centroid-distance rule, so no
    * per-row expression grows with nlist. Components run at pair
    * cardinality; the final tagging is one group-keyed window.
    *
    * Determinism: cluster assignment and centroid distances are integer
    * arithmetic on quantized micros; cosine rounds to 1e-6 before the
    * threshold (the dd5 rule) — every cut reproduces bit-for-bit in any
    * engine.
    */
  def semDedup(emb: DataFrame, cents: Array[Array[Long]],
      threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val homed = emb.select(col("vec_id"), col("embedding"),
      graft.ann.Pq.coarseAssign(col("embedding"), cents).as("block"))
    val centDf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("block", "__cent")
    val d2c = aggregate(
      zip_with(graft.ann.Pq.quantize(col("embedding")), col("__cent"),
        (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val withD = homed.join(broadcast(centDf), Seq("block"))
      .select(col("vec_id"), col("block"), col("embedding"), d2c.as("__d2c"))
    val pairs = embeddingNearDups(
      withD.select(col("vec_id"), col("block"), col("embedding")), "block", threshold)
    val groups = dupGroups(pairs.select(col("id_a"), col("id_b")))
      .withColumnRenamed("doc_id", "vec_id")
    val labeled = withD.select(col("vec_id"), col("block"), col("__d2c"))
      .join(groups, Seq("vec_id"), "left")
      .withColumn("group_id", coalesce(col("group_id"), col("vec_id")))
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("group_id"))
    labeled
      .withColumn("group_size", count(lit(1)).over(wg))
      .withColumn("__rk",
        row_number().over(wg.orderBy(col("__d2c").desc, col("vec_id"))))
      .select(col("vec_id"), col("block"), col("group_id"), col("group_size"),
        (col("__rk") === 1).as("kept"))
  }

  /** Embedding near-dup pairs by exact cosine within a blocking key (the
    * IVF-style coarse partition; brute force within the block only).
    */
  def embeddingNearDups(emb: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    val base = emb.select(col("vec_id"), col(blockCol).as("block"), col("embedding"))
    val a = base.select(col("vec_id").as("id_a"), col("block"), col("embedding").as("e_a"))
    val b = base.select(col("vec_id").as("id_b"), col("block"), col("embedding").as("e_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      // native fused cosine (graft.functions.CosineSimilarity), rounded to
      // 1e-6 so the threshold cut is reproducible across engines
      .select(col("id_a"), col("id_b"), col("block"),
        graft.ann.Ann.cosine(col("e_a"), col("e_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}

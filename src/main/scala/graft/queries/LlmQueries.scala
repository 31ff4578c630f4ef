package graft.queries

import graft.ann.Ann
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sources.Tables
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators (beyond the reference, per the
  * BASELINE north star): dedup (dd*), similarity search (ann*), text
  * analysis (tx*), multimodal plumbing (mm*). Every query carries a DuckDB
  * oracle: md5/string ops directly; xxhash64-default ops (dd2/dd3/ann2) via
  * the [[OracleDumps]] signature side-dump (downstream replayed in SQL) plus
  * an engine-portable md5 twin that pins the hash stage's algorithm.
  */
object LlmQueries extends QueryModule {

  /** dd8/dd8b shared input: the documents corpus plus planted prefix-copy
    * docs (guaranteed spans on top of the organic boilerplate). The span
    * pipeline tokenizes+explodes this frame twice (dup-set pass +
    * position-mark pass — recompute is the scale-correct choice, see
    * [[graft.dedup.Dedup.substringSpans]]), and that work is CPU-dense; but
    * at bench SF the fixture is one small parquet file that splits into ~2
    * scan tasks, serializing the suite's most expensive query onto 2 of 32
    * cores. Widen to the session's parallelism ONLY when the scan is
    * under-partitioned — at production scale the file count dwarfs the core
    * count, the branch never fires, and no full-corpus shuffle is added.
    */
  private def dd8Corpus(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val planted = docs.filter(pmod(col("doc_id"), lit(13)) === 0)
      .select((col("doc_id") + 300000).as("doc_id"),
        concat(
          array_join(slice(TextOps.tokens(lower(col("text"))), 1, 16), " "),
          lit(" planted unique tail "), col("doc_id")).as("text"))
    val corpus = docs.unionByName(planted)
    val cores = s.sparkContext.defaultParallelism
    if (corpus.rdd.getNumPartitions < cores) corpus.repartition(cores) else corpus
  }

  /** dd2/dd2b shared input: the corpus plus near-dup mutations (suffix-token
    * variants of every 7th doc under fresh ids). Shared with
    * [[OracleDumps]] so the xxhash64 signature side-dump is computed over
    * exactly the frame the registered query hashes.
    */
  private[queries] def dd2Corpus(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val mutated = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" trailing mutation token")).as("text"))
    docs.unionByName(mutated)
  }

  /** dd15b's build-once + serve-legs construction, shared with PlanSpec's
    * artifact-only audit: builds the signature index + group map artifacts
    * on first call per (corpus, process), then returns the batch's new-edge
    * legs (index-serve pairs ∪ within-batch LSH over ONE pinned signature
    * pass) and the groups artifact path. The registered row folds the legs
    * via [[Dedup.incrementalDupGroups]] (whose edge checkpoint truncates
    * the legs out of the final plan — which is why the spec audits the
    * legs' plan from HERE, before the truncation point).
    */
  private[graft] def dd15bServeLegs(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, String) = {
    val root = QueryModule.processScopedDir("dd15b", dir) // per-process + shutdown-hook-cleaned (QueryModule)
    val idx = s"$root/idx"
    val grp = s"$root/groups"
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      s.sparkContext.hadoopConfiguration)
    // build phase — once per (corpus, process); warm invocations measure
    // the serve alone, which is the point: the 36s dd15 row measured the
    // from-scratch build the incremental operator exists to avoid
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$grp/_SUCCESS"))) {
      val base = dd2Corpus(s, dir)
      Dedup.writeLshIndex(base, "doc_id", "text", idx,
        numHashes = 16, portableHash = true)
      Dedup.writeGroups(Dedup.dupGroups(
        Dedup.minhashLsh(base, "doc_id", "text", numHashes = 16,
          bands = 4, threshold = 0.5, portableHash = true)), grp)
    }
    // serve phase — same batch construction as dd15 (checkpointed:
    // lineage back to documents is truncated, as an arriving batch's
    // would be), then both edge legs from the index
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val gen3 = dd2Corpus(s, dir).filter(col("doc_id") >= 100000)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" third generation tail")).as("text"))
    val freshSrc = docs.filter(pmod(col("doc_id"), lit(7)) === 3)
    val fresh = freshSrc
      .select((col("doc_id") + 500000).as("doc_id"),
        concat(col("text"), lit(" fresh family tail")).as("text"))
      .unionByName(freshSrc
        .select((col("doc_id") + 600000).as("doc_id"),
          concat(col("text"), lit(" fresh family tail extra")).as("text")))
    val batch = gen3.unionByName(fresh).localCheckpoint(true)
    // ONE signature pass over the batch feeds BOTH edge legs (the
    // index-serve join and the within-batch LSH) — the r16-profiled ~3%
    // double-minhash slack, folded
    val batchSigs = Dedup.pinnedSignatures(batch, "doc_id", "text",
      numHashes = 16, portableHash = true)
    val newPairs = Dedup.incrementalLshPairsFromIndex(s, idx, batch,
        "doc_id", "text", numHashes = 16, bands = 4, threshold = 0.5,
        portableHash = true, incSigs = Some(batchSigs))
      .select(col("id_a"), col("id_b"))
      .unionByName(Dedup.minhashLshOnSigs(batchSigs,
          numHashes = 16, bands = 4, threshold = 0.5, portableHash = true)
        .select(col("id_a"), col("id_b")))
    (newPairs, grp)
  }

  /** Shared recall@3 fold for the ann6 family: per exact-baseline query,
    * how many of its exact top-3 the approx leg retrieved. ONE pass over
    * the exact leg — the query universe and the hit count come from the
    * same left join (the r18 shape computed `exact` twice: once under the
    * inner-join hit count, once for the distinct query list — and the
    * exact leg IS the row's dominant cost). count(__hit) ≡ the old
    * inner-join count(*) per query (approx pairs are unique), and a query
    * with no hits keeps its row with 0 — same rows, same types.
    */
  private def recallAt3(approx: org.apache.spark.sql.DataFrame,
      exact: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    exact.join(approx.withColumn("__hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(col("__hit")).as("n_hits"))
      .select(col("query_id"), col("n_hits"),
        (col("n_hits") / lit(3.0)).as("recall_at_3"))

  /** ann6d's clustered embedding fixture: a deterministic
    * mixture-of-Gaussians-style corpus derived from the embeddings table —
    * 13 well-separated per-dimension centers (`((c·31 + i·17) mod 13)/13`
    * scaled to [-1, 1), c = vec_id mod 13; 31 is invertible mod 13 so any
    * two clusters differ in EVERY dimension by ≥ 2/13) plus the original
    * near-uniform vector at 0.1 amplitude as within-cluster noise. All
    * arithmetic is IEEE double in a fixed order, then one cast to float —
    * DuckDB replays it bit-for-bit, so the full IMI train/probe/ADC and
    * exact-baseline oracle runs on the identical fixture. This is the
    * operating point the IMI is FOR (real embedding corpora cluster);
    * ann6c's near-uniform leg stays as the labeled honest floor.
    */
  private[queries] def clusteredEmb(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val c = pmod(col("vec_id"), lit(13))
    Tables.embeddings(s, dir).select(col("vec_id"),
      transform(col("embedding"), (v, i) =>
        (pmod(c * lit(31) + i * lit(17), lit(13)).cast("double") / lit(13.0)
          * lit(2.0) - lit(1.0)
          + v.cast("double") * lit(0.1)).cast("float")).as("embedding"),
      col("label"))
  }

  /** The DuckDB twin of [[clusteredEmb]] — same integer center rule, same
    * double-op order, same final float cast (list indices are 1-based in
    * DuckDB, hence `i - 1`). */
  private val CLUSTERED_EMB_SQL: String =
    "SELECT vec_id, label, list_transform(range(1, 65), i -> CAST(" +
      "CAST(((vec_id % 13) * 31 + (i - 1) * 17) % 13 AS DOUBLE) / 13.0" +
      " * 2.0 - 1.0" +
      " + CAST(embedding[i] AS DOUBLE) * 0.1 AS FLOAT)) AS embedding" +
      " FROM embeddings"

  /** dd3/dd3b shared input (short-suffix mutations — SimHash's regime). */
  private[queries] def dd3Corpus(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val mutated = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"))
    docs.unionByName(mutated)
  }

  val defs: Map[String, Q] = Map(
    // dd1: exact dedup via normalized-text fingerprint (hash-groupBy).
    "dd1_exact_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // Introduce real duplicates (re-ingested docs with new ids).
      val dups = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
      Dedup.exact(docs.unionByName(dups), "doc_id", "text")
    }),

    // st8: dd1's continuous twin — streaming exact dedup at ingest via
    // dropDuplicatesWithinWatermark (state bounded by the watermark horizon,
    // not the corpus). Output is the surviving fingerprint set: which
    // duplicate arrives first is a race, the set of distinct fingerprints is
    // not — that's what the oracle pins.
    "st8_stream_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = java.nio.file.Files.createTempDirectory("graft_st8").toString
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val dups = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
      docs.unionByName(dups)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fingerprint"),
          lit("2024-01-01 00:00:00").cast("timestamp").as("ts"))
        .write.parquet(s"$base/src")
      val schema = s.read.parquet(s"$base/src").schema
      // input-sized state partitions (see st11's note): the dedup state is
      // fingerprint rows, not the corpus — 32 stores of it is fsync overhead
      graft.streaming.Streaming.withAdaptiveStatePartitions(s,
          graft.streaming.Streaming.dirBytes(s, s"$base/src")) {
        graft.streaming.Streaming
          .dedupStream(s.readStream.schema(schema).parquet(s"$base/src"))
          .select(col("fingerprint"))
          .writeStream.format("parquet").option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(s"$base/out")
    }),

    // st9: tx6's continuous twin — the Gopher gate is stateless per-row
    // Column code, so the SAME expressions run unchanged under readStream
    // (no unsupported-operation fallback, no state). The driver row proves
    // the micro-batch output equals the batch gate over the same corpus.
    "st9_stream_gopher_gate" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = java.nio.file.Files.createTempDirectory("graft_st9").toString
      Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .write.parquet(s"$base/src")
      val schema = s.read.parquet(s"$base/src").schema
      TextOps.gopherFlags(s.readStream.schema(schema).parquet(s"$base/src"), "text")
        .filter(col("gopher_pass"))
        .select(col("doc_id"), col("n_words"), col("symbol_ratio"))
        .writeStream.format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.parquet(s"$base/out")
    }),

    // st10: stream-static broadcast enrichment — each micro-batch left-joins
    // a static broadcast dim (the streaming half of every dimension
    // enrichment); rows off the dim get a deterministic default. At scale
    // the dim rides the broadcast, the stream never shuffles.
    "st10_stream_static_enrich" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_st10").toString
      Tables.documents(s, dir).select(col("doc_id"), col("source"))
        .write.parquet(s"$base/src")
      val schema = s.read.parquet(s"$base/src").schema
      val dim = Seq(("src0", "tier-a"), ("src1", "tier-b"), ("src2", "tier-c"))
        .toDF("source", "tier")
      s.readStream.schema(schema).parquet(s"$base/src")
        .join(broadcast(dim), Seq("source"), "left")
        .select(col("doc_id"), coalesce(col("tier"), lit("untiered")).as("tier"))
        .writeStream.format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      s.read.parquet(s"$base/out")
    }),

    // st11: streaming tumbling-window aggregation WITH WATERMARK in append
    // mode — the semantics every streaming metric pipeline runs on: a
    // window emits exactly once, when the watermark (max event time − 2
    // days) passes its end; trailing windows stay in state. The oracle is
    // the batch window agg filtered by the SAME finalization predicate, so
    // the row proves the emission rule, not just the arithmetic. State is
    // bounded by the watermark horizon — the scale story vs an ever-growing
    // running agg.
    "st11_stream_windowed_agg" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = java.nio.file.Files.createTempDirectory("graft_st11").toString
      // watermarks require TIMESTAMP_LTZ; the session runs UTC so the
      // ntz→ltz cast (and the ntz cast back on output) is instant-preserving
      Tables.events(s, dir)
        .select(col("ts").cast("timestamp").as("ts"), col("event_type"), col("value"))
        .write.parquet(s"$base/src")
      val schema = s.read.parquet(s"$base/src").schema
      // state partitions sized from the INPUT, not the session constant
      // (r20): 32 state stores for kilobytes of window state is pure
      // checkpoint-fsync overhead; the rule grows with the corpus and
      // saturates at the session parallelism (Streaming.adaptiveStatePartitions)
      graft.streaming.Streaming.withAdaptiveStatePartitions(s,
          graft.streaming.Streaming.dirBytes(s, s"$base/src")) {
        s.readStream.schema(schema).parquet(s"$base/src")
          .withWatermark("ts", "2 days")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            graft.ops.Exact.sum2(col("value")).as("sum_value"))
          .select(col("window.start").cast("timestamp_ntz").as("win_start"),
            col("event_type"), col("cnt"), col("sum_value"))
          .writeStream.format("parquet").option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(s"$base/out")
    }),

    // st12: stream-stream inner join with event-time range — attribution
    // (purchase ← clicks by the same user in the preceding hour) as both
    // sides flow. Watermarks on BOTH streams plus the time-range bound the
    // join state to the horizon (the property that makes stream-stream
    // joins feasible at all at scale); inner join + AvailableNow emits the
    // complete match set, so the batch join is the exact oracle.
    "st12_stream_stream_join" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = java.nio.file.Files.createTempDirectory("graft_st12").toString
      Tables.events(s, dir)
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
          col("user_id"), col("event_type"))
        .write.parquet(s"$base/src")
      val schema = s.read.parquet(s"$base/src").schema
      def src = s.readStream.schema(schema).parquet(s"$base/src")
      val clicks = src.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
          col("ts").as("click_ts"))
        .withWatermark("click_ts", "1 day")
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "1 day")
      // input-sized state partitions (see st11's note): the join keeps BOTH
      // sides' horizons in per-partition state stores — 32 of them for this
      // input is fsync overhead, not parallelism
      graft.streaming.Streaming.withAdaptiveStatePartitions(s,
          graft.streaming.Streaming.dirBytes(s, s"$base/src")) {
        purchases.join(clicks,
            col("user_id") === col("click_user") &&
              col("purchase_ts") >= col("click_ts") &&
              col("purchase_ts") < col("click_ts") + expr("INTERVAL 1 HOUR"))
          .select(col("purchase_id"), col("click_id"), col("user_id"),
            (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
              .as("secs_after_click"))
          .writeStream.format("parquet").option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(s"$base/out")
    }),

    // st13: custom streaming state (flatMapGroupsWithState) as a driver
    // row — the sync-tracker state machine runs over a real file stream and
    // emits one tracker row per sync id. AvailableNow on a single source
    // directory processes all files in ONE micro-batch, so the emitted
    // state (rows summed, batches=1, failure count, status) is
    // deterministic and the batch aggregate is the exact oracle; the
    // multi-batch increment path is property-tested in StreamingSpec with
    // MemoryStream.
    "st13_stream_tracker_state" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_st13").toString
      Tables.events(s, dir)
        .select(concat(lit("sync"), pmod(col("user_id"), lit(5L))).as("sync_id"),
          pmod(col("user_id"), lit(97L)).as("rows"),
          (col("event_type") === "error").as("failed"))
        .write.parquet(s"$base/src")
      val schema = s.read.parquet(s"$base/src").schema
      val events = s.readStream.schema(schema).parquet(s"$base/src")
        .as[graft.streaming.Streaming.TrackerEvent]
      // update-mode operator → parquet via foreachBatch (FileSink is
      // append-only); each micro-batch appends its refreshed tracker rows.
      // Input-sized state partitions (see st11's note): tracker state is 5
      // sync rows — 32 stores of it is pure checkpoint overhead.
      graft.streaming.Streaming.withAdaptiveStatePartitions(s,
          graft.streaming.Streaming.dirBytes(s, s"$base/src")) {
        graft.streaming.Streaming.trackerState(events)
          .writeStream.outputMode("update")
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[graft.streaming.Streaming.TrackerRow], _: Long) =>
              b.write.mode("append").parquet(s"$base/out")
          }
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(s"$base/out")
    }),

    // st13b: MULTI-batch state evolution, driver-checked. The events split
    // by date into two halves; each half is written to the source dir and
    // drained by its own AvailableNow pass over one shared checkpoint, so
    // the tracker state built in micro-batch 1 carries into micro-batch 2
    // exactly as a restarted incremental sync resumes (ref:
    // `main_paginated.py:78-99,177-184` — per-run tracker rows, cumulative
    // totals). Output is the union of both passes' update rows: batch-1
    // rows show each sync after one batch, batch-2 rows the cumulative
    // rows/failures with batches=2 — the state-evolution trace itself is
    // what the oracle pins, not just the final table.
    // st14: streaming SESSION windows (beyond-reference) — Spark's native
    // session_window (dynamic-gap state merging in the streaming engine)
    // rather than st7's batch gaps-and-islands. Watermark bounds session
    // state; append mode emits a session once the watermark passes its end
    // (= last event + gap). Session-merge semantics: an event starts a new
    // session iff ts >= previous ts + gap — the oracle replays exactly that
    // break rule plus the watermark emission cut.
    "st14_stream_session_window" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = java.nio.file.Files.createTempDirectory("graft_st14").toString
      Tables.events(s, dir)
        .select(col("ts").cast("timestamp").as("ts"), col("user_id"), col("value"))
        .write.parquet(s"$base/src")
      val schema = s.read.parquet(s"$base/src").schema
      // input-sized state partitions (see st11's note)
      graft.streaming.Streaming.withAdaptiveStatePartitions(s,
          graft.streaming.Streaming.dirBytes(s, s"$base/src")) {
        s.readStream.schema(schema).parquet(s"$base/src")
          .withWatermark("ts", "1 day")
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"),
            graft.ops.Exact.sum2(col("value")).as("sum_value"))
          .select(col("user_id"),
            col("session_window.start").cast("timestamp_ntz").as("session_start"),
            col("session_window.end").cast("timestamp_ntz").as("session_end"),
            col("n_events"), col("sum_value"))
          .writeStream.format("parquet").option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      s.read.parquet(s"$base/out")
    }),

    "st13b_tracker_two_batches" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_st13b").toString
      val ev = Tables.events(s, dir)
        .select(col("ts").cast("date").as("d"),
          concat(lit("sync"), pmod(col("user_id"), lit(5L))).as("sync_id"),
          pmod(col("user_id"), lit(97L)).as("rows"),
          (col("event_type") === "error").as("failed"))
      val pivot = lit("2024-01-16").cast("date")
      ev.filter(col("d") < pivot).drop("d").write.parquet(s"$base/src")
      val schema = s.read.parquet(s"$base/src").schema
      // input-sized state partitions (see st11/st13's note); sized from the
      // FIRST half — the partition count binds into the shared checkpoint at
      // creation and both drains reuse it, exactly as a restarted job would
      def drainPass(): Unit =
        graft.streaming.Streaming.withAdaptiveStatePartitions(s,
            graft.streaming.Streaming.dirBytes(s, s"$base/src")) {
          graft.streaming.Streaming.trackerState(
              s.readStream.schema(schema).parquet(s"$base/src")
                .as[graft.streaming.Streaming.TrackerEvent])
            .writeStream.outputMode("update")
            .option("checkpointLocation", s"$base/ckpt")
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[graft.streaming.Streaming.TrackerRow], _: Long) =>
                b.write.mode("append").parquet(s"$base/out")
            }
            .trigger(Trigger.AvailableNow())
            .start().awaitTermination()
        }
      drainPass()
      ev.filter(col("d") >= pivot).drop("d").write.mode("append").parquet(s"$base/src")
      drainPass()
      s.read.parquet(s"$base/out")
    }),

    // st15: continuous near-dup dedup AT INGEST — the streaming composition
    // of dd11b (serve from the persisted index) and dd13 (fold each served
    // batch back in). Each micro-batch is flagged against base ∪ every
    // prior arrival, then appended to the index; state lives in the
    // PARQUET INDEX, not in streaming state — bounded by corpus size on
    // disk, zero rows in the state store. Restart-safe BY CONSTRUCTION,
    // not by luck: both per-batch writes key on the foreachBatch batchId
    // (flags overwrite out/batch=<id>, the fold overwrites the index
    // partition part=b<id> — dd13's idempotent-append contract) and the
    // serve EXCLUDES its own tag, so a batch replayed after a mid-fold
    // crash rewrites the same files and never matches itself. Per-batch
    // serve caches are cleared after each fold (the serve plans differ
    // every batch, so entries could never be reused). CONTRACT: dedup is
    // inc→base like dd11 — two near-dups CO-ARRIVING in one micro-batch
    // flag against the corpus, not each other; compose minhashLsh on the
    // batch (dd2, batch-sized) when intra-batch dups matter. Two drains
    // prove the fold-in: batch 2 contains near-dups of batch-1 members
    // and flags against them. Oracle = the dd11 replay per batch with
    // batch 2's base side being documents ∪ batch 1, unioned.
    "st15_stream_neardup_ingest" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_st15").toString
      // The BASE index is per (corpus, process) and built once — the dd13
      // steady-state economics: a warm invocation (bench rep, scale-leg
      // median) pays the increment-sized serves and folds, never the
      // corpus-wide signature rebuild. Stream plumbing (src, checkpoint,
      // out) stays per-invocation under `tmp`, and each invocation FOLDS
      // under its own tag namespace (`<runId>_b<batchId>`) while SERVING
      // against exactly its own lineage (includeTags = base + its prior
      // tags) — prior invocations' folded partitions coexist in the index
      // but are partition-pruned out, so a shared index cannot
      // contaminate a run (a batch replayed verbatim by an earlier run
      // would otherwise match itself at jaccard 1.0).
      val idx = QueryModule.processScopedDir("st15_idx", dir)
      val metaOk = new org.apache.hadoop.fs.Path(s"$idx/meta/_SUCCESS")
      if (!metaOk.getFileSystem(s.sparkContext.hadoopConfiguration).exists(metaOk))
        Dedup.writeLshIndex(base, "doc_id", "text", idx,
          numHashes = 16, portableHash = true)
      val runId = new java.io.File(tmp).getName
      val batch1 = base.filter(pmod(col("doc_id"), lit(9)) === 5)
        .select((col("doc_id") + 510000).as("doc_id"),
          concat(col("text"), lit(" stream batch one")).as("text"))
      val batch2 = base.filter(pmod(col("doc_id"), lit(9)) === 6)
        .select((col("doc_id") + 620000).as("doc_id"),
          concat(col("text"), lit(" stream batch two")).as("text"))
        .unionByName(batch1.select((col("doc_id") + 300000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text")))
      batch1.repartition(4).write.parquet(s"$tmp/src")
      val schema = s.read.parquet(s"$tmp/src").schema
      def drain(): Unit =
        s.readStream.schema(schema).parquet(s"$tmp/src")
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
            val arrived = b.localCheckpoint(true)
            val tag = s"${runId}_b$batchId"
            // flag against base ∪ THIS RUN's prior arrivals (includeTags;
            // own tag not listed, so a retry never matches itself); the
            // overwrite keyed by batchId makes the flag write idempotent
            val lineage = "base" +: (0L until batchId).map(i => s"${runId}_b$i")
            // one signature pass per batch, shared by the serve AND the
            // fold (the serve meta-validates the same params, so the fold's
            // precomputedSigs contract holds)
            val sigs = Dedup.pinnedSignatures(arrived, "doc_id", "text",
              numHashes = 16, portableHash = true)
            Dedup.incrementalLshFromIndex(s, idx, arrived, "doc_id", "text",
                numHashes = 16, bands = 4, threshold = 0.5, portableHash = true,
                includeTags = Some(lineage), incSigs = Some(sigs))
              .write.mode("overwrite").parquet(s"$tmp/out/batch=b$batchId")
            // the flag write above is an ACTION — the serve scan has
            // drained before the fold lands
            Dedup.appendLshIndex(s, idx, arrived, "doc_id", "text", tag,
              precomputedSigs = Some((sigs, 16, true)))
            s.sqlContext.clearCache() // per-batch serve caches, never reusable
          }
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      drain()
      batch2.repartition(4).write.mode("append").parquet(s"$tmp/src")
      drain()
      // Compact the shared index: this run's folded partitions are
      // namespaced to its runId and pruned out of every OTHER run's serve
      // (includeTags), so once both drains have landed their flags under
      // $tmp/out they are dead weight — without this the per-process index
      // accrues two partitions per invocation and listing cost grows per
      // bench rep.
      locally {
        val fs = new org.apache.hadoop.fs.Path(idx)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        Seq(0, 1).foreach { b =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$idx/sigs/part=${runId}_b$b"), true)
        }
      }
      s.read.parquet(s"$tmp/out")
        .select(col("doc_id"), col("matched_base"), col("est_jaccard"), col("is_dup"))
    }),

    // dd2: MinHash + LSH banded near-dup pairs (never all-pairs), on the
    // scale-default xxhash64 signatures. Oracled via the signature
    // side-dump ([[OracleDumps]]): DuckDB replays banding → bucket
    // collision → jaccard estimate → threshold from the dumped signatures
    // (band buckets grouped by the raw 4-long slice — collision-free, so a
    // real xxhash64 band collision in Spark would surface as a diff). The
    // signature computation itself is pinned by the md5 twin dd2b below
    // (same pipeline, engine-portable hash) and by DedupAnnSpec's
    // native-vs-agg bit-identity test.
    "dd2_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLsh(dd2Corpus(s, dir), "doc_id", "text", numHashes = 64, bands = 16,
        threshold = 0.5)),

    // dd2b: the SAME MinHash+LSH pipeline on the portable (md5-derived)
    // hash, which a cross-engine oracle can reproduce end-to-end — banding,
    // bucket collision and jaccard estimate all verified exactly.
    "dd2b_minhash_portable" -> ((s, dir) =>
      Dedup.minhashLsh(dd2Corpus(s, dir), "doc_id", "text", numHashes = 16,
        bands = 4, threshold = 0.5, portableHash = true)),

    // dd11: incremental dedup — a new batch matched against the existing
    // corpus (inc→base candidates only; the corpus never re-pairs with
    // itself). The increment plants two populations: near-dup mutations of
    // every 9th base doc (must match their source) and token-reversed
    // copies of every (9th+1) doc (3-shingle sets disjoint from the source
    // → must NOT match it). Portable md5 hashing end-to-end, so banding,
    // bucket pruning, jaccard verify and best-match selection all replay in
    // the oracle.
    "dd11_incremental_dedup" -> ((s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val inc = base.filter(pmod(col("doc_id"), lit(9)) === 0)
        .select((col("doc_id") + 300000).as("doc_id"),
          concat(col("text"), lit(" incremental tail drift")).as("text"))
        .unionByName(base.filter(pmod(col("doc_id"), lit(9)) === 1)
          .select((col("doc_id") + 400000).as("doc_id"),
            concat_ws(" ", reverse(graft.text.TextOps.tokens(lower(col("text")))))
              .as("text")))
      Dedup.incrementalLsh(base, inc, "doc_id", "text",
        numHashes = 16, bands = 4, threshold = 0.5, portableHash = true)
    }),

    // dd11b: the persisted-index serving path — the economics dd11's
    // scaladoc claims, demonstrated: the base corpus' signature index is
    // WRITTEN ONCE (Dedup.writeLshIndex) and TWO successive increments are
    // served from it (Dedup.incrementalLshFromIndex); base text is never
    // re-scanned at serve time (PlanSpec asserts the returned plan reads
    // the index parquet and zero documents scans — the increments are
    // eagerly checkpointed, standing in for batches that ARRIVE rather
    // than derive from the corpus). Batch 1 is materialized and
    // discarded; the registered/oracled output is batch 2's matches.
    "dd11b_index_served" -> ((s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val idx = QueryModule.processScopedDir("dd11b_idx", dir) // per-process + shutdown-hook-cleaned (QueryModule)
      Dedup.writeLshIndex(base, "doc_id", "text", idx,
        numHashes = 16, portableHash = true)
      def serve(inc: org.apache.spark.sql.DataFrame) =
        Dedup.incrementalLshFromIndex(s, idx, inc.localCheckpoint(true),
          "doc_id", "text", numHashes = 16, bands = 4, threshold = 0.5,
          portableHash = true)
      val inc1 = base.filter(pmod(col("doc_id"), lit(9)) === 2)
        .select((col("doc_id") + 500000).as("doc_id"),
          concat(col("text"), lit(" first batch drift")).as("text"))
      serve(inc1).count() // batch 1: served and discarded — reuse, proven
      val inc2 = base.filter(pmod(col("doc_id"), lit(9)) === 3)
        .select((col("doc_id") + 600000).as("doc_id"),
          concat(col("text"), lit(" second batch tail")).as("text"))
        .unionByName(base.filter(pmod(col("doc_id"), lit(9)) === 4)
          .select((col("doc_id") + 700000).as("doc_id"),
            concat_ws(" ", reverse(graft.text.TextOps.tokens(lower(col("text")))))
              .as("text")))
      serve(inc2)
    }),

    // dd13: index APPEND closes the incremental-dedup lifecycle — batch 1
    // is folded into the base index (Dedup.appendLshIndex — signature
    // params come from the index meta, one pass over the increment only),
    // so batch 2 dedups against base ∪ batch 1, including a planted
    // near-dup group OF BATCH-1 MEMBERS (their text + ' extra'). The
    // oracle's base side is exactly that union; DedupAnnSpec carries the
    // load-bearing proof (reversed-text batches that can ONLY match
    // appended members).
    "dd13_lsh_index_append" -> ((s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val idx = QueryModule.processScopedDir("dd13_idx", dir) // per-process + shutdown-hook-cleaned (QueryModule)
      // base build once per process (round 12, the dd15b economics): the
      // append below OVERWRITES part=batch1 with identical content and the
      // serve never touches other partitions, so a warm invocation's
      // output is unchanged while its cost is the steady-state
      // append + serve — which is what the scale-leg row should measure,
      // not the corpus-wide signature rebuild
      val metaOk = new org.apache.hadoop.fs.Path(s"$idx/meta/_SUCCESS")
      if (!metaOk.getFileSystem(s.sparkContext.hadoopConfiguration).exists(metaOk))
        Dedup.writeLshIndex(base, "doc_id", "text", idx,
          numHashes = 16, portableHash = true)
      val inc1 = base.filter(pmod(col("doc_id"), lit(9)) === 2)
        .select((col("doc_id") + 500000).as("doc_id"),
          concat(col("text"), lit(" first batch drift")).as("text"))
        .localCheckpoint(true)
      Dedup.appendLshIndex(s, idx, inc1, "doc_id", "text", "batch1")
      val inc2 = base.filter(pmod(col("doc_id"), lit(9)) === 3)
        .select((col("doc_id") + 600000).as("doc_id"),
          concat(col("text"), lit(" second batch tail")).as("text"))
        .unionByName(inc1.select((col("doc_id") + 300000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text")))
      Dedup.incrementalLshFromIndex(s, idx, inc2.localCheckpoint(true),
        "doc_id", "text", numHashes = 16, bands = 4, threshold = 0.5,
        portableHash = true)
    }),

    // dd12: incremental EXACT dedup through a bloom pre-filter — the
    // arriving batch probes a bloom built over the corpus' fingerprints
    // (ops/BloomPrune; xxhash64 keys, no false negatives) and only the
    // bloom-positive fraction enters the exact verify join. For the real
    // case — a mostly-novel batch — almost nothing shuffles: fpp·|inc|
    // false positives plus the true dups. Misses are new BY CONSTRUCTION,
    // so the output is bit-identical to the plain membership test, which
    // is the oracle. Planted increment: every 7th doc re-arrives verbatim
    // (must flag dup), every (7th+1) arrives with a novel suffix (must
    // flag new).
    "dd12_bloom_incremental" -> ((s, dir) => {
      val fp = TextOps.fingerprint(col("text"))
      val base = Tables.documents(s, dir).select(col("doc_id"), fp.as("fingerprint"))
      val docs = Tables.documents(s, dir)
      val inc = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 800000).as("doc_id"), fp.as("fingerprint"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(7)) === 1)
          .select((col("doc_id") + 900000).as("doc_id"),
            TextOps.fingerprint(concat(col("text"), lit(" novel suffix")))
              .as("fingerprint")))
      // auto-sized from the corpus count (the fingerprint projection prunes
      // away under count(), so the sizing pass is a metadata-cheap row
      // count) — a pinned constant would saturate silently at larger SF
      val bf = graft.ops.BloomPrune.buildFilter(base, col("fingerprint"))
      val dupIds = inc
        .filter(graft.ops.BloomPrune.mightContain(bf, col("fingerprint")))
        .join(base.select(col("fingerprint")), Seq("fingerprint"), "left_semi")
        .select(col("doc_id")).withColumn("__dup", lit(true))
      inc.join(dupIds, Seq("doc_id"), "left")
        .select(col("doc_id"), col("fingerprint"),
          coalesce(col("__dup"), lit(false)).as("is_dup"))
    }),

    // dd3: SimHash near-dup pairs (16-bit band bucketing + hamming verify)
    // on xxhash64 signatures. Oracled via the signature side-dump
    // ([[OracleDumps]]): banding, bucket pairing and the hamming cut are
    // pure bit arithmetic DuckDB replays from the dumped 64-bit signatures.
    // The signature computation is pinned by the md5 twin dd3b below.
    "dd3_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(dd3Corpus(s, dir), "doc_id", "text", maxHamming = 3)),

    // dd3b: the SAME SimHash pipeline on the portable 60-bit md5 hash —
    // votes, bit packing, banding and hamming verify all oracle-checked.
    "dd3b_simhash_portable" -> ((s, dir) =>
      Dedup.simhashPairs(dd3Corpus(s, dir), "doc_id", "text", maxHamming = 3,
        portableHash = true)),

    // dd4: exact n-gram Jaccard verification on blocked candidate pairs.
    "dd4_ngram_jaccard" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val keyed = docs.select(col("doc_id"), col("lang"), col("source"))
      // spread the pair list to the session's shuffle-partition target: the
      // per-pair gram-intersect compute downstream inherits THIS frame's
      // partitioning once the gram side broadcasts, and the id self-join
      // runs at the (single-row-group, 1-task) scan's otherwise — r19
      // profile: the whole verify CPU (2.3 s) in the final stage's one task
      val pairs = keyed.select(col("doc_id").as("id_a"), col("lang"), col("source"))
        .join(keyed.select(col("doc_id").as("id_b"), col("lang"), col("source")),
          Seq("lang", "source"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .repartition(s.sessionState.conf.numShufflePartitions, col("id_a"), col("id_b"))
      Dedup.ngramJaccard(pairs, docs, "doc_id", "text", k = 3)
    }),

    // dd14: LSH dedup RECALL against exact Jaccard ground truth — ann6c's
    // role for the dedup family: banding is probabilistic (a true near-dup
    // pair that collides in no band is silently missed), so a deployment
    // ships this measurement beside the dedup. Ground truth = exact 3-gram
    // Jaccard over all pairs of a SAMPLED sub-corpus; the sample keys on
    // the mutation FAMILY (doc_id % 100000) so planted near-dup pairs
    // survive sampling together — the sp7 lesson (sample by entity, never
    // split one across the cut). Output: every true pair (jaccard ≥ 0.5)
    // with whether the 16-hash/4-band LSH found it. Exact leg is all-pairs
    // BY DESIGN, bounded by the sample (the ann6b argument); query side
    // repartitioned so the cross join parallelizes (the exactGlobalTopK
    // lesson). Fully oracled: exact Jaccard + the dd2b LSH replay.
    "dd14_lsh_recall" -> ((s, dir) => {
      val corpus = dd2Corpus(s, dir)
      val sampled = corpus.filter(
        graft.ops.Sampling.unitHash(pmod(col("doc_id"), lit(100000L))) < 0.2)
      // spread the query side to the session's shuffle-partition target
      // (not a constant: 16 left half the cores idle — r19 profile: the
      // exact-Jaccard stage was 20.7 s of CPU on 16 tasks — and an
      // UNnumbered repartition would let AQE coalesce the id-sized frame
      // to one partition, blind to the cross join's row blow-up below)
      val allPairs = sampled.select(col("doc_id").as("id_a"))
        .repartition(s.sessionState.conf.numShufflePartitions, col("id_a"))
        .crossJoin(sampled.select(col("doc_id").as("id_b")))
        .filter(col("id_a") < col("id_b"))
      val truth = Dedup.ngramJaccard(allPairs, corpus, "doc_id", "text", k = 3)
        .filter(col("jaccard") >= 0.5)
      val lsh = Dedup.minhashLsh(sampled, "doc_id", "text", numHashes = 16,
          bands = 4, threshold = 0.5, portableHash = true)
        .select(col("id_a"), col("id_b"), lit(true).as("__hit"))
      truth.join(lsh, Seq("id_a", "id_b"), "left")
        .select(col("id_a"), col("id_b"), col("jaccard"),
          coalesce(col("__hit"), lit(false)).as("found_by_lsh"))
    }),

    // dd15: INCREMENTAL connected components — the batch's new edges fold
    // into the existing group map without recomputing components for the
    // corpus (work ∝ affected subgraph: new edges + members of touched
    // groups as star edges). Closes the last from-scratch step in the
    // incremental dedup lifecycle: dd11 finds the batch's edges
    // incrementally, dd13 folds its signatures in, dd15 folds its GROUPS
    // in. The batch both EXTENDS existing families (third-generation
    // mutants) and creates new ones that pull in previously-unpaired base
    // docs (two fresh mutants of the same unpaired doc — linked to each
    // other within-batch AND to their source via the inc→base leg, the
    // two edge sources a real batch has). Oracle = the from-scratch
    // recompute over the full corpus' LSH pairs (dd6's recursive replay):
    // incremental ≡ recompute IS the correctness claim.
    "dd15_incremental_groups" -> ((s, dir) => {
      val base = dd2Corpus(s, dir)
      val basePairs = Dedup.minhashLsh(base, "doc_id", "text",
        numHashes = 16, bands = 4, threshold = 0.5, portableHash = true)
      val baseGroups = Dedup.dupGroups(basePairs)
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val gen3 = base.filter(col("doc_id") >= 100000)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" third generation tail")).as("text"))
      val freshSrc = docs.filter(pmod(col("doc_id"), lit(7)) === 3)
      val fresh = freshSrc
        .select((col("doc_id") + 500000).as("doc_id"),
          concat(col("text"), lit(" fresh family tail")).as("text"))
        .unionByName(freshSrc
          .select((col("doc_id") + 600000).as("doc_id"),
            concat(col("text"), lit(" fresh family tail extra")).as("text")))
      val batch = gen3.unionByName(fresh).localCheckpoint(true)
      val newPairs = Dedup.incrementalLshPairs(base, batch, "doc_id", "text",
          numHashes = 16, bands = 4, threshold = 0.5, portableHash = true)
        .select(col("id_a"), col("id_b"))
        .unionByName(Dedup.minhashLsh(batch, "doc_id", "text",
            numHashes = 16, bands = 4, threshold = 0.5, portableHash = true)
          .select(col("id_a"), col("id_b")))
      Dedup.incrementalDupGroups(baseGroups, newPairs)
    }),

    // dd15b: the persisted-ARTIFACT serving path for group updates — the
    // dd11b economics applied to dd15. The base corpus' signature index
    // (Dedup.writeLshIndex) and its group map (Dedup.writeGroups) are
    // built ONCE per process; the serve phase reads BOTH artifacts and
    // folds the batch in at increment cost — base text is never
    // re-scanned and base groups are never recomputed (PlanSpec asserts
    // the edge legs' plan reads only the index and the returned fold plan
    // reads only the groups artifact; the batch arrives eagerly
    // checkpointed, as a real batch would, and the fold's edge list is
    // checkpointed inside incrementalDupGroups). Output ≡ dd15 — same
    // base, same batch, same fold — so the two rows share one
    // from-scratch-recompute oracle.
    "dd15b_groups_served" -> ((s, dir) => {
      val (newPairs, grp) = dd15bServeLegs(s, dir)
      Dedup.incrementalDupGroups(Dedup.readGroups(s, grp), newPairs)
    }),

    // dd6: connected components over verified near-dup pairs → dedup groups.
    // Three-generation mutation families (doc → +suffix → +longer tail) give
    // a transitive structure the pairwise view alone can't collapse.
    "dd6_dup_groups" -> ((s, dir) => dd6Groups(s, dir)._2),

    // dd7: the deduplicated corpus itself — the step a pipeline actually
    // ships: canonical survivor (min doc_id) per dup group, singletons kept
    // as their own group. One left join of corpus ids against the (small)
    // group membership, then a per-group min/count.
    "dd7_dedup_corpus" -> ((s, dir) => {
      val (all, groups) = dd6Groups(s, dir)
      all.select(col("doc_id"))
        .join(groups, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("group_id"), col("doc_id")).as("group_id"))
        .groupBy(col("group_id"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("group_size"))
        .select(col("doc_id"), col("group_id"), col("group_size"))
    }),

    // dd8: exact substring duplicate spans (Lee et al. 2022 ExactSubstr at
    // k-token-window granularity) — maximal cross-document verbatim regions
    // at word-position resolution, the step between doc-level dedup and
    // nothing. Planted prefix-copy docs guarantee known spans on top of the
    // corpus's organic boilerplate. Fully oracled; this string-key run is
    // the oracle twin for the xxhash64-keyed production variant dd8h below.
    "dd8_substring_spans" -> ((s, dir) => {
      Dedup.substringSpans(dd8Corpus(s, dir), "doc_id", "text", k = 8)
    }),

    // dd8h: the production-key ExactSubstr variant — every k-word shingle
    // collapses to its xxhash64 before the dup-count groupBy and the
    // position-mark join, so the pipeline's two dominant shuffles carry
    // 8-byte longs instead of 8-word strings (see Dedup.substringSpans'
    // hashedKey note). Output is identical to dd8 barring a 64-bit
    // collision, so the string-key oracle verifies this path in full —
    // the dd2/dd2b twin pattern with both twins sharing one oracle.
    "dd8h_spans_hashed" -> ((s, dir) => {
      Dedup.substringSpans(dd8Corpus(s, dir), "doc_id", "text", k = 8, hashedKey = true)
    }),

    // dd8b: the cleaned corpus — dd8's spans excised from every doc, text
    // rebuilt from the surviving tokens (whitespace-normalized lowercase,
    // the working form at this stage). The shippable ExactSubstr artifact,
    // as dd7 is for dd6.
    "dd8b_excised_corpus" -> ((s, dir) => {
      val corpus = dd8Corpus(s, dir)
      val spans = Dedup.substringSpans(corpus, "doc_id", "text", k = 8)
      Dedup.exciseSpans(corpus, spans, "doc_id", "text")
    }),

    // dd5: embedding near-dups — exact cosine within a coarse block.
    "dd5_embedding_dups" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val dups = emb.filter(pmod(col("vec_id"), lit(11)) === 0)
        .withColumn("vec_id", col("vec_id") + 100000)
      Dedup.embeddingNearDups(emb.unionByName(dups).select(col("vec_id"), col("embedding"),
        col("label")), "label", threshold = 0.98)
    }),

    // dd10: SemDeDup (Abbas et al. 2023) — semantic dedup: k-means-cluster
    // the embeddings (the ann7 learned coarse quantizer, corpus-adaptive
    // nlist), mark within-cluster pairs with cosine >= 0.96 as duplicate
    // MEANING, connect into groups, keep the member farthest from its
    // centroid (the least-typical example carries the most signal). Fully
    // oracled: DuckDB replays clustering (shared Lloyd CTEs), pairing,
    // recursive components, and the keep rule.
    "dd10_semdedup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val nlist = graft.ann.Pq.adaptiveNlist(emb.count())
      val cents = graft.ann.Pq.coarseTrain(emb, nlist)
      Dedup.semDedup(emb, cents, threshold = 0.96)
    }),

    // ann1: brute-force cosine top-k (exact baseline; broadcast queries).
    "ann1_bruteforce_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Ann.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
    }),

    // ann13: metadata-FILTERED vector search — top-k among corpus vectors
    // whose document metadata passes a predicate (here lang='en'). The
    // semantics that matter: the filter applies to the CORPUS BEFORE
    // ranking (pre-filter), so every query still gets k qualifying
    // neighbors — post-filtering an unfiltered top-k would silently return
    // fewer than k (the classic filtered-ANN bug every production vector
    // store documents). Exact form here (brute force over the filtered
    // subset — the filter is a semi-join the optimizer pushes below the
    // ranking); at scale the same semi-join lands on the ann9 CODES table
    // before probing, with ann6's recall monitor guarding the
    // fewer-candidates-per-list effect.
    "ann13_filtered_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val meta = Tables.documents(s, dir)
        .filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      Ann.bruteForceTopK(emb.filter(col("vec_id") < 10),
          emb.join(meta, Seq("vec_id"), "left_semi"), k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
    }),

    // ann2: random-hyperplane LSH bucketed approximate top-k (scale path,
    // xxhash64-seeded planes). Oracled via the bucket side-dump
    // ([[OracleDumps]]): DuckDB takes Spark's bucket assignment as given and
    // replays candidate generation, cosine scoring and ranking. The plane
    // projection itself is pinned by the md5-parity twin ann2b below, and
    // DedupAnnSpec asserts planted-neighbor recall@1 >= 0.8 with probes.
    "ann2_lsh_topk" -> ((s, dir) =>
      Ann.lshTopK(Tables.embeddings(s, dir), k = 5, planes = 8)
        .select(col("query_id"), col("neighbor_id"), col("bucket"), col("cosine"), col("rank"))),

    // ann2b: the same hyperplane-LSH top-k with portable (md5-parity) plane
    // signs — bucketing, candidate join and ranking all oracle-checked.
    "ann2b_lsh_portable" -> ((s, dir) =>
      Ann.lshTopK(Tables.embeddings(s, dir), k = 5, planes = 8, portableHash = true)
        .select(col("query_id"), col("neighbor_id"), col("bucket"), col("cosine"), col("rank"))),

    // ann3: IVF-style exact search within the label block.
    "ann3_ivf_topk" -> ((s, dir) =>
      Ann.ivfTopK(Tables.embeddings(s, dir), "label", k = 3)
        .select(col("query_id"), col("neighbor_id"), col("block"), col("cosine"), col("rank"))),

    // ann8: scalar-quantization (SQ8) top-k — per-dim [min,max] affine
    // 8-bit codes, integer code-space L2, block-scoped search (ann/Sq).
    // The training-free compression step between raw floats and PQ. The
    // default call is depth-guarded (Sq.sqTopK pre-flights avg block
    // depth, rerouting through learned coarse lists above 256 — the
    // ivfPqTopK guard); at verify SF depth is 50, so the fixed path runs
    // and the oracle replays it exactly.
    "ann8_sq_topk" -> ((s, dir) =>
      graft.ann.Sq.sqTopK(Tables.embeddings(s, dir), "label", k = 3)
        .select(col("query_id"), col("neighbor_id"), col("block"),
          col("d2"), col("rank"))),

    // ann4: IVF + product quantization (Jégou et al. 2011) — codebooks
    // trained on a hash-deterministic sample (driver-fit, integer Lloyd),
    // corpus stored as m 1-byte codes, candidates ranked by integer ADC.
    // Fully oracle-checked: the DuckDB side replays the SAME training
    // (seeds, Lloyd rounds, floor updates, tie rules) in generated SQL.
    // `contrast = true` OPTS IN to the fixed-block path: this row is the
    // scale curve's measured quadratic contrast for ann7 (the default API
    // guards against it — see Pq.ivfPqTopK's scale guard).
    "ann4_ivfpq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val model = graft.ann.Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
      graft.ann.Pq.ivfPqTopK(emb, "label", k = 3, model, contrast = true)
        .select(col("query_id"), col("neighbor_id"), col("block"), col("adc"), col("rank"))
    }),

    // ann7: TRUE IVF — the coarse quantizer is LEARNED (nlist k-means
    // centroids over the full vector, nlist sized to the corpus by
    // Pq.adaptiveNlist) instead of borrowing the fixed-cardinality `label`
    // column. This is the 100 TB shape: with nlist ∝ corpus size, per-list
    // depth (and so a self-search's scored-pair count) stays bounded, where
    // a fixed block column degrades quadratically — the scale curve
    // measured ann4 at 4.0 s @10x → 46.3 s @30x for exactly this reason.
    // Multi-probe (nprobe = 2) recovers the recall a learned partition
    // loses at list boundaries. Fully oracled: DuckDB replays coarse
    // training, home-list assignment, probing, and ADC ranking.
    "ann7_ivf_learned" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val nlist = graft.ann.Pq.adaptiveNlist(emb.count())
      val coarse = graft.ann.Pq.coarseTrain(emb, nlist)
      val model = graft.ann.Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
      graft.ann.Pq.ivfPqTopKLearned(emb, k = 3, model, coarse, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("block"), col("adc"), col("rank"))
    }),

    // ann10: IVF+PQ under an INVERTED MULTI-INDEX coarse quantizer — the
    // answer to the 100x knee the deep scale leg measured in ann7: a flat
    // quantizer's nlist caps at 1024 (driver Lloyd is sample-bounded), so
    // past ~33k vectors per-list depth grows as n/1024 and scored pairs
    // turn quadratic. The IMI composes two half-space quantizers (trained
    // by the SAME Pq.train, m = 2) into k² lists for k + k training cost —
    // adaptiveImiK keeps per-list depth at target to ~2M vectors at the
    // default clamp. Fully oracled: DuckDB replays both half trainings,
    // the composed home assignment, grid probing, and ADC ranking.
    "ann10_imi_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val imiK = graft.ann.Pq.adaptiveImiK(emb.count())
      val imi = graft.ann.Pq.train(emb, m = 2, k = imiK, iters = 2, sampleRate = 0.5)
      val model = graft.ann.Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
      graft.ann.Pq.ivfPqTopKImi(emb, k = 3, model, imi, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("block"), col("adc"), col("rank"))
    }),

    // x10: EXACT heavy hitters (tokens covering > 0.05% of the corpus) via
    // a two-pass Misra–Gries candidate sketch + exact verify. A plain
    // groupBy-count shuffles one row per distinct token per partition —
    // the vocabulary-cardinality problem itself at 100 TB; the sketch
    // bounds the shuffle at ≤ sketchSize candidates (superset guaranteed:
    // MG undercount ≤ n/(k+1) < n·share = the threshold), and the exact
    // verify pass makes the OUTPUT exact — partition-order independent,
    // fully SQL-oracle-able. ops/HeavyHitters.
    "x10_heavy_hitters" -> ((s, dir) => {
      val toks = filter(
        graft.text.TextOps.tokens(lower(col("text"))), t => length(t) > 0)
      graft.ops.HeavyHitters.exactTopShare(s, Tables.documents(s, dir),
        toks, share = 0.0005)
    }),

    // ann9: the index-build / query-serve SPLIT — dd11b's persisted-artifact
    // economics applied to retrieval. Pq.writeIvfIndex persists the codes
    // table AND the trained model (codebooks + centroids as a one-row
    // parquet); Pq.ivfPqTopKFromIndex answers a query batch (every 7th
    // vector, arriving pre-materialized via eager checkpoint) with NO
    // corpus-embedding scan and NO retraining at serve time — PlanSpec
    // asserts the served plan reads only the index. Values are identical
    // to ann7 restricted to the batch (shared arithmetic/tie rules), which
    // is exactly what the oracle replays.
    "ann9_index_served" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val nlist = graft.ann.Pq.adaptiveNlist(emb.count())
      val coarse = graft.ann.Pq.coarseTrain(emb, nlist)
      val model = graft.ann.Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
      val idx = QueryModule.processScopedDir("ann9_idx", dir) // per-process + shutdown-hook-cleaned (QueryModule)
      graft.ann.Pq.writeIvfIndex(emb, idx, model, coarse)
      val queries = emb.filter(pmod(col("vec_id"), lit(7)) === 0)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      graft.ann.Pq.ivfPqTopKFromIndex(s, idx, queries, k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("block"), col("adc"), col("rank"))
    }),

    // ann11: index APPEND — the maintain half of ann9's lifecycle. The
    // model + coarse lists train on the BASE corpus only (80%: vec_id%5<>0);
    // two increment batches arrive later and are parquet-appended to the
    // codes table encoded under the PERSISTED model — no retrain, no base
    // re-read, no base re-write (one pass over each increment; dd11b's
    // economics for retrieval). Serving the full query batch from the
    // appended index must equal the learned search over the union corpus
    // under the base-trained model — exactly what the oracle replays
    // (training sample restricted to base, search over all of e).
    "ann11_index_append" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val base = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val inc1 = emb.filter(pmod(col("vec_id"), lit(5)) === 0 &&
        pmod(col("vec_id"), lit(2)) === 0)
      val inc2 = emb.filter(pmod(col("vec_id"), lit(5)) === 0 &&
        pmod(col("vec_id"), lit(2)) =!= 0)
      val nlist = graft.ann.Pq.adaptiveNlist(base.count())
      val coarse = graft.ann.Pq.coarseTrain(base, nlist)
      val model = graft.ann.Pq.train(base, m = 4, k = 8, iters = 2, sampleRate = 0.5)
      val idx = QueryModule.processScopedDir("ann11_idx", dir) // per-process + shutdown-hook-cleaned (QueryModule)
      // writeIvfIndex overwrites codes/ + model/, so a re-run (bench
      // warm-up, repeated verify) resets any previously appended files
      graft.ann.Pq.writeIvfIndex(base, idx, model, coarse)
      graft.ann.Pq.appendIvfIndex(s, idx, inc1)
      graft.ann.Pq.appendIvfIndex(s, idx, inc2)
      val queries = emb.filter(pmod(col("vec_id"), lit(7)) === 0)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      graft.ann.Pq.ivfPqTopKFromIndex(s, idx, queries, k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("block"), col("adc"), col("rank"))
    }),

    // ann14: index DELETE — the retire half that completes the lifecycle
    // (build ann9 / append ann11 / filter ann13 / delete here). Every 10th
    // vector is tombstoned after the build; serving anti-joins the
    // delete-batch-sized tombstone table out of the candidates, the
    // corpus-sized codes stay immutable (rewriting them per delete would be
    // O(corpus) for an O(batch) event), and space reclaims at the next
    // rebuild. The oracle replays the learned search with the neighbor
    // side alone restricted — a tombstoned id surfacing anywhere in any
    // query's top-k breaks the row hash.
    "ann14_index_delete" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val nlist = graft.ann.Pq.adaptiveNlist(emb.count())
      val coarse = graft.ann.Pq.coarseTrain(emb, nlist)
      val model = graft.ann.Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
      val idx = QueryModule.processScopedDir("ann14_idx", dir) // per-process + shutdown-hook-cleaned (QueryModule)
      graft.ann.Pq.writeIvfIndex(emb, idx, model, coarse)
      graft.ann.Pq.deleteFromIvfIndex(s, idx,
        emb.filter(pmod(col("vec_id"), lit(10)) === 0).select(col("vec_id")))
      val queries = emb.filter(pmod(col("vec_id"), lit(7)) === 0)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      graft.ann.Pq.ivfPqTopKFromIndex(s, idx, queries, k = 3, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("block"), col("adc"), col("rank"))
    }),

    // sp9: greedy k-center coreset — diverse-subset selection over the
    // embedding space (farthest-point traversal; Sener & Savarese's coreset
    // rule): each of k driver-bounded steps takes the vector farthest from
    // everything chosen so far, so dense near-dup regions send one
    // representative and outliers are guaranteed in. k linear passes
    // (top-1 TakeOrdered each — no vector shuffle); integer-micro distances
    // make the whole traversal replayable exactly (ann/Coreset.scala).
    "sp9_kcenter_coreset" -> ((s, dir) =>
      graft.ann.Coreset.kCenter(Tables.embeddings(s, dir), k = 8)),

    // ann12: hybrid retrieval — BM25 top-20 (tx17's query set/scoring) and
    // dense cosine top-20 (queries = vectors 1..3, the shared doc/vec id
    // space) fused by reciprocal rank fusion (ann/Hybrid.scala). Only
    // integer ranks cross the fusion boundary, so the fused double is
    // cross-engine exact; each leg keeps its own scale path (two-stage
    // salted BM25 rank, broadcast-query ANN) and the fusion works on
    // queries×k rows regardless of corpus size.
    "ann12_rrf_hybrid" -> ((s, dir) => {
      import s.implicits._
      val q = Seq(
        (1L, "spark"), (1L, "window"), (1L, "shuffle"),
        (2L, "customer"), (2L, "vector"),
        (3L, "merge"), (3L, "stream"), (3L, "filter"))
        .toDF("query_id", "term")
      val sparse = graft.text.Bm25.topK(
        Tables.documents(s, dir), q, "doc_id", "text", topK = 20)
        .select(col("query_id"), col("doc_id").as("id"), col("rank"))
      val emb = Tables.embeddings(s, dir)
      val dense = Ann.bruteForceTopK(
        emb.filter(col("vec_id").isin(1L, 2L, 3L)), emb, k = 20)
        .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
      graft.ann.Hybrid.rrfFuse(Seq("bm25" -> sparse, "dense" -> dense), k = 10)
        .select(col("query_id"), col("id").as("doc_id"), col("rrf_score"),
          col("bm25_rank"), col("dense_rank"), col("rank"))
    }),

    // dq5: index-fit drift — the measurement that makes ann11's no-retrain
    // trade explicit. The increment's occupancy HISTOGRAM over the
    // base-trained coarse lists is compared to the base's via PSI (x7's
    // smoothed Σ (p−q)·ln(p/q)): an increment the quantizer fits lands in
    // lists roughly like the base did; distribution shift piles into few
    // lists (degrading per-list depth AND recall) and the PSI says so
    // BEFORE recall quietly sinks. Scale shape: homes are map-side
    // (CoarseProbes codegen), one nlist-cardinality exchange, PSI over a
    // control-plane-sized frame.
    "dq5_index_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val base = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val cents = graft.ann.Pq.coarseTrain(base, graft.ann.Pq.adaptiveNlist(base.count()))
      graft.quality.EmbeddingHealth.indexDriftPsi(emb,
        pmod(col("vec_id"), lit(5)) === 0, cents)
    }),

    // dq6: CORPUS drift gate — dq5's question asked of the text itself:
    // does a new crawl/snapshot still look like the corpus the pipeline
    // was tuned on? Token-count histograms (10 buckets, 32-token cells,
    // top cell open) of the base vs the current snapshot, compared by
    // x7's smoothed PSI — a scraper regression (truncated pages) or a
    // template change (boilerplate doubling lengths) shifts the length
    // distribution and trips the gate BEFORE a silently different corpus
    // trains. The fixture's "current" snapshot plants that drift: every
    // 3rd doc arrives text-doubled. Scale shape: one map-side tokenize +
    // bucket projection, ONE 10-row exchange, PSI over the control-plane
    // frame — x7's cost at any corpus size.
    "dq6_corpus_drift" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val curr = docs.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(col("text"), lit(" "), col("text"))).otherwise(col("text")).as("text"))
      def bucketed(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.select(least(floor(
            size(TextOps.tokens(lower(col("text")))) / 32).cast("long"), lit(9L))
          .as("bucket"), lit(tag).as("__snap"))
      val buckets = bucketed(docs, "base").unionByName(bucketed(curr, "curr"))
        .groupBy(col("bucket"))
        .agg(sum(when(col("__snap") === "base", 1L).otherwise(0L)).as("n_base"),
          sum(when(col("__snap") === "curr", 1L).otherwise(0L)).as("n_curr"))
      val w = Window.partitionBy(lit(1))
      val p = (col("n_base") + 1).cast("double") / sum((col("n_base") + 1).cast("double")).over(w)
      val q = (col("n_curr") + 1).cast("double") / sum((col("n_curr") + 1).cast("double")).over(w)
      buckets
        .withColumn("psi", round(sum((p - q) * log(p / q)).over(w), 6))
        .select(col("bucket"), col("n_base"), col("n_curr"), col("psi"),
          (col("psi") > 0.2).as("drift_detected"))
    }),

    // dq7: SCHEMA + stat drift between two table versions — the contract
    // check a sync runs when a new snapshot arrives: which columns
    // appeared/vanished/changed type, and did null rates move. Built on
    // x12's one-pass profile (quality/Profiling); the drift join is
    // column-count-sized, control-plane cheap at any table size. Null
    // rates compare in exact integer basis points (div, no float ratio).
    // The fixture plants every drift class: o_custkey type-changes to
    // string, o_orderstatus nulls out its 'F' rows (null-rate jump),
    // o_totalprice drops, o_orderdate appears.
    "dq7_schema_drift" -> ((s, dir) => {
      import graft.quality.Profiling
      val orders = Tables.orders(s, dir)
      val prev = orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val curr = orders.select(col("o_orderkey"),
        col("o_custkey").cast("string").as("o_custkey"),
        when(col("o_orderstatus") === "F", lit(null))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        col("o_orderdate").cast("date").as("o_orderdate"))
      Profiling.schemaDrift(
        Profiling.profile(prev, prev.columns.toSeq),
        Profiling.profile(curr, curr.columns.toSeq))
    }),

    // ann6: recall@3 of the IVF+PQ path against the exact integer-L2 top-3
    // in the same block — the measurement every ANN deployment ships beside
    // the index (is the compression hurting retrieval?). Per-query hit
    // counts, queries with zero hits kept. Fully oracled: the DuckDB side
    // replays training + ADC (pqOracle) AND the exact baseline.
    // contrast = true: recall isolates PQ compression loss, so both legs
    // must share the SAME block structure — letting the scale guard swap
    // the approx leg onto learned lists would measure partition drift, not
    // compression. (Both legs are measurement harness, not serving paths.)
    "ann6_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val model = graft.ann.Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
      val approx = graft.ann.Pq.ivfPqTopK(emb, "label", k = 3, model, contrast = true)
        .select(col("query_id"), col("neighbor_id"))
      val exact = graft.ann.Pq.exactL2TopK(emb, "label", k = 3)
        .select(col("query_id"), col("neighbor_id"))
      recallAt3(approx, exact)
    }),

    // ann6b: SAMPLED recall — the scale-honest form of ann6. Recall
    // measurement re-runs the exact baseline for every query vector; at
    // 100 TB you sample the query side (the estimate's variance falls as
    // 1/sqrt(sampled queries), and the exact leg's cost falls linearly).
    // Both legs pre-filter queries by the engine-portable md5 unit hash
    // (< 0.25); Catalyst pushes the query_id predicate below the window
    // and into the query-side scan of both joins, so the pruning actually
    // reaches the expensive exact self-join. Fully oracled with the same
    // sampled query set.
    "ann6b_recall_sampled" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val model = graft.ann.Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
      val keep = graft.ops.Sampling.unitHash(col("query_id")) < 0.25
      val approx = graft.ann.Pq.ivfPqTopK(emb, "label", k = 3, model, contrast = true)
        .filter(keep).select(col("query_id"), col("neighbor_id"))
      val exact = graft.ann.Pq.exactL2TopK(emb, "label", k = 3)
        .filter(keep).select(col("query_id"), col("neighbor_id"))
      recallAt3(approx, exact)
    }),

    // ann6c: recall@3 of the IMI SCALE PATH against the GLOBAL exact
    // top-3 — ann6 measures compression loss inside a shared block; this
    // measures what the learned PARTITION loses too (a true neighbor in an
    // unprobed list is a miss). With dq5 this is the pair of live monitors
    // the ANN lifecycle ships: drift says the quantizer no longer fits,
    // recall says what that costs retrieval. Query side sampled at 25%
    // on BOTH legs (ann6b's argument — the global exact leg is the
    // all-pairs cost). Fully oracled: IMI training + grid probing + ADC
    // AND the global exact baseline replay.
    // Honest read of the number on THIS corpus: the synthetic embeddings
    // are near-uniform (no cluster structure), so the global top-3 is
    // spread almost arbitrarily across lists and recall is bounded near
    // the probed fraction (nprobe 2 of 16 lists ≈ 12.5%, ADC loss on top
    // → measured ≈ 0.06). That is the true value of the configured
    // measurement — real embedding corpora have the cluster structure
    // learned partitions exploit — ann6d below IS that operating point
    // (clustered fixture, recall 1.0); the row's job is the machinery and the
    // honest floor, not a flattering constant.
    "ann6c_imi_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val imiK = graft.ann.Pq.adaptiveImiK(emb.count())
      val imi = graft.ann.Pq.train(emb, m = 2, k = imiK, iters = 2, sampleRate = 0.5)
      val model = graft.ann.Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
      val keep = graft.ops.Sampling.unitHash(col("query_id")) < 0.25
      val approx = graft.ann.Pq.ivfPqTopKImi(emb, k = 3, model, imi, nprobe = 2)
        .filter(keep).select(col("query_id"), col("neighbor_id"))
      val exact = graft.ann.Pq.exactGlobalTopK(emb, k = 3,
          graft.ops.Sampling.unitHash(col("vec_id")) < 0.25)
        .select(col("query_id"), col("neighbor_id"))
      recallAt3(approx, exact)
    }),

    // ann6d: ann6c's measurement at the IMI's intended OPERATING POINT —
    // recall@3 vs the global exact baseline on the clustered fixture
    // (clusteredEmb: 13 well-separated centers + 0.1 noise), with the
    // approx leg as the TWO-STAGE serve (Pq.imiExactRerankTopK: the index
    // prunes candidates, exact L2 re-ranks them — ann5's re-rank under
    // ann10's blocking). That isolates PARTITION loss: on clustered data
    // the global top-3 lives inside the query's own cluster, the composed
    // quantizer's lists align with the clusters, and nprobe=2 probing
    // reaches them — recall here must sit far above ann6c's near-uniform
    // floor (≈ the probed fraction; ADC-ranked legs additionally cap near
    // ann6's compression recall ≈ 0.19, which is why the clustered row
    // serves re-ranked). The ann6c/ann6d pair is the honest
    // characterization: what the partition costs when data has no
    // structure, and what it delivers when it does.
    "ann6d_imi_recall_clustered" -> ((s, dir) => {
      val emb = clusteredEmb(s, dir)
      val imiK = graft.ann.Pq.adaptiveImiK(emb.count())
      val imi = graft.ann.Pq.train(emb, m = 2, k = imiK, iters = 2, sampleRate = 0.5)
      val keep = graft.ops.Sampling.unitHash(col("query_id")) < 0.25
      val approx = graft.ann.Pq.imiExactRerankTopK(emb, k = 3, imi, nprobe = 2)
        .filter(keep).select(col("query_id"), col("neighbor_id"))
      val exact = graft.ann.Pq.exactGlobalTopK(emb, k = 3,
          graft.ops.Sampling.unitHash(col("vec_id")) < 0.25)
        .select(col("query_id"), col("neighbor_id"))
      recallAt3(approx, exact)
    }),

    // tx15: PII scrub (RefinedWeb/Pile recipe) — emails, IPv4s and
    // phone-like numbers detected and replaced with typed tags in one
    // map-side projection (text/Pii.scala). The fixture corpus carries no
    // PII, so known instances are PLANTED deterministically (every 7th doc
    // an email, 11th an IP, 13th a phone — the dd2-mutation pattern);
    // counts and the redacted text both hash-compare, so tag placement is
    // verified byte-for-byte cross-engine.
    "tx15_pii_redact" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val planted = docs.select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(11)) === 0,
            concat(lit(" from 10.2."), pmod(col("doc_id"), lit(200)), lit(".7 logged")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(13)) === 0,
            concat(lit(" call +1 555 01"),
              lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"), lit(" today")))
            .otherwise(lit(""))).as("text"))
      graft.text.Pii.redact(planted, "doc_id", "text")
    }),

    // ann5: two-stage retrieval — ADC shortlist (10 per query), exact
    // integer-L2 re-rank on the quantized vectors for the final top-3.
    "ann5_pq_rerank_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val model = graft.ann.Pq.train(emb, m = 4, k = 8, iters = 2, sampleRate = 0.5)
      graft.ann.Pq.ivfPqRerankTopK(emb, "label", k = 3, shortlist = 10, model)
        .select(col("query_id"), col("neighbor_id"), col("block"), col("d2"), col("rank"))
    }),

    // tx1: n-gram-heuristic language id (stopword-ratio argmax).
    "tx1_langid" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"), col("lang").as("labeled_lang"),
        TextOps.langId(col("text")).as("detected_lang"))),

    // tx2: quality scoring (length/diversity/stopword heuristics).
    "tx2_quality_score" -> ((s, dir) =>
      TextOps.qualityMetrics(Tables.documents(s, dir), "text")
        .select(col("doc_id"), col("n_tokens"), col("n_chars_measured"),
          col("avg_token_len"), col("distinct_token_ratio"), col("stopword_ratio"),
          col("quality_score"))),

    // tx3: token counting — whitespace + the chars/4 subword estimate (the
    // documented FALLBACK; tx3b below is the real vocab-driven count).
    "tx3_token_count" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        TextOps.approxBpeCount(col("text")).as("n_bpe_tokens"))),

    // tx3b: REAL subword token counting — greedy longest-match merging
    // against a merges vocab (BPE/WordPiece inference) fused into one
    // codegen'd per-row loop (functions.BpeTokenCount). The oracle replays
    // the identical greedy scan as a recursive CTE over the same vocab
    // (text.Bpe renders ONE list into both sides), so the count is verified
    // bit-exactly, not approximated.
    "tx3b_bpe_tokens" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.bpeCount(col("text")).as("n_bpe_tokens"))),

    // tx6: Gopher-rule quality filters (Rae et al. 2021 §A1.1) — the
    // standard pre-dedup format heuristics of a pretraining pipeline, all
    // integer-count based so the oracle hashes bit-identically.
    "tx6_gopher_rules" -> ((s, dir) =>
      TextOps.gopherFlags(Tables.documents(s, dir), "text")
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("symbol_ratio"), col("alpha_word_ratio"), col("bullet_line_ratio"),
          col("ellipsis_line_ratio"), col("word_count_ok"), col("mean_word_len_ok"),
          col("symbol_ratio_ok"), col("alpha_ok"), col("bullet_ok"),
          col("ellipsis_ok"), col("gopher_pass"))),

    // tx7: repetition filters — duplicate-line / duplicate-paragraph
    // fractions (boilerplate detection; the other half of the Gopher rules).
    "tx7_repetition" -> ((s, dir) =>
      TextOps.repetitionFlags(Tables.documents(s, dir), "text")
        .select(col("doc_id"), col("dup_line_ratio"), col("dup_para_ratio"),
          col("dup_line_ok"), col("dup_para_ok"), col("repetition_pass"))),

    // tx7b: the Gopher n-gram repetition rules (Rae et al. §A1.1 Table A1)
    // tx7 doesn't cover — top-2/3/4-gram char fraction and duplicate-
    // 5..10-gram char fraction — all nine from ONE fused per-row pass
    // (functions.GopherNgramStats, integer numerators → bit-exact ratios),
    // plus the COMBINED Gopher gate: format rules (tx6) AND line/para
    // repetition (tx7) AND n-gram repetition.
    "tx7b_ngram_repetition" -> ((s, dir) => {
      val base = TextOps.repetitionFlags(
        TextOps.gopherFlags(Tables.documents(s, dir), "text"), "text")
      val ngramCols = TextOps.ngramThresholds.flatMap { case (f, _) =>
        Seq(col(s"${f}_ratio"), col(s"${f}_ok")) }
      TextOps.ngramRepetitionFlags(base, "text")
        .withColumn("gopher_full_pass",
          col("gopher_pass") && col("repetition_pass") && col("ngram_pass"))
        .select((col("doc_id") +: ngramCols) ++ Seq(col("ngram_pass"),
          col("gopher_pass"), col("repetition_pass"), col("gopher_full_pass")): _*)
    }),

    // tx8: sequence packing — assign each document a (pack shard, sequence
    // id, token offset) for fixed-window pretraining batches via the
    // concat-and-chunk scheme: documents concatenate in deterministic order
    // within a shard and split at every `seqLen` tokens; a doc belongs to
    // the sequence its first token lands in. One window function per shard
    // partition — no global sort, shards pack independently at any scale.
    "tx8_sequence_pack" -> ((s, dir) =>
      packSequences(Tables.documents(s, dir).select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens")))),

    // tx8b: tx8's packing scheme re-based on REAL subword counts (tx3b's
    // vocab-driven tokenizer) — the budget every pretraining batch actually
    // consumes. Same per-shard window; the token counting stays map-side.
    "tx8b_bpe_pack" -> ((s, dir) =>
      packSequences(Tables.documents(s, dir).select(col("doc_id"), col("source"),
        TextOps.bpeCount(col("text")).as("n_tokens")))),

    // sp4b: temperature mixture sampling re-based on REAL token budgets —
    // source weights from Σ bpe tokens (not doc counts), target in tokens:
    // the unit a pretraining mix is actually specified in. Same √-temperature
    // arithmetic and exact decimal weight sum as sp4; the per-source token
    // sums are exact long sums, so cross-engine bit-identity carries over.
    "sp4b_token_budget_mix" -> ((s, dir) =>
      graft.ops.Sampling.temperatureMix(
        Tables.documents(s, dir).withColumn("__tok", TextOps.bpeCount(col("text"))),
        "doc_id", "source", targetRows = 30000, weightCol = Some("__tok"))
        .select(col("doc_id"), col("source"), col("lang"))),

    // tx9: benchmark decontamination — flag corpus docs sharing ≥ 3
    // distinct 5-grams with the (deterministic, every-50th-doc) eval set.
    // The eval gram set broadcasts; corpus grams join map-side.
    "tx9_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.text.Decontaminate.flag(docs,
        docs.filter(pmod(col("doc_id"), lit(50)) === 0), "doc_id", "text",
        k = 5, minHits = 3L)
    }),

    // tx10: CCNet-style cross-document line dedup. The synthetic corpus is
    // single-line, so the query deterministically reconstructs the shape the
    // operator exists for — a per-source boilerplate header line prepended to
    // every doc (the oracle replays the same construction): 25 copies of each
    // header collapse to the first doc per source, bodies all survive.
    "tx10_line_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("text", concat(lit("HEADER for "), col("source"), lit("\n"), col("text")))
      graft.text.LineDedup.dropDuplicateLines(docs, "doc_id", "text",
        scopeCols = Seq("source"))
    }),

    // tx11: overlapping token-window chunking (16-token windows, stride 12
    // — 4-token overlap) — the retrieval/embedding prep step.
    "tx11_chunking" -> ((s, dir) =>
      TextOps.chunk(Tables.documents(s, dir), "doc_id", "text",
        winLen = 16, stride = 12)),

    // tx12: Unicode NFC normalization (native expression). The ASCII corpus
    // is augmented deterministically: every 3rd doc gets a DECOMPOSED suffix
    // (e + combining acute), the next a precomposed one — NFC must collapse
    // the former onto the latter's byte form. The oracle replays the same
    // construction with chr().
    "tx12_nfc_normalize" -> ((s, dir) => {
      val aug = Tables.documents(s, dir).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, concat(col("text"), lit(" cafe\u0301")))
          .when(pmod(col("doc_id"), lit(3)) === 1, concat(col("text"), lit(" caf\u00e9")))
          .otherwise(col("text")).as("raw"))
      aug.select(col("doc_id"), TextOps.nfc(col("raw")).as("text_nfc"),
        (TextOps.nfc(col("raw")) =!= col("raw")).as("was_denormalized"),
        (length(col("raw")) - length(TextOps.nfc(col("raw")))).cast("long")
          .as("chars_saved"))
    }),

    // tx13: control-character stripping — the first pass of every corpus
    // cleaner (C0 controls except \t\n\r, plus DEL, are tokenizer poison
    // and break downstream line protocols). Scan-speed regexp_replace with
    // an explicit hex class (portable across Java regex and RE2). The
    // corpus is clean, so contamination is injected deterministically —
    // both engines construct and strip the same bytes.
    "tx13_control_strip" -> ((s, dir) => {
      val aug = Tables.documents(s, dir).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit("\u0001\u0002"), col("text"), lit("\u0000end\u007F")))
          .when(pmod(col("doc_id"), lit(4)) === 1,
            concat(col("text"), lit("\u000Bmid\u001Ftail")))
          .otherwise(col("text")).as("raw"))
      val clean = TextOps.stripControls(col("raw"))
      aug.select(col("doc_id"), clean.as("text_clean"),
        (length(col("raw")) - length(clean)).cast("long").as("n_ctrl"))
    }),

    // tx14: n-gram LM quality scoring (CCNet recipe, self-trained bigram
    // model — see graft.text.LmScore). Mean conditional bigram probability
    // per doc; fluent/templated text scores high, rare-transition gibberish
    // low. All-rational arithmetic (no ln/pow) + exact decimal sums keep the
    // score bit-identical across engines.
    "tx14_lm_score" -> ((s, dir) =>
      graft.text.LmScore.bigramScore(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "doc_id", "text")),

    // tx16: CCNet perplexity bucketing — head/middle/tail thirds from
    // sample-derived thresholds (no corpus-wide sort; see LmScore.pplBuckets'
    // scale note). Buckets assigned map-side against the broadcast cut
    // points; the 25% threshold sample is hash-deterministic so the oracle
    // draws the identical line.
    "tx16_ppl_buckets" -> ((s, dir) =>
      graft.text.LmScore.pplBuckets(
        graft.text.LmScore.bigramScore(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "doc_id", "text"),
        sampleFraction = 0.25)),

    // tx20: the end-to-end curation GATE — the RefinedWeb/Gopher pipeline
    // shape as ONE query: language id, Gopher quality rules, PII audit,
    // token floor and exact-dup canonicalization feed a single keep/drop
    // decision with an ordered drop_reasons trail. Each component is the
    // already-oracled operator (tx1/tx6/tx5/tx3/tx4) — this row proves
    // they COMPOSE: one corpus scan computes every per-row gate, and the
    // ONLY shuffle is the fingerprint exchange for dup canonicalization —
    // the keeper is a min-over-fingerprint window on that same exchange,
    // never a materialized keeper table (one row per distinct fingerprint
    // is corpus-sized; broadcasting or re-joining it would be the scale
    // mistake this query exists to avoid).
    "tx20_curation_gate" -> ((s, dir) => {
      val flagged = TextOps.gopherFlags(Tables.documents(s, dir), "text")
        .withColumn("detected_lang", TextOps.langId(col("text")))
        .withColumn("lang_ok", col("detected_lang") === col("lang"))
        .withColumn("pii_hits", TextOps.piiCount(col("text")))
        .withColumn("pii_ok", col("pii_hits") === 0L)
        .withColumn("n_tokens", size(TextOps.tokens(col("text"))).cast("long"))
        .withColumn("token_ok", col("n_tokens") >= 10L)
        .withColumn("fingerprint", TextOps.fingerprint(col("text")))
      flagged
        .withColumn("__keeper", min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("fingerprint"))))
        .withColumn("dup_ok", col("doc_id") === col("__keeper"))
        .withColumn("keep", col("lang_ok") && col("gopher_pass") &&
          col("pii_ok") && col("token_ok") && col("dup_ok"))
        .withColumn("drop_reasons", concat_ws(",",
          when(!col("lang_ok"), lit("lang")),
          when(!col("gopher_pass"), lit("gopher")),
          when(!col("pii_ok"), lit("pii")),
          when(!col("token_ok"), lit("tokens")),
          when(!col("dup_ok"), lit("duplicate"))))
        .select(col("doc_id"), col("detected_lang"), col("lang_ok"),
          col("gopher_pass"), col("pii_hits"), col("pii_ok"),
          col("n_tokens"), col("token_ok"), col("dup_ok"),
          col("keep"), col("drop_reasons"))
    }),

    // tx21: corpus-level collocation mining — top adjacent word pairs by
    // fixed-point PMI (the log's argument as exact integer `c_ab·N·1e6 div
    // c_a·c_b`, so the RANKING has no float in it and replays exactly in
    // DuckDB with hugeint `//`). Bigrams extract map-side (zip_with over
    // two token-array slices, no explode-join); the hapax tail is pruned
    // by minCount BEFORE the unigram joins; top-k is
    // TakeOrderedAndProject. See graft.text.Collocations for the 100 TB
    // shape and overflow bounds.
    "tx21_pmi_collocations" -> ((s, dir) =>
      graft.text.Collocations.pmiCollocations(
        Tables.documents(s, dir), "text", minCount = 3L, topK = 100)),

    // tx23: word-frequency SPECTRUM (frequency of frequencies) — the
    // Zipf/Heaps profile a corpus audit reads before trusting token
    // statistics: hapax mass (k=1), the boilerplate head (huge k), and the
    // shape between. Two shuffles total — the word count is
    // vocabulary-sized, the spectrum is ~log-many rows; both orders of
    // magnitude below the corpus at any SF.
    "tx23_freq_spectrum" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(filter(graft.text.TextOps.tokens(lower(col("text"))),
          w => length(w) > 0)).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("cnt").as("occurrences"))
        .agg(count(lit(1)).as("n_words"))),

    // tx22: BPE tokenizer TRAINING — learn the merges table tx3b's
    // inference consumes, from the corpus itself (Sennrich et al. 2016).
    // Corpus touched once (the distinct-word count); each of the 8
    // iterations is one vocabulary-sized pair-count aggregation + a one-row
    // driver argmax + a map-side literal replace. The bracket encoding
    // (<c><a><t>) makes merge application a literal leftmost
    // non-overlapping string replace — identical semantics in Spark and
    // DuckDB — so the oracle re-derives EVERY merge from raw text (8
    // unrolled stages, each verifying the argmax of the state the previous
    // merges produced). See graft.text.BpeTrain.
    "tx22_bpe_train" -> ((s, dir) =>
      graft.text.BpeTrain.train(Tables.documents(s, dir), "text", merges = 8)),

    // tx22b: the train→apply ROUNDTRIP — tokenize the corpus with the
    // merges tx22 just learned, applied in TRAINING ORDER (true BPE
    // inference; tx3b's greedy longest-match is the WordPiece variant).
    // Training is k vocabulary-sized shuffles; application is pure
    // map-side (the merges fold into one literal replace chain), so the
    // corpus pass has no shuffle. The oracle re-derives the merges through
    // the tx22 stage chain and applies the same chain per word.
    "tx22b_bpe_roundtrip" -> ((s, dir) =>
      graft.text.BpeTrain.trainAndCount(Tables.documents(s, dir), "text", merges = 8)),

    // tx20b: the curation gate at NEAR-DUP granularity — what a production
    // pipeline actually runs: the dup leg is dd2b's portable MinHash+LSH
    // pairs chained through dd6's connected components, so canonicalization
    // collapses whole near-dup GROUPS (keeper = smallest doc id reachable
    // through near-dup edges), not just byte-identical fingerprints. The
    // other four gates are tx20's, computed in the same single corpus scan.
    // Scale shape: the near-dup leg is the banded, skew-sub-partitioned dd2
    // pipeline; the group map holds only docs that appear in some near-dup
    // pair (≪ corpus), so the final left join broadcasts; min-label
    // propagation is per-round one shuffle on vertex id (see dupGroups).
    "tx20b_curation_gate_neardup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val flagged = TextOps.gopherFlags(docs, "text")
        .withColumn("detected_lang", TextOps.langId(col("text")))
        .withColumn("lang_ok", col("detected_lang") === col("lang"))
        .withColumn("pii_hits", TextOps.piiCount(col("text")))
        .withColumn("pii_ok", col("pii_hits") === 0L)
        .withColumn("n_tokens", size(TextOps.tokens(col("text"))).cast("long"))
        .withColumn("token_ok", col("n_tokens") >= 10L)
      val pairs = Dedup.minhashLsh(docs.select(col("doc_id"), col("text")),
        "doc_id", "text", numHashes = 16, bands = 4, threshold = 0.5,
        portableHash = true)
      val groups = Dedup.dupGroups(pairs)
      flagged.join(groups.withColumnRenamed("group_id", "__grp"), Seq("doc_id"), "left")
        .withColumn("dup_ok", col("doc_id") === coalesce(col("__grp"), col("doc_id")))
        .withColumn("keep", col("lang_ok") && col("gopher_pass") &&
          col("pii_ok") && col("token_ok") && col("dup_ok"))
        .withColumn("drop_reasons", concat_ws(",",
          when(!col("lang_ok"), lit("lang")),
          when(!col("gopher_pass"), lit("gopher")),
          when(!col("pii_ok"), lit("pii")),
          when(!col("token_ok"), lit("tokens")),
          when(!col("dup_ok"), lit("near_duplicate"))))
        .select(col("doc_id"), col("detected_lang"), col("lang_ok"),
          col("gopher_pass"), col("pii_hits"), col("pii_ok"),
          col("n_tokens"), col("token_ok"), col("dup_ok"),
          col("keep"), col("drop_reasons"))
    }),

    // tx19: URL filtering (RefinedWeb §3.1/3.2) — the corpus has no URL
    // column, so one is synthesized deterministically from (source, lang,
    // doc_id): varied TLDs, an optional cdn. subdomain, a path and a query
    // string. Host/domain extraction and the blocklist decision are
    // map-side regexp + literal membership; zero shuffle (see text/UrlOps).
    "tx19_url_filter" -> ((s, dir) => {
      val dom = concat(col("source"), lit("-"), pmod(col("doc_id"), lit(7)),
        element_at(array(lit(".org"), lit(".net"), lit(".io")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
      val hostSyn = when(pmod(col("doc_id"), lit(2)) === 0, concat(lit("cdn."), dom))
        .otherwise(dom)
      val url = concat(lit("https://"), hostSyn, lit("/docs/"), col("doc_id"),
        lit("?l="), col("lang"))
      val blocklist = Seq("src1-3.org", "src4-0.net", "src2-5.io", "src0-6.org")
      val withUrl = Tables.documents(s, dir).select(col("doc_id"), url.as("url"))
      val h = graft.text.UrlOps.host(col("url"))
      withUrl.select(col("doc_id"), col("url"), h.as("host"),
        graft.text.UrlOps.registrableDomain(h).as("domain"))
        .withColumn("is_blocked",
          graft.text.UrlOps.isBlocked(col("domain"), blocklist))
    }),

    // tx18: Moore-Lewis contrastive domain selection — in-domain LM from
    // the (lang='en', source='src0') seed vs the general corpus LM; keep
    // where the in-domain model explains the doc better (see
    // LmScore.contrastiveSelect).
    "tx18_contrastive_select" -> ((s, dir) =>
      graft.text.LmScore.contrastiveSelect(
        Tables.documents(s, dir),
        col("lang") === "en" && col("source") === "src0",
        "doc_id", "text")),

    // tx17: BM25 retrieval (rational-idf variant — see text/Bm25.scala) of
    // the top 10 docs for three fixed multi-term queries over corpus
    // vocabulary. The broadcast query-term semi-join prunes the token
    // explode before any shuffle; top-k is the two-stage salted rank.
    "tx17_bm25_topk" -> ((s, dir) => {
      import s.implicits._
      val q = Seq(
        (1L, "spark"), (1L, "window"), (1L, "shuffle"),
        (2L, "customer"), (2L, "vector"),
        (3L, "merge"), (3L, "stream"), (3L, "filter"))
        .toDF("query_id", "term")
      graft.text.Bm25.topK(Tables.documents(s, dir), q, "doc_id", "text", topK = 10)
    }),

    // tx4: document fingerprinting + duplicate-group sizing.
    "tx4_fingerprint" -> ((s, dir) => {
      val fp = Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fingerprint"))
      val groups = fp.groupBy(col("fingerprint")).agg(count(lit(1)).as("dup_group_size"))
      fp.join(groups, Seq("fingerprint")).select(col("doc_id"), col("fingerprint"),
        col("dup_group_size"))
    }),

    // mm1: multimodal decode, real codec — the fixture column is actual PNG
    // bytes and the decode is javax.imageio in partition batches. The oracle
    // predicts the decoded dimensions from doc_id (the fixture's generator
    // formula), so a decode that didn't really parse the PNG can't pass.
    "mm1_multimodal_decode" -> ((s, dir) =>
      Multimodal.decodeImage(s, Multimodal.imageTable(s, Tables.documents(s, dir)))
        .toDF().select(col("doc_id"), col("width"), col("height"), col("channels"))),

    // mm2: per-media-type curation stats over the REAL decodes — pixel count
    // from ImageIO, sample count from javax.sound.sampled, frame count from
    // the container demux. Each leg is one map-side codec pass + a global agg;
    // the oracle predicts every number from the fixture formulas.
    "mm2_media_stats" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val img = Multimodal.decodeImage(s, Multimodal.imageTable(s, docs)).toDF()
        .agg(count(lit(1)).as("n_assets"),
          sum((col("width") * col("height")).cast("long")).as("total_units"))
        .select(lit("image").as("media_type"), col("n_assets"), col("total_units"))
      val aud = Multimodal.decodeAudio(s, Multimodal.audioTable(s, docs)).toDF()
        .agg(count(lit(1)).as("n_assets"), sum(col("n_samples")).as("total_units"))
        .select(lit("audio").as("media_type"), col("n_assets"), col("total_units"))
      val vid = Multimodal.probeVideo(s, Multimodal.videoTable(s, docs)).toDF()
        .agg(count(lit(1)).as("n_assets"),
          sum(col("n_frames").cast("long")).as("total_units"))
        .select(lit("video").as("media_type"), col("n_assets"), col("total_units"))
      img.union(aud).union(vid)
    }),

    // mm2b: per-row audio decode — the strongest check of the WAV codec path
    // (the planted peak can only come from actually reading the PCM frames).
    "mm2_audio_decode" -> ((s, dir) =>
      Multimodal.decodeAudio(s, Multimodal.audioTable(s, Tables.documents(s, dir)))
        .toDF()),

    // mm3: real resize — ImageIO decode → half-scale bilinear → PNG
    // re-encode, map-side. Thumb dimensions oracle-checked like mm1.
    "mm3_resize" -> ((s, dir) =>
      Multimodal.resizeImage(s, Multimodal.imageTable(s, Tables.documents(s, dir)))
        .toDF().select(col("doc_id"), col("width"), col("height"),
          col("thumb_width"), col("thumb_height"))),

    // mm4: real frame sampling — demux the length-prefixed container, decode
    // only the min(k, n_frames) evenly-spaced frames, fan out map-side. The
    // oracle replays the sampling arithmetic and the per-frame dimension
    // formula, so a sampler that doesn't really walk the index can't pass.
    "mm4_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(s, Multimodal.videoTable(s, Tables.documents(s, dir)))
        .toDF()),

    // mm5: perceptual-hash image dedup — the multimodal twin of dd1:
    // aHash each PNG (8×8 block means vs global mean, exact integer
    // compares), group identical hashes, keep the smallest doc id.
    // Re-keyed byte-identical copies are planted like dd1's. FULLY oracled:
    // the fixture's pixels are a closed-form function of the id, so DuckDB
    // replays downsample → threshold → pack without any codec.
    "mm5_image_dedup" -> ((s, dir) => {
      import s.implicits._
      val imgs = Multimodal.imageTable(s, Tables.documents(s, dir).select(col("doc_id")))
      val copies = imgs.filter(_.doc_id % 6 == 0)
        .map(r => r.copy(doc_id = r.doc_id + 500000))
      val hashed = Multimodal.imageAHash(s, imgs.union(copies)).toDF()
      val groups = hashed.groupBy(col("ahash_hi"), col("ahash_lo"))
        .agg(count(lit(1)).as("group_size"), min(col("doc_id")).as("__keeper"))
      hashed.join(groups, Seq("ahash_hi", "ahash_lo"))
        .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
          col("group_size"), (col("doc_id") === col("__keeper")).as("kept"))
    }),

    // mm7: audio dedup by energy-envelope fingerprint — mm5's role for
    // audio: REAL WAV decode map-side (the mm2 codec path), |amplitude|
    // sums over 16 sample windows thresholded by the exact
    // cross-multiplied integer rule, identical envelopes group, smallest
    // id survives. Every 9th doc gets a byte-identical planted copy
    // (+600000) that must land in its source's group. Only (doc_id, one
    // long) shuffles; the oracle replays the closed-form PCM samples
    // (wavBytes' construction) without any codec — mm5's stance.
    "mm7_audio_dedup" -> ((s, dir) => {
      import s.implicits._
      val audio = Multimodal.audioTable(s, Tables.documents(s, dir).select(col("doc_id")))
      val copies = audio.filter(_.doc_id % 9 == 0)
        .map(r => r.copy(doc_id = r.doc_id + 600000))
      val fp = Multimodal.audioFingerprint(s, audio.union(copies)).toDF()
      val groups = fp.groupBy(col("afp"))
        .agg(count(lit(1)).as("group_size"), min(col("doc_id")).as("__keeper"))
      fp.join(groups, Seq("afp"))
        .select(col("doc_id"), col("afp"), col("group_size"),
          (col("doc_id") === col("__keeper")).as("kept"))
    }),

    // mm6: cross-video frame-level dedup — sampled frames fingerprinted
    // with the mm5 aHash (REAL demux + ImageIO decode per frame), video
    // pairs ranked by shared-frame count. Every 13th doc gets a
    // byte-identical planted copy (+700000), which must share all its
    // sampled frames with the source. The join is equi on the 128-bit
    // hash — candidate work is proportional to hash collisions, never
    // |videos|²; a degenerate constant frame (black intros) would make a
    // hot hash bucket, where dd2's sub-partition guard pattern applies.
    // The oracle replays sampling indices, the closed-form frame pixels
    // and the cross-multiplied aHash without any codec (mm5's stance).
    "mm6_video_frame_dedup" -> ((s, dir) => {
      import s.implicits._
      val base = Tables.documents(s, dir).select(col("doc_id"))
      // spread before the opaque synthesis+decode chain — the whole video
      // codec stage otherwise runs at the (single-row-group) scan's 1-2
      // task parallelism; see Multimodal.imageTable
      val withCopies = graft.ops.Scan.spreadIfStarved(
        base.select(col("doc_id"), col("doc_id").as("src"))
          .unionByName(base.filter(pmod(col("doc_id"), lit(13)) === 0)
            .select((col("doc_id") + 700000).as("doc_id"), col("doc_id").as("src"))))
      val videos = withCopies.as[(Long, Long)].mapPartitions { it =>
        it.map { case (vid, src) =>
          val bytes = Multimodal.videoBytes(src)
          Multimodal.VideoRecord(vid, bytes, bytes.length.toLong)
        }
      }
      val fh = Multimodal.frameAHash(s, videos, k = 4).toDF()
      val a = fh.select(col("doc_id").as("id_a"), col("ahash_hi"), col("ahash_lo"))
      val b = fh.select(col("doc_id").as("id_b"), col("ahash_hi"), col("ahash_lo"))
      a.join(b, Seq("ahash_hi", "ahash_lo"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_shared_frames"))
    }),

    // mm8: scene-boundary detection — every frame REAL-decoded (demux +
    // ImageIO, the mm6 path with k ≥ max frame count so no frame is
    // sampled away), per-frame aHash, then a LAG hamming delta per video:
    // a cut is where consecutive frames' 64-bit hashes differ in more
    // than 16 bits (the fixture's delta distribution straddles 16, so
    // both classes occur). scene_id is the running boundary count — the
    // segment label a frame-to-clip pipeline groups on. One keyed window
    // over ≤6-frame groups; only (doc_id, two longs) per frame shuffles,
    // never pixels. The oracle replays the closed-form frame pixels, the
    // aHash integer rule, and the same LAG/bit_count arithmetic (mm5's
    // no-codec stance).
    "mm8_scene_detect" -> ((s, dir) => {
      val videos = Multimodal.videoTable(s, Tables.documents(s, dir).select(col("doc_id")))
      Multimodal.sceneDetect(Multimodal.frameAHash(s, videos, k = 8).toDF())
    }),

    // dq2: the quality-agent module over two tables with per-table
    // thresholds and a fixed as-of date (`data_quality_agent.py:29-48`).
    "dq2_quality_report" -> ((s, dir) => {
      import graft.quality.QualityChecks
      QualityChecks.run(Seq(
        QualityChecks.TableCheck("documents", Tables.documents(s, dir),
          Seq("doc_id"), None, "lang",
          QualityChecks.Thresholds(minRows = 100)),
        QualityChecks.TableCheck("events", Tables.events(s, dir),
          Seq("event_id"), Some("ts"), "props",
          QualityChecks.Thresholds(minRows = 1000, maxAgeHours = 25))),
        asOf = lit("2024-02-01").cast("date"))
    }),

    // x4b: ML anomaly scoring — isolation forest over daily metrics (the
    // reference's exact model family, pure-Scala `IsolationForestModel`;
    // the earlier KMeans substitution is gone). Fully oracled by replay:
    // [[OracleDumps]] dumps the fitted trees' split nodes to parquet and
    // the DuckDB oracle re-scores every day through them (recursive-CTE
    // tree walk + the paper's 2^(-E[h]/c(ψ)) formula). The score is rounded
    // to 1e-6 because the 100-tree mean sums floats in engine-specific
    // order; ulp-level divergence is far below any meaningful score
    // difference.
    "x4b_ml_anomaly" -> ((s, dir) =>
      graft.quality.AnomalyDetection.score(
          graft.quality.AnomalyDetection.dailyFeatures(Tables.events(s, dir)))
        .withColumn("anomaly_score", round(col("anomaly_score"), 6))),

    // dq3: per-source corpus health report — the one-scan summary a corpus
    // owner reads before a training run: volume (docs/tokens/chars),
    // dq4: embedding-space outlier report (quality/EmbeddingHealth) —
    // per-vector squared distance to the label centroid in pure integer
    // arithmetic (micro-quantized), outlier cut by cross-multiplied
    // compare; no doubles anywhere, hashes bit-identically.
    "dq4_embedding_outliers" -> ((s, dir) =>
      graft.quality.EmbeddingHealth.outlierReport(
        Tables.embeddings(s, dir), "vec_id", "embedding", "label", ratio = 2)),

    // language spread, exact-dup pressure, and the Gopher quality-gate pass
    // count, all per source. Single scan + one small (source) aggregation;
    // every metric is an integer so the report hashes bit-identically.
    "dq3_corpus_report" -> ((s, dir) =>
      TextOps.gopherFlags(Tables.documents(s, dir), "text")
        .groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(size(TextOps.tokens(col("text"))).cast("long")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars_total"),
          countDistinct(col("lang")).as("n_langs"),
          (count(lit(1)) - countDistinct(col("text"))).as("n_dup_texts"),
          count_if(col("gopher_pass")).as("n_gopher_pass"))),

    // dq1: data-quality agent checks — freshness/row-floor/null%/dup% flags
    // (`data_quality_agent.py:29-211`).
    "dq1_quality_checks" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      docs.agg(
        count(lit(1)).as("row_cnt"),
        count_if(col("text").isNull).as("null_text_cnt"),
        countDistinct(col("text")).as("distinct_text_cnt"))
        .select(
          lit("documents").as("table_name"), col("row_cnt"), col("null_text_cnt"),
          (col("row_cnt") - col("distinct_text_cnt")).as("dup_cnt"),
          (col("row_cnt") >= 100).as("row_floor_ok"),
          (col("null_text_cnt").cast("double") / col("row_cnt") <= 0.10).as("null_rate_ok"),
          ((col("row_cnt") - col("distinct_text_cnt")).cast("double") / col("row_cnt") <= 0.05)
            .as("dup_rate_ok"))
    })
  )

  /** dd6/dd7 shared corpus + dup-group construction: the mutated
    * three-generation corpus and its connected-component groups. Returns
    * (full corpus, (doc_id, group_id) membership of dup-pair members).
    */
  private def dd6Groups(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val fam = docs.filter(pmod(col("doc_id"), lit(9)) === 0)
    val m1 = fam.select((col("doc_id") + 200000).as("doc_id"),
      concat(col("text"), lit(" chain hop one extra suffix")).as("text"))
    val m2 = fam.select((col("doc_id") + 400000).as("doc_id"),
      concat(col("text"),
        lit(" chain hop one extra suffix and then a second longer tail of filler tokens"))
        .as("text"))
    val all = docs.unionByName(m1).unionByName(m2)
    val base = fam.select(col("doc_id").as("i"))
    val cand = base.select(col("i").as("id_a"), (col("i") + 200000).as("id_b"))
      .unionByName(base.select(col("i").as("id_a"), (col("i") + 400000).as("id_b")))
      .unionByName(base.select((col("i") + 200000).as("id_a"), (col("i") + 400000).as("id_b")))
    val pairs = Dedup.ngramJaccard(cand, all, "doc_id", "text").filter(col("jaccard") >= 0.45)
    (all, Dedup.dupGroups(pairs))
  }

  /** tx8/tx8b concat-and-chunk packing: cumulative token count per shard
    * (one window per `source` partition — shards pack independently, no
    * global sort), sequence id by exact integer division. Input must carry
    * (doc_id, source, n_tokens).
    */
  private def packSequences(d: org.apache.spark.sql.DataFrame,
      seqLen: Long = 4096L): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    d.withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        // integer division (`div`), not double `/`: the oracle's `//` is
        // exact at all magnitudes, double division loses bits past 2^53
        expr(s"tokens_before div $seqLen").as("seq_id"),
        pmod(col("tokens_before"), lit(seqLen)).cast("long").as("seq_offset"))
  }

  /** Oracle-side reader for a Spark side-dump (see [[OracleDumps]]). */
  private def dump(t: String) =
    s"read_parquet('${DomainOracles.FixturesDir}/$t/*.parquet')"

  private val TOKS = "regexp_split_to_array(trim(lower(text)), '\\s+')"
  private val TOKS_RAW = "regexp_split_to_array(trim(text), '\\s+')"

  /** tx14's bigram-LM scoring pipeline as shared CTEs (tokens → bigrams →
    * conditional-P model → per-doc mean-P), ending in `scored(doc_id,
    * n_bigrams, lm_score)`. tx14 selects it directly; tx16 buckets it.
    */
  private val LM_CTES: String =
    s"""tokq AS (SELECT doc_id, $TOKS AS toks FROM documents),
       |bg AS (SELECT doc_id,
       |  unnest(list_transform(range(0, greatest(len(toks) - 1, 0)), i -> toks[i+1])) AS prefix,
       |  unnest(list_transform(range(0, greatest(len(toks) - 1, 0)), i -> toks[i+2])) AS word
       | FROM tokq),
       |modelp AS (SELECT prefix, word,
       |  CAST(CAST(COUNT(*) AS DOUBLE) /
       |   CAST(SUM(COUNT(*)) OVER (PARTITION BY prefix) AS DOUBLE) AS DECIMAL(18,12)) AS p
       | FROM bg GROUP BY prefix, word),
       |sc AS (SELECT bg.doc_id, COUNT(*) AS n_bigrams, SUM(p) AS psum
       |  FROM bg JOIN modelp USING (prefix, word) GROUP BY bg.doc_id),
       |scored AS (SELECT d.doc_id, COALESCE(sc.n_bigrams, 0) AS n_bigrams,
       |  CAST(sc.psum AS DOUBLE) / CAST(sc.n_bigrams AS DOUBLE) AS lm_score
       |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id)""".stripMargin

  /** tx6's metric/ratio CTEs and keep-predicate, shared with tx7b's combined
    * gate so the two oracles cannot drift apart.
    */
  private val GOPHER_BASE: String =
    s"""m AS (SELECT doc_id,
       |CAST(len($TOKS_RAW) AS BIGINT) AS n_words,
       |CAST(greatest(len($TOKS_RAW), 1) AS DOUBLE) AS nw,
       |CAST(list_sum(list_transform($TOKS_RAW, t -> length(t))) AS DOUBLE) AS char_sum,
       |CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
       |  + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS sym_cnt,
       |CAST(len(list_filter($TOKS_RAW, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS alpha_cnt,
       |CAST(greatest(len(string_split(text, chr(10))), 1) AS DOUBLE) AS nl,
       |CAST(len(list_filter(string_split(text, chr(10)), l -> regexp_matches(l, '^\\s*[-*•]'))) AS BIGINT) AS bullet_cnt,
       |CAST(len(list_filter(string_split(text, chr(10)), l -> regexp_matches(l, '\\.\\.\\.\\s*$$'))) AS BIGINT) AS ell_cnt
       |FROM documents),
       |r AS (SELECT doc_id, n_words, char_sum / nw AS mean_word_len,
       |CAST(sym_cnt AS DOUBLE) / nw AS symbol_ratio,
       |CAST(alpha_cnt AS DOUBLE) / nw AS alpha_word_ratio,
       |CAST(bullet_cnt AS DOUBLE) / nl AS bullet_line_ratio,
       |CAST(ell_cnt AS DOUBLE) / nl AS ellipsis_line_ratio FROM m)""".stripMargin

  private val GOPHER_PASS: String =
    "(n_words >= 50 AND n_words <= 100000) AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)" +
      " AND symbol_ratio <= 0.1 AND alpha_word_ratio >= 0.8" +
      " AND bullet_line_ratio <= 0.9 AND ellipsis_line_ratio <= 0.3"

  /** tx7b n-gram oracle: per n, unnest the word n-grams, count occurrences
    * and covered (non-space) chars per gram, then MAX for the top-gram legs
    * (n = 2..4) and a count≥2-filtered SUM for the duplicate legs
    * (n = 5..10) — the same integer numerators GopherNgramStats computes in
    * one fused pass. Words drop empty strings so both sides split
    * identically; thresholds render from TextOps.ngramThresholds (one
    * source).
    */
  private val NGRAM_CTES: String = {
    def leg(n: Int): String = {
      val agg = if (n < 5) "MAX(cov)" else "COALESCE(SUM(cov) FILTER (WHERE c >= 2), 0)"
      s"""g$n AS (SELECT doc_id, g, COUNT(*) AS c, SUM(length(replace(g, ' ', ''))) AS cov
         |FROM (SELECT doc_id, unnest(list_transform(range(0, greatest(len(words) - $n + 1, 0)),
         |      i -> array_to_string(words[i+1:i+$n], ' '))) AS g FROM tokd)
         |GROUP BY doc_id, g),
         |a$n AS (SELECT doc_id, $agg AS v FROM g$n GROUP BY doc_id)""".stripMargin
    }
    def fld(n: Int) = if (n < 5) s"top$n" else s"dup$n"
    val joins = (2 to 10).map(n => s"LEFT JOIN a$n ON t.doc_id = a$n.doc_id").mkString(" ")
    val fields = (2 to 10).map(n => s"COALESCE(a$n.v, 0) AS ${fld(n)}").mkString(", ")
    val ratios = TextOps.ngramThresholds.map { case (f, th) =>
      s"CAST($f AS DOUBLE) / tc AS ${f}_ratio, CAST($f AS DOUBLE) / tc <= $th AS ${f}_ok"
    }.mkString(",\n")
    val pass = TextOps.ngramThresholds
      .map { case (f, th) => s"CAST($f AS DOUBLE) / tc <= $th" }.mkString(" AND ")
    s"""tokd AS (SELECT doc_id, list_filter($TOKS_RAW, t -> length(t) > 0) AS words FROM documents),
       |${(2 to 10).map(leg).mkString(",\n")},
       |ng AS (SELECT t.doc_id,
       |CAST(greatest(COALESCE(list_sum(list_transform(t.words, x -> length(x))), 0), 1) AS DOUBLE) AS tc,
       |$fields
       |FROM tokd t $joins),
       |nr AS (SELECT doc_id,
       |$ratios,
       |$pass AS ngram_pass
       |FROM ng)""".stripMargin
  }
  /** tx3b/tx8b oracle core: the greedy longest-match scan as a recursive
    * CTE — per step, consume the longest vocab token at the cursor (LEFT
    * JOIN on prefix match, MAX(length)) or one character; terminal rows
    * (pos = word length) carry the word's token count. Words dedup per doc
    * before recursing (identical words tokenize identically). The vocab
    * VALUES body renders from the same Scala list the Spark expression
    * uses — the two sides cannot drift.
    */
  private val BPE_CTES =
    s"""vocab(tok) AS (VALUES ${graft.text.Bpe.sqlVocabValues}),
       |bwords AS (
       |  SELECT doc_id, w, COUNT(*) AS n
       |  FROM (SELECT doc_id, unnest($TOKS_RAW) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY doc_id, w),
       |bsteps AS (
       |  SELECT doc_id, w, n, 0 AS pos, 0 AS cnt FROM bwords
       |  UNION ALL
       |  SELECT s.doc_id, s.w, s.n,
       |         s.pos + COALESCE(MAX(length(v.tok)), 1) AS pos, s.cnt + 1 AS cnt
       |  FROM bsteps s LEFT JOIN vocab v
       |    ON substr(s.w, s.pos + 1, length(v.tok)) = v.tok
       |  WHERE s.pos < length(s.w)
       |  GROUP BY s.doc_id, s.w, s.n, s.pos, s.cnt),
       |bpe AS (
       |  SELECT d.doc_id, CAST(COALESCE(SUM(s.n * s.cnt), 0) AS BIGINT) AS n_bpe
       |  FROM documents d LEFT JOIN bsteps s
       |    ON d.doc_id = s.doc_id AND s.pos >= length(s.w)
       |  GROUP BY d.doc_id)""".stripMargin
  // 3-gram shingles of TOKS, deduped — mirrors Dedup.shingles(k=3)
  private val GRAMS = "list_distinct(list_transform(range(0, greatest(len(toks) - 3, 0) + 1), " +
    "i -> array_to_string(toks[i+1:i+3], ' ')))"
  private def ratio(words: Seq[String]) =
    s"CAST(len(list_filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(",")}))) AS DOUBLE)" +
      " / CAST(greatest(len(toks), 1) AS DOUBLE)"

  /** ann4 oracle: the ENTIRE IVF+PQ pipeline — sample selection, seeded
    * integer Lloyd training, encoding, ADC ranking — replayed in generated
    * DuckDB SQL with the exact arithmetic Pq.train/ivfPqTopK use (micro
    * quantization, floor(sum/count) centroid updates, smallest-index
    * argmin ties). Cross-validated against an independent reference
    * implementation before registration.
    */
  // MAXS mirrors Pq.train's maxSample count cap (the rate filter alone
  // would make the driver collect O(corpus); the oracle replays the same
  // orderBy(h, vec_id).limit cap so the selected sample is identical).
  private val PQ_M = 4; private val PQ_K = 8; private val PQ_ITERS = 2
  private val PQ_SUB = 16; private val PQ_RATE = "0.5"; private val PQ_MAXS = 4096
  private val PQ_HASH =
    "(CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)" +
      " / 1152921504606846976.0)"
  private def pqDist(vec: String, cent: String, lo: Int, width: Int): String =
    s"list_sum(list_transform(range(1, ${width + 1}), " +
      s"i -> ($vec[$lo + i] - $cent[i]) * ($vec[$lo + i] - $cent[i])))"
  /** The quantized-embedding and training-sample CTEs every Pq oracle
    * starts from (Pq.quantize + Pq.train's sample selection).
    */
  private def pqBaseCtes: Seq[String] = pqBaseCtesWhere(None)

  /** `trainWhere` restricts the TRAINING sample's input rows (ann11: the
    * model is fit on the base corpus only; appended increments are encoded
    * under it, never trained on) — search CTEs still read the full `e`.
    */
  private def pqBaseCtesWhere(trainWhere: Option[String],
      embFrom: String = "embeddings"): Seq[String] = Seq(
    "e AS (SELECT vec_id, label, list_transform(CAST(embedding AS DOUBLE[]), " +
      s"v -> CAST(round(v * 1000000) AS BIGINT)) AS e FROM $embFrom)",
    s"samp AS (SELECT vec_id, e, h FROM (SELECT vec_id, e, $PQ_HASH AS h FROM e " +
      s"WHERE ${trainWhere.map(w => s"($w) AND ").getOrElse("")}$PQ_HASH < $PQ_RATE) " +
      s"QUALIFY ROW_NUMBER() OVER (ORDER BY h, vec_id) <= $PQ_MAXS)")
  /** One Lloyd-trained codebook (Pq.train's per-subspace loop): `kk` seeds
    * from the ordered sample, PQ_ITERS rounds of assign (ties to smaller j)
    * + floor(sum/count) update, empty clusters keep their centroid. Shared
    * verbatim between the m subspace codebooks, the learned coarse
    * quantizer (the same trainer at lo=0, width=dim, kk=nlist), and dd10's
    * SemDeDup clustering replay.
    */
  private def pqCodebookCtes(ctes: scala.collection.mutable.ArrayBuffer[String],
      tag: String, lo: Int, width: Int, kk: Int): Unit = {
    ctes += s"s${tag}i0 AS (SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS j, " +
      s"e[${lo + 1}:${lo + width}] AS c FROM samp " +
      s"QUALIFY ROW_NUMBER() OVER (ORDER BY h, vec_id) <= $kk)"
    (1 to PQ_ITERS).foreach { t =>
      ctes += s"a${tag}t$t AS (SELECT vec_id, s, j FROM (" +
        s"SELECT sa.vec_id AS vec_id, sa.e[${lo + 1}:${lo + width}] AS s, c.j AS j, " +
        s"${pqDist("sa.e", "c.c", lo, width)} AS d FROM samp sa CROSS JOIN s${tag}i${t - 1} c) " +
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, j) = 1)"
      ctes += s"u${tag}t$t AS (SELECT j, list(cv ORDER BY i) AS c FROM (" +
        "SELECT j, i, CAST(floor(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv " +
        s"FROM (SELECT j, unnest(s) AS v, unnest(range(1, ${width + 1})) AS i FROM a${tag}t$t) " +
        "GROUP BY j, i) GROUP BY j)"
      ctes += s"s${tag}i$t AS (SELECT p.j, COALESCE(u.c, p.c) AS c FROM s${tag}i${t - 1} p " +
        s"LEFT JOIN u${tag}t$t u ON p.j = u.j)"
    }
    ctes += s"cm$tag AS (SELECT list(c ORDER BY j) AS cs FROM s${tag}i$PQ_ITERS)"
  }

  private def pqOracle(topK: Int, rerankK: Option[Int], recall: Boolean = false,
      learned: Option[(Int, Int)] = None, recallFraction: Option[Double] = None,
      queryWhere: Option[String] = None, imi: Option[(Int, Int)] = None,
      trainWhere: Option[String] = None, recallGlobal: Boolean = false,
      embFrom: String = "embeddings",
      recallExactRerank: Boolean = false,
      corpusWhere: Option[String] = None): String = {
    // corpusWhere restricts the NEIGHBOR side only (ann14: tombstoned ids
    // leave the candidate set; training and the query batch both still see
    // the full corpus — deletes arrive after the build)
    val nbrPred = corpusWhere.map(w => s" AND $w").getOrElse("")
    val M = PQ_M; val K = PQ_K; val ITERS = PQ_ITERS; val SUB = PQ_SUB
    def dist(vec: String, cent: String, lo: Int, width: Int): String =
      pqDist(vec, cent, lo, width)
    val ctes = scala.collection.mutable.ArrayBuffer[String](
      pqBaseCtesWhere(trainWhere, embFrom): _*)
    def codebookCtes(tag: String, lo: Int, width: Int, kk: Int): Unit =
      pqCodebookCtes(ctes, tag, lo, width, kk)
    (0 until M).foreach(mi => codebookCtes(mi.toString, mi * SUB, SUB, K))
    learned.foreach { case (nl, _) => codebookCtes("c", 0, M * SUB, nl) }
    // IMI (ann10): two half-space quantizers trained by the SAME Lloyd CTEs
    // (Pq.train with m = 2 — subspaces spanning the halves)
    imi.foreach { case (ik, _) =>
      codebookCtes("i0", 0, M * SUB / 2, ik)
      codebookCtes("i1", M * SUB / 2, M * SUB / 2, ik)
    }
    val crossj = (learned.map(_ => "CROSS JOIN cmc").toSeq ++
      imi.map(_ => "CROSS JOIN cmi0 CROSS JOIN cmi1").toSeq ++
      (0 until M).map(mi => s"CROSS JOIN cm$mi")).mkString(" ")
    def dlist(mi: Int) = s"list_transform(cm$mi.cs, cc -> ${dist("e.e", "cc", mi * SUB, SUB)})"
    val codes = (0 until M)
      .map(mi => s"(list_position(${dlist(mi)}, list_min(${dlist(mi)})) - 1) AS c$mi")
      .mkString(", ")
    val ds = (0 until M).map(mi => s"${dlist(mi)} AS d$mi").mkString(", ")
    val adc = (0 until M).map(mi => s"q.d$mi[n.c$mi + 1]").mkString(" + ")
    (learned, imi) match {
      case (None, Some((ik, np))) =>
        // ann10: composed half distances — home list = (argmin0)·k + argmin1
        // (L2 decomposes across the halves; lexicographic tie order matches
        // the composed-id first-minimum rule), probes = top-np over the
        // k × k grid of da[i] + db[j], ordered (d, block).
        val half = M * SUB / 2
        val da = s"list_transform(cmi0.cs, cc -> ${dist("e.e", "cc", 0, half)})"
        val db = s"list_transform(cmi1.cs, cc -> ${dist("e.e", "cc", half, half)})"
        ctes += s"enc AS (SELECT e.vec_id, " +
          s"CAST((list_position($da, list_min($da)) - 1) * $ik + " +
          s"(list_position($db, list_min($db)) - 1) AS INTEGER) AS block, " +
          s"$codes FROM e $crossj)"
        ctes += s"qd AS (SELECT e.vec_id, $da AS da, $db AS db, $ds FROM e $crossj" +
          queryWhere.map(w => s" WHERE $w").getOrElse("") + ")"
        ctes += s"qp AS (SELECT vec_id, block FROM (" +
          s"SELECT vec_id, CAST(ga.g * $ik + gb.g AS INTEGER) AS block, " +
          s"da[ga.g + 1] + db[gb.g + 1] AS d FROM qd " +
          s"CROSS JOIN (SELECT unnest(range(0, $ik)) AS g) ga " +
          s"CROSS JOIN (SELECT unnest(range(0, $ik)) AS g) gb) " +
          s"QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, block) <= $np)"
        ctes += "scored AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, " +
          s"p.block AS block, CAST($adc AS BIGINT) AS adc " +
          "FROM qp p JOIN qd q ON p.vec_id = q.vec_id " +
          s"JOIN enc n ON p.block = n.block AND q.vec_id <> n.vec_id$nbrPred)"
      case (Some((nl, np)), _) =>
        // ann7: home list = argmin coarse distance (first-minimum tie, the
        // trainer's rule); a query probes its np nearest lists by (d, id).
        val dc = s"list_transform(cmc.cs, cc -> ${dist("e.e", "cc", 0, M * SUB)})"
        ctes += s"enc AS (SELECT e.vec_id, " +
          s"CAST(list_position($dc, list_min($dc)) - 1 AS INTEGER) AS block, " +
          s"$codes FROM e $crossj)"
        ctes += s"qd AS (SELECT e.vec_id, $dc AS dc, $ds FROM e $crossj" +
          queryWhere.map(w => s" WHERE $w").getOrElse("") + ")"
        ctes += s"qp AS (SELECT vec_id, block FROM (SELECT vec_id, unnest(dc) AS d, " +
          s"CAST(unnest(range(0, $nl)) AS INTEGER) AS block FROM qd) " +
          s"QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, block) <= $np)"
        ctes += "scored AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, " +
          s"p.block AS block, CAST($adc AS BIGINT) AS adc " +
          "FROM qp p JOIN qd q ON p.vec_id = q.vec_id " +
          s"JOIN enc n ON p.block = n.block AND q.vec_id <> n.vec_id$nbrPred)"
      case (None, None) =>
        ctes += s"enc AS (SELECT e.vec_id, e.label, $codes FROM e $crossj)"
        ctes += s"q AS (SELECT e.vec_id, e.label, $ds FROM e $crossj)"
        // VARCHAR block: the guarded Spark entry point (Pq.ivfPqTopK)
        // emits a schema-stable string block on every path
        ctes += "scored AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, " +
          s"CAST(q.label AS VARCHAR) AS block, CAST($adc AS BIGINT) AS adc " +
          "FROM q JOIN enc n ON q.label = n.label AND q.vec_id <> n.vec_id)"
    }
    if (recall) {
      // ann6: ADC top-k vs the exact integer-L2 top-k on the same `e`
      // vectors within the block; per-query hit count and recall fraction.
      // ann6b: recallFraction samples the QUERY side of both legs by the
      // same md5 unit-hash the Spark side uses (Sampling.unitHash) — the
      // scale-honest measurement (the exact leg is the expensive one).
      def uh(c: String) =
        s"(CAST('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15) AS BIGINT) / 1152921504606846976.0)"
      val apprWhere = recallFraction.map(f => s" WHERE ${uh("query_id")} < $f").getOrElse("")
      val exPred = recallFraction.map(f => s" AND ${uh("qe.vec_id")} < $f").getOrElse("")
      if (recallExactRerank) {
        // ann6d: the approx leg is the two-stage serve — probed candidates
        // (scored's pair set) re-ranked by EXACT integer L2 (the same d2
        // the ex leg uses), so the recall isolates partition loss
        val scApprWhere =
          recallFraction.map(f => s" WHERE ${uh("sc.query_id")} < $f").getOrElse("")
        ctes += "appr AS (SELECT query_id, neighbor_id FROM (" +
          "SELECT query_id, neighbor_id, ROW_NUMBER() OVER " +
          "(PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank FROM (" +
          "SELECT sc.query_id, sc.neighbor_id, " +
          s"list_sum(list_transform(range(1, ${M * SUB + 1}), " +
          "i -> (qe.e[i] - ne.e[i]) * (qe.e[i] - ne.e[i]))) AS d2 " +
          "FROM scored sc JOIN e qe ON qe.vec_id = sc.query_id " +
          s"JOIN e ne ON ne.vec_id = sc.neighbor_id$scApprWhere)) " +
          s"WHERE rank <= $topK)"
      } else {
        ctes += "appr AS (SELECT query_id, neighbor_id FROM (SELECT *, ROW_NUMBER() OVER " +
          s"(PARTITION BY query_id ORDER BY adc, neighbor_id) AS rank FROM scored$apprWhere) WHERE rank <= $topK)"
      }
      // ann6/ann6b rank exact within the shared label block (compression
      // loss); ann6c ranks against the WHOLE corpus (partition loss too)
      val exJoin =
        if (recallGlobal) "ON qe.vec_id <> ne.vec_id"
        else "ON qe.label = ne.label AND qe.vec_id <> ne.vec_id"
      ctes += "ex AS (SELECT qe.vec_id AS query_id, ne.vec_id AS neighbor_id " +
        s"FROM e qe JOIN e ne $exJoin$exPred " +
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY qe.vec_id ORDER BY " +
        s"list_sum(list_transform(range(1, ${M * SUB + 1}), " +
        s"i -> (qe.e[i] - ne.e[i]) * (qe.e[i] - ne.e[i]))), ne.vec_id) <= $topK)"
      ctes += "h AS (SELECT a.query_id, COUNT(*) AS n_hits FROM appr a " +
        "JOIN ex x ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id " +
        "GROUP BY a.query_id)"
      return "WITH " + ctes.mkString(",\n") +
        "\nSELECT q.query_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, " +
        s"CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / $topK.0 AS recall_at_$topK " +
        "FROM (SELECT DISTINCT query_id FROM ex) q LEFT JOIN h ON q.query_id = h.query_id"
    }
    rerankK match {
      case None =>
        "WITH " + ctes.mkString(",\n") +
          "\nSELECT query_id, neighbor_id, block, adc, rank FROM (SELECT *, ROW_NUMBER() OVER " +
          s"(PARTITION BY query_id ORDER BY adc, neighbor_id) AS rank FROM scored) WHERE rank <= $topK"
      case Some(rk) =>
        // ann5: ADC shortlist of topK, then exact integer squared L2 on the
        // quantized vectors (same `e` CTE the training reads) for the final rk.
        ctes += "short AS (SELECT query_id, neighbor_id, block FROM (SELECT *, " +
          "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS prank " +
          s"FROM scored) WHERE prank <= $topK)"
        ctes += s"rr AS (SELECT s.query_id, s.neighbor_id, s.block, " +
          s"CAST(list_sum(list_transform(range(1, ${M * SUB + 1}), " +
          "i -> (qe.e[i] - ne.e[i]) * (qe.e[i] - ne.e[i]))) AS BIGINT) AS d2 " +
          "FROM short s JOIN e qe ON s.query_id = qe.vec_id " +
          "JOIN e ne ON s.neighbor_id = ne.vec_id)"
        "WITH " + ctes.mkString(",\n") +
          "\nSELECT query_id, neighbor_id, block, d2, rank FROM (SELECT *, ROW_NUMBER() OVER " +
          s"(PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank FROM rr) WHERE rank <= $rk"
    }
  }
  private val ANN4_ORACLE: String = pqOracle(3, None)
  private val ANN5_ORACLE: String = pqOracle(10, Some(3))
  private val ANN6_ORACLE: String = pqOracle(3, None, recall = true)
  private val ANN6B_ORACLE: String =
    pqOracle(3, None, recall = true, recallFraction = Some(0.25))
  // nlist pinned to adaptiveNlist(500) = 16, the sf0.01 correctness corpus
  // the driver runs the oracle on; the Scala side computes it from the
  // corpus count at runtime (the scale-adaptive property under test).
  private val ANN7_ORACLE: String = pqOracle(3, None, learned = Some((16, 2)))
  // ann9 serves the SAME learned-IVF search from the persisted index for a
  // query batch (every 7th vector); values replay identically — the index
  // is a plan property (no corpus re-scan at serve time), not a value one.
  private val ANN9_ORACLE: String =
    pqOracle(3, None, learned = Some((16, 2)), queryWhere = Some("e.vec_id % 7 = 0"))
  // ann14: ann9's served search with every 10th vector tombstoned AFTER the
  // build — the neighbor side alone shrinks (training and the query batch
  // still saw the full corpus; deletes arrive later by definition)
  private val ANN14_ORACLE: String =
    pqOracle(3, None, learned = Some((16, 2)), queryWhere = Some("e.vec_id % 7 = 0"),
      corpusWhere = Some("n.vec_id % 10 <> 0"))
  // ann10: IMI grid k pinned to adaptiveImiK(500) = 4 (16 composed lists)
  // for the sf0.01 correctness corpus, like ANN7's nlist pin; the Scala
  // side computes k from the corpus count (the uncapped-scaling property
  // under test).
  private val ANN10_ORACLE: String = pqOracle(3, None, imi = Some((4, 2)))
  // ann6c: IMI approx leg (k pinned like ANN10) vs the GLOBAL exact
  // baseline, both query-sampled at 25% by the portable unit hash.
  private val ANN6C_ORACLE: String =
    pqOracle(3, None, recall = true, imi = Some((4, 2)),
      recallFraction = Some(0.25), recallGlobal = true)
  // ann6d: the same IMI-vs-global-exact replay over the clustered fixture
  // (CLUSTERED_EMB_SQL is the bit-exact DuckDB twin of clusteredEmb).
  private val ANN6D_ORACLE: String =
    pqOracle(3, None, recall = true, imi = Some((4, 2)),
      recallFraction = Some(0.25), recallGlobal = true,
      embFrom = s"($CLUSTERED_EMB_SQL)", recallExactRerank = true)
  /** sp9: greedy k-center replay — k unrolled MATERIALIZED stages over the
    * micro-quantized vectors; stage i takes the (min_d2 desc, vec_id) argmax
    * of the state the previous centers produced, then folds its distance
    * into min_d2 with `least`. The `WHERE min_d2 > 0` guard reproduces the
    * Scala early stop (an exhausted stage empties every later one).
    */
  private def kcenterOracle(k: Int): String = {
    val dim = PQ_M * PQ_SUB
    def d2(a: String, b: String) =
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    val ctes = scala.collection.mutable.ArrayBuffer[String](
      "e AS MATERIALIZED (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]), " +
        "v -> CAST(round(v * 1000000) AS BIGINT)) AS e FROM embeddings)",
      "k0 AS MATERIALIZED (SELECT vec_id, e FROM e ORDER BY vec_id LIMIT 1)",
      s"s0 AS MATERIALIZED (SELECT x.vec_id, x.e, ${d2("x.e", "c.e")} AS min_d2 FROM e x, k0 c)")
    (1 until k).foreach { i =>
      ctes += s"k$i AS MATERIALIZED (SELECT vec_id, e, min_d2 FROM s${i - 1} " +
        "WHERE min_d2 > 0 ORDER BY min_d2 DESC, vec_id LIMIT 1)"
      if (i < k - 1)
        ctes += s"s$i AS MATERIALIZED (SELECT x.vec_id, x.e, " +
          s"least(x.min_d2, ${d2("x.e", "c.e")}) AS min_d2 FROM s${i - 1} x, k$i c)"
    }
    val union = (s"SELECT 0 AS iter, vec_id, CAST(0 AS BIGINT) AS d2 FROM k0" +:
      (1 until k).map(i => s"SELECT $i, vec_id, CAST(min_d2 AS BIGINT) FROM k$i"))
      .mkString("\nUNION ALL ")
    "WITH " + ctes.mkString(",\n") + "\n" + union
  }

  /** Shared replay of the incremental MinHash pipeline (dd11/dd11b/dd13):
    * portable signatures, banding, the inc→base bucket join, jaccard
    * verify and the best-match window — parameterized ONLY by the base and
    * increment CTE bodies (the `inc` body may reference `base`). One
    * definition keeps the three oracles in lockstep with each other and
    * with Dedup's 16-hash/4-band portable construction.
    */
  private def minhashIncOracle(baseSql: String, incSql: String): String = {
    val mins = (1 to 16).map { sd =>
      val (pair, off) = ((sd + 1) / 2, if (sd % 2 == 1) 1 else 17)
      s"MIN(CAST(('0x' || substr(md5(shingle || '#$pair'), $off, 15)) AS BIGINT)) AS h$sd"
    }.mkString(", ")
    val sigList = (1 to 16).map(i => s"h$i").mkString("[", ", ", "]")
    val bandHash = (0 until 4).map { b =>
      val parts = (1 to 4).map(r => s"CAST(sig[${b * 4 + r}] AS VARCHAR)").mkString(", ")
      s"WHEN $b THEN md5(concat_ws(',', $parts))"
    }.mkString(" ")
    val shingle = "unnest(list_transform(range(0, greatest(len(toks) - 3, 0) + 1), " +
      "i -> array_to_string(toks[i+1:i+3], ' ')))"
    val simExpr = "CAST(list_sum(list_transform(range(1, 17), " +
      "i -> CASE WHEN si.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 16"
    s"""WITH base AS ($baseSql),
       |inc AS ($incSql),
       |exb AS (SELECT doc_id AS doc, $shingle AS shingle
       |  FROM (SELECT doc_id, $TOKS AS toks FROM base)),
       |exi AS (SELECT doc_id AS doc, $shingle AS shingle
       |  FROM (SELECT doc_id, $TOKS AS toks FROM inc)),
       |sigb AS (SELECT doc, $sigList AS sig FROM (SELECT doc, $mins FROM exb GROUP BY doc)),
       |sigi AS (SELECT doc, $sigList AS sig FROM (SELECT doc, $mins FROM exi GROUP BY doc)),
       |bb AS (SELECT doc, b AS band, CASE b $bandHash END AS band_hash
       |  FROM sigb CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs),
       |bi AS (SELECT doc, b AS band, CASE b $bandHash END AS band_hash
       |  FROM sigi CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs),
       |cand AS (SELECT DISTINCT x.doc AS id_inc, y.doc AS id_base
       |  FROM bi x JOIN bb y ON x.band = y.band AND x.band_hash = y.band_hash),
       |ver AS (SELECT c.id_inc, c.id_base, $simExpr AS est_jaccard
       |  FROM cand c JOIN sigi si ON si.doc = c.id_inc JOIN sigb sb ON sb.doc = c.id_base
       |  WHERE $simExpr >= 0.5),
       |best AS (SELECT id_inc, id_base, est_jaccard,
       |  ROW_NUMBER() OVER (PARTITION BY id_inc ORDER BY est_jaccard DESC, id_base) AS rn
       |  FROM ver)
       |SELECT i.doc_id, b.id_base AS matched_base, b.est_jaccard,
       |  b.id_base IS NOT NULL AS is_dup
       |FROM inc i LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON i.doc_id = b.id_inc""".stripMargin
  }

  /** dq5: coarse training replayed on the base split (the ann11 pin:
    * adaptiveNlist(400) = 16), home assignment over the full corpus, then
    * x7's smoothed PSI over the per-list occupancy histograms. Exact
    * long counts; psi rounded to 6 dp (ln's last ulp may differ across
    * engines), verdict at the conventional 0.2.
    */
  private val DQ5_ORACLE: String = {
    val ctes = scala.collection.mutable.ArrayBuffer[String](
      pqBaseCtesWhere(Some("vec_id % 5 <> 0")): _*)
    pqCodebookCtes(ctes, "c", 0, 64, 16)
    val dc = s"list_transform(cmc.cs, cc -> ${pqDist("e.e", "cc", 0, 64)})"
    ctes += s"homes AS (SELECT e.vec_id % 5 = 0 AS is_inc, " +
      s"CAST(list_position($dc, list_min($dc)) - 1 AS INTEGER) AS block " +
      "FROM e CROSS JOIN cmc)"
    ctes += "counts AS (SELECT block, " +
      "CAST(SUM(CASE WHEN NOT is_inc THEN 1 ELSE 0 END) AS BIGINT) AS n_base, " +
      "CAST(SUM(CASE WHEN is_inc THEN 1 ELSE 0 END) AS BIGINT) AS n_inc " +
      "FROM homes GROUP BY block)"
    ctes += "rates AS (SELECT block, n_base, n_inc, " +
      "CAST(n_base + 1 AS DOUBLE) / SUM(CAST(n_base + 1 AS DOUBLE)) OVER () AS p, " +
      "CAST(n_inc + 1 AS DOUBLE) / SUM(CAST(n_inc + 1 AS DOUBLE)) OVER () AS q " +
      "FROM counts)"
    "WITH " + ctes.mkString(",\n") +
      "\nSELECT block, n_base, n_inc, round(SUM((p - q) * ln(p / q)) OVER (), 6) AS psi, " +
      "round(SUM((p - q) * ln(p / q)) OVER (), 6) > 0.2 AS drift_detected FROM rates"
  }

  // ann11: training restricted to the base corpus (vec_id % 5 <> 0 — 400
  // vectors at sf0.01, so adaptiveNlist(400) = 16, the same pin), search
  // over the full union (base + both appended increments), queries every
  // 7th vector — the appended index must serve exactly this.
  private val ANN11_ORACLE: String =
    pqOracle(3, None, learned = Some((16, 2)),
      queryWhere = Some("e.vec_id % 7 = 0"),
      trainWhere = Some("vec_id % 5 <> 0"))

  /** dd10 oracle: replay coarse k-means (shared Lloyd CTEs), home
    * assignment + integer centroid distance, within-cluster cosine pairing
    * at 1e-6-rounded precision, recursive min-label components, and the
    * keep-farthest-from-centroid rule. nlist pinned like ANN7_ORACLE.
    */
  private def semDedupOracle(nlist: Int, tau: Double): String = {
    val dim = PQ_M * PQ_SUB
    val ctes = scala.collection.mutable.ArrayBuffer[String](pqBaseCtes: _*)
    pqCodebookCtes(ctes, "c", 0, dim, nlist)
    val dc = s"list_transform(cmc.cs, cc -> ${pqDist("e.e", "cc", 0, dim)})"
    ctes += "ed AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)"
    ctes += s"enc AS (SELECT e.vec_id, " +
      s"CAST(list_position($dc, list_min($dc)) - 1 AS INTEGER) AS block, " +
      s"CAST(list_min($dc) AS BIGINT) AS d2c FROM e CROSS JOIN cmc)"
    ctes += "p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b " +
      "FROM enc a JOIN enc b ON a.block = b.block AND a.vec_id < b.vec_id " +
      "JOIN ed ea ON ea.vec_id = a.vec_id JOIN ed eb ON eb.vec_id = b.vec_id " +
      s"WHERE round(list_cosine_similarity(ea.emb, eb.emb), 6) >= $tau)"
    ctes += "edges AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p)"
    ctes += "reach(id, label) AS (SELECT src, src FROM edges " +
      "UNION SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id)"
    ctes += "grp AS (SELECT id, MIN(label) AS group_id FROM reach GROUP BY id)"
    ctes += "tagged AS (SELECT enc.vec_id, enc.block, enc.d2c, " +
      "COALESCE(g.group_id, enc.vec_id) AS group_id " +
      "FROM enc LEFT JOIN grp g ON enc.vec_id = g.id)"
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      "\nSELECT vec_id, block, group_id, " +
      "COUNT(*) OVER (PARTITION BY group_id) AS group_size, " +
      "(ROW_NUMBER() OVER (PARTITION BY group_id ORDER BY d2c DESC, vec_id) = 1) AS kept " +
      "FROM tagged"
  }
  private val DD10_ORACLE: String = semDedupOracle(16, 0.96)

  /** dd8/dd8b shared oracle CTEs — mirrors [[graft.dedup.Dedup.substringSpans]]
    * and the planted prefix-copy corpus: k=8 token windows with positions,
    * windows in ≥2 distinct docs, per-doc gaps-and-islands merge (a gap
    * strictly greater than k starts a new island).
    */
  private val DD8_CTES: String =
    s"""all_docs AS (
       |SELECT doc_id, text FROM documents
       |UNION ALL
       |SELECT doc_id + 300000,
       | array_to_string(($TOKS)[1:16], ' ') || ' planted unique tail ' || CAST(doc_id AS VARCHAR)
       |FROM documents WHERE doc_id % 13 = 0),
       |tokd AS (SELECT doc_id, $TOKS AS toks FROM all_docs),
       |sh AS (SELECT doc_id,
       | CAST(unnest(range(0, greatest(len(toks) - 7, 0))) AS INTEGER) AS pos,
       | unnest(list_transform(range(0, greatest(len(toks) - 7, 0)),
       |  i -> array_to_string(toks[i+1:i+8], ' '))) AS shingle
       |FROM tokd),
       |dup AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(DISTINCT doc_id) >= 2),
       |m AS (SELECT sh.doc_id, sh.pos FROM sh JOIN dup USING (shingle)),
       |lagd AS (SELECT doc_id, pos, LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM m),
       |isl AS (SELECT doc_id, pos, SUM(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
       | OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island FROM lagd)""".stripMargin

  /** dd6/dd7 shared oracle CTEs: mutated corpus, candidate pairs, Jaccard
    * scoring, and the recursive connected-component reachability — everything
    * up to (and including) `reach`. Mirrors [[dd6Groups]].
    */
  private val DD6_CTES: String =
    s"""fam AS (SELECT doc_id, text FROM documents WHERE doc_id % 9 = 0),
       |all_docs AS (
       |SELECT doc_id, text FROM documents
       |UNION ALL SELECT doc_id + 200000, text || ' chain hop one extra suffix' FROM fam
       |UNION ALL SELECT doc_id + 400000, text || ' chain hop one extra suffix and then a second longer tail of filler tokens' FROM fam),
       |g AS (SELECT doc_id, $GRAMS AS grams FROM (SELECT doc_id, $TOKS AS toks FROM all_docs)),
       |cand AS (SELECT doc_id AS id_a, doc_id + 200000 AS id_b FROM fam
       |UNION ALL SELECT doc_id, doc_id + 400000 FROM fam
       |UNION ALL SELECT doc_id + 200000, doc_id + 400000 FROM fam),
       |scored AS (SELECT id_a, id_b FROM cand
       |JOIN g a ON a.doc_id = id_a JOIN g b ON b.doc_id = id_b
       |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
       | / CAST(len(list_distinct(a.grams || b.grams)) AS DOUBLE) >= 0.45),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM scored UNION SELECT id_b, id_a FROM scored),
       |reach(id, label) AS (SELECT src, src FROM edges
       |UNION SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id)""".stripMargin

  /** dd15/dd15b shared oracle: the from-scratch recompute — LSH pairs over
    * the FULL corpus (base ∪ batch; signatures don't depend on corpus
    * membership, so the full pair set is exactly basePairs ∪ inc→base ∪
    * within-batch), then dd6's recursive reachability. Equality with the
    * incremental update is precisely the operator's correctness claim.
    */
  private lazy val DD15_ORACLE: String = {
    val mins = (1 to 16).map { sd =>
      val (pair, off) = ((sd + 1) / 2, if (sd % 2 == 1) 1 else 17)
      s"MIN(CAST(('0x' || substr(md5(shingle || '#$pair'), $off, 15)) AS BIGINT)) AS h$sd"
    }.mkString(", ")
    val sigList = (1 to 16).map(i => s"h$i").mkString("[", ", ", "]")
    val bandHash = (0 until 4).map { b =>
      val parts = (1 to 4).map(r => s"CAST(sig[${b * 4 + r}] AS VARCHAR)").mkString(", ")
      s"WHEN $b THEN md5(concat_ws(',', $parts))"
    }.mkString(" ")
    val shingle = "unnest(list_transform(range(0, greatest(len(toks) - 3, 0) + 1), " +
      "i -> array_to_string(toks[i+1:i+3], ' ')))"
    val sim = "CAST(list_sum(list_transform(range(1, 17), " +
      "i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 16"
    s"""WITH RECURSIVE all_docs AS (
       |SELECT doc_id, text FROM documents
       |UNION ALL
       |SELECT doc_id + 100000, text || ' trailing mutation token' FROM documents WHERE doc_id % 7 = 0
       |UNION ALL
       |SELECT doc_id + 300000, text || ' trailing mutation token third generation tail' FROM documents WHERE doc_id % 7 = 0
       |UNION ALL
       |SELECT doc_id + 500000, text || ' fresh family tail' FROM documents WHERE doc_id % 7 = 3
       |UNION ALL
       |SELECT doc_id + 600000, text || ' fresh family tail extra' FROM documents WHERE doc_id % 7 = 3),
       |ex AS (SELECT doc_id AS doc, $shingle AS shingle
       |  FROM (SELECT doc_id, $TOKS AS toks FROM all_docs)),
       |sigs AS (SELECT doc, $sigList AS sig FROM (SELECT doc, $mins FROM ex GROUP BY doc)),
       |banded AS (SELECT doc, sig, b AS band, CASE b $bandHash END AS band_hash
       |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs),
       |prs AS (SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
       |  FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc < b.doc
       |  WHERE $sim >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM prs UNION SELECT id_b, id_a FROM prs),
       |reach(id, label) AS (SELECT src, src FROM edges
       |  UNION SELECT e.src, r2.label FROM edges e JOIN reach r2 ON e.dst = r2.id)
       |SELECT id AS doc_id, MIN(label) AS group_id FROM reach GROUP BY id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "ann4_ivfpq_topk" -> ANN4_ORACLE,
    "ann5_pq_rerank_topk" -> ANN5_ORACLE,
    "ann6_recall" -> ANN6_ORACLE,
    "ann6b_recall_sampled" -> ANN6B_ORACLE,
    // tx15: same planted PII, same regex families (syntax chosen for
    // identical Java-regex/RE2 semantics — see text/Pii.scala), same
    // email → IP → phone pass order.
    "tx15_pii_redact" -> {
      import graft.text.Pii
      s"""WITH pl AS (SELECT doc_id, text ||
         |CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END ||
         |CASE WHEN doc_id % 11 = 0 THEN ' from 10.2.' || CAST(doc_id % 200 AS VARCHAR) || '.7 logged' ELSE '' END ||
         |CASE WHEN doc_id % 13 = 0 THEN ' call +1 555 01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' today' ELSE '' END AS t
         |FROM documents),
         |s2 AS (SELECT doc_id, t,
         |regexp_replace(regexp_replace(t, '${Pii.EmailRe}', '<EMAIL>', 'g'), '${Pii.Ipv4Re}', '<IP>', 'g') AS t2
         |FROM pl)
         |SELECT doc_id,
         |regexp_replace(t2, '${Pii.PhoneRe}', '<PHONE>', 'g') AS text_redacted,
         |CAST(len(regexp_extract_all(t, '${Pii.EmailRe}')) AS INTEGER) AS n_emails,
         |CAST(len(regexp_extract_all(t, '${Pii.Ipv4Re}')) AS INTEGER) AS n_ips,
         |CAST(len(regexp_extract_all(t2, '${Pii.PhoneRe}')) AS INTEGER) AS n_phones
         |FROM s2""".stripMargin
    },
    "ann7_ivf_learned" -> ANN7_ORACLE,
    "ann9_index_served" -> ANN9_ORACLE,
    "ann10_imi_topk" -> ANN10_ORACLE,
    "ann11_index_append" -> ANN11_ORACLE,
    "ann14_index_delete" -> ANN14_ORACLE,
    "sp9_kcenter_coreset" -> kcenterOracle(8),
    "ann6c_imi_recall" -> ANN6C_ORACLE,
    "ann6d_imi_recall_clustered" -> ANN6D_ORACLE,
    "dq5_index_drift" -> DQ5_ORACLE,
    // ann12: both legs replayed in full (tx17's BM25 formula at top-20, the
    // ann1 rounded-cosine rank at top-20 for query vectors 1..3), fused by
    // RRF. All fused arithmetic is over integer ranks — one division and
    // one two-term sum per row, in the same operand order as the Scala
    // side, so the double ranking key matches bit-for-bit.
    "ann12_rrf_hybrid" ->
      s"""WITH q(query_id, term) AS (VALUES
         |  (1, 'spark'), (1, 'window'), (1, 'shuffle'),
         |  (2, 'customer'), (2, 'vector'),
         |  (3, 'merge'), (3, 'stream'), (3, 'filter')),
         |tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
         |  FROM (SELECT doc_id, $TOKS AS toks FROM documents)),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf, MAX(dl) AS dl FROM tok
         |  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
         |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |stats AS (SELECT COUNT(*) AS n_docs, SUM(len($TOKS)) AS total_tokens FROM documents),
         |ts AS (SELECT q.query_id, tf.doc_id,
         |  CAST(((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
         |    * (CAST(tf AS DOUBLE) * 2.2)
         |    / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
         |        / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))
         |    AS DECIMAL(18,12)) AS term_score
         | FROM tf JOIN dfq USING (term) CROSS JOIN stats JOIN q ON q.term = tf.term),
         |pd AS (SELECT query_id, doc_id, CAST(SUM(term_score) AS DOUBLE) AS score
         |  FROM ts GROUP BY query_id, doc_id),
         |sleg AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id AS id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id)
         |    AS INTEGER) AS rnk
         | FROM pd QUALIFY rnk <= 20),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |dl2 AS (SELECT a.vec_id AS query_id, b.vec_id AS id,
         |  ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |    ORDER BY round(list_cosine_similarity(a.emb, b.emb), 6) DESC, b.vec_id) AS rnk
         | FROM e a JOIN e b ON a.vec_id <> b.vec_id WHERE a.vec_id IN (1, 2, 3)),
         |dleg AS (SELECT query_id, id, CAST(rnk AS INTEGER) AS rnk FROM dl2 WHERE rnk <= 20),
         |fused AS (SELECT COALESCE(s.query_id, d.query_id) AS query_id,
         |  COALESCE(s.id, d.id) AS id, s.rnk AS bm25_rank, d.rnk AS dense_rank,
         |  COALESCE(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(s.rnk AS DOUBLE)),
         |      CAST(0 AS DOUBLE))
         |  + COALESCE(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(d.rnk AS DOUBLE)),
         |      CAST(0 AS DOUBLE)) AS rrf_score
         | FROM sleg s FULL OUTER JOIN dleg d ON s.query_id = d.query_id AND s.id = d.id)
         |SELECT query_id, id AS doc_id, rrf_score, bm25_rank, dense_rank,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, id)
         |    AS INTEGER) AS "rank"
         |FROM fused QUALIFY "rank" <= 10""".stripMargin,
    // dq6: token-count bucketing + the x7 smoothed-PSI replay, with the
    // planted text-doubling on every 3rd current-snapshot doc.
    "dq6_corpus_drift" ->
      s"""WITH base AS (SELECT len($TOKS) AS n FROM documents),
         |curr AS (SELECT CASE WHEN doc_id % 3 = 0
         |    THEN len(regexp_split_to_array(trim(lower(text || ' ' || text)), '\\s+'))
         |    ELSE len($TOKS) END AS n FROM documents),
         |b AS (SELECT LEAST(n // 32, 9) AS bucket, 'base' AS snap FROM base
         |  UNION ALL SELECT LEAST(n // 32, 9), 'curr' FROM curr),
         |c AS (SELECT bucket,
         |  CAST(SUM(CASE WHEN snap = 'base' THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
         |  CAST(SUM(CASE WHEN snap = 'curr' THEN 1 ELSE 0 END) AS BIGINT) AS n_curr
         |  FROM b GROUP BY bucket),
         |t AS (SELECT CAST(SUM(n_base + 1) AS DOUBLE) AS tb,
         |             CAST(SUM(n_curr + 1) AS DOUBLE) AS tc FROM c)
         |SELECT bucket, n_base, n_curr,
         |  round(SUM((CAST(n_base + 1 AS DOUBLE) / tb - CAST(n_curr + 1 AS DOUBLE) / tc)
         |    * ln((CAST(n_base + 1 AS DOUBLE) / tb) / (CAST(n_curr + 1 AS DOUBLE) / tc)))
         |    OVER (), 6) AS psi,
         |  round(SUM((CAST(n_base + 1 AS DOUBLE) / tb - CAST(n_curr + 1 AS DOUBLE) / tc)
         |    * ln((CAST(n_base + 1 AS DOUBLE) / tb) / (CAST(n_curr + 1 AS DOUBLE) / tc)))
         |    OVER (), 6) > 0.2 AS drift_detected
         |FROM c CROSS JOIN t""".stripMargin,
    // dq7: both snapshot profiles replayed per column (literal dtypes —
    // the oracle knows the projection statically), then the same
    // full-outer drift join with integer-basis-point null rates.
    "dq7_schema_drift" ->
      """WITH curr_t AS (SELECT o_orderkey,
        |  CAST(o_custkey AS VARCHAR) AS o_custkey,
        |  CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END AS o_orderstatus,
        |  CAST(o_orderdate AS DATE) AS o_orderdate FROM orders),
        |pp AS (
        |  SELECT 'o_orderkey' AS col_name, 'bigint' AS dtype,
        |    COUNT(*) AS n_rows, COUNT(*) - COUNT(o_orderkey) AS n_nulls,
        |    COUNT(DISTINCT o_orderkey) AS n_distinct FROM orders
        |  UNION ALL SELECT 'o_custkey', 'bigint', COUNT(*),
        |    COUNT(*) - COUNT(o_custkey), COUNT(DISTINCT o_custkey) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', 'string', COUNT(*),
        |    COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus) FROM orders
        |  UNION ALL SELECT 'o_totalprice', 'double', COUNT(*),
        |    COUNT(*) - COUNT(o_totalprice), COUNT(DISTINCT o_totalprice) FROM orders),
        |cp AS (
        |  SELECT 'o_orderkey' AS col_name, 'bigint' AS dtype,
        |    COUNT(*) AS n_rows, COUNT(*) - COUNT(o_orderkey) AS n_nulls,
        |    COUNT(DISTINCT o_orderkey) AS n_distinct FROM curr_t
        |  UNION ALL SELECT 'o_custkey', 'string', COUNT(*),
        |    COUNT(*) - COUNT(o_custkey), COUNT(DISTINCT o_custkey) FROM curr_t
        |  UNION ALL SELECT 'o_orderstatus', 'string', COUNT(*),
        |    COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus) FROM curr_t
        |  UNION ALL SELECT 'o_orderdate', 'date', COUNT(*),
        |    COUNT(*) - COUNT(o_orderdate), COUNT(DISTINCT o_orderdate) FROM curr_t),
        |p AS (SELECT col_name, dtype AS dtype_prev,
        |  n_nulls * 10000 // n_rows AS null_bps_prev,
        |  n_distinct AS n_distinct_prev FROM pp),
        |c AS (SELECT col_name, dtype AS dtype_curr,
        |  n_nulls * 10000 // n_rows AS null_bps_curr,
        |  n_distinct AS n_distinct_curr FROM cp)
        |SELECT COALESCE(p.col_name, c.col_name) AS col_name,
        |  CASE WHEN p.dtype_prev IS NULL THEN 'added'
        |       WHEN c.dtype_curr IS NULL THEN 'dropped'
        |       WHEN p.dtype_prev <> c.dtype_curr THEN 'type_changed'
        |       ELSE 'common' END AS status,
        |  p.dtype_prev, c.dtype_curr, p.null_bps_prev, c.null_bps_curr,
        |  p.n_distinct_prev, c.n_distinct_curr,
        |  (CASE WHEN p.dtype_prev IS NULL THEN 'added'
        |        WHEN c.dtype_curr IS NULL THEN 'dropped'
        |        WHEN p.dtype_prev <> c.dtype_curr THEN 'type_changed'
        |        ELSE 'common' END) <> 'common'
        |    OR abs(p.null_bps_prev - c.null_bps_curr) > 100 AS drift_detected
        |FROM p FULL OUTER JOIN c ON p.col_name = c.col_name""".stripMargin,

    // x10: the oracle is the EXACT definition (group-count + share
    // threshold) — the sketch is an execution strategy, not a semantics
    // change, which is the whole point of the verify pass.
    "x10_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest(list_filter($TOKS, t -> len(t) > 0)) AS key
         |FROM documents)
         |SELECT key, count(*) AS cnt FROM tk GROUP BY key
         |HAVING count(*) >= (SELECT floor(count(*) * 0.0005) + 1 FROM tk)""".stripMargin,
    "dd10_semdedup" -> DD10_ORACLE,
    "tx9_decontaminate" ->
      s"""WITH tokd AS (SELECT doc_id, $TOKS AS toks FROM documents),
         |g AS (SELECT doc_id, list_distinct(list_transform(range(0, greatest(len(toks) - 5, 0) + 1),
         |      i -> array_to_string(toks[i+1:i+5], ' '))) AS grams FROM tokd),
         |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0),
         |cg AS (SELECT doc_id, unnest(grams) AS gram FROM g),
         |h AS (SELECT cg.doc_id, COUNT(*) AS c FROM cg JOIN bg ON cg.gram = bg.gram GROUP BY cg.doc_id)
         |SELECT d.doc_id, CAST(COALESCE(h.c, 0) AS BIGINT) AS contaminated_grams,
         |COALESCE(h.c, 0) >= 3 AS is_contaminated
         |FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id""".stripMargin,
    "tx14_lm_score" ->
      s"""WITH $LM_CTES
         |SELECT doc_id, n_bigrams, lm_score FROM scored""".stripMargin,
    // tx16: tx14's scored frame + the sample-threshold bucketing
    // (LmScore.pplBuckets): same salted unit hash, same integer cut ranks,
    // same (score, doc_id) tuple compare — the oracle draws the same line.
    "tx16_ppl_buckets" ->
      s"""WITH $LM_CTES,
         |samp AS (SELECT doc_id, lm_score FROM scored WHERE lm_score IS NOT NULL
         |  AND (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#ppl'), 1, 15)) AS BIGINT)
         |       / 1152921504606846976.0) < 0.25),
         |rk AS (SELECT doc_id, lm_score,
         |  ROW_NUMBER() OVER (ORDER BY lm_score DESC, doc_id) AS rn,
         |  COUNT(*) OVER () AS m FROM samp),
         |th AS (SELECT
         |  MAX(CASE WHEN rn = (m + 2) // 3 THEN lm_score END) AS t1s,
         |  MAX(CASE WHEN rn = (m + 2) // 3 THEN doc_id END) AS t1d,
         |  MAX(CASE WHEN rn = (2 * m + 2) // 3 THEN lm_score END) AS t2s,
         |  MAX(CASE WHEN rn = (2 * m + 2) // 3 THEN doc_id END) AS t2d FROM rk)
         |SELECT s.doc_id, s.n_bigrams, s.lm_score,
         |  CASE WHEN s.lm_score IS NULL THEN 'no_evidence'
         |       WHEN s.lm_score > th.t1s OR (s.lm_score = th.t1s AND s.doc_id <= th.t1d) THEN 'head'
         |       WHEN s.lm_score > th.t2s OR (s.lm_score = th.t2s AND s.doc_id <= th.t2d) THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM scored s CROSS JOIN th""".stripMargin,
    // tx20: the component oracles composed — Gopher CTEs, the tx1 langid
    // case chain, tx5's pii count, tx4's fingerprint — one final decision.
    "tx20_curation_gate" ->
      s"""WITH $GOPHER_BASE,
         |lng AS (SELECT doc_id, lang,
         |${ratio(graft.text.TextOps.stopwords("en"))} AS s_en,
         |${ratio(graft.text.TextOps.stopwords("es"))} AS s_es,
         |${ratio(graft.text.TextOps.stopwords("de"))} AS s_de,
         |${ratio(graft.text.TextOps.stopwords("fr"))} AS s_fr
         |FROM (SELECT doc_id, lang, $TOKS AS toks FROM documents)),
         |det AS (SELECT doc_id, lang,
         |CASE WHEN greatest(s_en, s_es, s_de, s_fr) <= 0 THEN 'unknown'
         |WHEN s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de THEN 'fr'
         |WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
         |WHEN s_en >= s_de THEN 'en'
         |ELSE 'de' END AS detected_lang FROM lng),
         |aux AS (SELECT doc_id,
         |(len(regexp_split_to_array(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) - 1
         | + len(regexp_split_to_array(text, '\\+?[0-9][0-9()\\- ]{6,}[0-9]')) - 1) AS pii_hits,
         |CAST(len($TOKS) AS BIGINT) AS n_tokens,
         |md5(array_to_string($TOKS, ' ')) AS fingerprint FROM documents),
         |canon AS (SELECT fingerprint, MIN(doc_id) AS keeper FROM aux GROUP BY fingerprint),
         |gates AS (SELECT r.doc_id, det.detected_lang,
         | det.detected_lang = det.lang AS lang_ok,
         | $GOPHER_PASS AS gopher_pass,
         | CAST(aux.pii_hits AS BIGINT) AS pii_hits, aux.pii_hits = 0 AS pii_ok,
         | aux.n_tokens, aux.n_tokens >= 10 AS token_ok,
         | aux.doc_id = canon.keeper AS dup_ok
         |FROM r JOIN det ON r.doc_id = det.doc_id
         |JOIN aux ON r.doc_id = aux.doc_id
         |JOIN canon ON aux.fingerprint = canon.fingerprint)
         |SELECT doc_id, detected_lang, lang_ok, gopher_pass, pii_hits, pii_ok,
         | n_tokens, token_ok, dup_ok,
         | lang_ok AND gopher_pass AND pii_ok AND token_ok AND dup_ok AS keep,
         | concat_ws(',',
         |  CASE WHEN NOT lang_ok THEN 'lang' END,
         |  CASE WHEN NOT gopher_pass THEN 'gopher' END,
         |  CASE WHEN NOT pii_ok THEN 'pii' END,
         |  CASE WHEN NOT token_ok THEN 'tokens' END,
         |  CASE WHEN NOT dup_ok THEN 'duplicate' END) AS drop_reasons
         |FROM gates""".stripMargin,
    // tx23: the same explicit-class tokenization → word counts → counts of
    // counts; all integer.
    "tx23_freq_spectrum" ->
      """WITH wc AS (SELECT w, COUNT(*) AS cnt FROM (
        |  SELECT unnest(list_filter(
        |    regexp_split_to_array(trim(lower(text)), '[ \t\n\f\r]+'),
        |    t -> length(t) > 0)) AS w FROM documents) t GROUP BY w)
        |SELECT cnt AS occurrences, COUNT(*) AS n_words FROM wc GROUP BY 1""".stripMargin,
    // tx21: the PMI replay — same explicit-class tokenization, bigrams via
    // list_transform over index ranges, and the identical fixed-point
    // integer score in hugeint (// is exact floor division; both engines'
    // operands are positive, so div and // agree).
    "tx21_pmi_collocations" ->
      """WITH tokd AS (SELECT list_filter(
        |  regexp_split_to_array(trim(lower(text)), '[ \t\n\f\r]+'),
        |  t -> length(t) > 0) AS ws FROM documents),
        |uni AS (SELECT unnest(ws) AS w FROM tokd),
        |uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
        |nt AS (SELECT COUNT(*) AS n FROM uni),
        |bi AS (SELECT unnest(list_transform(range(0, greatest(len(ws) - 1, 0)),
        |  i -> struct_pack(w1 := ws[i+1], w2 := ws[i+2]))) AS g FROM tokd),
        |bc AS (SELECT g.w1 AS w1, g.w2 AS w2, COUNT(*) AS c_ab FROM bi
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        |SELECT bc.w1, bc.w2, bc.c_ab, u1.c AS c1, u2.c AS c2,
        |CAST(CAST(bc.c_ab AS HUGEINT) * nt.n * 1000000
        |  // (CAST(u1.c AS HUGEINT) * u2.c) AS BIGINT) AS pmi_scaled
        |FROM bc JOIN uc u1 ON bc.w1 = u1.w JOIN uc u2 ON bc.w2 = u2.w, nt
        |ORDER BY pmi_scaled DESC, bc.w1, bc.w2 LIMIT 100""".stripMargin,

    // tx22: the full training replay, generated for the same merge count
    "tx22_bpe_train" -> graft.text.BpeTrain.oracleSql(8),

    // tx22b: training replay + per-word merge application (same chain)
    "tx22b_bpe_roundtrip" -> graft.text.BpeTrain.roundtripOracleSql(8),

    // tx20b: tx20's gate oracle with the canon CTE replaced by the chained
    // dd2b-portable MinHash CTEs (over plain documents) feeding dd6's
    // recursive reachability — keeper = smallest doc id reachable through
    // near-dup edges, singletons their own keeper.
    "tx20b_curation_gate_neardup" -> {
      val mins = (1 to 16).map { sd =>
        val (pair, off) = ((sd + 1) / 2, if (sd % 2 == 1) 1 else 17)
        s"MIN(CAST(('0x' || substr(md5(shingle || '#$pair'), $off, 15)) AS BIGINT)) AS h$sd"
      }.mkString(", ")
      val sigList = (1 to 16).map(i => s"h$i").mkString("[", ", ", "]")
      val bandHash = (0 until 4).map { b =>
        val parts = (1 to 4).map(r => s"CAST(sig[${b * 4 + r}] AS VARCHAR)").mkString(", ")
        s"WHEN $b THEN md5(concat_ws(',', $parts))"
      }.mkString(" ")
      val shingle = "unnest(list_transform(range(0, greatest(len(toks) - 3, 0) + 1), " +
        "i -> array_to_string(toks[i+1:i+3], ' ')))"
      val sim = "CAST(list_sum(list_transform(range(1, 17), " +
        "i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 16"
      s"""WITH RECURSIVE $GOPHER_BASE,
         |lng AS (SELECT doc_id, lang,
         |${ratio(graft.text.TextOps.stopwords("en"))} AS s_en,
         |${ratio(graft.text.TextOps.stopwords("es"))} AS s_es,
         |${ratio(graft.text.TextOps.stopwords("de"))} AS s_de,
         |${ratio(graft.text.TextOps.stopwords("fr"))} AS s_fr
         |FROM (SELECT doc_id, lang, $TOKS AS toks FROM documents)),
         |det AS (SELECT doc_id, lang,
         |CASE WHEN greatest(s_en, s_es, s_de, s_fr) <= 0 THEN 'unknown'
         |WHEN s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de THEN 'fr'
         |WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
         |WHEN s_en >= s_de THEN 'en'
         |ELSE 'de' END AS detected_lang FROM lng),
         |aux AS (SELECT doc_id,
         |(len(regexp_split_to_array(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) - 1
         | + len(regexp_split_to_array(text, '\\+?[0-9][0-9()\\- ]{6,}[0-9]')) - 1) AS pii_hits,
         |CAST(len($TOKS) AS BIGINT) AS n_tokens FROM documents),
         |ex AS (SELECT doc_id AS doc, $shingle AS shingle
         |  FROM (SELECT doc_id, $TOKS AS toks FROM documents)),
         |sigs AS (SELECT doc, $sigList AS sig FROM (SELECT doc, $mins FROM ex GROUP BY doc)),
         |banded AS (SELECT doc, sig, b AS band, CASE b $bandHash END AS band_hash
         |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs),
         |prs AS (SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
         |  FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc < b.doc
         |  WHERE $sim >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM prs UNION SELECT id_b, id_a FROM prs),
         |reach(id, label) AS (SELECT src, src FROM edges
         |  UNION SELECT e.src, r2.label FROM edges e JOIN reach r2 ON e.dst = r2.id),
         |grp AS (SELECT id AS doc_id, MIN(label) AS group_id FROM reach GROUP BY id),
         |gates AS (SELECT r.doc_id, det.detected_lang,
         | det.detected_lang = det.lang AS lang_ok,
         | $GOPHER_PASS AS gopher_pass,
         | CAST(aux.pii_hits AS BIGINT) AS pii_hits, aux.pii_hits = 0 AS pii_ok,
         | aux.n_tokens, aux.n_tokens >= 10 AS token_ok,
         | r.doc_id = COALESCE(grp.group_id, r.doc_id) AS dup_ok
         |FROM r JOIN det ON r.doc_id = det.doc_id
         |JOIN aux ON r.doc_id = aux.doc_id
         |LEFT JOIN grp ON r.doc_id = grp.doc_id)
         |SELECT doc_id, detected_lang, lang_ok, gopher_pass, pii_hits, pii_ok,
         | n_tokens, token_ok, dup_ok,
         | lang_ok AND gopher_pass AND pii_ok AND token_ok AND dup_ok AS keep,
         | concat_ws(',',
         |  CASE WHEN NOT lang_ok THEN 'lang' END,
         |  CASE WHEN NOT gopher_pass THEN 'gopher' END,
         |  CASE WHEN NOT pii_ok THEN 'pii' END,
         |  CASE WHEN NOT token_ok THEN 'tokens' END,
         |  CASE WHEN NOT dup_ok THEN 'near_duplicate' END) AS drop_reasons
         |FROM gates""".stripMargin
    },
    // tx19: the same deterministic URL synthesis, the same two regexes.
    "tx19_url_filter" ->
      """WITH u AS (SELECT doc_id, lang,
        |  source || '-' || (doc_id % 7) ||
        |  (CASE doc_id % 3 WHEN 0 THEN '.org' WHEN 1 THEN '.net' ELSE '.io' END) AS dom
        | FROM documents),
        |w AS (SELECT doc_id,
        |  'https://' || (CASE WHEN doc_id % 2 = 0 THEN 'cdn.' || dom ELSE dom END)
        |    || '/docs/' || doc_id || '?l=' || lang AS url FROM u),
        |x AS (SELECT doc_id, url,
        |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host FROM w)
        |SELECT doc_id, url, host,
        |  regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
        |  regexp_extract(host, '([^.]+\.[^.]+)$', 1)
        |    IN ('src1-3.org', 'src4-0.net', 'src2-5.io', 'src0-6.org') AS is_blocked
        |FROM x""".stripMargin,
    // tx18: the general model is LM_CTES' scored frame verbatim; the
    // in-domain branch retrains modelp on the filtered seed and re-scores
    // the SAME bg pairs (all docs) against it.
    "tx18_contrastive_select" ->
      s"""WITH $LM_CTES,
         |tgt AS (SELECT doc_id, text FROM documents WHERE lang = 'en' AND source = 'src0'),
         |mtok AS (SELECT doc_id, $TOKS AS toks FROM tgt),
         |mbg AS (SELECT doc_id,
         |  unnest(list_transform(range(0, greatest(len(toks) - 1, 0)), i -> toks[i+1])) AS prefix,
         |  unnest(list_transform(range(0, greatest(len(toks) - 1, 0)), i -> toks[i+2])) AS word
         | FROM mtok),
         |imodelp AS (SELECT prefix, word,
         |  CAST(CAST(COUNT(*) AS DOUBLE) /
         |   CAST(SUM(COUNT(*)) OVER (PARTITION BY prefix) AS DOUBLE) AS DECIMAL(18,12)) AS p
         | FROM mbg GROUP BY prefix, word),
         |isc AS (SELECT bg.doc_id, COUNT(*) AS n_bigrams, SUM(p) AS psum
         |  FROM bg JOIN imodelp USING (prefix, word) GROUP BY bg.doc_id),
         |iscored AS (SELECT d.doc_id,
         |  CAST(isc.psum AS DOUBLE) / CAST(isc.n_bigrams AS DOUBLE) AS score_in
         |FROM documents d LEFT JOIN isc ON d.doc_id = isc.doc_id)
         |SELECT s.doc_id, i.score_in, s.lm_score AS score_gen,
         |  i.score_in - s.lm_score AS ml_diff,
         |  COALESCE(i.score_in - s.lm_score > 0, FALSE) AS selected
         |FROM scored s JOIN iscored i ON s.doc_id = i.doc_id""".stripMargin,
    // tx17: BM25 with the rational idf (see text/Bm25.scala) — every factor
    // in the same operand order, per-term quantize to DECIMAL(18,12), exact
    // sum, one double conversion for the ranking key.
    "tx17_bm25_topk" ->
      s"""WITH q(query_id, term) AS (VALUES
         |  (1, 'spark'), (1, 'window'), (1, 'shuffle'),
         |  (2, 'customer'), (2, 'vector'),
         |  (3, 'merge'), (3, 'stream'), (3, 'filter')),
         |tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
         |  FROM (SELECT doc_id, $TOKS AS toks FROM documents)),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf, MAX(dl) AS dl FROM tok
         |  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
         |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |stats AS (SELECT COUNT(*) AS n_docs, SUM(len($TOKS)) AS total_tokens FROM documents),
         |ts AS (SELECT q.query_id, tf.doc_id,
         |  CAST(((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
         |    * (CAST(tf AS DOUBLE) * 2.2)
         |    / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
         |        / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))
         |    AS DECIMAL(18,12)) AS term_score
         | FROM tf JOIN dfq USING (term) CROSS JOIN stats JOIN q ON q.term = tf.term),
         |pd AS (SELECT query_id, doc_id, CAST(SUM(term_score) AS DOUBLE) AS score,
         |  COUNT(*) AS matched_terms FROM ts GROUP BY query_id, doc_id)
         |SELECT CAST(query_id AS BIGINT) AS query_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INTEGER) AS "rank",
         |  doc_id, score, matched_terms
         |FROM pd QUALIFY "rank" <= 10""".stripMargin,
    "tx13_control_strip" ->
      """WITH aug AS (SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN chr(1) || chr(2) || text || chr(0) || 'end' || chr(127)
        |       WHEN doc_id % 4 = 1 THEN text || chr(11) || 'mid' || chr(31) || 'tail'
        |       ELSE text END AS raw FROM documents)
        |SELECT doc_id,
        |  regexp_replace(raw, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g') AS text_clean,
        |  CAST(length(raw) - length(regexp_replace(raw, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')) AS BIGINT) AS n_ctrl
        |FROM aug""".stripMargin,
    "tx12_nfc_normalize" ->
      """WITH aug AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN text || ' caf' || chr(101) || chr(769)
        |       WHEN doc_id % 3 = 1 THEN text || ' caf' || chr(233)
        |       ELSE text END AS raw FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS text_nfc,
        |nfc_normalize(raw) <> raw AS was_denormalized,
        |CAST(length(raw) - length(nfc_normalize(raw)) AS BIGINT) AS chars_saved
        |FROM aug""".stripMargin,
    "tx11_chunking" ->
      s"""WITH t AS (SELECT doc_id, $TOKS_RAW AS toks FROM documents),
         |m AS (SELECT doc_id, toks, (greatest(len(toks) - 16, 0) + 11) // 12 AS mx FROM t),
         |c AS (SELECT doc_id, unnest(range(0, mx + 1)) AS chunk_id, toks FROM m)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |array_to_string(toks[chunk_id*12 + 1 : chunk_id*12 + 16], ' ') AS chunk_text,
         |CAST(len(toks[chunk_id*12 + 1 : chunk_id*12 + 16]) AS BIGINT) AS chunk_tokens
         |FROM c""".stripMargin,
    "tx10_line_dedup" ->
      """WITH src AS (
        |  SELECT doc_id, source, 'HEADER for ' || source || chr(10) || text AS text FROM documents),
        |l AS (
        |  SELECT doc_id, source,
        |         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos,
        |         unnest(string_split(text, chr(10))) AS line
        |  FROM src),
        |k AS (
        |  SELECT *, row_number() OVER (PARTITION BY source, line ORDER BY doc_id, pos) AS rn FROM l)
        |SELECT doc_id, source,
        |  COALESCE(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE rn = 1), '') AS text_clean,
        |  COUNT(*) FILTER (WHERE rn = 1) AS lines_kept,
        |  COUNT(*) FILTER (WHERE rn > 1) AS lines_dropped
        |FROM k GROUP BY doc_id, source""".stripMargin,
    // mm1/mm3: the image fixture is a pure function of doc_id (width =
    // 8 + id%16, height = 8 + id%12, RGB), so the oracle recomputes the
    // dimensions ImageIO must recover from the actual PNG bytes.
    "mm1_multimodal_decode" ->
      """SELECT doc_id, CAST(8 + doc_id % 16 AS INT) AS width,
        |CAST(8 + doc_id % 12 AS INT) AS height, CAST(3 AS INT) AS channels
        |FROM documents""".stripMargin,
    "mm3_resize" ->
      """SELECT doc_id, CAST(8 + doc_id % 16 AS INT) AS width,
        |CAST(8 + doc_id % 12 AS INT) AS height,
        |CAST((8 + doc_id % 16) // 2 AS INT) AS thumb_width,
        |CAST((8 + doc_id % 12) // 2 AS INT) AS thumb_height
        |FROM documents""".stripMargin,

    // mm5: full aHash replay from the closed-form pixel formula
    // v(x,y) = (img_id·31 + 7x + 13y) mod 256 on a (8+id%16)×(8+id%12)
    // canvas — downsample cell = (8y div h)·8 + (8x div w), bit set iff
    // cell_sum·total_cnt > total_sum·cell_cnt (the exact integer compare
    // the Scala side uses), packed into two 32-bit halves.
    "mm5_image_dedup" ->
      """WITH base AS (SELECT doc_id, doc_id AS img_id FROM documents
        |UNION ALL SELECT doc_id + 500000, doc_id FROM documents WHERE doc_id % 6 = 0),
        |dims AS (SELECT doc_id, img_id, 8 + img_id % 16 AS w, 8 + img_id % 12 AS h FROM base),
        |pix AS (SELECT doc_id, img_id, w, h,
        | unnest(flatten(list_transform(range(0, w), xx ->
        |   list_transform(range(0, h), yy -> [xx, yy])))) AS xy FROM dims),
        |px AS (SELECT doc_id, ((img_id * 31 + xy[1] * 7 + xy[2] * 13) % 256) AS red,
        | ((xy[2] * 8 // h) * 8 + (xy[1] * 8 // w)) AS b FROM pix),
        |bsum AS (SELECT doc_id, b, SUM(red) AS bs, COUNT(*) AS bc FROM px GROUP BY doc_id, b),
        |tot AS (SELECT doc_id, SUM(red) AS ts, COUNT(*) AS tc FROM px GROUP BY doc_id),
        |bits AS (SELECT bsum.doc_id,
        | CAST(SUM(CASE WHEN bs * tc > ts * bc AND b >= 32
        |   THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS BIGINT) AS ahash_hi,
        | CAST(SUM(CASE WHEN bs * tc > ts * bc AND b < 32
        |   THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS ahash_lo
        | FROM bsum JOIN tot ON bsum.doc_id = tot.doc_id GROUP BY bsum.doc_id),
        |g AS (SELECT ahash_hi, ahash_lo, COUNT(*) AS group_size, MIN(doc_id) AS keeper
        | FROM bits GROUP BY ahash_hi, ahash_lo)
        |SELECT b.doc_id, b.ahash_hi, b.ahash_lo, g.group_size, (b.doc_id = g.keeper) AS kept
        |FROM bits b JOIN g ON b.ahash_hi = g.ahash_hi AND b.ahash_lo = g.ahash_lo""".stripMargin,

    // mm7: closed-form PCM replay (wavBytes: n = 256 + (src%128)·16,
    // s(0) = 20000 + src%10000, s(i) = ((src·131 + i·17)%16384) − 8192),
    // |v| energy sums over 16 windows (w = i·16 // n — the aHash cell
    // rule), the cross-multiplied threshold, 16-bit pack, group.
    "mm7_audio_dedup" ->
      """WITH base AS (SELECT doc_id, doc_id AS src FROM documents
        |UNION ALL SELECT doc_id + 600000, doc_id FROM documents WHERE doc_id % 9 = 0),
        |ns AS (SELECT doc_id, src, 256 + (src % 128) * 16 AS n FROM base),
        |sm AS (SELECT doc_id, n,
        |  CASE WHEN i = 0 THEN 20000 + src % 10000
        |       ELSE abs(((src * 131 + i * 17) % 16384) - 8192) END AS v,
        |  (i * 16) // n AS w
        | FROM (SELECT doc_id, src, n, unnest(range(0, n)) AS i FROM ns)),
        |wsum AS (SELECT doc_id, w, SUM(v) AS ws, COUNT(*) AS wc FROM sm GROUP BY doc_id, w),
        |tot AS (SELECT doc_id, n, SUM(v) AS ts FROM sm GROUP BY doc_id, n),
        |fp AS (SELECT wsum.doc_id,
        |  CAST(SUM(CASE WHEN ws * n > ts * wc THEN (CAST(1 AS BIGINT) << w) ELSE 0 END) AS BIGINT) AS afp
        | FROM wsum JOIN tot ON wsum.doc_id = tot.doc_id GROUP BY wsum.doc_id),
        |g AS (SELECT afp, COUNT(*) AS group_size, MIN(doc_id) AS keeper FROM fp GROUP BY afp)
        |SELECT f.doc_id, f.afp, g.group_size, (f.doc_id = g.keeper) AS kept
        |FROM fp f JOIN g ON f.afp = g.afp""".stripMargin,

    // mm6: sampling indices (j·fc/4 when fc>4, else all), closed-form frame
    // dims/pixels, the mm5 aHash arithmetic, then the shared-hash pair count.
    "mm6_video_frame_dedup" ->
      """WITH vids AS (SELECT doc_id AS vid, doc_id AS src FROM documents
        |UNION ALL SELECT doc_id + 700000, doc_id FROM documents WHERE doc_id % 13 = 0),
        |fcs AS (SELECT vid, src, 2 + src % 5 AS fc FROM vids),
        |fr AS (SELECT vid, src, fc, j AS frame_no,
        |  CASE WHEN fc <= 4 THEN j ELSE (j * fc) // 4 END AS f
        | FROM fcs CROSS JOIN (SELECT unnest(range(0, 4)) AS j) js
        | WHERE j < least(fc, 4)),
        |dims AS (SELECT vid, frame_no, src, f,
        |  4 + (src + f) % 8 AS w, 4 + (src + f) % 6 AS h FROM fr),
        |pix AS (SELECT vid, frame_no, src, f, w, h,
        | unnest(flatten(list_transform(range(0, w), xx ->
        |   list_transform(range(0, h), yy -> [xx, yy])))) AS xy FROM dims),
        |px AS (SELECT vid, frame_no,
        | ((src * 37 + f * 11 + xy[1] * 5 + xy[2] * 3) % 256) AS red,
        | ((xy[2] * 8 // h) * 8 + (xy[1] * 8 // w)) AS b FROM pix),
        |bsum AS (SELECT vid, frame_no, b, SUM(red) AS bs, COUNT(*) AS bc
        | FROM px GROUP BY vid, frame_no, b),
        |tot AS (SELECT vid, frame_no, SUM(red) AS ts, COUNT(*) AS tc
        | FROM px GROUP BY vid, frame_no),
        |bits AS (SELECT bsum.vid, bsum.frame_no,
        | CAST(SUM(CASE WHEN bs * tc > ts * bc AND b >= 32
        |   THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS BIGINT) AS hi,
        | CAST(SUM(CASE WHEN bs * tc > ts * bc AND b < 32
        |   THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS lo
        | FROM bsum JOIN tot ON bsum.vid = tot.vid AND bsum.frame_no = tot.frame_no
        | GROUP BY bsum.vid, bsum.frame_no)
        |SELECT a.vid AS id_a, b.vid AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared_frames
        |FROM bits a JOIN bits b ON a.hi = b.hi AND a.lo = b.lo AND a.vid < b.vid
        |GROUP BY a.vid, b.vid""".stripMargin,

    // mm8: all frames (k=8 ≥ fc max 6 → frame index = frame_no), the mm6
    // closed-form pixel/aHash replay, then the same LAG hamming rule.
    "mm8_scene_detect" ->
      """WITH fcs AS (SELECT doc_id, 2 + doc_id % 5 AS fc FROM documents),
        |fr AS (SELECT doc_id, fc, j AS frame_no
        | FROM fcs CROSS JOIN (SELECT unnest(range(0, 6)) AS j) js WHERE j < fc),
        |dims AS (SELECT doc_id, frame_no,
        |  4 + (doc_id + frame_no) % 8 AS w, 4 + (doc_id + frame_no) % 6 AS h FROM fr),
        |pix AS (SELECT doc_id, frame_no, w, h,
        | unnest(flatten(list_transform(range(0, w), xx ->
        |   list_transform(range(0, h), yy -> [xx, yy])))) AS xy FROM dims),
        |px AS (SELECT doc_id, frame_no,
        | ((doc_id * 37 + frame_no * 11 + xy[1] * 5 + xy[2] * 3) % 256) AS red,
        | ((xy[2] * 8 // h) * 8 + (xy[1] * 8 // w)) AS b FROM pix),
        |bsum AS (SELECT doc_id, frame_no, b, SUM(red) AS bs, COUNT(*) AS bc
        | FROM px GROUP BY doc_id, frame_no, b),
        |tot AS (SELECT doc_id, frame_no, SUM(red) AS ts, COUNT(*) AS tc
        | FROM px GROUP BY doc_id, frame_no),
        |bits AS (SELECT bsum.doc_id, bsum.frame_no,
        | CAST(SUM(CASE WHEN bs * tc > ts * bc AND b >= 32
        |   THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS BIGINT) AS hi,
        | CAST(SUM(CASE WHEN bs * tc > ts * bc AND b < 32
        |   THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS lo
        | FROM bsum JOIN tot ON bsum.doc_id = tot.doc_id AND bsum.frame_no = tot.frame_no
        | GROUP BY bsum.doc_id, bsum.frame_no),
        |lagd AS (SELECT doc_id, frame_no,
        | CAST(bit_count(xor(hi, lag(hi) OVER w)) +
        |      bit_count(xor(lo, lag(lo) OVER w)) AS INTEGER) AS hamming_prev
        | FROM bits WINDOW w AS (PARTITION BY doc_id ORDER BY frame_no)),
        |bnd AS (SELECT doc_id, frame_no, hamming_prev,
        | COALESCE(hamming_prev > 16, FALSE) AS is_boundary FROM lagd)
        |SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no, hamming_prev, is_boundary,
        | CAST(SUM(CASE WHEN is_boundary THEN 1 ELSE 0 END)
        |   OVER (PARTITION BY doc_id ORDER BY frame_no
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS scene_id
        |FROM bnd""".stripMargin,
    // mm2: the stats the codecs must recover, from the fixture formulas —
    // image pixels (8+id%16)·(8+id%12), audio samples 256+(id%128)·16, video
    // frames 2+id%5. CAST(SUM AS BIGINT): DuckDB SUM(int) is HUGEINT.
    "mm2_media_stats" ->
      """SELECT 'image' AS media_type, COUNT(*) AS n_assets,
        |CAST(SUM((8 + doc_id % 16) * (8 + doc_id % 12)) AS BIGINT) AS total_units
        |FROM documents
        |UNION ALL SELECT 'audio', COUNT(*),
        |CAST(SUM(256 + (doc_id % 128) * 16) AS BIGINT) FROM documents
        |UNION ALL SELECT 'video', COUNT(*),
        |CAST(SUM(2 + doc_id % 5) AS BIGINT) FROM documents""".stripMargin,

    // mm2b: every WAV field the codec must recover, per row. duration_ms uses
    // the same integer floor division as the Spark side.
    "mm2_audio_decode" ->
      """SELECT doc_id,
        |CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
        |CAST(1 AS INT) AS channels,
        |CAST(16 AS INT) AS bits_per_sample,
        |CAST(256 + (doc_id % 128) * 16 AS BIGINT) AS n_samples,
        |CAST((256 + (doc_id % 128) * 16) * 1000
        |  // (8000 + (doc_id % 8) * 1000) AS BIGINT) AS duration_ms,
        |CAST(20000 + doc_id % 10000 AS INT) AS peak_abs
        |FROM documents""".stripMargin,

    // mm4: replay the sampler's arithmetic — n = 2+id%5 frames, k = 4 output
    // slots, frame_index = j·n/k when n > k else j — and the per-frame
    // dimension formulas the PNG decode must recover.
    "mm4_frame_sample" ->
      """WITH f AS (SELECT doc_id, CAST(2 + doc_id % 5 AS INT) AS fc FROM documents),
        |s AS (SELECT doc_id, fc, CAST(j AS INT) AS frame_no
        |      FROM f, generate_series(0, 3) t(j) WHERE j < least(fc, 4)),
        |x AS (SELECT doc_id, frame_no,
        |      CAST(CASE WHEN fc <= 4 THEN frame_no
        |                ELSE (frame_no * fc) // 4 END AS INT) AS frame_index
        |      FROM s)
        |SELECT doc_id, frame_no, frame_index,
        |CAST(4 + (doc_id + frame_index) % 8 AS INT) AS width,
        |CAST(4 + (doc_id + frame_index) % 6 AS INT) AS height
        |FROM x""".stripMargin,

    "dq2_quality_report" ->
      """WITH d AS (SELECT 'documents' AS table_name, COUNT(*) AS row_cnt,
        |COUNT(*) FILTER (WHERE lang IS NULL) AS null_cnt,
        |COUNT(*) - COUNT(DISTINCT CAST(doc_id AS VARCHAR)) AS dup_cnt,
        |CAST(NULL AS DATE) AS latest_date,
        |COUNT(*) >= 100 AS row_floor_ok,
        |(COUNT(*) FILTER (WHERE lang IS NULL)) * 100.0 / greatest(COUNT(*), 1) <= 10.0 AS null_rate_ok,
        |(COUNT(*) - COUNT(DISTINCT CAST(doc_id AS VARCHAR))) * 100.0 / greatest(COUNT(*), 1) <= 5.0 AS dup_rate_ok,
        |TRUE AS freshness_ok FROM documents),
        |e AS (SELECT 'events', COUNT(*),
        |COUNT(*) FILTER (WHERE props IS NULL),
        |COUNT(*) - COUNT(DISTINCT CAST(event_id AS VARCHAR)),
        |MAX(CAST(ts AS DATE)),
        |COUNT(*) >= 1000,
        |(COUNT(*) FILTER (WHERE props IS NULL)) * 100.0 / greatest(COUNT(*), 1) <= 10.0,
        |(COUNT(*) - COUNT(DISTINCT CAST(event_id AS VARCHAR))) * 100.0 / greatest(COUNT(*), 1) <= 5.0,
        |CAST(DATEDIFF('day', MAX(CAST(ts AS DATE)), DATE '2024-02-01') AS INT) * 24 <= 25
        |FROM events)
        |SELECT *, row_floor_ok AND null_rate_ok AND dup_rate_ok AND freshness_ok AS all_ok
        |FROM (SELECT * FROM d UNION ALL SELECT * FROM e)""".stripMargin,
    // st8: the surviving fingerprint set of the streaming dedup — identical
    // to batch DISTINCT fingerprints over the same duplicated corpus.
    "st8_stream_dedup" ->
      s"""WITH all_docs AS (
         |SELECT * FROM documents
         |UNION ALL
         |SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars FROM documents WHERE doc_id % 5 = 0)
         |SELECT DISTINCT md5(array_to_string($TOKS, ' ')) AS fingerprint FROM all_docs""".stripMargin,
    // st11: batch windows restricted to the ones streaming finalizes —
    // window_end <= watermark, where the terminal watermark is
    // max(ts) − 2 days (AvailableNow's trailing no-data batch advances the
    // watermark once more, emitting every window it passes).
    // st14: the session break rule (new session iff ts >= prev + gap), the
    // [min_ts, max_ts + gap) window, and the watermark emission cut.
    "st14_stream_session_window" ->
      """WITH mx AS (SELECT max(ts) - INTERVAL 1 DAY AS wm FROM events),
        |o AS (SELECT user_id, ts, value, event_id,
        |  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts FROM events),
        |sb AS (SELECT user_id, ts, value, event_id,
        |  CASE WHEN pts IS NULL OR ts >= pts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM o),
        |r AS (SELECT user_id, ts, value,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM sb),
        |g AS (SELECT user_id, sid, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        | FROM r GROUP BY user_id, sid)
        |SELECT user_id, session_start, session_end, n_events, sum_value
        |FROM g CROSS JOIN mx WHERE session_end <= wm""".stripMargin,
    "st11_stream_windowed_agg" ->
      """WITH mx AS (SELECT max(ts) - INTERVAL 2 DAY AS wm FROM events)
        |SELECT date_trunc('day', ts) AS win_start, event_type,
        |COUNT(*) AS cnt,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events CROSS JOIN mx
        |WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= wm
        |GROUP BY 1, 2""".stripMargin,

    // st12: inner stream-stream join + AvailableNow emits the complete
    // match set — the plain batch join IS the oracle (second-level diff via
    // boundary counting matches unix_timestamp truncation).
    "st12_stream_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
        |CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS secs_after_click
        |FROM events p JOIN events c ON p.user_id = c.user_id
        |AND p.event_type = 'purchase' AND c.event_type = 'click'
        |AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR""".stripMargin,

    // st13: single AvailableNow batch → final state per sync id equals the
    // batch aggregate (batches=1); status FAILED iff any failure seen.
    "st13_stream_tracker_state" ->
      """SELECT 'sync' || CAST(user_id % 5 AS VARCHAR) AS sync_id,
        |CAST(SUM(user_id % 97) AS BIGINT) AS rows_processed,
        |CAST(1 AS BIGINT) AS batches,
        |CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS failures,
        |CASE WHEN COUNT(*) FILTER (WHERE event_type = 'error') > 0
        |     THEN 'FAILED' ELSE 'PROCESSING' END AS status
        |FROM events GROUP BY user_id % 5""".stripMargin,

    // st13b: the two-micro-batch state trace — batch-1 rows are the first
    // half's per-sync aggregate (batches=1); batch-2 rows are CUMULATIVE
    // rows/failures with batches=2 (or 1 for a sync first seen in half 2,
    // matching flatMapGroupsWithState's per-appearance increment).
    "st13b_tracker_two_batches" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS d,
        |'sync' || CAST(user_id % 5 AS VARCHAR) AS sync_id,
        |user_id % 97 AS r, event_type = 'error' AS failed FROM events),
        |b1 AS (SELECT sync_id, CAST(SUM(r) AS BIGINT) AS r,
        |CAST(COUNT(*) FILTER (WHERE failed) AS BIGINT) AS f
        |FROM ev WHERE d < DATE '2024-01-16' GROUP BY sync_id),
        |b2 AS (SELECT sync_id, CAST(SUM(r) AS BIGINT) AS r,
        |CAST(COUNT(*) FILTER (WHERE failed) AS BIGINT) AS f
        |FROM ev WHERE d >= DATE '2024-01-16' GROUP BY sync_id)
        |SELECT sync_id, r AS rows_processed, CAST(1 AS BIGINT) AS batches,
        |f AS failures,
        |CASE WHEN f > 0 THEN 'FAILED' ELSE 'PROCESSING' END AS status FROM b1
        |UNION ALL
        |SELECT b2.sync_id, COALESCE(b1.r, 0) + b2.r AS rows_processed,
        |CAST(CASE WHEN b1.sync_id IS NULL THEN 1 ELSE 2 END AS BIGINT) AS batches,
        |COALESCE(b1.f, 0) + b2.f AS failures,
        |CASE WHEN COALESCE(b1.f, 0) + b2.f > 0
        |     THEN 'FAILED' ELSE 'PROCESSING' END AS status
        |FROM b2 LEFT JOIN b1 USING (sync_id)""".stripMargin,

    // st9: the micro-batch Gopher gate must equal the batch gate — same
    // GOPHER_BASE CTEs as tx6, filtered to the pass set.
    "st9_stream_gopher_gate" ->
      s"""WITH $GOPHER_BASE
         |SELECT doc_id, n_words, symbol_ratio FROM r WHERE $GOPHER_PASS""".stripMargin,
    // st10: stream-static broadcast enrichment ≡ a plain left join against
    // the same inline dim with the same untiered default.
    "st10_stream_static_enrich" ->
      """SELECT d.doc_id, COALESCE(t.tier, 'untiered') AS tier
        |FROM documents d
        |LEFT JOIN (VALUES ('src0', 'tier-a'), ('src1', 'tier-b'), ('src2', 'tier-c'))
        |  AS t(source, tier) ON d.source = t.source""".stripMargin,
    "dd1_exact_dedup" ->
      s"""WITH all_docs AS (
         |SELECT * FROM documents
         |UNION ALL
         |SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars FROM documents WHERE doc_id % 5 = 0),
         |fp AS (SELECT *, md5(array_to_string($TOKS, ' ')) AS fingerprint FROM all_docs)
         |SELECT doc_id, text, lang, source, n_chars, fingerprint FROM
         |(SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn FROM fp)
         |WHERE rn = 1""".stripMargin,
    "tx2_quality_score" ->
      s"""SELECT doc_id,
         |CAST(len($TOKS) AS BIGINT) AS n_tokens,
         |CAST(length(text) AS BIGINT) AS n_chars_measured,
         |CAST(length(text) AS DOUBLE) / CAST(greatest(len($TOKS), 1) AS DOUBLE) AS avg_token_len,
         |CAST(len(list_distinct($TOKS)) AS DOUBLE) / CAST(greatest(len($TOKS), 1) AS DOUBLE) AS distinct_token_ratio,
         |CAST(len(list_filter($TOKS, t -> t IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
         | / CAST(greatest(len($TOKS), 1) AS DOUBLE) AS stopword_ratio,
         |ROUND(
         |  (CASE WHEN len($TOKS) >= 10 AND len($TOKS) <= 1000 THEN 0.4 ELSE 0.0 END)
         |  + (CAST(len(list_distinct($TOKS)) AS DOUBLE) / CAST(greatest(len($TOKS), 1) AS DOUBLE)) * 0.4
         |  + (CASE WHEN CAST(len(list_filter($TOKS, t -> t IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
         |     / CAST(greatest(len($TOKS), 1) AS DOUBLE) > 0.0 THEN 0.2 ELSE 0.0 END), 4) AS quality_score
         |FROM documents""".stripMargin,
    "tx3_token_count" ->
      s"""SELECT doc_id, CAST(len($TOKS_RAW) AS BIGINT) AS n_tokens,
         |CAST(len($TOKS_RAW) + CAST(CEIL(length(text) / 4.0) AS INT) AS BIGINT) AS n_bpe_tokens
         |FROM documents""".stripMargin,
    "tx4_fingerprint" ->
      s"""WITH fp AS (SELECT doc_id, md5(array_to_string($TOKS, ' ')) AS fingerprint FROM documents)
         |SELECT doc_id, fingerprint,
         |COUNT(*) OVER (PARTITION BY fingerprint) AS dup_group_size FROM fp""".stripMargin,
    "tx7_repetition" ->
      s"""WITH m AS (SELECT doc_id,
         |string_split(text, chr(10)) AS l,
         |string_split(text, chr(10) || chr(10)) AS p FROM documents),
         |r AS (SELECT doc_id,
         |CAST(len(l) - len(list_distinct(l)) AS DOUBLE) / CAST(greatest(len(l), 1) AS DOUBLE) AS dup_line_ratio,
         |CAST(len(p) - len(list_distinct(p)) AS DOUBLE) / CAST(greatest(len(p), 1) AS DOUBLE) AS dup_para_ratio
         |FROM m)
         |SELECT doc_id, dup_line_ratio, dup_para_ratio,
         |dup_line_ratio <= 0.3 AS dup_line_ok,
         |dup_para_ratio <= 0.3 AS dup_para_ok,
         |dup_line_ratio <= 0.3 AND dup_para_ratio <= 0.3 AS repetition_pass
         |FROM r""".stripMargin,
    "tx8_sequence_pack" ->
      s"""WITH d AS (SELECT doc_id, source, CAST(len($TOKS_RAW) AS BIGINT) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tb FROM d)
         |SELECT doc_id, source, n_tokens,
         |CAST(tb // 4096 AS BIGINT) AS seq_id,
         |CAST(tb % 4096 AS BIGINT) AS seq_offset FROM c""".stripMargin,
    "tx3b_bpe_tokens" ->
      s"""WITH RECURSIVE $BPE_CTES
         |SELECT doc_id, n_bpe AS n_bpe_tokens FROM bpe""".stripMargin,
    "sp4b_token_budget_mix" ->
      s"""WITH RECURSIVE $BPE_CTES,
         |c AS (SELECT d.source, SUM(b.n_bpe) AS n,
         |CAST(sqrt(CAST(SUM(b.n_bpe) AS DOUBLE)) AS DECIMAL(18,6)) AS w
         |FROM documents d JOIN bpe b ON d.doc_id = b.doc_id GROUP BY d.source),
         |t AS (SELECT CAST(SUM(w) AS DOUBLE) AS tw FROM c),
         |r AS (SELECT source,
         |least(1.0, 30000.0 * (CAST(w AS DOUBLE) / tw) / CAST(n AS DOUBLE)) AS rate
         |FROM c, t)
         |SELECT d.doc_id, d.source, d.lang FROM documents d
         |JOIN r ON d.source = r.source
         |WHERE ${QueryModule.duckUnitHash} < r.rate""".stripMargin,
    "tx8b_bpe_pack" ->
      s"""WITH RECURSIVE $BPE_CTES,
         |d AS (SELECT doc.doc_id, doc.source, b.n_bpe AS n_tokens
         |      FROM documents doc JOIN bpe b ON doc.doc_id = b.doc_id),
         |c AS (SELECT doc_id, source, n_tokens,
         |COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tb FROM d)
         |SELECT doc_id, source, n_tokens,
         |CAST(tb // 4096 AS BIGINT) AS seq_id,
         |CAST(tb % 4096 AS BIGINT) AS seq_offset FROM c""".stripMargin,
    // dq4: quantize → per-(label,dim) floor-mean centroid (exact integer
    // pmod form — no float division) → integer d2 → cross-multiplied cut.
    "dq4_embedding_outliers" ->
      """WITH q AS (SELECT vec_id, label, list_transform(CAST(embedding AS DOUBLE[]),
        |  v -> CAST(round(v * 1000000) AS BIGINT)) AS e FROM embeddings),
        |dv AS (SELECT label, j AS pos, e[j] AS v FROM q
        |  CROSS JOIN (SELECT unnest(range(1, 65)) AS j)),
        |cd AS (SELECT label, pos, SUM(v) AS s, COUNT(*) AS n FROM dv GROUP BY label, pos),
        |cm AS (SELECT label, pos, (s - ((s % n + n) % n)) // n AS c FROM cd),
        |ce AS (SELECT label, list(c ORDER BY pos) AS ce FROM cm GROUP BY label),
        |sc AS (SELECT q.vec_id, q.label,
        |  CAST(list_sum(list_transform(range(1, 65),
        |    j -> (q.e[j] - ce.ce[j]) * (q.e[j] - ce.ce[j]))) AS BIGINT) AS d2
        | FROM q JOIN ce ON q.label = ce.label),
        |st AS (SELECT label, SUM(d2) AS sum_d2, COUNT(*) AS n_label FROM sc GROUP BY label)
        |SELECT sc.vec_id, sc.label, sc.d2,
        |  sc.d2 * st.n_label > 2 * st.sum_d2 AS is_outlier
        |FROM sc JOIN st ON sc.label = st.label""".stripMargin,
    "dq3_corpus_report" ->
      s"""WITH $GOPHER_BASE,
         |gp AS (SELECT doc_id, $GOPHER_PASS AS p FROM r)
         |SELECT d.source,
         |CAST(COUNT(*) AS BIGINT) AS n_docs,
         |CAST(SUM(len($TOKS_RAW)) AS BIGINT) AS n_tokens,
         |CAST(SUM(d.n_chars) AS BIGINT) AS n_chars_total,
         |CAST(COUNT(DISTINCT d.lang) AS BIGINT) AS n_langs,
         |CAST(COUNT(*) - COUNT(DISTINCT d.text) AS BIGINT) AS n_dup_texts,
         |CAST(COUNT(*) FILTER (WHERE gp.p) AS BIGINT) AS n_gopher_pass
         |FROM documents d JOIN gp ON d.doc_id = gp.doc_id
         |GROUP BY d.source""".stripMargin,
    "tx6_gopher_rules" ->
      s"""WITH $GOPHER_BASE
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
         |bullet_line_ratio, ellipsis_line_ratio,
         |n_words >= 50 AND n_words <= 100000 AS word_count_ok,
         |mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS mean_word_len_ok,
         |symbol_ratio <= 0.1 AS symbol_ratio_ok,
         |alpha_word_ratio >= 0.8 AS alpha_ok,
         |bullet_line_ratio <= 0.9 AS bullet_ok,
         |ellipsis_line_ratio <= 0.3 AS ellipsis_ok,
         |$GOPHER_PASS AS gopher_pass
         |FROM r""".stripMargin,
    "tx7b_ngram_repetition" ->
      s"""WITH $GOPHER_BASE,
         |repm AS (SELECT doc_id,
         |string_split(text, chr(10)) AS l,
         |string_split(text, chr(10) || chr(10)) AS p FROM documents),
         |rep AS (SELECT doc_id,
         |CAST(len(l) - len(list_distinct(l)) AS DOUBLE) / CAST(greatest(len(l), 1) AS DOUBLE) AS dup_line_ratio,
         |CAST(len(p) - len(list_distinct(p)) AS DOUBLE) / CAST(greatest(len(p), 1) AS DOUBLE) AS dup_para_ratio
         |FROM repm),
         |$NGRAM_CTES
         |SELECT nr.*, $GOPHER_PASS AS gopher_pass,
         |rep.dup_line_ratio <= 0.3 AND rep.dup_para_ratio <= 0.3 AS repetition_pass,
         |($GOPHER_PASS) AND (rep.dup_line_ratio <= 0.3 AND rep.dup_para_ratio <= 0.3)
         |  AND nr.ngram_pass AS gopher_full_pass
         |FROM nr JOIN r ON nr.doc_id = r.doc_id JOIN rep ON nr.doc_id = rep.doc_id""".stripMargin,
    "dd4_ngram_jaccard" ->
      s"""WITH g AS (SELECT doc_id, lang, source, $GRAMS AS grams
         |FROM (SELECT doc_id, lang, source, $TOKS AS toks FROM documents)),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.grams AS ga, b.grams AS gb
         |FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, CAST(len(list_intersect(ga, gb)) AS DOUBLE)
         | / CAST(len(list_distinct(ga || gb)) AS DOUBLE) AS jaccard FROM p""".stripMargin,
    // dd15: the from-scratch recompute — LSH pairs over the FULL corpus
    // (base ∪ batch; signatures don't depend on corpus membership, so the
    // full pair set is exactly basePairs ∪ inc→base ∪ within-batch), then
    // dd6's recursive reachability. Equality with the incremental update
    // is precisely the operator's correctness claim.
    "dd15_incremental_groups" -> DD15_ORACLE,
    // dd15b: same batch, same base, same fold semantics served from the
    // persisted artifacts — the from-scratch recompute is the oracle for
    // both rows (output equivalence IS the serving path's claim).
    "dd15b_groups_served" -> DD15_ORACLE,
    // dd14: exact-Jaccard ground truth over the family-sampled sub-corpus
    // LEFT JOINed with the dd2b LSH replay restricted to the same sample.
    // The jaccard operand order mirrors Dedup.ngramJaccard exactly
    // (inter / ((|a|+|b|) - inter), all doubles) for bit-equal division.
    "dd14_lsh_recall" -> {
      val mins = (1 to 16).map { sd =>
        val (pair, off) = ((sd + 1) / 2, if (sd % 2 == 1) 1 else 17)
        s"MIN(CAST(('0x' || substr(md5(shingle || '#$pair'), $off, 15)) AS BIGINT)) AS h$sd"
      }.mkString(", ")
      val sigList = (1 to 16).map(i => s"h$i").mkString("[", ", ", "]")
      val bandHash = (0 until 4).map { b =>
        val parts = (1 to 4).map(r => s"CAST(sig[${b * 4 + r}] AS VARCHAR)").mkString(", ")
        s"WHEN $b THEN md5(concat_ws(',', $parts))"
      }.mkString(" ")
      val shingle = "unnest(list_transform(range(0, greatest(len(toks) - 3, 0) + 1), " +
        "i -> array_to_string(toks[i+1:i+3], ' ')))"
      val sim = "CAST(list_sum(list_transform(range(1, 17), " +
        "i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 16"
      val uh = "(CAST('0x' || substr(md5(CAST(doc_id % 100000 AS VARCHAR)), 1, 15) AS BIGINT)" +
        " / 1152921504606846976.0)"
      s"""WITH all_docs AS (
         |SELECT doc_id, text FROM documents
         |UNION ALL
         |SELECT doc_id + 100000, text || ' trailing mutation token' FROM documents WHERE doc_id % 7 = 0),
         |samp AS (SELECT doc_id, text FROM all_docs WHERE $uh < 0.2),
         |g AS (SELECT doc_id, $GRAMS AS grams
         |  FROM (SELECT doc_id, $TOKS AS toks FROM samp)),
         |tp AS (SELECT id_a, id_b, inter / (CAST(la + lb AS DOUBLE) - inter) AS jaccard
         |  FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) AS inter,
         |    len(a.grams) AS la, len(b.grams) AS lb
         |  FROM g a JOIN g b ON a.doc_id < b.doc_id)
         |  WHERE inter / (CAST(la + lb AS DOUBLE) - inter) >= 0.5),
         |ex AS (SELECT doc_id AS doc, $shingle AS shingle
         |  FROM (SELECT doc_id, $TOKS AS toks FROM samp)),
         |sigs AS (SELECT doc, $sigList AS sig FROM (SELECT doc, $mins FROM ex GROUP BY doc)),
         |banded AS (SELECT doc, sig, b AS band, CASE b $bandHash END AS band_hash
         |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs),
         |lsh AS (SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
         |  FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc < b.doc
         |  WHERE $sim >= 0.5)
         |SELECT tp.id_a, tp.id_b, tp.jaccard,
         |  l.id_a IS NOT NULL AS found_by_lsh
         |FROM tp LEFT JOIN lsh l ON tp.id_a = l.id_a AND tp.id_b = l.id_b""".stripMargin
    },
    "dd8_substring_spans" ->
      s"""WITH $DD8_CTES
         |SELECT doc_id, CAST(MIN(pos) AS INTEGER) AS span_start,
         | CAST(MAX(pos) + 7 AS INTEGER) AS span_end,
         | CAST(MAX(pos) - MIN(pos) + 8 AS INTEGER) AS span_words
         |FROM isl GROUP BY doc_id, island""".stripMargin,
    // dd8h emits the same spans as dd8 (hashed keys change shuffle payload,
    // not results) — one oracle covers both twins.
    "dd8h_spans_hashed" ->
      s"""WITH $DD8_CTES
         |SELECT doc_id, CAST(MIN(pos) AS INTEGER) AS span_start,
         | CAST(MAX(pos) + 7 AS INTEGER) AS span_end,
         | CAST(MAX(pos) - MIN(pos) + 8 AS INTEGER) AS span_words
         |FROM isl GROUP BY doc_id, island""".stripMargin,
    "dd8b_excised_corpus" ->
      s"""WITH $DD8_CTES,
         |spg AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e FROM isl GROUP BY doc_id, island),
         |spl AS (SELECT doc_id, list([s, e]) AS spans FROM spg GROUP BY doc_id),
         |kept AS (SELECT t.doc_id, t.toks, list_filter(range(0, len(t.toks)),
         |  i -> NOT COALESCE(len(list_filter(sp.spans, s -> i >= s[1] AND i <= s[2])) > 0, FALSE)) AS ki
         |FROM tokd t LEFT JOIN spl sp ON t.doc_id = sp.doc_id)
         |SELECT doc_id, COALESCE(array_to_string(list_transform(ki, i -> toks[i + 1]), ' '), '') AS text_clean,
         | CAST(len(toks) - len(ki) AS INTEGER) AS n_removed FROM kept""".stripMargin,
    // dd2: the default xxhash64 path, verified from the signature side-dump
    // (OracleDumps). Banding groups by the RAW 4-long band slice instead of
    // the band hash — the collision-free equivalent, so an actual xxhash64
    // band collision in Spark would show up as an extra pair here.
    "dd2_minhash_lsh" ->
      s"""WITH sigs AS (SELECT doc, sig FROM ${dump("dd2_sigs")}),
         |banded AS (SELECT doc, sig, b AS band, sig[b*4+1:b*4+4] AS band_key
         |FROM sigs CROSS JOIN (SELECT unnest(range(0, 16)) AS b) bs)
         |SELECT DISTINCT a.doc AS id_a, b.doc AS id_b,
         |CAST(list_sum(list_transform(range(1, 65),
         |  i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 64 AS est_jaccard
         |FROM banded a JOIN banded b
         |ON a.band = b.band AND a.band_key = b.band_key AND a.doc < b.doc
         |WHERE CAST(list_sum(list_transform(range(1, 65),
         |  i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 64 >= 0.5""".stripMargin,
    "dd2b_minhash_portable" -> {
      // seeds 2p-1 / 2p split the #p-salted digest's two 60-bit halves,
      // mirroring Dedup.minhashSignatures' portable path
      val mins = (1 to 16).map { sd =>
        val (pair, off) = ((sd + 1) / 2, if (sd % 2 == 1) 1 else 17)
        s"MIN(CAST(('0x' || substr(md5(shingle || '#$pair'), $off, 15)) AS BIGINT)) AS h$sd"
      }.mkString(", ")
      val sigList = (1 to 16).map(i => s"h$i").mkString("[", ", ", "]")
      def bandHash = (0 until 4).map { b =>
        val parts = (1 to 4).map(r => s"CAST(sig[${b * 4 + r}] AS VARCHAR)").mkString(", ")
        s"WHEN $b THEN md5(concat_ws(',', $parts))"
      }.mkString(" ")
      s"""WITH all_docs AS (
         |SELECT doc_id, text FROM documents
         |UNION ALL
         |SELECT doc_id + 100000, text || ' trailing mutation token' FROM documents WHERE doc_id % 7 = 0),
         |ex AS (SELECT doc_id AS doc,
         |unnest(list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
         |  i -> array_to_string(toks[i+1:i+3], ' '))) AS shingle
         |FROM (SELECT doc_id, $TOKS AS toks FROM all_docs)),
         |mins AS (SELECT doc, $mins FROM ex GROUP BY doc),
         |sigs AS (SELECT doc, $sigList AS sig FROM mins),
         |banded AS (SELECT doc, sig, b AS band, CASE b $bandHash END AS band_hash
         |FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs)
         |SELECT DISTINCT a.doc AS id_a, b.doc AS id_b,
         |CAST(list_sum(list_transform(range(1, 17),
         |  i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 16 AS est_jaccard
         |FROM banded a JOIN banded b
         |ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc < b.doc
         |WHERE CAST(list_sum(list_transform(range(1, 17),
         |  i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 16 >= 0.5""".stripMargin
    },
    // dd12: the bloom is a pure pre-filter (no false negatives + exact
    // verify), so plain fingerprint membership IS the oracle.
    "dd12_bloom_incremental" ->
      """WITH base AS (SELECT md5(array_to_string(regexp_split_to_array(trim(lower(text)), '\s+'), ' ')) AS fingerprint FROM documents),
        |inc AS (
        |SELECT doc_id + 800000 AS doc_id,
        |  md5(array_to_string(regexp_split_to_array(trim(lower(text)), '\s+'), ' ')) AS fingerprint
        |FROM documents WHERE doc_id % 7 = 0
        |UNION ALL
        |SELECT doc_id + 900000 AS doc_id,
        |  md5(array_to_string(regexp_split_to_array(trim(lower(text || ' novel suffix')), '\s+'), ' ')) AS fingerprint
        |FROM documents WHERE doc_id % 7 = 1)
        |SELECT doc_id, fingerprint,
        |  fingerprint IN (SELECT fingerprint FROM base) AS is_dup
        |FROM inc""".stripMargin,
    // dd11: the incremental pipeline replayed end-to-end — base and
    // increment signatures, banding, the inc→base bucket join, jaccard
    // verify and the best-match window (the oracle doesn't model the
    // bucket-size guard, which is inactive below maxBucket — dd2's stance).
    "dd11_incremental_dedup" -> minhashIncOracle(
      "SELECT doc_id, text FROM documents",
      s"""SELECT doc_id + 300000 AS doc_id, text || ' incremental tail drift' AS text
         |FROM base WHERE doc_id % 9 = 0
         |UNION ALL
         |SELECT doc_id + 400000 AS doc_id, array_to_string(list_reverse($TOKS), ' ') AS text
         |FROM base WHERE doc_id % 9 = 1""".stripMargin),
    // dd11b: the index-served path computes the SAME pipeline as dd11 from
    // persisted signatures, so the oracle is dd11's replay with batch 2's
    // increment construction (the oracle recomputes base signatures from
    // text — serve-time scan economics are a plan property, asserted in
    // PlanSpec, not a value property).
    "dd11b_index_served" -> minhashIncOracle(
      "SELECT doc_id, text FROM documents",
      s"""SELECT doc_id + 600000 AS doc_id, text || ' second batch tail' AS text
         |FROM base WHERE doc_id % 9 = 3
         |UNION ALL
         |SELECT doc_id + 700000 AS doc_id, array_to_string(list_reverse($TOKS), ' ') AS text
         |FROM base WHERE doc_id % 9 = 4""".stripMargin),
    // st15: two per-batch replays of the incremental pipeline, unioned —
    // batch 1 against documents, batch 2 against documents ∪ batch 1 (the
    // fold-in). Each side is the dd11 oracle with the respective base/inc
    // constructions.
    "st15_stream_neardup_ingest" -> {
      val b1 = minhashIncOracle(
        "SELECT doc_id, text FROM documents",
        s"""SELECT doc_id + 510000 AS doc_id, text || ' stream batch one' AS text
           |FROM base WHERE doc_id % 9 = 5""".stripMargin)
      val b2 = minhashIncOracle(
        s"""SELECT doc_id, text FROM documents
           |UNION ALL
           |SELECT doc_id + 510000 AS doc_id, text || ' stream batch one' AS text
           |FROM documents WHERE doc_id % 9 = 5""".stripMargin,
        s"""SELECT doc_id + 620000 AS doc_id, text || ' stream batch two' AS text
           |FROM base WHERE doc_id < 510000 AND doc_id % 9 = 6
           |UNION ALL
           |SELECT doc_id + 300000 AS doc_id, text || ' extra' AS text
           |FROM base WHERE doc_id >= 510000""".stripMargin)
      s"SELECT * FROM ($b1) UNION ALL SELECT * FROM ($b2)"
    },

    // dd13: the appended index serves against base ∪ batch-1 — the oracle's
    // base side is exactly that union (batch-1's construction inlined), the
    // increment is batch 2 including the near-dup-of-batch-1 group whose
    // best match must resolve to an APPENDED member.
    "dd13_lsh_index_append" -> minhashIncOracle(
      s"""SELECT doc_id, text FROM documents
         |UNION ALL
         |SELECT doc_id + 500000 AS doc_id, text || ' first batch drift' AS text
         |FROM documents WHERE doc_id % 9 = 2""".stripMargin,
      s"""SELECT doc_id + 600000 AS doc_id, text || ' second batch tail' AS text
         |FROM base WHERE doc_id < 500000 AND doc_id % 9 = 3
         |UNION ALL
         |SELECT doc_id + 300000 AS doc_id, text || ' extra' AS text
         |FROM base WHERE doc_id >= 500000""".stripMargin),
    // dd3: default xxhash64 path from the signature side-dump — banding,
    // bucket pairing and the hamming cut are pure bit arithmetic replayed
    // on the dumped 64-bit signatures.
    "dd3_simhash" ->
      s"""WITH sigs AS (SELECT doc, sig FROM ${dump("dd3_sigs")}),
         |banded AS (SELECT doc, sig, b AS band, (sig >> (b * 16)) & 65535 AS band_bits
         |FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs)
         |SELECT DISTINCT a.doc AS id_a, b.doc AS id_b,
         |bit_count(xor(a.sig, b.sig)) AS hamming
         |FROM banded a JOIN banded b
         |ON a.band = b.band AND a.band_bits = b.band_bits AND a.doc < b.doc
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin,
    "dd3b_simhash_portable" -> {
      val votes = (0 until 60).map(j =>
        s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j").mkString(", ")
      val packed = (0 until 60).map(j =>
        s"CASE WHEN b$j > 0 THEN (CAST(1 AS BIGINT) << $j) ELSE CAST(0 AS BIGINT) END")
        .mkString(" + ")
      s"""WITH all_docs AS (
         |SELECT doc_id, text FROM documents
         |UNION ALL
         |SELECT doc_id + 100000, text || ' zz' FROM documents WHERE doc_id % 7 = 0),
         |tok AS (SELECT doc_id AS doc, unnest(toks) AS t
         |FROM (SELECT doc_id, $TOKS AS toks FROM all_docs)),
         |h AS (SELECT doc, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h FROM tok),
         |votes AS (SELECT doc, $votes FROM h GROUP BY doc),
         |sigs AS (SELECT doc, $packed AS sig FROM votes),
         |banded AS (SELECT doc, sig, b AS band, (sig >> (b * 15)) & 32767 AS band_bits
         |FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs)
         |SELECT DISTINCT a.doc AS id_a, b.doc AS id_b,
         |bit_count(xor(a.sig, b.sig)) AS hamming
         |FROM banded a JOIN banded b
         |ON a.band = b.band AND a.band_bits = b.band_bits AND a.doc < b.doc
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin
    },
    "dd6_dup_groups" ->
      s"""WITH RECURSIVE $DD6_CTES
         |SELECT id AS doc_id, MIN(label) AS group_id FROM reach GROUP BY id""".stripMargin,
    "dd7_dedup_corpus" ->
      s"""WITH RECURSIVE $DD6_CTES,
         |grp AS (SELECT id AS doc_id, MIN(label) AS group_id FROM reach GROUP BY id),
         |tagged AS (SELECT a.doc_id, COALESCE(g.group_id, a.doc_id) AS group_id
         |FROM all_docs a LEFT JOIN grp g ON a.doc_id = g.doc_id)
         |SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, CAST(group_id AS BIGINT) AS group_id,
         |CAST(COUNT(*) AS BIGINT) AS group_size
         |FROM tagged GROUP BY group_id""".stripMargin,
    "dd5_embedding_dups" ->
      """WITH all_e AS (
        |SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings
        |UNION ALL
        |SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]), label FROM embeddings WHERE vec_id % 11 = 0)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS block,
        |round(list_cosine_similarity(a.e, b.e), 6) AS cosine
        |FROM all_e a JOIN all_e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.98""".stripMargin,
    "ann1_bruteforce_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings)
        |SELECT query_id, neighbor_id, cosine, rank FROM (
        |SELECT query_id, neighbor_id, round(list_cosine_similarity(qe, ce), 6) AS cosine,
        |ROW_NUMBER() OVER (PARTITION BY query_id
        |ORDER BY round(list_cosine_similarity(qe, ce), 6) DESC, neighbor_id) AS rank
        |FROM q, c WHERE query_id <> neighbor_id)
        |WHERE rank <= 5""".stripMargin,
    // ann13: the ann1 replay with the corpus side pre-filtered by the
    // metadata predicate — ranks computed AFTER the filter
    "ann13_filtered_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT e.vec_id AS neighbor_id, CAST(e.embedding AS DOUBLE[]) AS ce
        |FROM embeddings e WHERE e.vec_id IN
        |  (SELECT doc_id FROM documents WHERE lang = 'en'))
        |SELECT query_id, neighbor_id, cosine, rank FROM (
        |SELECT query_id, neighbor_id, round(list_cosine_similarity(qe, ce), 6) AS cosine,
        |ROW_NUMBER() OVER (PARTITION BY query_id
        |ORDER BY round(list_cosine_similarity(qe, ce), 6) DESC, neighbor_id) AS rank
        |FROM q, c WHERE query_id <> neighbor_id)
        |WHERE rank <= 5""".stripMargin,
    // ann2: default xxhash64-seeded planes — bucket assignment comes from
    // the side-dump; candidate generation, cosine scoring and ranking are
    // re-derived here (same downstream as the ann2b twin).
    "ann2_lsh_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |b AS (SELECT e.vec_id, e.emb, d.bucket
         |FROM e JOIN ${dump("ann2_buckets")} d USING (vec_id))
         |SELECT query_id, neighbor_id, bucket, cosine, rank FROM (
         |SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id, a.bucket,
         |round(list_cosine_similarity(a.emb, c.emb), 6) AS cosine,
         |ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |ORDER BY round(list_cosine_similarity(a.emb, c.emb), 6) DESC, c.vec_id) AS rank
         |FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id)
         |WHERE rank <= 5""".stripMargin,
    "ann2b_lsh_portable" -> {
      val sign = (p: Int) =>
        s"CASE WHEN CAST(('0x' || substr(md5('plane${p}_' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) & 1 = 1 " +
          "THEN 1.0 ELSE -1.0 END"
      val bucket = (0 until 8).map { p =>
        s"CASE WHEN list_sum(list_transform(range(0, len(emb)), i -> emb[i+1] * ${sign(p)})) > 0 " +
          s"THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
      }.mkString(" + ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |b AS (SELECT vec_id, emb, $bucket AS bucket FROM e)
         |SELECT query_id, neighbor_id, bucket, cosine, rank FROM (
         |SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id, a.bucket,
         |round(list_cosine_similarity(a.emb, c.emb), 6) AS cosine,
         |ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |ORDER BY round(list_cosine_similarity(a.emb, c.emb), 6) DESC, c.vec_id) AS rank
         |FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id)
         |WHERE rank <= 5""".stripMargin
    },
    // ann8: micro-quantize, per-dim integer [min,max], the same DIV code
    // map (nonnegative operands — // and DIV agree), integer L2, rank.
    "ann8_sq_topk" ->
      """WITH q AS (SELECT vec_id, label, list_transform(CAST(embedding AS DOUBLE[]),
        |  v -> CAST(round(v * 1000000) AS BIGINT)) AS e FROM embeddings),
        |dv AS (SELECT j AS pos, e[j] AS v FROM q
        |  CROSS JOIN (SELECT unnest(range(1, 65)) AS j)),
        |rg AS (SELECT pos, MIN(v) AS lo, MAX(v) AS hi FROM dv GROUP BY pos),
        |mm AS (SELECT list(lo ORDER BY pos) AS mn, list(hi ORDER BY pos) AS mx FROM rg),
        |cd AS (SELECT vec_id, label,
        |  list_transform(range(1, 65), i -> CASE WHEN mx[i] = mn[i] THEN 0
        |    ELSE ((e[i] - mn[i]) * 255) // (mx[i] - mn[i]) END) AS code
        | FROM q CROSS JOIN mm),
        |sc AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |  CAST(a.label AS VARCHAR) AS block,
        |  CAST(list_sum(list_transform(range(1, 65),
        |    i -> (a.code[i] - b.code[i]) * (a.code[i] - b.code[i]))) AS BIGINT) AS d2
        | FROM cd a JOIN cd b ON a.label = b.label AND a.vec_id <> b.vec_id)
        |SELECT query_id, neighbor_id, block, d2, CAST(rank AS INTEGER) AS rank FROM (
        | SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
        | FROM sc) WHERE rank <= 3""".stripMargin,
    "ann3_ivf_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings)
        |SELECT query_id, neighbor_id, block, cosine, rank FROM (
        |SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.label AS block,
        |round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine,
        |ROW_NUMBER() OVER (PARTITION BY a.vec_id
        |ORDER BY round(list_cosine_similarity(a.emb, b.emb), 6) DESC, b.vec_id) AS rank
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id)
        |WHERE rank <= 3""".stripMargin,
    "tx1_langid" ->
      s"""WITH s AS (SELECT doc_id, lang AS labeled_lang,
         |${ratio(graft.text.TextOps.stopwords("en"))} AS s_en,
         |${ratio(graft.text.TextOps.stopwords("es"))} AS s_es,
         |${ratio(graft.text.TextOps.stopwords("de"))} AS s_de,
         |${ratio(graft.text.TextOps.stopwords("fr"))} AS s_fr
         |FROM (SELECT doc_id, lang, $TOKS AS toks FROM documents))
         |SELECT doc_id, labeled_lang,
         |CASE WHEN greatest(s_en, s_es, s_de, s_fr) <= 0 THEN 'unknown'
         |WHEN s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de THEN 'fr'
         |WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
         |WHEN s_en >= s_de THEN 'en'
         |ELSE 'de' END AS detected_lang FROM s""".stripMargin,
    // x4b: isolation-forest replay — daily features re-derived from events,
    // each day walked down the DUMPED fitted trees (recursive CTE; node 0 is
    // every tree's root, leaves stop the recursion), path length
    // depth + c(leaf_size), score 2^(-mean/c(psi)). Feature list order must
    // match AnomalyDetection.FeatCols (the trees' feature index points into
    // it); total_value imputes NULL→0.0 for scoring only, as the Scala fit
    // does. Score rounded to 1e-6 on both sides (float sum order).
    "x4b_ml_anomaly" -> {
      val cOf = (m: String) => s"CASE WHEN $m <= 1 THEN 0.0 ELSE " +
        s"2.0 * (ln($m - 1.0) + 0.5772156649015329) - 2.0 * ($m - 1.0) / $m END"
      s"""WITH RECURSIVE daily AS (
         |SELECT CAST(ts AS DATE) AS event_date,
         |CAST(COUNT(*) AS DOUBLE) AS event_cnt,
         |CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS active_users,
         |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         |COUNT(*) FILTER (WHERE event_type = 'error') * 100.0 / COUNT(*) AS error_pct,
         |CAST(COUNT(DISTINCT EXTRACT(hour FROM ts)) AS DOUBLE) AS active_hours
         |FROM events GROUP BY CAST(ts AS DATE)),
         |nodes AS (SELECT * FROM ${dump("x4b_forest")}),
         |walk AS (
         |SELECT d.event_date, n.tree, n.is_leaf, n.leaf_size, n.lo, n.hi,
         |n.feature, n.split, 0 AS depth,
         |[d.event_cnt, d.active_users, COALESCE(d.total_value, 0.0),
         | d.error_pct, d.active_hours] AS x
         |FROM daily d JOIN nodes n ON n.node = 0
         |UNION ALL
         |SELECT w.event_date, n.tree, n.is_leaf, n.leaf_size, n.lo, n.hi,
         |n.feature, n.split, w.depth + 1, w.x
         |FROM walk w JOIN nodes n ON n.tree = w.tree
         |AND n.node = CASE WHEN w.x[w.feature + 1] < w.split THEN w.lo ELSE w.hi END
         |WHERE NOT w.is_leaf),
         |paths AS (
         |SELECT event_date,
         |depth + ${cOf("leaf_size")} AS plen
         |FROM walk WHERE is_leaf),
         |psi_t AS (SELECT MAX(psi) AS psi FROM nodes),
         |scores AS (
         |SELECT event_date,
         |pow(2.0, -(SUM(plen) / COUNT(*)) / GREATEST(${cOf("psi")}, 1e-12)) AS raw_score
         |FROM paths CROSS JOIN psi_t GROUP BY event_date, psi),
         |ranked AS (
         |SELECT d.*, s.raw_score,
         |ROW_NUMBER() OVER (ORDER BY s.raw_score DESC, d.event_date ASC NULLS FIRST) AS rk,
         |COUNT(*) OVER () AS n
         |FROM daily d JOIN scores s ON d.event_date IS NOT DISTINCT FROM s.event_date)
         |SELECT event_date, event_cnt, active_users, total_value, error_pct, active_hours,
         |round(raw_score, 6) AS anomaly_score,
         |rk <= GREATEST(1, CAST(round(n * 0.1) AS BIGINT)) AS is_anomaly
         |FROM ranked""".stripMargin
    },
    "dq1_quality_checks" ->
      """SELECT 'documents' AS table_name, row_cnt, null_text_cnt,
        |row_cnt - distinct_text_cnt AS dup_cnt,
        |row_cnt >= 100 AS row_floor_ok,
        |CAST(null_text_cnt AS DOUBLE) / row_cnt <= 0.10 AS null_rate_ok,
        |CAST(row_cnt - distinct_text_cnt AS DOUBLE) / row_cnt <= 0.05 AS dup_rate_ok
        |FROM (SELECT COUNT(*) AS row_cnt,
        |COUNT(*) FILTER (WHERE text IS NULL) AS null_text_cnt,
        |COUNT(DISTINCT text) AS distinct_text_cnt FROM documents)""".stripMargin
  )
}

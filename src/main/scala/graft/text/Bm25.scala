package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** tx17: BM25 retrieval over the corpus — the ranked-lookup primitive a
  * curation pipeline uses for decontamination mining (find training docs
  * matching eval-set queries), targeted quality audits, and hard-negative
  * mining. Robertson/Sparck Jones BM25 (k1 = 1.2, b = 0.75) with one
  * deliberate variant: the idf factor is the RATIONAL odds form
  * `(N − df + 0.5) / (df + 0.5)` rather than its logarithm. ln reintroduces
  * libm's engine-specific last-ulp behavior (the same reason
  * [[LmScore]] reports mean-P, not perplexity); dropping the monotone log
  * preserves each term's idf ORDERING exactly and keeps every arithmetic
  * step reproducible bit-for-bit in any engine. Per-term scores are
  * quantized to DECIMAL(18,12) before the order-independent exact sum, so
  * shuffle nondeterminism cannot flip a ranking bit.
  *
  * 100 TB story, stage by stage:
  *   - The corpus is tokenized EXACTLY ONCE: one projection computes
  *     (doc_id, dl, query-matched tokens) — the query-term set is
  *     control-plane-sized (the same bound that would let it broadcast),
  *     so collected it becomes a map-side array filter — and that narrow
  *     frame (an id, an int, and only matching tokens) persists
  *     MEMORY_AND_DISK as the single source both consumers read. At 100 TB
  *     tokenization is the dominant map-side cost; the previous shape paid
  *     it twice (once for postings, once inside the Σdl aggregate).
  *   - Postings explode from the persisted matched tokens, so the tf
  *     groupBy's exchange carries query-matched tokens, not the corpus.
  *   - df and the global (N, Σdl) statistics are aggregates over the
  *     (already tiny) tf frame and the SAME persisted projection;
  *     both broadcast back as 1-row/term-count frames.
  *   - Top-k per query is TWO-STAGE: a first row_number inside
  *     (query, salt) sub-partitions keeps ≤ k candidates per salt, the
  *     final rank orders ≤ k·`saltParts` rows per query — a hot query whose
  *     term matches half the corpus never funnels that half into one
  *     window task (the same bound [[graft.ops.Skew]] gives joins).
  *     Exact because a global top-k row is top-k within its salt too.
  */
object Bm25 {

  /** Largest query vocabulary inlined as an In-list filter; above this the
    * term match degrades to a broadcast semi-join (see [[topK]]). */
  val MaxInlineTerms: Int = 10000

  /** `docs(idCol, textCol)` scored against `queries(query_id, term)`;
    * returns the top `topK` docs per query with rank, score, and the number
    * of matched query terms. Terms are matched on whitespace tokens of
    * `lower(text)`.
    */
  def topK(docs: DataFrame, queries: DataFrame, idCol: String, textCol: String,
      topK: Int = 10, saltParts: Int = 32,
      maxInlineTerms: Int = MaxInlineTerms): DataFrame = {
    val toks = TextOps.tokens(lower(col(textCol)))
    // single-tokenize projection (see scale note): dl + query-matched tokens
    // in one pass, persisted narrow so stats and postings never re-tokenize.
    // Cache lifecycle contract: pinned until session end, a caller sweep
    // (clearCache — the bench isolation pattern), or the deterministic
    // graft.ops.PinnedCaches.release() handle;
    // repeat calls with the SAME docs+queries reuse the entry (CacheManager
    // canonical-plan match), but per-batch query sets each pin a copy — a
    // serving deployment should materialize the tokenized projection once
    // (parquet) and score batches against it, the writeLshIndex shape.
    // Inline the term set as a map-side array filter only while it is
    // provably control-plane-sized: the collect is capped at MaxInlineTerms
    // (limit n+1, so an oversized vocabulary is detected without draining
    // it to the driver). Above the cap, fall back to the broadcast
    // semi-join shape — the explode then carries the full corpus (the
    // pre-inline cost), but driver memory and plan size stay bounded.
    // An EMPTY query set is well-defined on both paths: isInCollection
    // over zero values is false for every token (no terms → no matches).
    val distinctTerms = queries.select(col("term")).distinct()
    val termList = distinctTerms.limit(maxInlineTerms + 1)
      .collect().map(_.getString(0)).toSeq
    val inlineTerms = termList.size <= maxInlineTerms
    val tokenized = graft.ops.PinnedCaches.pin(docs
      .select(col(idCol).as("doc_id"), size(toks).as("dl"),
        (if (inlineTerms) filter(toks, t => t.isInCollection(termList))
         else toks).as("__qtoks")))
    val posted = tokenized
      .select(col("doc_id"), col("dl"), explode(col("__qtoks")).as("term"))
    val tf = (if (inlineTerms) posted
              else posted.join(broadcast(distinctTerms), Seq("term"), "left_semi"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    // df per query term (the tf frame is already query-term-scoped) and the
    // global corpus stats; both control-plane-small, both broadcast
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = tokenized.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens"))
    val scoredTerms = tf
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(queries), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        // every factor written in the exact operand order the oracle uses;
        // constants pre-folded (k1+1 = 2.2, 1−b = 0.25, k1·b = shown as
        // 1.2 * (0.25 + 0.75·dl/avgdl)) so both engines run the same ops
        (((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))) *
          (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl").cast("double") /
              (col("total_tokens").cast("double") / col("n_docs").cast("double")))))
          .cast("decimal(18,12)").as("term_score"))
    // exact decimal sum, then ONE double conversion: the ranking key is the
    // same IEEE double in any engine (summing doubles directly would expose
    // shuffle-order-dependent rounding)
    val perDoc = scoredTerms
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_score")).as("__ssum"), count(lit(1)).as("matched_terms"))
      .select(col("query_id"), col("doc_id"),
        col("__ssum").cast("double").as("score"), col("matched_terms"))
    // two-stage top-k (see scale note): salt-local prune, then final rank
    val salted = perDoc
      .withColumn("__salt", pmod(col("doc_id"), lit(saltParts)))
      .withColumn("__srn", row_number().over(Window
        .partitionBy(col("query_id"), col("__salt"))
        .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("__srn") <= topK)
    salted
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"),
        col("matched_terms"))
  }
}

package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — combine independently-ranked retrieval legs
  * (sparse BM25, dense ANN, ...) into one list per query with reciprocal
  * rank fusion (Cormack et al., SIGIR 2009): each leg contributes
  * 1/(rrfK + rank) for the ids it ranked, missing ids contribute 0.
  *
  * RRF is the standard first fusion in RAG / retrieval-corpus curation
  * because it needs no score calibration across legs — only ranks cross
  * the fusion boundary, which also makes the fused score cross-engine
  * exact (integer ranks → one IEEE division per leg, summed in the fixed
  * leg order; no engine-ordered float accumulation).
  *
  * Scale shape: each leg arrives already top-k'd (per query), so the
  * fusion input is queries×k rows per leg — orders of magnitude below the
  * corpora the legs scanned. The spine (distinct (query, id)) and the
  * per-leg rank lookups are plain hash joins on (query_id, id); nothing
  * here touches text or vectors, so fusion cost is independent of corpus
  * size. The final per-query rank is a window over ≤ Σ leg-k rows per
  * query — no global sort.
  */
object Hybrid {

  /** Fuse ranked legs into the top `k` per query.
    *
    * Each leg is (name, frame) where the frame has columns
    * `(query_id, id, rank)` — its top-k for every query, rank 1-based.
    * Output: `(query_id, id, rrf_score, <name>_rank ... per leg, rank)`
    * with rank 1..k per query by (rrf_score desc, id asc). Leg rank
    * columns are null where that leg did not rank the id.
    */
  def rrfFuse(legs: Seq[(String, DataFrame)], k: Int, rrfK: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one leg")
    require(legs.map(_._1).distinct.size == legs.size, "leg names must be unique")
    // Each leg has TWO consumers (the spine union and its own rank join),
    // whose differing projections canonicalize differently — without a
    // materialization point the whole retrieval pipeline behind a leg
    // (a BM25 corpus scan, an ANN search) executes once per consumer
    // (r20 profile of ann12: both legs' source stages ran twice). The legs
    // are top-k'd per query BY CONTRACT — queries×k rows at any corpus
    // size — so a block-level pin is bounded; PinnedCaches.release is the
    // caller's deterministic release handle.
    val prepared = legs.map { case (name, df) =>
      name -> graft.ops.PinnedCaches.pin(df.select(col("query_id"), col("id"),
        col("rank").cast("int").as(s"${name}_rank")))
    }
    // Spine = every (query, id) any leg ranked; then one left join per leg.
    // The score sums coalesced terms in the caller's leg order, so the
    // addition order is fixed regardless of join/shuffle order.
    val spine = prepared.map { case (_, df) => df.select(col("query_id"), col("id")) }
      .reduce(_ unionByName _).distinct()
    val joined = prepared.foldLeft(spine) { case (acc, (name, df)) =>
      acc.join(df, Seq("query_id", "id"), "left")
    }
    val score: Column = prepared.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(rrfK).cast("double") + col(s"${name}_rank").cast("double")),
        lit(0.0))
    }.reduce(_ + _)
    joined
      .withColumn("rrf_score", score)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_score").desc, col("id"))))
      .filter(col("rank") <= k)
  }
}

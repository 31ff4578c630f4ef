package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection (SP9; beyond-reference) — diverse-
  * subset sampling for training data: pick the k vectors that best COVER
  * the embedding space (farthest-point traversal, Gonzalez 1985; the
  * coreset active-selection of Sener & Savarese, ICLR 2018). Unlike the
  * sp1–sp6 samplers (which draw by key/quota/temperature), the selection
  * here depends on geometry: each step takes the vector farthest from
  * everything already chosen, so near-duplicate regions contribute one
  * representative and outlying regions are guaranteed representation —
  * the greedy solution is a 2-approximation of the optimal k-center cover.
  *
  * Execution shape: k driver-bounded iterations (like Pq's Lloyd step and
  * BpeTrain's argmax — control-plane collects of ONE row each); iteration i
  * updates a persisted per-vector `min_d2` with ONE map-side `least` against
  * the new center (broadcast as a literal) and takes a top-1 ordered limit
  * (TakeOrdered — no full sort, no shuffle of vectors). Total cost k linear
  * passes, the known price of exact greedy k-center; at 100 TB you run it
  * on a pre-sampled/pre-deduped tier (sp2/dd10's output), not the raw
  * corpus, and k stays human-sized (a coreset, not a partition).
  *
  * Exactness: embeddings quantize to integer micros ([[Pq.quantize]]), so
  * every distance is an exact long and the argmax tie-break is total
  * (min_d2 desc, vec_id asc) — the DuckDB oracle replays all k stages.
  */
object Coreset {

  private def d2To(e: Column, center: Seq[Long]): Column =
    aggregate(
      zip_with(e, typedLit(center), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** Select `k` centers; returns (iter, vec_id, d2) — d2 is the vector's
    * distance to the nearest PREVIOUS center at selection time (the cover
    * radius achieved by the first `iter` centers; 0 for the seed). The seed
    * is the smallest vec_id — deterministic at any parallelism. Requires
    * k ≥ distinct-vector support: selecting past exhaustion (max min_d2 = 0
    * with duplicates everywhere) stops early with fewer rows.
    */
  def kCenter(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    val spark = emb.sparkSession
    import spark.implicits._
    val q = emb.select(col("vec_id"), Pq.quantize(col("embedding")).as("e"))
    val seedRow = q.orderBy(col("vec_id")).limit(1)
      .collect().headOption.getOrElse(throw new IllegalArgumentException("empty corpus"))
    val seed = (seedRow.getLong(0), seedRow.getSeq[Long](1).toSeq)
    val selected = scala.collection.mutable.ListBuffer[(Int, Long, Long)]((0, seed._1, 0L))
    var state = q.withColumn("min_d2", d2To(col("e"), seed._2)).persist()
    state.count()
    var i = 1
    var exhausted = false
    while (i < k && !exhausted) {
      val top = state.orderBy(col("min_d2").desc, col("vec_id")).limit(1).collect()
      top.headOption match {
        case Some(r) if r.getAs[Long]("min_d2") > 0L =>
          val (id, vec, d2) = (r.getLong(0), r.getSeq[Long](1).toSeq, r.getAs[Long]("min_d2"))
          selected += ((i, id, d2))
          val next = state
            .withColumn("min_d2", least(col("min_d2"), d2To(col("e"), vec)))
            .persist()
          next.count()
          state.unpersist()
          state = next
          i += 1
        case _ => exhausted = true // every remaining vector is a duplicate of a center
      }
    }
    state.unpersist()
    selected.toSeq.toDF("iter", "vec_id", "d2")
  }
}

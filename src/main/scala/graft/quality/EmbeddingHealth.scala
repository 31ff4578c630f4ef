package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dq4: embedding-space health / outlier report — the sanity gate a
  * pipeline runs over a fresh embedding batch before letting it near
  * dedup (dd5/dd10) or retrieval (ann*): vectors far from their group's
  * centroid are suspect (encoder regressions, corrupt inputs, mislabeled
  * groups). Flags every vector whose squared distance to its label
  * centroid exceeds `ratio`× the label's mean squared distance.
  *
  * Exactness (full DuckDB oracle): embeddings quantize to integer micros
  * ([[graft.ann.Pq.quantize]]'s convention), centroids are per-dimension
  * floor(sum/count) in pure integer arithmetic (the `(s − pmod(s, n)) / n`
  * form, identical in any engine regardless of negative-division
  * semantics), distances are integer sums, and the outlier cut is the
  * cross-multiplied compare `n·d2 > ratio·Σd2` — no division, no doubles,
  * no rounding anywhere.
  *
  * Overflow discipline: a per-vector d2 is bounded by dims·(2·2²¹)² ≈
  * 2⁴⁸·dims (exact in a long), but the per-label Σd2 and the
  * cross-multiplied d2·n_label exceed 2⁶³ once a label holds a few
  * million vectors — Spark (non-ANSI) would wrap silently while DuckDB
  * promotes to HUGEINT. Both therefore accumulate/compare in
  * decimal(38,0), which holds the products exactly to ~10³⁸ and matches
  * the oracle's HUGEINT arithmetic bit-for-bit at any corpus scale. The
  * per-dimension centroid sums stay long: |micro| ≤ 2²¹, so they are
  * exact below ~2⁴¹ vectors per label — a bound 12 orders above the Σd2
  * one, and keeping them integral preserves the engine-portable %/DIV
  * floor-mean form.
  *
  * 100 TB story: centroids come from one explode + (label, dim) groupBy
  * whose result is labels×dims rows — control-plane-sized — and broadcast
  * back; per-vector distance is one map-side zip_with fold; the per-label
  * Σd2 is a second small aggregate broadcast back for the flag. Two passes
  * over the vectors (centroid fit, then score) — the same shape as any
  * fit-then-apply step — with only dim-level and label-level rows ever
  * shuffled.
  */
object EmbeddingHealth {

  def outlierReport(emb: DataFrame, idCol: String, embCol: String,
      labelCol: String, ratio: Int = 2): DataFrame = {
    val q = emb.select(col(idCol).as("vec_id"), col(labelCol).as("label"),
      graft.ann.Pq.quantize(col(embCol)).as("e"))
    // per-(label, dim) integer sums → floor-mean centroid, rebuilt into an
    // ordered array (array_sort on (pos, c) structs — deterministic)
    val cent = q
      .select(col("label"), posexplode(col("e")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        expr("(s - ((s % n + n) % n)) DIV n").as("c"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("ce"))
    val scored = q.join(broadcast(cent), Seq("label"))
      .select(col("vec_id"), col("label"),
        aggregate(zip_with(col("e"), col("ce"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, v) => acc + v).as("d2"))
    val stats = scored.groupBy(col("label"))
      .agg(sum(col("d2").cast("decimal(38,0)")).as("sum_d2"),
        count(lit(1)).as("n_label"))
    scored.join(broadcast(stats), Seq("label"))
      .select(col("vec_id"), col("label"), col("d2"),
        (col("d2").cast("decimal(38,0)") * col("n_label") >
          lit(ratio.toLong) * col("sum_d2")).as("is_outlier"))
  }

  /** dq5: index-fit drift — PSI between an increment's and the base's
    * occupancy histograms over a trained coarse quantizer's lists (x7's
    * smoothed Σ (p−q)·ln(p/q), verdict at the conventional 0.2). An
    * increment the quantizer fits occupies lists roughly like the base
    * did; distribution shift piles it into few lists — degrading per-list
    * depth and recall — and the PSI says so BEFORE recall quietly sinks,
    * which is what makes [[graft.ann.Pq.appendIvfIndex]]'s no-retrain
    * trade measured rather than silent.
    *
    * Scale shape: home lists are map-side (CoarseProbes codegen), the
    * only exchange is the nlist-cardinality count, and the PSI window runs
    * over a control-plane-sized frame. Counts are exact longs; psi rounds
    * to 6 dp (ln's last ulp may differ across engines).
    */
  def indexDriftPsi(emb: DataFrame, isInc: org.apache.spark.sql.Column,
      cents: Array[Array[Long]], embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = emb
      .select(graft.ann.Pq.coarseAssign(col(embCol), cents).as("block"),
        isInc.as("is_inc"))
      .groupBy(col("block"))
      .agg(
        sum(when(!col("is_inc"), 1L).otherwise(0L)).as("n_base"),
        sum(when(col("is_inc"), 1L).otherwise(0L)).as("n_inc"))
    val w = Window.partitionBy(lit(1))
    val p = (col("n_base") + 1).cast("double") / sum((col("n_base") + 1).cast("double")).over(w)
    val q = (col("n_inc") + 1).cast("double") / sum((col("n_inc") + 1).cast("double")).over(w)
    counts
      .withColumn("psi", round(sum((p - q) * log(p / q)).over(w), 6))
      .select(col("block"), col("n_base"), col("n_inc"), col("psi"),
        (col("psi") > lit(0.2)).as("drift_detected"))
  }
}

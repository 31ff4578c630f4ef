package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ML anomaly scoring over daily sync metrics (ref
  * `anomaly_detection_agent.py:45-205`). The reference extracts per-day
  * features (row counts, distinct users, error rates, hour-of-day spread)
  * and scores them with sklearn's IsolationForest; scoring here runs the
  * same algorithm via the pure-Scala [[IsolationForestModel]] (random
  * sub-sampled trees, `2^(-E[h]/c(ψ))` scores) — same contamination-fraction
  * flagging contract, same model family, deterministic under a fixed seed.
  * (Rounds 1–5 substituted KMeans distance-to-centroid; that deviation is
  * gone.)
  *
  * Scale note: feature extraction is one groupBy(day) over the event log
  * (map-side combined); the model fits on one row per day — thousands of
  * rows even for a decade — so fit + score are a driver-side blink
  * (control-plane, like the merge path's touched-partition list) while the
  * scan stays distributed, and the scores broadcast-join back onto the
  * daily frame.
  */
object AnomalyDetection {

  /** Daily metric features (ref `anomaly_detection_agent.py:45-83`). */
  def dailyFeatures(events: DataFrame): DataFrame =
    events.groupBy(col("ts").cast("date").as("event_date"))
      .agg(
        count(lit(1)).cast("double").as("event_cnt"),
        countDistinct(col("user_id")).cast("double").as("active_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        (count_if(col("event_type") === "error") * 100.0 / count(lit(1))).as("error_pct"),
        countDistinct(hour(col("ts"))).cast("double").as("active_hours"))

  /** Score each day with an isolation forest over the raw daily features
    * (sklearn doesn't standardize either — tree splits are scale-free);
    * `is_anomaly` flags the top `contamination` fraction — the
    * IsolationForest contamination contract (`anomaly_detection_agent.py:139`).
    */
  def score(daily: DataFrame, numTrees: Int = 100, contamination: Double = 0.1,
      seed: Long = 42L): DataFrame = {
    val featCols = Seq("event_cnt", "active_users", "total_value", "error_pct", "active_hours")
    // The daily aggregate feeds BOTH the driver-side collect and the joined
    // result — cache it (one row per day, tiny) or the full event scan +
    // groupBy runs twice: once here, once when the returned join evaluates.
    val cached = daily.cache()
    // One row per day = control-plane-small at any event volume. Sorted
    // before collect so the seeded RNG stream maps onto the same rows
    // regardless of partitioning — scores are reproducible across cluster
    // layouts.
    val collected = cached
      .select((col("event_date") +: featCols.map(col)): _*)
      .orderBy(col("event_date"))
      .collect()
    val feats: IndexedSeq[Array[Double]] =
      collected.toIndexedSeq.map(r => Array.tabulate(featCols.length)(i => r.getDouble(i + 1)))
    val forest = IsolationForestModel.fit(feats, numTrees, seed = seed)
    val scores = feats.map(IsolationForestModel.score(forest, _))
    val n = collected.length
    val cutoffRank = math.max(1L, math.round(n * contamination))
    // deterministic flagging: rank by (score desc, date) like the previous
    // window tie-break; a null day (null-ts events group) sorts first like
    // the window's default nulls-first instead of NPE-ing
    val ranked = collected.indices
      .sortBy(i => (-scores(i),
        Option(collected(i).getDate(0)).map(_.getTime).getOrElse(Long.MinValue)))
      .zipWithIndex.map { case (i, rank) => i -> (rank < cutoffRank) }.toMap
    val scored = collected.indices.map { i =>
      (collected(i).getDate(0), scores(i), ranked(i))
    }
    val spark = daily.sparkSession
    import spark.implicits._
    val scoreDf = scored.toDF("event_date", "anomaly_score", "is_anomaly")
    // null-safe equality so a null-day group keeps its score row (plain
    // equality would silently drop it from the result)
    cached.join(broadcast(scoreDf),
        cached("event_date") <=> scoreDf("event_date"))
      .drop(scoreDf("event_date"))
  }
}

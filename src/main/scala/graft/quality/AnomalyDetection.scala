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
  /** The feature-column order every consumer (fit, score, replay oracle)
    * must agree on — the dumped trees' `feature` index points into this.
    */
  val FeatCols: Seq[String] =
    Seq("event_cnt", "active_users", "total_value", "error_pct", "active_hours")

  /** Collect the daily frame once, date-sorted (so the seeded RNG stream
    * maps onto the same rows regardless of partitioning), with the feature
    * matrix extracted. A null feature (sum(decimal) over a day whose values
    * are all null) imputes to 0.0 — the "no volume" reading.
    */
  private def collectWithFeatures(daily: DataFrame)
      : (Array[org.apache.spark.sql.Row], IndexedSeq[Array[Double]]) = {
    val schema = daily.schema
    val idx = FeatCols.map(schema.fieldIndex)
    val collected = daily.orderBy(col("event_date")).collect()
    val feats: IndexedSeq[Array[Double]] = collected.toIndexedSeq.map { r =>
      idx.map(i => if (r.isNullAt(i)) 0.0 else r.getDouble(i)).toArray
    }
    (collected, feats)
  }

  /** The exact forest [[score]] fits — exposed so the replay oracle
    * ([[graft.queries.OracleDumps]]) can dump the identical trees.
    */
  def fittedForest(daily: DataFrame, numTrees: Int = 100,
      seed: Long = 42L): IsolationForestModel.Forest =
    IsolationForestModel.fit(collectWithFeatures(daily)._2, numTrees, seed = seed)

  def score(daily: DataFrame, numTrees: Int = 100, contamination: Double = 0.1,
      seed: Long = 42L): DataFrame = {
    val spark = daily.sparkSession
    // One row per day = control-plane-small at any event volume: collect the
    // full daily frame ONCE and assemble the scored result driver-side. The
    // earlier cache+join version scanned once but pinned a cached frame per
    // call forever; this leaves nothing persisted and scans exactly once.
    val schema = daily.schema
    val dateIdx = schema.fieldIndex("event_date")
    val (collected, feats) = collectWithFeatures(daily)
    val forest = IsolationForestModel.fit(feats, numTrees, seed = seed)
    val scores = feats.map(IsolationForestModel.score(forest, _))
    val n = collected.length
    val cutoffRank = math.max(1L, math.round(n * contamination))
    // deterministic flagging: rank by (score desc, date); a null day
    // (null-ts events group) sorts first like a window's default nulls-first
    val ranked = collected.indices
      .sortBy(i => (-scores(i),
        if (collected(i).isNullAt(dateIdx)) Long.MinValue
        else collected(i).getDate(dateIdx).getTime))
      .zipWithIndex.map { case (i, rank) => i -> (rank < cutoffRank) }.toMap
    val outSchema = org.apache.spark.sql.types.StructType(schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("anomaly_score",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("is_anomaly",
        org.apache.spark.sql.types.BooleanType, nullable = false)))
    val outRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(collected.indices.map { i =>
        org.apache.spark.sql.Row.fromSeq(collected(i).toSeq :+ scores(i) :+ ranked(i))
      }: _*)
    spark.createDataFrame(outRows, outSchema)
  }
}

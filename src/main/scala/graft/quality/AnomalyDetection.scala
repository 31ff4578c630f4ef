package graft.quality

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML anomaly scoring over daily sync metrics (ref
  * `anomaly_detection_agent.py:45-205`). The reference extracts per-day
  * features (row counts, distinct users, error rates, hour-of-day spread)
  * and scores them with sklearn's IsolationForest; Spark MLlib has no
  * isolation forest, so the scoring model here is KMeans
  * distance-to-centroid over standardized features — the same
  * "unsupervised outlier score from daily metrics" contract, deviation
  * documented. Deterministic under a fixed seed.
  *
  * Scale note: feature extraction is one groupBy(day) over the event log
  * (map-side combined); the model fits on one row per day — thousands of
  * rows even for a decade — so training is a driver-side blink while the
  * scan stays distributed.
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

  /** Score each day: distance to its nearest KMeans centroid in standardized
    * feature space; `is_anomaly` flags the top `contamination` fraction —
    * the IsolationForest contamination contract (`anomaly_detection_agent.py:139`).
    */
  def score(daily: DataFrame, k: Int = 3, contamination: Double = 0.1, seed: Long = 42L): DataFrame = {
    val featCols = Array("event_cnt", "active_users", "total_value", "error_pct", "active_hours")
    // One row per day: collapse to a single partition before the iterative ML
    // stages (inheriting the scan's 32 shuffle partitions made every scaler/
    // KMeans pass schedule 32 near-empty tasks — 234 s of overhead at sf0.1),
    // and cache: fit() + transform() + the count/groupBy below each re-read it.
    val assembled = new VectorAssembler()
      .setInputCols(featCols).setOutputCol("raw_features")
      .transform(daily.coalesce(1)).cache()
    val scaler = new StandardScaler().setInputCol("raw_features").setOutputCol("features")
      .setWithMean(true).setWithStd(true).fit(assembled)
    val scaled = scaler.transform(assembled).cache()
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features").fit(scaled)
    val clustered = model.transform(scaled)
    // An extreme outlier captures its own centroid (distance 0); score
    // against the centroids of "major" clusters only (≥5% of points).
    val n = clustered.count()
    val sizes = clustered.groupBy(col("prediction")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val minMajor = math.max(2L, math.round(n * 0.05))
    val majorCentroids = model.clusterCenters.zipWithIndex
      .collect { case (c, i) if sizes.getOrElse(i, 0L) >= minMajor => c.toArray }
    val centroids = if (majorCentroids.nonEmpty) majorCentroids
      else model.clusterCenters.map(_.toArray)
    val dist = udf { (v: Vector) =>
      centroids.map { c =>
        math.sqrt(v.toArray.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.min
    }
    val withDist = clustered
      .withColumn("anomaly_score", dist(col("features")))
      .drop("raw_features", "features")
    val cutoffRank = math.max(1L, math.round(n * contamination))
    val w = Window.orderBy(col("anomaly_score").desc, col("event_date"))
    withDist.withColumn("score_rank", row_number().over(w))
      .withColumn("is_anomaly", col("score_rank") <= cutoffRank)
      .drop("score_rank", "prediction")
  }
}

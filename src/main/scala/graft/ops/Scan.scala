package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared scan-shape helpers. */
object Scan {

  /** Repartition iff plan statistics say the scan cannot feed all cores —
    * a single-row-group parquet file is unsplittable, AQE never widens a
    * scan, and a compute-dense map-side stage (signature loops, gram
    * explodes, codec decodes) then serializes onto one task. Decided from
    * `optimizedPlan.stats` (no execution); at real scale `sizeInBytes`
    * dwarfs the threshold and this is a no-op, so the scan-once design
    * gains no shuffle. Shared by the dedup, PQ, and decontamination paths.
    */
  def spreadIfStarved(projected: DataFrame): DataFrame = {
    val conf = projected.sparkSession.sessionState.conf
    val target = conf.numShufflePartitions
    val maxSplit = math.max(conf.filesMaxPartitionBytes, 1L)
    val approxScanParts = projected.queryExecution.optimizedPlan.stats.sizeInBytes / maxSplit
    if (approxScanParts >= target) projected else projected.repartition(target)
  }
}

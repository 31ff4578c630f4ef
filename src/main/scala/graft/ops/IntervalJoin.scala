package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** j16: point-in-interval join via time bucketization — the other range-join
  * shape Spark lacks natively (as-of is [[AsofJoin]]). A naive
  * `pt BETWEEN start AND end` theta-join compiles to a broadcast
  * nested-loop / cartesian filter: every point × every interval. Bucketizing
  * makes it an EQUI join: each interval explodes to the fixed-width time
  * buckets it overlaps, each point computes its single bucket, and the hash
  * join on bucket only pairs rows that can possibly match; the exact
  * containment predicate then filters within the bucket.
  *
  * A point meets an interval in at most ONE bucket (the point's own), so the
  * join never duplicates a match — no dedup pass. Cost: |intervals| ×
  * (span/bucketDays + 1) exploded rows and one hash shuffle on the bucket id;
  * pick `bucketDays` ≈ the typical interval span so intervals explode to
  * O(1) buckets. Skewed buckets (a hot week) salt like any equi-join key.
  */
object IntervalJoin {

  private def bucket(c: Column, bucketDays: Int): Column =
    floor(datediff(c, to_date(lit("1970-01-01"))).cast("double") / bucketDays)
      .cast("int")

  /** Inner point-in-interval join: rows of `points` paired with every row of
    * `intervals` whose `[startCol, endCol]` (inclusive, date granularity)
    * contains `ptCol`. Output = point columns ++ interval columns.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketDays: Int = 7): DataFrame = {
    require(bucketDays > 0, "bucketDays must be positive")
    val iv = intervals.withColumn("__b",
      explode(sequence(bucket(col(startCol), bucketDays),
        bucket(col(endCol), bucketDays))))
    points.withColumn("__b", bucket(col(ptCol), bucketDays))
      .join(iv, Seq("__b"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__b")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** j15: as-of join — for each left row, attach the LATEST right row whose
  * timestamp is ≤ the left row's, per key (the time-series point-in-time
  * lookup: trades→quotes, clicks→views, metrics→deploys). Spark has no
  * native ASOF JOIN; the naive range join explodes to |L|·|R| per key before
  * filtering.
  *
  * This is the scalable union-tag formulation instead: tag both sides, union
  * them, and run ONE keyed window pass where `last(right_value, ignoreNulls)`
  * over rows ≤ current carries the most recent right payload forward into
  * each left row. One shuffle total (the window's key partition), no
  * pair-explosion ever materializes, and the window state is a single row of
  * carried values — at 100 TB this is a plain sort-based window over
  * (key, ts), the same cost class as any sessionization.
  *
  * Right rows at exactly the left timestamp match (ties order right before
  * left). The right side must be unique per (keys, rightTs); pass
  * `tieBreak` to resolve duplicates deterministically (max tieBreak wins) —
  * otherwise which same-instant right row carries is plan-dependent.
  *
  * The right payload rides the window as ONE struct, not per-column
  * `last(ignoreNulls)` calls: a struct literal is non-null for every right
  * row even when its fields are null, so the carried values are always the
  * fields of the single most recent right row — per-column carry would
  * substitute stale values for a matched row's legitimate NULLs and could
  * mix fields from different right rows (true ASOF attach is row-atomic).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      outPrefix: String = "asof_", tieBreak: Option[String] = None): DataFrame = {
    val keySet = keys.toSet
    val leftPayload = left.columns.toSeq.filterNot(c => keySet(c) || c == leftTs)
    val rightDedup = tieBreak match {
      case None => right
      case Some(tb) =>
        val w = Window.partitionBy((keys :+ rightTs).map(col): _*)
          .orderBy(col(tb).desc)
        right.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
    }
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c)).toArray)
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
          lit(null).cast(rvType).as("__rv")) ++
        leftPayload.map(col): _*)
    val r = rightDedup.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
          struct(rightVals.map(col): _*).as("__rv")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(
        (keys.map(col) :+ col("__ts") :+ col("__side")) ++
          leftPayload.map(col) :+
          last(col("__rv"), ignoreNulls = true).over(w).as("__rv"): _*)
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++ leftPayload.map(col) ++
          rightVals.map(c => col("__rv").getField(c).as(s"$outPrefix$c")): _*)
  }
}

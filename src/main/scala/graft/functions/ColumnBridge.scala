package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode bridge between the public `Column` API and Catalyst
  * `Expression`s. Spark 4 made the `Column(expr)` constructor and `.expr`
  * accessor `private[sql]` (the Column API now fronts ColumnNode for
  * Connect), so a library shipping its own native expressions needs this
  * one-hop adapter in a `org.apache.spark.sql` subpackage — the same access
  * route Spark's own `functions` object uses internally.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Per-column range SETS implied by a predicate Column — the general form
    * behind [[predicateBounds]]. An entry `c -> ranges` means: every row
    * satisfying the predicate has `c` non-null and inside the UNION of
    * `ranges` (sorted, disjoint). A column absent from the map is
    * unconstrained; an EMPTY range list is a proven contradiction (no row
    * can satisfy — callers may plan zero files).
    *
    * Conservative algebra:
    *  - AND intersects range sets per column;
    *  - OR unions them — but only for columns constrained in BOTH branches
    *    (a column bound in one disjunct alone is unconstrained overall);
    *  - `IN (v1..vk)` is the union of its point ranges;
    *  - strict bounds widen by one (callers prune FILES and re-apply the
    *    full predicate as the residual row filter, so over-reading is safe
    *    and the MinValue/MaxValue overflow edge disappears);
    *  - anything unrecognized (null tests, non-literal comparisons, UDFs,
    *    NOT) contributes no constraint.
    *
    * Literal encoding matches [[graft.merge.Versioned]]'s stats encoding:
    * integrals as-is, DATE as epoch days, TIMESTAMP as epoch micros — so
    * the reference's canonical `REPORTING_DATE BETWEEN …` predicate
    * (`snowflake_bq_sync_daily Time Details/main.py:139-145`) prunes a
    * versioned read without the caller doing calendar math. Floating-point
    * literals contribute nothing (stats are long-exact by contract).
    *
    * `maxDisjuncts` caps the per-column range-list length a union may
    * produce (the reference's progressive day-rotation windows,
    * `main_progressive.py:31-54`, build bounded disjunctions; a pathological
    * predicate must not): past the cap the set collapses to its envelope —
    * still conservative, never larger than one range.
    */
  def predicateRanges(predicate: Column,
      maxDisjuncts: Int = 64): Map[String, Seq[(Long, Long)]] = {
    import org.apache.spark.sql.internal.{ColumnNode, Literal => NLit,
      UnresolvedAttribute => NAttr, UnresolvedFunction => NFn}
    val Full = Seq((Long.MinValue, Long.MaxValue))
    def longOf(n: ColumnNode): Option[Long] = n match {
      case l: NLit => l.value match {
        case i: java.lang.Integer => Some(i.toLong)
        case i: java.lang.Long => Some(i.longValue)
        case i: java.lang.Short => Some(i.toLong)
        case i: java.lang.Byte => Some(i.toLong)
        case d: java.sql.Date => Some(DateTimeUtils.fromJavaDate(d).toLong)
        case d: java.time.LocalDate => Some(d.toEpochDay)
        case t: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(t))
        case t: java.time.Instant => Some(DateTimeUtils.instantToMicros(t))
        case _ => None // float/string/…: no bound (skip stats are long-exact)
      }
      case _ => None
    }
    def nameOf(n: ColumnNode): Option[String] = n match {
      case a: NAttr => Some(a.nameParts.mkString("."))
      case _ => None
    }
    // interval-set algebra shared with the Expression-side walker
    // (ManifestFileIndex.exprRanges); only the cap is parameterized here
    import RangeAlgebra.{norm, inter}
    def union(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      val u = norm(a ++ b)
      if (u.length > maxDisjuncts) Seq((u.head._1, u.last._2)) else u // envelope past the cap
    }
    def one(colN: ColumnNode, lo: Option[Long], hi: Option[Long]): Map[String, Seq[(Long, Long)]] =
      nameOf(colN).map(c =>
        Map(c -> Seq((lo.getOrElse(Long.MinValue), hi.getOrElse(Long.MaxValue)))))
        .getOrElse(Map.empty)
    def walk(e: ColumnNode): Map[String, Seq[(Long, Long)]] = e match {
      case f: NFn => (f.functionName, f.arguments) match {
        case ("and", Seq(l, r)) =>
          val (a, b) = (walk(l), walk(r))
          (a.keySet ++ b.keySet).map(k =>
            k -> inter(a.getOrElse(k, Full), b.getOrElse(k, Full))).toMap
        case ("or", Seq(l, r)) =>
          val (a, b) = (walk(l), walk(r))
          // only columns constrained in BOTH disjuncts stay constrained
          a.keySet.intersect(b.keySet).map(k => k -> union(a(k), b(k))).toMap
        case ("=" | "==" | "equalTo", Seq(a, b)) =>
          longOf(b).map(v => one(a, Some(v), Some(v)))
            .orElse(longOf(a).map(v => one(b, Some(v), Some(v)))).getOrElse(Map.empty)
        case (">" | ">=", Seq(a, b)) =>
          longOf(b).map(v => one(a, Some(v), None))
            .orElse(longOf(a).map(v => one(b, None, Some(v)))).getOrElse(Map.empty)
        case ("<" | "<=", Seq(a, b)) =>
          longOf(b).map(v => one(a, None, Some(v)))
            .orElse(longOf(a).map(v => one(b, Some(v), None))).getOrElse(Map.empty)
        case ("in", valueExpr +: list) if list.nonEmpty =>
          val vs = list.map(longOf)
          if (vs.exists(_.isEmpty)) Map.empty // any unboundable member: conservative
          else nameOf(valueExpr).map { c =>
            val u = norm(vs.flatten.map(v => (v, v)))
            Map(c -> (if (u.length > maxDisjuncts) Seq((u.head._1, u.last._2)) else u))
          }.getOrElse(Map.empty)
        case _ => Map.empty // not / isNull / udf / …: conservative
      }
      case _ => Map.empty
    }
    walk(predicate.node)
  }

  /** Per-column [lo, hi] ENVELOPE bounds implied by a predicate Column —
    * the single-range view of [[predicateRanges]] (columns whose envelope
    * is the full long domain are dropped as unconstrained; a proven
    * contradiction surfaces as the canonical empty range (MaxValue,
    * MinValue)). Kept for callers that want one range per column; pruning
    * paths use [[predicateRanges]] directly so OR/IN disjunctions skip too.
    */
  def predicateBounds(predicate: Column): Map[String, (Long, Long)] =
    predicateRanges(predicate).flatMap { case (c, rs) =>
      if (rs.isEmpty) Some(c -> (Long.MaxValue, Long.MinValue))
      else {
        val env = (rs.head._1, rs.last._2)
        if (env == (Long.MinValue, Long.MaxValue)) None else Some(c -> env)
      }
    }
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
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

  /** Per-column [lo, hi] bounds implied by a predicate Column,
    * conservative: a column absent from the result is unconstrained; AND
    * intersects; anything not a recognized integral comparison contributes
    * nothing (OR, IN, null tests, non-literal comparisons, UDFs). Strict
    * bounds are widened by one: callers prune FILES from these bounds and
    * re-apply the full predicate as the residual row filter, so
    * conservative-by-one is always safe — and it avoids the
    * MinValue/MaxValue overflow edge entirely.
    *
    * Lives here, not in [[graft.merge.Versioned]] (its one caller): Spark
    * 4's Column operators build name-based `sql.internal.UnresolvedFunction`
    * NODES (Connect-compatible), not typed Catalyst comparisons, and the
    * `ColumnNode` tree is `private[sql]` — structural predicate analysis
    * needs this package, the same access route as the bridges above.
    */
  def predicateBounds(predicate: Column): Map[String, (Long, Long)] = {
    import org.apache.spark.sql.internal.{ColumnNode, Literal => NLit,
      UnresolvedAttribute => NAttr, UnresolvedFunction => NFn}
    def longOf(n: ColumnNode): Option[Long] = n match {
      case l: NLit => l.value match {
        case i: java.lang.Integer => Some(i.toLong)
        case i: java.lang.Long => Some(i)
        case i: java.lang.Short => Some(i.toLong)
        case i: java.lang.Byte => Some(i.toLong)
        case _ => None // non-integral literal: no bound (skip stats are long-exact)
      }
      case _ => None
    }
    def nameOf(n: ColumnNode): Option[String] = n match {
      case a: NAttr => Some(a.nameParts.mkString("."))
      case _ => None
    }
    def one(col: ColumnNode, lo: Option[Long], hi: Option[Long]): Map[String, (Long, Long)] =
      nameOf(col).map(c =>
        Map(c -> (lo.getOrElse(Long.MinValue), hi.getOrElse(Long.MaxValue)))).getOrElse(Map.empty)
    def intersect(a: Map[String, (Long, Long)], b: Map[String, (Long, Long)]) =
      (a.keySet ++ b.keySet).map { k =>
        val (al, ah) = a.getOrElse(k, (Long.MinValue, Long.MaxValue))
        val (bl, bh) = b.getOrElse(k, (Long.MinValue, Long.MaxValue))
        k -> (math.max(al, bl), math.min(ah, bh))
      }.toMap
    def walk(e: ColumnNode): Map[String, (Long, Long)] = e match {
      case f: NFn => (f.functionName, f.arguments) match {
        case ("and", Seq(l, r)) => intersect(walk(l), walk(r))
        case ("=" | "==" | "equalTo", Seq(a, b)) =>
          longOf(b).map(v => one(a, Some(v), Some(v)))
            .orElse(longOf(a).map(v => one(b, Some(v), Some(v)))).getOrElse(Map.empty)
        case (">" | ">=", Seq(a, b)) =>
          longOf(b).map(v => one(a, Some(v), None))
            .orElse(longOf(a).map(v => one(b, None, Some(v)))).getOrElse(Map.empty)
        case ("<" | "<=", Seq(a, b)) =>
          longOf(b).map(v => one(a, None, Some(v)))
            .orElse(longOf(a).map(v => one(b, Some(v), None))).getOrElse(Map.empty)
        case _ => Map.empty // or / in / isNull / udf: conservative
      }
      case _ => Map.empty
    }
    walk(predicate.node)
  }
}

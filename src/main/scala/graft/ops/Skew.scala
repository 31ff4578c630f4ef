package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins. AQE's skew-join handles sort-merge
  * skew it can SEE at runtime; explicit salting is the tool when the skew is
  * known up front (a few whale keys in a fact table) or when the join must
  * hash-partition deterministically. The reference's fact tables skew by
  * client and by work item (a handful of clients carry most time entries —
  * the dashboard's own per-client rollups show the imbalance), so the 100 TB
  * plan needs this escape hatch.
  */
object Skew {

  /** Salted equi-join: every left row gets a deterministic salt in
    * [0, salts) hashed from `saltFrom` columns; the right side is replicated
    * `salts` times so the join key becomes (key, salt). A whale key's rows
    * then spread over `salts` reducers instead of one straggler. Output ≡
    * the plain inner join (the salt is internal).
    *
    * Cost model: right side is scanned `salts`× — use for large-left ⋈
    * modest-right joins where the left skew dominates (the broadcast join
    * already solves small-right; this solves medium-right + skewed-left).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      salts: Int, saltFrom: Seq[String]): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltFrom.map(col): _*), lit(salts.toLong)))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"), "inner")
      .drop("__salt")
  }
}

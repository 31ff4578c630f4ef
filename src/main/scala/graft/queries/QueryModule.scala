package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries + their DuckDB oracle SQL (driver contract —
  * see SparkEntry). Query names carry the SURVEY.md §2 operator ids so the
  * coverage audit is a string match.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def defs: Map[String, Q]
  def oracles: Map[String, String]
}

object QueryModule {
  /** DuckDB twin of [[graft.ops.Sampling.unitHash]] (no salt): first 60 bits
    * of md5 / 2^60 — shared by every oracle that replays hash-membership
    * sampling (sp1/sp2/sp4 in SamplingQueries, sp4b in LlmQueries).
    */
  val duckUnitHash: String =
    "(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) / 1152921504606846976.0)"

  private val scopedDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** A per-(label, corpus, process) artifact directory under
    * `java.io.tmpdir` — the persisted-index home for the serve/append
    * queries (dd11b/dd13/dd15b/st15/ann9/11/14/x13). Per-process suffix:
    * concurrent runs must not share an index. Warm reuse WITHIN one JVM is
    * the point (bench reps and scale medians pay increment-sized work,
    * never a rebuild), but the directory must not outlive it: a shutdown
    * hook deletes it on JVM exit, so stale per-pid artifacts stop
    * accumulating in the system tmpdir across driver/bench/test processes.
    */
  def processScopedDir(label: String, corpusDir: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_${label}_" +
      java.lang.Integer.toHexString(corpusDir.hashCode) +
      "_p" + ProcessHandle.current().pid()
    if (scopedDirs.add(p))
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(new java.io.File(p))))
    p
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(); ()
  }
}

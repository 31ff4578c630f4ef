package graft.merge

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** A minimal versioned-table transaction log (VT1-VT6/ST17; beyond-
  * reference): time travel, rollback, vacuum, CDC read+apply, an exactly-
  * once streaming sink, manifest-level data skipping — atomic commits over
  * plain parquet, the
  * table-format substrate (Delta/Iceberg-style, from their published
  * designs) that a long-lived 100 TB sync target needs once "overwrite the
  * directory" stops being an option.
  *
  * Layout:
  * {{{
  *   root/_vlog/v00001.txt     one manifest per version (see format below)
  *   root/data/c1-<uuid>/      immutable parquet files, one dir per commit
  * }}}
  *
  * Manifest format (plain text, one header line then one RELATIVE file path
  * per line — relocatable, no JSON parser in the trust path):
  * {{{
  *   op=append parent=3
  *   data/c4-.../part-....parquet
  * }}}
  *
  * Semantics and why they hold at scale:
  *  - Data files are IMMUTABLE: a commit only ever adds a new `data/c*` dir
  *    and a new manifest. Appends are O(new data); rollback is a POINTER
  *    FLIP (a new manifest listing an old version's files — zero data moved,
  *    any terabyte count); time travel is "plan from manifest N's file
  *    list", so a reader's scan set is exact, never directory-listing-racy.
  *  - Commit is ATOMIC + optimistically concurrent: the manifest is staged
  *    to a temp name and promoted with a hard link, which REFUSES to
  *    replace (POSIX rename would clobber silently) — two writers racing to
  *    v(n+1) means exactly one wins and the loser throws (retry = re-read
  *    the log, re-stage). Same local/HDFS filesystem caveat as [[Dml]]:
  *    object stores need a CAS'd log service.
  *  - Readers never see partial state: a version exists iff its manifest
  *    rename completed, and the files it lists were fully written before
  *    the rename (Spark's job commit precedes [[commit]]'s return).
  */
object Versioned {

  /** `stats` holds optional per-file (min, max) of `statsCol` — manifest-
    * level data skipping (VT6): a pruned read plans only files whose range
    * overlaps the predicate, without opening a single footer. Files with
    * no entry are read conservatively.
    */
  final case class Version(n: Int, op: String, parent: Int, files: Seq[String],
      stats: Map[String, (Long, Long)] = Map.empty, statsCol: Option[String] = None)

  private def vlogDir(root: String): Path = Paths.get(root, "_vlog")
  private def manifestPath(root: String, n: Int): Path =
    vlogDir(root).resolve(f"v$n%05d.txt")

  // NIO directory streams hold an open dir handle until closed — a
  // long-lived pipeline process calling versions() per batch would leak
  // file descriptors if these relied on GC
  private def listClosing[A](s: java.util.stream.Stream[Path])(f: Iterator[Path] => A): A =
    try f(s.iterator().asScala) finally s.close()

  /** All committed versions, ascending. */
  def versions(root: String): Seq[Version] = {
    val dir = vlogDir(root)
    if (!Files.isDirectory(dir)) return Seq.empty
    listClosing(Files.list(dir))(_.filter(p => p.getFileName.toString.matches("v\\d{5}\\.txt")).toSeq)
      .sortBy(_.getFileName.toString)
      .map { p =>
        val lines = Files.readAllLines(p).asScala.toSeq
        val n = p.getFileName.toString.stripPrefix("v").stripSuffix(".txt").toInt
        val header = lines.head.split(" ").map(_.split("=")).map(a => a(0) -> a(1)).toMap
        // a file line is `path` or `path|min|max` ('|' never appears in the
        // uuid-named data paths this log writes)
        val entries = lines.tail.filter(_.nonEmpty).map(_.split('|'))
        Version(n, header("op"), header("parent").toInt, entries.map(_.head),
          entries.collect { case Array(f, mn, mx) => f -> (mn.toLong, mx.toLong) }.toMap,
          header.get("stats"))
      }
  }

  def currentVersion(root: String): Option[Version] = versions(root).lastOption

  // private[graft] so the spec can drive the CAS with a racing version
  // number directly — a single-threaded test can't interleave two appends
  // between version selection and promote
  private[graft] def writeManifest(root: String, v: Version): Version = {
    Files.createDirectories(vlogDir(root))
    val head = s"op=${v.op} parent=${v.parent}" +
      v.statsCol.map(c => s" stats=$c").getOrElse("")
    val body = (head +: v.files.map { f =>
      v.stats.get(f).map { case (mn, mx) => s"$f|$mn|$mx" }.getOrElse(f)
    }).mkString("\n")
    val tmp = Files.createTempFile(vlogDir(root), s".v${v.n}-", ".staged")
    Files.writeString(tmp, body)
    // atomic promote via hard link: POSIX rename REPLACES silently (so an
    // ATOMIC_MOVE would let the second writer clobber the first), while
    // link(2) fails with EEXIST — fully-written content appears under the
    // final name in one atomic step, and a concurrent winner loses loudly.
    try Files.createLink(manifestPath(root, v.n), tmp)
    catch { case e: java.nio.file.FileAlreadyExistsException =>
      throw new IllegalStateException(
        s"concurrent commit: version ${v.n} already exists at $root " +
          "(re-read the log and retry on top of it)", e)
    }
    finally Files.deleteIfExists(tmp)
    v
  }

  /** List the parquet files a finished Spark write left under `dataDir`,
    * as root-relative paths (manifests must survive a table relocation).
    */
  private def listParquet(root: String, dataDir: Path): Seq[String] = {
    val rootP = Paths.get(root)
    listClosing(Files.walk(dataDir))(
      _.filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(p => rootP.relativize(p).toString)
        .toSeq).sorted
  }

  private def writeData(df: DataFrame, root: String, n: Int): Seq[String] = {
    val dataDir = Paths.get(root, "data", s"c$n-${java.util.UUID.randomUUID()}")
    df.write.parquet(dataDir.toString)
    listParquet(root, dataDir)
  }

  /** Append `df` as the next version (previous files + the new commit's).
    * Carried files keep their skipping stats; the new commit's files have
    * none (use [[appendWithStats]] to collect them).
    */
  def append(df: DataFrame, root: String): Version = {
    val cur = currentVersion(root)
    val n = cur.map(_.n + 1).getOrElse(1)
    val files = writeData(df, root, n)
    writeManifest(root, Version(n, "append", cur.map(_.n).getOrElse(0),
      cur.map(_.files).getOrElse(Seq.empty) ++ files,
      cur.map(_.stats).getOrElse(Map.empty), cur.flatMap(_.statsCol)))
  }

  /** VT6: append WITH manifest-level skipping stats — after the commit's
    * files land, ONE commit-sized pass (group by input file) records each
    * file's (min, max) of `statsCol` in the manifest, so a [[readPruned]]
    * later plans only range-overlapping files without opening a footer.
    * This is file-granularity data skipping from log metadata (the Delta/
    * Iceberg published design); it composes with z-order inside each file
    * (row-group pruning) and costs O(commit) at write time, never O(table).
    * `statsCol` must be integral (exact long min/max — no float edges in
    * the trust path) and consistent across commits of one table.
    */
  def appendWithStats(df: DataFrame, root: String, statsCol: String): Version = {
    val cur = currentVersion(root)
    require(cur.forall(_.statsCol.forall(_ == statsCol)),
      s"table tracks stats on ${cur.flatMap(_.statsCol)}, not $statsCol")
    val n = cur.map(_.n + 1).getOrElse(1)
    val files = writeData(df, root, n)
    val spark = df.sparkSession
    val rootP = Paths.get(root)
    val newStats = spark.read.parquet(rootP.resolve(files.head).getParent.toString)
      .groupBy(org.apache.spark.sql.functions.input_file_name().as("f"))
      .agg(org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.col(statsCol))
          .cast("long").as("mn"),
        org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.col(statsCol))
          .cast("long").as("mx"))
      .collect().map { r =>
        val rel = rootP.relativize(Paths.get(new java.net.URI(r.getString(0)).getPath)).toString
        rel -> (r.getLong(1), r.getLong(2))
      }.toMap
    writeManifest(root, Version(n, "append", cur.map(_.n).getOrElse(0),
      cur.map(_.files).getOrElse(Seq.empty) ++ files,
      cur.map(_.stats).getOrElse(Map.empty) ++ newStats, Some(statsCol)))
  }

  /** VT6 (read half): the version's rows with `statsCol` in [lo, hi],
    * planned from ONLY the manifest entries whose (min, max) overlaps —
    * files without stats are read conservatively; the residual filter
    * still applies (stats prune files, they never decide rows).
    */
  def readPruned(spark: SparkSession, root: String, lo: Long, hi: Long,
      asOf: Option[Int] = None): DataFrame = {
    require(lo <= hi, s"empty range [$lo, $hi]")
    val all = versions(root)
    require(all.nonEmpty, s"no committed versions at $root")
    val v = asOf.map(n => all.find(_.n == n).getOrElse(
      throw new IllegalArgumentException(s"version $n does not exist at $root")))
      .getOrElse(all.last)
    val c = v.statsCol.getOrElse(throw new IllegalStateException(
      s"version ${v.n} at $root tracks no skipping stats — use read() + filter"))
    val candidates = v.files.filter(f =>
      v.stats.get(f).forall { case (mn, mx) => mx >= lo && mn <= hi })
    val cc = org.apache.spark.sql.functions.col(c)
    val base =
      if (candidates.isEmpty) read(spark, root, Some(v.n)).limit(0)
      else spark.read.parquet(candidates.map(f => Paths.get(root).resolve(f).toString): _*)
    base.filter(cc >= lo && cc <= hi)
  }

  /** Replace the table contents with `df` as the next version. Old files
    * stay on disk (they back earlier versions) — retention is a separate,
    * deliberate vacuum, never a side effect of a write.
    */
  def overwrite(df: DataFrame, root: String): Version = {
    val cur = currentVersion(root)
    val n = cur.map(_.n + 1).getOrElse(1)
    writeManifest(root, Version(n, "overwrite", cur.map(_.n).getOrElse(0),
      writeData(df, root, n), Map.empty, cur.flatMap(_.statsCol)))
  }

  /** Roll the table back to version `to` by committing a NEW version with
    * `to`'s file list — history is append-only (the bad versions stay
    * auditable), and no data is copied regardless of table size.
    */
  def rollback(root: String, to: Int): Version = {
    val all = versions(root)
    val target = all.find(_.n == to).getOrElse(
      throw new IllegalArgumentException(s"version $to does not exist at $root"))
    val cur = all.last
    writeManifest(root, Version(cur.n + 1, "rollback", to, target.files,
      target.stats, target.statsCol))
  }

  /** Retention (VT3): delete data files referenced ONLY by versions older
    * than the last `keepLast` — the deliberate counterpart to writes never
    * deleting anything. Returns (deleted, retained) root-relative paths.
    * Manifests stay (history remains auditable); reading an expired version
    * fails at scan time, which is the honest signal that its data aged out.
    * Scale: pure metadata set-difference over manifests (vocabulary of file
    * names, never data), then unlink — no rewrite of surviving files.
    */
  def vacuum(root: String, keepLast: Int): (Seq[String], Seq[String]) = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val all = versions(root)
    require(all.nonEmpty, s"no committed versions at $root")
    val live = all.takeRight(keepLast).flatMap(_.files).toSet
    val expired = all.dropRight(keepLast).flatMap(_.files).filterNot(live).distinct
    expired.foreach(f => Files.deleteIfExists(Paths.get(root).resolve(f)))
    (expired.sorted, live.toSeq.sorted)
  }

  /** CDC between two versions (VT4): the rows inserted and deleted going
    * `from` → `to`, as a `change_type`-tagged frame — the "what changed
    * since I last synced" read every downstream consumer of a versioned
    * table wants.
    *
    * The scale property: only files NOT SHARED by the two manifests are
    * read. Files are immutable, so version contents are multisets
    * `shared ⊎ onlyFrom` and `shared ⊎ onlyTo`, and multiset difference
    * cancels the shared part exactly: `to ∖ from = onlyTo ∖ onlyFrom`
    * (Spark's `exceptAll`). An append's CDC therefore costs O(changed
    * files) however large the table — VersionedSpec pins the scan set.
    */
  def changes(spark: SparkSession, root: String, from: Int, to: Int): DataFrame = {
    val all = versions(root)
    def manifestOf(n: Int) = all.find(_.n == n).getOrElse(
      throw new IllegalArgumentException(s"version $n does not exist at $root"))
    val (fa, fb) = (manifestOf(from).files.toSet, manifestOf(to).files.toSet)
    val schemaSrc = read(spark, root, Some(to)) // lazy; schema only
    def rd(files: Set[String]): DataFrame =
      if (files.isEmpty) schemaSrc.limit(0)
      else spark.read.parquet(files.toSeq.sorted.map(f => Paths.get(root).resolve(f).toString): _*)
    val onlyFrom = rd(fa -- fb)
    val onlyTo = rd(fb -- fa)
    onlyTo.exceptAll(onlyFrom).withColumn("change_type", org.apache.spark.sql.functions.lit("insert"))
      .unionByName(
        onlyFrom.exceptAll(onlyTo).withColumn("change_type",
          org.apache.spark.sql.functions.lit("delete")))
  }

  /** Exactly-once streaming sink (ST17): append a micro-batch under its
    * batch id, SKIPPING ids already in the log — the foreachBatch
    * idempotence contract (a restarted query replays batches with the same
    * ids; the log's committed id set is the dedup state, no side store).
    * The check + the [[writeManifest]] CAS make a concurrent retry of the
    * same batch resolve to one commit. Returns None when skipped.
    */
  def appendStreamBatch(df: DataFrame, root: String, batchId: Long): Option[Version] = {
    val op = s"stream-batch-$batchId"
    if (versions(root).exists(_.op == op)) None
    else {
      val cur = currentVersion(root)
      val n = cur.map(_.n + 1).getOrElse(1)
      val files = writeData(df, root, n)
      Some(writeManifest(root, Version(n, op, cur.map(_.n).getOrElse(0),
        cur.map(_.files).getOrElse(Seq.empty) ++ files,
        cur.map(_.stats).getOrElse(Map.empty), cur.flatMap(_.statsCol))))
    }
  }

  /** Replica maintenance (VT5): apply a [[changes]] frame to a materialized
    * copy of version `from`, producing exactly version `to`'s row multiset —
    * the downstream half of CDC: the consumer never reads the source table,
    * only the (changed-files-sized) change set. Multiset algebra, no keys
    * needed: `to = from ∖ deletes ⊎ inserts` holds by [[changes]]'
    * construction, so `exceptAll` + `unionAll` reproduce it exactly.
    */
  def applyChanges(replica: DataFrame, changeSet: DataFrame): DataFrame = {
    val cols = replica.columns.map(org.apache.spark.sql.functions.col(_))
    val ins = changeSet.filter(org.apache.spark.sql.functions.col("change_type") === "insert")
      .select(cols: _*)
    val del = changeSet.filter(org.apache.spark.sql.functions.col("change_type") === "delete")
      .select(cols: _*)
    replica.exceptAll(del).unionAll(ins)
  }

  /** Read the table at version `asOf` (default: latest). The scan set is
    * exactly the manifest's file list — no directory listing, so readers
    * are immune to concurrent commits and leftover files.
    */
  def read(spark: SparkSession, root: String, asOf: Option[Int] = None): DataFrame = {
    val all = versions(root)
    require(all.nonEmpty, s"no committed versions at $root")
    val v = asOf.map(n => all.find(_.n == n).getOrElse(
      throw new IllegalArgumentException(s"version $n does not exist at $root")))
      .getOrElse(all.last)
    require(v.files.nonEmpty, s"version ${v.n} at $root lists no files")
    spark.read.parquet(v.files.map(f => Paths.get(root).resolve(f).toString): _*)
  }
}

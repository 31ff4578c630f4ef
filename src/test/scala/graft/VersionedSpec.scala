package graft

import graft.merge.Versioned
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Transaction-log semantics: manifest-scoped reads, append-only history,
  * pointer-flip rollback, optimistic-concurrency conflict, relocatability.
  */
class VersionedSpec extends SparkSuite {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_vt_spec").toString + "/t"

  private def dataFiles(root: String): Seq[String] =
    Files.walk(Paths.get(root, "data")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).toSeq.sorted

  test("append/overwrite/rollback: every version reads back as its snapshot") {
    import spark.implicits._
    val root = freshRoot()
    Versioned.append(Seq(1L, 2L).toDF("k"), root)
    Versioned.append(Seq(3L).toDF("k"), root)
    Versioned.overwrite(Seq(9L).toDF("k"), root)
    Versioned.rollback(root, to = 2)
    val vs = Versioned.versions(root)
    assert(vs.map(v => (v.n, v.op, v.parent)) ===
      Seq((1, "append", 0), (2, "append", 1), (3, "overwrite", 2), (4, "rollback", 2)))
    def ks(asOf: Int): Seq[Long] =
      Versioned.read(spark, root, Some(asOf)).as[Long].collect().sorted.toSeq
    assert(ks(1) === Seq(1L, 2L))
    assert(ks(2) === Seq(1L, 2L, 3L))
    assert(ks(3) === Seq(9L))
    assert(ks(4) === Seq(1L, 2L, 3L))
    // latest = v4
    assert(Versioned.read(spark, root).as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("rollback is a pointer flip: no data files written or removed") {
    import spark.implicits._
    val root = freshRoot()
    Versioned.append(Seq(1L).toDF("k"), root)
    Versioned.append(Seq(2L).toDF("k"), root)
    val before = dataFiles(root)
    Versioned.rollback(root, to = 1)
    assert(dataFiles(root) === before)
    assert(Versioned.currentVersion(root).get.files ===
      Versioned.versions(root).head.files)
  }

  test("concurrent commit to the same version loses loudly") {
    import spark.implicits._
    val root = freshRoot()
    Versioned.append(Seq(1L).toDF("k"), root)
    // simulate the race by driving the CAS promote with a version number
    // that lands AFTER this writer selected it: v1 already exists, so the
    // link-promote must refuse (POSIX rename would have clobbered v1 —
    // the failure mode the hard-link publish exists to prevent)
    val e = intercept[IllegalStateException] {
      Versioned.writeManifest(root,
        Versioned.Version(1, "append", 0, Seq("data/raced.parquet")))
    }
    assert(e.getMessage.contains("concurrent commit"))
    // the winner's manifest is untouched (not clobbered by the loser)
    assert(Versioned.read(spark, root).as[Long].collect().toSeq === Seq(1L))
    // the loser's staged file must not linger in the log dir
    val staged = Files.list(Paths.get(root, "_vlog")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".staged")).toSeq
    assert(staged.isEmpty)
  }

  test("manifests are relocatable: relative paths survive a table move") {
    import spark.implicits._
    val root = freshRoot()
    Versioned.append(Seq(7L, 8L).toDF("k"), root)
    val moved = Files.createTempDirectory("graft_vt_moved").toString + "/t2"
    Files.move(Paths.get(root), Paths.get(moved))
    assert(Versioned.read(spark, moved).as[Long].collect().sorted.toSeq === Seq(7L, 8L))
  }

  test("vacuum unlinks only expired files; survivors and current read intact") {
    import spark.implicits._
    val root = freshRoot()
    Versioned.append(Seq(1L).toDF("k"), root)            // v1: file A
    Versioned.append(Seq(2L).toDF("k"), root)            // v2: A + B
    Versioned.overwrite(Seq(9L).toDF("k"), root)         // v3: C only
    val (deleted, retained) = Versioned.vacuum(root, keepLast = 1)
    // A and B expired; C retained — and the sets are disjoint on disk
    assert(deleted.nonEmpty && retained.nonEmpty)
    deleted.foreach(f => assert(!Files.exists(Paths.get(root).resolve(f)), f))
    retained.foreach(f => assert(Files.exists(Paths.get(root).resolve(f)), f))
    assert(Versioned.read(spark, root).as[Long].collect().toSeq === Seq(9L))
    // a file shared by an expired AND a live version must survive:
    val root2 = freshRoot()
    Versioned.append(Seq(1L).toDF("k"), root2)           // v1: file A
    Versioned.append(Seq(2L).toDF("k"), root2)           // v2: A + B (A shared)
    val (del2, _) = Versioned.vacuum(root2, keepLast = 1)
    assert(del2.isEmpty) // v1's A is still referenced by the live v2
    assert(Versioned.read(spark, root2).as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("changes: CDC reads only non-shared files; multiset semantics cancel re-writes") {
    import spark.implicits._
    val root = freshRoot()
    Versioned.append(Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("k", "v"), root) // v1 (dup row!)
    Versioned.append(Seq((3L, "c")).toDF("k", "v"), root)                       // v2
    // v3 overwrite: keeps 2L x1 (drops the other copy and 1L/3L), adds 4L
    Versioned.overwrite(Seq((2L, "b"), (4L, "d")).toDF("k", "v"), root)
    val c12 = Versioned.changes(spark, root, 1, 2)
    // append CDC reads ONLY the appended files — v1's files are shared
    val v1Files = Versioned.versions(root).head.files.map(f =>
      Paths.get(root).resolve(f).toString).toSet
    assert(c12.inputFiles.toSet.intersect(v1Files).isEmpty)
    assert(c12.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ===
      Seq((3L, "c", "insert")))
    val c23 = Versioned.changes(spark, root, 2, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(x => (x._3, x._1))
    // the re-written (2L,"b") cancels ONE copy by value; the dup copy, 1L
    // and 3L are deletes; 4L is the only insert
    assert(c23.toSeq === Seq((1L, "a", "delete"), (2L, "b", "delete"),
      (3L, "c", "delete"), (4L, "d", "insert")))
  }

  test("applyChanges rolls a replica forward to exactly the target version's multiset") {
    import spark.implicits._
    val root = freshRoot()
    Versioned.append(Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("k", "v"), root)
    Versioned.append(Seq((3L, "c")).toDF("k", "v"), root)
    Versioned.overwrite(Seq((2L, "b"), (4L, "d")).toDF("k", "v"), root)
    var replica = Versioned.read(spark, root, Some(1))
    replica = Versioned.applyChanges(replica, Versioned.changes(spark, root, 1, 2))
    replica = Versioned.applyChanges(replica, Versioned.changes(spark, root, 2, 3))
    val got = replica.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val want = Versioned.read(spark, root, Some(3))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got === want)
    assert(got === Seq((2L, "b"), (4L, "d")))
  }

  test("appendStreamBatch is exactly-once per batch id") {
    import spark.implicits._
    val root = freshRoot()
    assert(Versioned.appendStreamBatch(Seq(1L).toDF("k"), root, batchId = 0).nonEmpty)
    // a replayed batch 0 (restart from fresh checkpoint) commits nothing
    assert(Versioned.appendStreamBatch(Seq(1L).toDF("k"), root, batchId = 0).isEmpty)
    assert(Versioned.appendStreamBatch(Seq(2L).toDF("k"), root, batchId = 1).nonEmpty)
    assert(Versioned.versions(root).map(_.op) === Seq("stream-batch-0", "stream-batch-1"))
    assert(Versioned.read(spark, root).as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("manifest stats prune the scan set; stats survive the log's lifecycle ops") {
    import spark.implicits._
    val root = freshRoot()
    // 20 keys range-clustered into 4 files per commit → tight per-file ranges
    Versioned.appendWithStats(
      (1L to 20L).toDF("k").repartitionByRange(4, col("k")), root, "k")
    Versioned.appendWithStats(
      (101L to 120L).toDF("k").repartitionByRange(4, col("k")), root, "k")
    val v = Versioned.currentVersion(root).get
    assert(v.statsCol === Some("k"))
    assert(v.stats.keySet === v.files.toSet) // every file has an entry
    val pruned = Versioned.readPruned(spark, root, lo = 104, hi = 110)
    // correctness: exactly the ranged keys, across the commit boundary
    assert(pruned.as[Long].collect().sorted.toSeq === (104L to 110L))
    // pruning: strictly fewer files scanned than the manifest lists
    assert(pruned.inputFiles.length < v.files.length,
      s"expected a pruned scan, got ${pruned.inputFiles.length} of ${v.files.length}")
    // all-files-pruned path: disjoint range over a fully-stats'd version
    assert(Versioned.readPruned(spark, root, 1000, 2000, asOf = Some(2)).count() === 0L)
    // stats ride rollback (pointer flip) and a plain append keeps old entries
    Versioned.rollback(root, to = 1)
    assert(Versioned.currentVersion(root).get.stats.nonEmpty)
    Versioned.append(Seq(500L).toDF("k"), root)
    val v4 = Versioned.currentVersion(root).get
    assert(v4.statsCol === Some("k"))
    // the stats-less new file is read conservatively: 500 is outside every
    // recorded range but must still appear in a ranged read that covers it
    assert(Versioned.readPruned(spark, root, 400, 600).as[Long].collect().toSeq === Seq(500L))
    // disjoint range → empty result (not an error), schema intact
    assert(Versioned.readPruned(spark, root, 1000, 2000).count() === 0L)
  }

  test("unknown versions fail loudly") {
    import spark.implicits._
    val root = freshRoot()
    Versioned.append(Seq(1L).toDF("k"), root)
    intercept[IllegalArgumentException](Versioned.read(spark, root, Some(5)))
    intercept[IllegalArgumentException](Versioned.rollback(root, to = 3))
  }
}

package graft

import graft.merge.Versioned
import org.apache.spark.sql.functions._

/** VT21: shallow clone — zero-copy writable copy through the manifest. */
class VersionedCloneSpec extends SparkSuite {

  test("clone reads the source's bytes zero-copy; carries stats, schema, constraints — NOT txns") {
    import spark.implicits._
    val base = tmpDir()
    val src = base + "/src"; val dst = base + "/clone"
    Versioned.appendWithStats(
      (1L to 100L).map(k => (k, k * 10.0)).toDF("k", "price")
        .repartitionByRange(4, col("k")), src, "k")
    Versioned.addConstraint(spark, src, "price_pos", "price > 0")
    val v = Versioned.cloneTable(src, dst)
    assert(v.op === "clone" && v.n === 1)
    // zero data files under the clone root
    assert(!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dst, "data")))
    // same rows, served from the SOURCE's files (absolute refs)
    assert(Versioned.read(spark, dst).select("k").as[Long].collect().sorted
      === (1L to 100L).toArray)
    assert(v.files.forall(f => java.nio.file.Paths.get(f).isAbsolute))
    // carried stats still prune: a one-quartile read plans a strict subset
    val planned = Versioned.readWhere(spark, dst, col("k") <= 25L).inputFiles
    assert(planned.length < v.files.length, s"pruning must survive the clone")
    // carried constraint still enforces
    val e = intercept[IllegalArgumentException] {
      Versioned.append(Seq((200L, -1.0)).toDF("k", "price"), dst)
    }
    assert(e.getMessage.contains("price_pos"))
    // a second clone into the same root refuses
    intercept[IllegalArgumentException] { Versioned.cloneTable(src, dst) }
  }

  test("writes to the clone never touch the source; COW rewrites land clone-local") {
    import spark.implicits._
    val base = tmpDir()
    val src = base + "/src"; val dst = base + "/clone"
    Versioned.appendWithStats(
      (1L to 100L).map(k => (k, "old")).toDF("k", "v")
        .repartitionByRange(4, col("k")), src, "k")
    val srcVer = Versioned.currentVersion(src).get
    Versioned.cloneTable(src, dst)
    // append + COW merge on the CLONE
    Versioned.append(Seq((101L, "new")).toDF("k", "v"), dst)
    Versioned.mergeInto(spark, dst, Seq((5L, "UPD")).toDF("k", "v"), Seq("k"))
    // clone sees the update; source is byte-identical (same version, same
    // files, same rows)
    assert(Versioned.read(spark, dst).filter(col("k") === 5L)
      .select("v").as[String].head() === "UPD")
    assert(Versioned.currentVersion(src).get === srcVer)
    assert(Versioned.read(spark, src).filter(col("k") === 5L)
      .select("v").as[String].head() === "old")
    // the merge delisted the affected INHERITED file and rewrote it
    // clone-locally; untouched inherited files still serve
    val cur = Versioned.currentVersion(dst).get
    assert(cur.files.exists(f => !java.nio.file.Paths.get(f).isAbsolute),
      "rewrite lands under the clone root")
    assert(cur.files.count(f => java.nio.file.Paths.get(f).isAbsolute)
      === srcVer.files.length - 1, "exactly the affected inherited file delisted")
  }

  test("clone does NOT inherit stream-batch ids: a fresh stream's batch 0 lands") {
    import spark.implicits._
    val base = tmpDir()
    val src = base + "/src"; val dst = base + "/clone"
    // the source was stream-fed: its dedup set holds id 0
    Versioned.appendStreamBatch(Seq((1L, "a")).toDF("k", "v"), src, batchId = 0L)
    val v = Versioned.cloneTable(src, dst)
    assert(v.txns.isEmpty, "clone starts with fresh stream-dedup lineage — " +
      "inherited bare-long ids would silently swallow a new stream's first batches")
    assert(Versioned.appendStreamBatch(Seq((2L, "b")).toDF("k", "v"), dst, 0L).nonEmpty)
    assert(Versioned.read(spark, dst).count() === 2)
  }

  test("clone of a PAST version (asOf) snapshots that state") {
    import spark.implicits._
    val base = tmpDir()
    val src = base + "/src"; val dst = base + "/clone"
    Versioned.append(Seq((1L, "a")).toDF("k", "v"), src)
    Versioned.append(Seq((2L, "b")).toDF("k", "v"), src)
    Versioned.cloneTable(src, dst, asOf = Some(1))
    assert(Versioned.read(spark, dst).select("k").as[Long].collect().toSeq === Seq(1L))
  }

  test("the clone works as a native relation: SQL over Versioned.table prunes inherited files") {
    import spark.implicits._
    val base = tmpDir()
    val src = base + "/src"; val dst = base + "/clone"
    Versioned.appendWithStats(
      (1L to 100L).map(k => (k, k * 2)).toDF("k", "v")
        .repartitionByRange(4, col("k")), src, "k")
    Versioned.cloneTable(src, dst)
    val rel = Versioned.table(spark, dst)
    rel.createOrReplaceTempView("clone_t")
    val q = spark.sql("SELECT k, v FROM clone_t WHERE k BETWEEN 1 AND 20")
    assert(q.as[(Long, Long)].collect().toSet === (1L to 20L).map(k => (k, k * 2)).toSet)
    val scanned = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray.map(_.filePath.toString).toSeq
    }.flatten
    assert(scanned.nonEmpty && scanned.length < 4,
      s"manifest-stats pruning must survive the clone's absolute paths, planned $scanned")
  }

  test("deep clone: reads identical, relocatable paths, symmetric vacuum, source deletable") {
    import spark.implicits._
    val base = tmpDir()
    val src = base + "/src"; val dst = base + "/deep"
    Versioned.appendWithStats(
      (1L to 100L).map(k => (k, k * 10.0)).toDF("k", "price")
        .repartitionByRange(4, col("k")), src, "k")
    Versioned.addConstraint(spark, src, "price_pos", "price > 0")
    val v = Versioned.cloneTable(src, dst, deep = true)
    assert(v.op === "clone-deep" && v.n === 1)
    // every reference is clone-local and RELATIVE (relocatable, vacuumable)
    assert(v.files.nonEmpty && v.files.forall(f =>
      !java.nio.file.Paths.get(f).isAbsolute && f.startsWith("data/")))
    assert(Versioned.read(spark, dst).select("k").as[Long].collect().sorted
      === (1L to 100L).toArray)
    // stats re-keyed to the copies: pruning is as selective as the source's
    assert(Versioned.readWhere(spark, dst, col("k") <= 25L).inputFiles.length
      < v.files.length)
    // constraints carried
    intercept[IllegalArgumentException] {
      Versioned.append(Seq((200L, -1.0)).toDF("k", "price"), dst)
    }
    // the SOURCE is deletable afterward — the deep clone owns its bytes
    def rmTree(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rmTree(_))
      java.nio.file.Files.deleteIfExists(p)
    }
    rmTree(java.nio.file.Paths.get(src))
    assert(Versioned.read(spark, dst).count() === 100)
    // vacuum is SYMMETRIC: after an overwrite, the copied v1 files (owned,
    // relative) DO reclaim — unlike a shallow clone's inherited paths
    Versioned.overwrite(Seq((1L, 1.0)).toDF("k", "price"), dst)
    val (deleted, _) = Versioned.vacuum(dst, keepLast = 1)
    assert(deleted.toSet === v.files.toSet, "deep-cloned files are the clone's to reclaim")
    assert(Versioned.read(spark, dst).count() === 1)
  }

  test("deep-cloning a SHALLOW clone materializes it") {
    import spark.implicits._
    val base = tmpDir()
    val src = base + "/src"; val sh = base + "/shallow"; val mat = base + "/mat"
    Versioned.append((1L to 50L).map(k => (k, s"v$k")).toDF("k", "v"), src)
    Versioned.cloneTable(src, sh) // shallow: absolute refs into src
    val v = Versioned.cloneTable(sh, mat, deep = true) // materialize
    assert(v.files.forall(f => !java.nio.file.Paths.get(f).isAbsolute))
    def rmTree(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rmTree(_))
      java.nio.file.Files.deleteIfExists(p)
    }
    rmTree(java.nio.file.Paths.get(src)) // kills the shallow clone's liveness…
    assert(Versioned.read(spark, mat).count() === 50) // …but not the deep one's
  }

  test("clone retention never deletes inherited files (vacuum + vacuumOlderThan)") {
    import spark.implicits._
    val base = tmpDir()
    val src = base + "/src"; val dst = base + "/clone"
    Versioned.append((1L to 50L).map(k => (k, "x")).toDF("k", "v"), src)
    Versioned.cloneTable(src, dst)
    Thread.sleep(15)
    // replace the clone's content: the inherited files drop out of HEAD
    Versioned.overwrite(Seq((999L, "z")).toDF("k", "v"), dst)
    val ts = Versioned.versions(dst).map(_.ts)
    val (del1, _) = Versioned.vacuum(dst, keepLast = 1)
    val (del2, _) = Versioned.vacuumOlderThan(dst, olderThanMs = 0,
      nowMs = ts.last + 1000000)
    assert(del1.isEmpty && del2.isEmpty,
      "expired inherited files are skipped — not ours to delete")
    // the source still reads intact
    assert(Versioned.read(spark, src).count() === 50L)
  }
}

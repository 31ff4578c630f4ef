package graft

import graft.merge.Versioned
import graft.streaming.VersionedStreamSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** ST19: the versioned table as a streaming SOURCE — commit-ordered
  * micro-batches, one per version, offsets checkpointed as version numbers
  * and resumed across a restart.
  */
class VersionedStreamSourceSpec extends SparkSuite {

  private def freshBase(): String = Files.createTempDirectory("graft_st19").toString

  private def readVersioned(root: String) =
    spark.readStream.format(classOf[VersionedStreamSource].getName)
      .option("path", root).load()

  test("three commits stream as three batches in commit order; restart resumes from the offset") {
    import spark.implicits._
    val base = freshBase()
    val root = base + "/t"; val out = base + "/out"
    Versioned.append(Seq((1L, "a"), (2L, "a")).toDF("k", "tag"), root)
    Versioned.append(Seq((3L, "b")).toDF("k", "tag"), root)
    Versioned.append(Seq((4L, "c"), (5L, "c")).toDF("k", "tag"), root)

    def drain(): Seq[(Long, Long, String)] = {
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)]()
      readVersioned(root).writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.select(col("k"), col("tag")).as[(Long, String)].collect()
            .foreach { case (k, t) => seen.add((id, k, t)) }; ()
        }
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      import scala.jdk.CollectionConverters._
      seen.iterator().asScala.toSeq.sortBy(r => (r._1, r._2))
    }

    val run1 = drain()
    // one micro-batch per COMMIT, in commit order
    assert(run1 === Seq(
      (0L, 1L, "a"), (0L, 2L, "a"),
      (1L, 3L, "b"),
      (2L, 4L, "c"), (2L, 5L, "c")), s"got $run1")

    // nothing new: a second run from the same checkpoint emits zero batches
    assert(drain().isEmpty)

    // two more commits (one a COW merge — its rewrites surface as re-adds)
    Versioned.append(Seq((6L, "d")).toDF("k", "tag"), root)
    val run2 = drain()
    assert(run2 === Seq((3L, 6L, "d")),
      s"restart must resume at the checkpointed version, got $run2")
    val _ = out
  }

  test("a change commit (COW merge) FAILS the stream by default — no silent duplication") {
    import spark.implicits._
    val base = freshBase()
    val root = base + "/t"
    Versioned.appendWithStats(
      (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v").repartitionByRange(2, col("k")),
      root, "k")
    Versioned.mergeInto(spark, root, Seq((5L, "NEW5")).toDF("k", "v"), Seq("k"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      readVersioned(root).writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
    // the root cause names the change commit and the opt-out
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("removed") && c.getMessage.contains("ignoreChanges")),
      s"expected the change-commit guard in the cause chain, got $e")
  }

  test("ignoreChanges opts into re-streaming a merge's rewritten files") {
    import spark.implicits._
    val base = freshBase()
    val root = base + "/t"
    Versioned.appendWithStats(
      (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v").repartitionByRange(2, col("k")),
      root, "k")
    Versioned.mergeInto(spark, root, Seq((5L, "NEW5")).toDF("k", "v"), Seq("k"))
    val batches = scala.collection.mutable.Map.empty[Long, Set[(Long, String)]]
    spark.readStream.format(classOf[VersionedStreamSource].getName)
      .option("path", root).option("ignoreChanges", "true").load()
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.synchronized {
          batches(id) = df.as[(Long, String)].collect().toSet }; ()
      }
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    // batch 0 = the original 20 rows; batch 1 = the merge's REWRITTEN file
    // (the affected half, with the update applied) — the caller opted into
    // dedup-by-key downstream
    assert(batches(0L).size === 20)
    assert(batches(1L).contains((5L, "NEW5")))
    assert(batches(1L).forall { case (k, _) => k <= 10 },
      "only the affected file's rows re-stream")
  }

  test("maxVersionsPerTrigger drains a 12-commit backlog in ceil(12/k) batches, same rows") {
    import spark.implicits._
    for (k <- Seq(4, 5)) {
      val base = freshBase()
      val root = base + "/t"
      (1 to 12).foreach(i => Versioned.append(Seq((i.toLong, s"c$i")).toDF("k", "tag"), root))
      val batches = scala.collection.mutable.Map.empty[Long, Set[(Long, String)]]
      spark.readStream.format(classOf[VersionedStreamSource].getName)
        .option("path", root).option("maxVersionsPerTrigger", k.toString).load()
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          batches.synchronized {
            batches(id) = df.as[(Long, String)].collect().toSet }; ()
        }
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      val expectBatches = (12 + k - 1) / k
      assert(batches.size === expectBatches,
        s"k=$k: expected $expectBatches batches, got ${batches.keySet}")
      assert(batches.values.flatten.toSet ===
        (1 to 12).map(i => (i.toLong, s"c$i")).toSet, s"k=$k: row set must be complete")
      // batch membership is contiguous version runs: batch 0 = v1..vk
      assert(batches(0L) === (1 to k).map(i => (i.toLong, s"c$i")).toSet)
    }
  }

  test("evolve() does not fail the stream; commits stream under the PINNED schema until restart") {
    import spark.implicits._
    val base = freshBase()
    val root = base + "/t"
    Versioned.append(Seq((1L, "a")).toDF("k", "tag"), root)
    def drain(pin: Option[org.apache.spark.sql.types.StructType])
        : Seq[(Long, Set[String], Long)] = {
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[String], Long)]
      val rd = spark.readStream.format(classOf[VersionedStreamSource].getName)
      pin.foreach(rd.schema)
      rd.option("path", root).load().writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          seen.synchronized { seen += ((id, df.columns.toSet, df.count())) }; ()
        }
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      seen.toSeq
    }
    assert(drain(None).map(_._2) === Seq(Set("k", "tag")))
    // evolve adds a column (removes no files — must NOT trip the change
    // guard), then a post-evolve append carries the new column
    Versioned.evolve(root, "extra STRING")
    Versioned.append(Seq((2L, "b", "x")).toDF("k", "tag", "extra"), root)
    // a query whose schema was pinned BEFORE the evolve (what a long-running
    // stream holds at that point) streams the new-generation file through
    // the OLD 2-column schema — the added column is silently absent, the
    // rows are not (Delta restarts on schema change; here the behavior is
    // explicit and pinned)
    val pinned = drain(Some(org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, tag STRING")))
    assert(pinned.forall(_._2 === Set("k", "tag")), s"got $pinned")
    assert(pinned.map(_._3).sum === 1L, "the appended row must still stream")
    // after a restart (fresh query start, schema re-inferred) the evolved
    // contract pins, and a further commit streams with the added column
    Versioned.append(Seq((3L, "c", "y")).toDF("k", "tag", "extra"), root)
    val restarted = drain(None)
    assert(restarted.map(_._2) === Seq(Set("k", "tag", "extra")), s"got $restarted")
  }

  test("load() with a user schema and no path fails actionably, not with an NPE") {
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format(classOf[VersionedStreamSource].getName)
        .schema(org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, tag STRING"))
        .load()
        .writeStream.format("noop").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", freshBase() + "/ckpt")
        .start().awaitTermination()
    }
    assert(e.getMessage.contains("path"), s"expected the path hint, got: ${e.getMessage}")
  }

  test("startingTimestamp is inclusive (Delta's 'at or after'); pre-table instants mean everything") {
    import spark.implicits._
    val base = freshBase()
    val root = base + "/t"
    Versioned.append(Seq((1L, "a")).toDF("k", "tag"), root)
    Thread.sleep(15)
    Versioned.append(Seq((2L, "b")).toDF("k", "tag"), root)
    Thread.sleep(15)
    Versioned.append(Seq((3L, "c")).toDF("k", "tag"), root)
    val ts = Versioned.versions(root).map(_.ts)
    def drainFrom(startTs: Long, tag: String): Seq[Long] = {
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      spark.readStream.format(classOf[VersionedStreamSource].getName)
        .option("path", root).option("startingTimestamp", startTs.toString).load()
        .writeStream
        .option("checkpointLocation", s"$base/ckpt_$tag")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("k").as[Long].collect().foreach(seen.add); ()
        }
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      import scala.jdk.CollectionConverters._
      seen.iterator().asScala.toSeq.sorted
    }
    // INCLUSIVE boundary (Delta: "all changes committed at or after the
    // timestamp"): an instant exactly AT a commit's ts streams that commit
    assert(drainFrom(ts(1), "a") === Seq(2L, 3L))
    assert(drainFrom(ts(2), "b") === Seq(3L))
    assert(drainFrom(ts(2) + 1, "b2") === Seq.empty,
      "one ms past the last commit streams nothing")
    assert(drainFrom(ts(1) - 1, "mid") === Seq(2L, 3L),
      "a between-commits instant streams the next commit onward")
    assert(drainFrom(ts(0) - 1000000, "c") === Seq(1L, 2L, 3L),
      "a pre-table instant streams everything")
    assert(drainFrom(ts(0), "d") === Seq(1L, 2L, 3L),
      "exactly at v1's commit streams everything (inclusive)")
  }

  test("maxBytesPerTrigger bounds admission by the manifests' recorded sizes") {
    import spark.implicits._
    def run(cap: Long, maxVers: Option[Int]): (Int, Set[Long]) = {
      val base = freshBase()
      val root = base + "/t"
      (1 to 6).foreach(i => Versioned.append(Seq((i.toLong, s"c$i")).toDF("k", "tag"), root))
      val batches = scala.collection.mutable.Map.empty[Long, Set[Long]]
      val rd = spark.readStream.format(classOf[VersionedStreamSource].getName)
        .option("path", root)
        .option("maxBytesPerTrigger", cap.toString)
      maxVers.foreach(v => rd.option("maxVersionsPerTrigger", v.toString))
      rd.load()
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          batches.synchronized { batches(id) = df.select("k").as[Long].collect().toSet }; ()
        }
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      (batches.size, batches.values.flatten.toSet)
    }
    // a 1-byte cap degenerates to one version per batch (first always admits)
    val (nTiny, rowsTiny) = run(cap = 1L, maxVers = Some(10))
    assert(nTiny === 6 && rowsTiny === (1L to 6L).toSet)
    // a huge cap leaves maxVersionsPerTrigger as the only bound
    val (nHuge, rowsHuge) = run(cap = Long.MaxValue / 2, maxVers = Some(10))
    assert(nHuge === 1 && rowsHuge === (1L to 6L).toSet)
    // the byte cap ALONE is size-based admission (Delta semantics): the
    // version cap defaults to unbounded, so a huge cap drains the whole
    // backlog in ONE batch — not a silent one-version-per-trigger no-op
    val (nAlone, rowsAlone) = run(cap = Long.MaxValue / 2, maxVers = None)
    assert(nAlone === 1 && rowsAlone === (1L to 6L).toSet,
      s"byte cap alone must admit by size, got $nAlone batches")
    // and a 1-byte cap alone still paces one version per batch
    val (nAloneTiny, _) = run(cap = 1L, maxVers = None)
    assert(nAloneTiny === 6)
  }

  test("maxFilesPerTrigger bounds admission by manifest file counts; caps compose") {
    import spark.implicits._
    def run(maxFiles: Option[Int], maxVers: Option[Int]): (Int, Set[Long]) = {
      val base = freshBase()
      val root = base + "/t"
      // 6 commits × 2 files each = 12 files of backlog
      (1 to 6).foreach(i => Versioned.append(
        Seq((i.toLong, "a"), (i.toLong + 100, "b")).toDF("k", "tag").repartition(2), root))
      assert(Versioned.currentVersion(root).get.files.length === 12)
      val batches = scala.collection.mutable.Map.empty[Long, Set[Long]]
      val rd = spark.readStream.format(classOf[VersionedStreamSource].getName)
        .option("path", root)
      maxFiles.foreach(f => rd.option("maxFilesPerTrigger", f.toString))
      maxVers.foreach(v => rd.option("maxVersionsPerTrigger", v.toString))
      rd.load()
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          batches.synchronized { batches(id) = df.select("k").as[Long].collect().toSet }; ()
        }
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      (batches.size, batches.values.flatten.toSet)
    }
    val all = ((1L to 6L) ++ (101L to 106L)).toSet
    // 12-file backlog at 4 files/trigger: ⌈12/4⌉ = 3 batches, identical rows
    val (n4, rows4) = run(maxFiles = Some(4), maxVers = None)
    assert(n4 === 3 && rows4 === all, s"expected 3 batches, got $n4")
    // a 1-file cap still drains (first version always admits): one
    // 2-file version per batch
    val (n1, rows1) = run(maxFiles = Some(1), maxVers = None)
    assert(n1 === 6 && rows1 === all)
    // composition: a huge file cap leaves the version cap as the bound
    val (nBoth, rowsBoth) = run(maxFiles = Some(1000), maxVers = Some(2))
    assert(nBoth === 3 && rowsBoth === all)
  }

  test("startingTimestamp on a pre-vt19 (timestamp-less) log streams everything, not nothing") {
    import spark.implicits._
    val base = freshBase()
    val root = base + "/t"
    Versioned.append(Seq((1L, "a")).toDF("k", "tag"), root)
    Versioned.append(Seq((2L, "b")).toDF("k", "tag"), root)
    // strip the ts= header from every manifest — the pre-vt19 on-disk form
    val vlog = java.nio.file.Paths.get(root, "_vlog")
    java.nio.file.Files.list(vlog).forEach { p =>
      if (p.getFileName.toString.matches("v\\d+\\.txt")) {
        val lines = java.nio.file.Files.readAllLines(p)
        lines.set(0, lines.get(0).replaceAll(" ts=\\d+", ""))
        java.nio.file.Files.write(p, lines)
      }
    }
    assert(Versioned.versions(root).forall(_.ts < 0), "fixture must be timestamp-less")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.readStream.format(classOf[VersionedStreamSource].getName)
      .option("path", root).option("startingTimestamp", "9999999999999").load()
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("k").as[Long].collect().foreach(seen.add); ()
      }
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    import scala.jdk.CollectionConverters._
    // unknown-age commits: the conservative read is ALL data (resolving
    // against ts=-1 would land on the head and silently skip everything)
    assert(seen.iterator().asScala.toSeq.sorted === Seq(1L, 2L))
  }

  test("startingVersion skips earlier commits on a fresh checkpoint") {
    import spark.implicits._
    val base = freshBase()
    val root = base + "/t"
    Versioned.append(Seq((1L, "a")).toDF("k", "tag"), root)
    Versioned.append(Seq((2L, "b")).toDF("k", "tag"), root)
    Versioned.append(Seq((3L, "c")).toDF("k", "tag"), root)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.readStream.format(classOf[VersionedStreamSource].getName)
      .option("path", root).option("startingVersion", "3").load()
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("k").as[Long].collect().foreach(seen.add); ()
      }
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(seen.iterator().asScala.toSeq === Seq(3L),
      "startingVersion=3 must emit only the third commit's rows")
  }
}

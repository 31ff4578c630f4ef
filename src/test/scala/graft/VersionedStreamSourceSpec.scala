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

  test("a merge commit streams its rewritten files (append-only re-add semantics)") {
    import spark.implicits._
    val base = freshBase()
    val root = base + "/t"
    Versioned.appendWithStats(
      (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v").repartitionByRange(2, col("k")),
      root, "k")
    Versioned.mergeInto(spark, root, Seq((5L, "NEW5")).toDF("k", "v"), Seq("k"))
    val batches = scala.collection.mutable.Map.empty[Long, Set[(Long, String)]]
    readVersioned(root).writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.synchronized {
          batches(id) = df.as[(Long, String)].collect().toSet }; ()
      }
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    // batch 0 = the original 20 rows; batch 1 = the merge's REWRITTEN file
    // (the affected half, with the update applied) — append-only semantics
    assert(batches(0L).size === 20)
    assert(batches(1L).contains((5L, "NEW5")))
    assert(batches(1L).forall { case (k, _) => k <= 10 },
      "only the affected file's rows re-stream")
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

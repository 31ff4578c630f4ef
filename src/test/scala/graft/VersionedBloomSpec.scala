package graft

import graft.merge.Versioned
import org.apache.spark.sql.functions._

/** VT26: per-file bloom bits in the manifest — point-lookup file skipping
  * on high-cardinality unsorted columns (the pruning min/max ranges cannot
  * do; Delta bloom index / Iceberg puffin design).
  */
class VersionedBloomSpec extends SparkSuite {

  private def root(): String = tmpDir() + "/t"

  // 100 rows in 4 range-files on k; `tag` is file-local (g0..g3) but
  // UNTRACKED by range stats — only the bloom can prune a tag probe
  private def fixture(r: String): Unit = {
    import spark.implicits._
    Versioned.appendWithStats(
      (1L to 100L).map(k => (k, s"g${(k - 1) / 25}", k * 1.0)).toDF("k", "tag", "price")
        .repartitionByRange(4, col("k")),
      r, Seq("k"), bloomCols = Seq("tag"))
  }

  test("readEquals prunes to a file subset with zero false negatives; absent values prune everything") {
    import spark.implicits._
    val r = root()
    fixture(r)
    val v = Versioned.currentVersion(r).get
    assert(v.bloomCols === Seq("tag") && v.blooms.size === v.files.size,
      "every file records a bloom for the tracked column")
    // every present value: planned subset, exact rows (no false negatives)
    (0 to 3).foreach { g =>
      val q = Versioned.readEquals(spark, r, "tag", s"g$g")
      assert(q.inputFiles.length < v.files.length,
        s"g$g must prune (planned ${q.inputFiles.length} of ${v.files.length})")
      assert(q.select("k").as[Long].collect().sorted.toSeq
        === (g * 25 + 1 to g * 25 + 25).map(_.toLong),
        s"bloom pruning must never lose rows for g$g")
    }
    // absent value: (almost surely) zero files planned, exactly zero rows
    val none = Versioned.readEquals(spark, r, "tag", "nope")
    assert(none.count() === 0)
    assert(none.inputFiles.isEmpty, "an absent value's probe prunes every file")
    // untracked column: conservative full read, correct rows
    val un = Versioned.readEquals(spark, r, "price", 50.0)
    assert(un.select("k").as[Long].collect().toSeq === Seq(50L))
    // NULL probe: SQL equality is never true
    assert(Versioned.readEquals(spark, r, "tag", null).count() === 0)
  }

  test("blooms round-trip the manifest (delta + checkpoint fold) and type-align the probe") {
    import spark.implicits._
    val r = root()
    fixture(r)
    // push past a checkpoint boundary: blooms must survive BOTH the delta
    // fold and the FULL re-render
    (2 to 11).foreach { i =>
      Versioned.appendWithStats(
        Seq((100L + i, s"h$i", 1.0)).toDF("k", "tag", "price")
          .repartition(1), r, Seq("k"), bloomCols = Seq("tag"))
    }
    val v = Versioned.currentVersion(r).get
    assert(v.n >= 11 && v.blooms.size === v.files.size)
    val q = Versioned.readEquals(spark, r, "tag", "h7")
    assert(q.inputFiles.length === 1 && q.count() === 1)
    // long-column bloom: an Int-typed probe casts to the contract type so
    // the hash matches what the write side computed over BIGINT values
    val r2 = root() + "2"
    Versioned.appendWithStats(
      (1L to 100L).map(k => (k, k * 7)).toDF("k", "id").repartitionByRange(4, col("k")),
      r2, Seq("k"), bloomCols = Seq("id"))
    val ql = Versioned.readEquals(spark, r2, "id", 70) // Int probe, BIGINT column
    assert(ql.select("k").as[Long].collect().toSeq === Seq(10L))
    assert(ql.inputFiles.length < 4)
  }

  test("COW delete and compact recompute blooms; clone carries; rename re-keys; drop clears") {
    import spark.implicits._
    val r = root()
    fixture(r)
    // COW delete rewrites the first file: its rewrite gets a fresh bloom
    Versioned.deleteWhere(spark, r, col("k") <= 10L)
    val v2 = Versioned.currentVersion(r).get
    assert(v2.blooms.size === v2.files.size, "rewritten files re-bloom")
    assert(Versioned.readEquals(spark, r, "tag", "g0")
      .select("k").as[Long].collect().sorted.toSeq === (11L to 25L))
    // compact: blooms recomputed for the packed files
    Versioned.compact(spark, r, nFiles = 2)
    val v3 = Versioned.currentVersion(r).get
    assert(v3.blooms.size === v3.files.size && v3.bloomCols === Seq("tag"))
    assert(Versioned.readEquals(spark, r, "tag", "g3").count() === 25)
    // clone carries the bits (zero-copy)
    val dst = tmpDir() + "/clone"
    Versioned.cloneTable(r, dst)
    assert(Versioned.readEquals(spark, dst, "tag", "g3").count() === 25)
    // rename re-keys the bloom column; the probe under the NEW name prunes
    Versioned.evolveRename(r, "tag", "label")
    assert(Versioned.currentVersion(r).get.bloomCols === Seq("label"))
    val qr = Versioned.readEquals(spark, r, "label", "g3")
    assert(qr.count() === 25)
    // post-rename appends keep blooming under the new name
    Versioned.appendWithStats(
      Seq((999L, "zz", 1.0)).toDF("k", "label", "price").repartition(1),
      r, Seq("k"), bloomCols = Seq("label"))
    val qz = Versioned.readEquals(spark, r, "label", "zz")
    assert(qz.count() === 1 && qz.inputFiles.length === 1)
    // dropping the bloom column clears tracking and bits
    Versioned.evolveDrop(r, Seq("label"))
    val v4 = Versioned.currentVersion(r).get
    assert(v4.bloomCols.isEmpty && v4.blooms.isEmpty)
  }

  test("range stats and blooms COMPOSE: the intersection plans fewer files than either alone") {
    import spark.implicits._
    val r = root()
    // k range-clustered; tag REPEATS across the key space (g0 in files 1
    // and 3), so the bloom alone plans two files while k-range + bloom
    // plans one
    Versioned.appendWithStats(
      (1L to 100L).map { k =>
        val g = ((k - 1) / 25) % 2 // g0, g1, g0, g1 across the 4 files
        (k, s"g$g", k * 1.0)
      }.toDF("k", "tag", "price").repartitionByRange(4, col("k")),
      r, Seq("k"), bloomCols = Seq("tag"))
    val bloomOnly = Versioned.readEquals(spark, r, "tag", "g0")
    assert(bloomOnly.inputFiles.length === 2 && bloomOnly.count() === 50)
    // readEquals' candidate set intersects range pruning: probing tag
    // through a readWhere on k then equality... the compose path is
    // readEquals itself when the probe column IS range-tracked
    val kq = Versioned.readEquals(spark, r, "k", 30L) // k: ranges prune, bloom untracked
    assert(kq.inputFiles.length === 1 && kq.select("tag").as[String].head() === "g1")
  }
}

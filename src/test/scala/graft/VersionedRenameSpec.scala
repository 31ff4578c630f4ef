package graft

import graft.merge.Versioned
import org.apache.spark.sql.functions._

/** VT24: metadata-only column RENAME via column mapping (logical names in
  * the contract, stable physical names in the files — Delta's published
  * column-mapping design).
  */
class VersionedRenameSpec extends SparkSuite {

  private def root(): String = tmpDir() + "/t"

  test("rename is metadata-only; head reads the new name, old versions the old; appends follow") {
    import spark.implicits._
    val r = root()
    Versioned.append((1L to 100L).map(k => (k, k * 10.0)).toDF("k", "price"), r)
    val before = Versioned.currentVersion(r).get.files
    val v = Versioned.evolveRename(r, "price", "amount")
    assert(v.op === "evolve-rename" && v.files === before, "zero data files touched")
    assert(v.colMap === Map("amount" -> "price"))
    // head: logical name `amount`, same values
    val head = Versioned.read(spark, r)
    assert(head.columns.toSeq === Seq("k", "amount"))
    assert(head.filter(col("k") === 7L).select("amount").as[Double].head() === 70.0)
    // v1 time-travels under its own contract
    assert(Versioned.read(spark, r, Some(1)).columns.toSeq === Seq("k", "price"))
    // old-shape appends refuse (schema contract is logical)
    intercept[IllegalArgumentException] {
      Versioned.append(Seq((101L, 1.0)).toDF("k", "price"), r)
    }
    // new-shape appends land…
    Versioned.append(Seq((101L, 1010.0)).toDF("k", "amount"), r)
    val all = Versioned.read(spark, r)
    assert(all.count() === 101)
    assert(all.filter(col("k") === 101L).select("amount").as[Double].head() === 1010.0)
    // …and their FILES carry the PHYSICAL name (generation-stable on disk):
    // the post-rename commit's file, read raw, has column `price`
    val newFiles = Versioned.currentVersion(r).get.files.toSet -- before.toSet
    val raw = spark.read.parquet(newFiles.map(f =>
      java.nio.file.Paths.get(r).resolve(f).toString).toSeq: _*)
    assert(raw.columns.toSeq === Seq("k", "price"),
      s"landed files must carry physical names, got ${raw.columns.toSeq}")
  }

  test("skipping stats follow the rename: pruning on the new name plans subsets") {
    import spark.implicits._
    val r = root()
    Versioned.appendWithStats(
      (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v").repartitionByRange(4, col("k")),
      r, "k")
    Versioned.evolveRename(r, "k", "id")
    val cur = Versioned.currentVersion(r).get
    assert(cur.statsCols === Seq("id"))
    val q = Versioned.readWhere(spark, r, col("id") <= 25L)
    assert(q.inputFiles.length < cur.files.length, "recorded ranges must still prune")
    assert(q.count() === 25)
    // post-rename appendWithStats lands under the SAME tracked set
    Versioned.appendWithStats(
      (101L to 200L).map(k => (k, s"v$k")).toDF("id", "v").repartitionByRange(4, col("id")),
      r, "id")
    assert(Versioned.readWhere(spark, r, col("id") > 150L).count() === 50)
  }

  test("constraints follow the rename; string literals do not") {
    import spark.implicits._
    val r = root()
    Versioned.append(Seq((1L, 10.0, "open")).toDF("k", "price", "status"), r)
    Versioned.addConstraint(spark, r, "price_pos", "price > 0")
    Versioned.addConstraint(spark, r, "not_price_lit", "status != 'price'")
    Versioned.evolveRename(r, "price", "amount")
    val cons = Versioned.currentVersion(r).get.constraints.toMap
    assert(cons("price_pos") === "amount > 0")
    assert(cons("not_price_lit") === "status != 'price'", "literals must not rewrite")
    // the rewritten constraint still enforces
    val e = intercept[IllegalArgumentException] {
      Versioned.append(Seq((2L, -1.0, "x")).toDF("k", "amount", "status"), r)
    }
    assert(e.getMessage.contains("price_pos") && e.getMessage.contains("amount > 0"))
    Versioned.append(Seq((2L, 2.0, "x")).toDF("k", "amount", "status"), r)
    assert(Versioned.read(spark, r).count() === 2)
  }

  test("renameInSql: word boundaries, backticks, literals") {
    assert(Versioned.renameInSql("price > 0 AND unit_price < price2", "price", "amt")
      === "amt > 0 AND unit_price < price2")
    assert(Versioned.renameInSql("`price` + length('price') > 0", "price", "amt")
      === "`amt` + length('price') > 0")
    assert(Versioned.renameInSql("coalesce(price, price) = price", "price", "amt")
      === "coalesce(amt, amt) = amt")
  }

  test("round-trip rename collapses to identity; repeated renames chase the original physical name") {
    import spark.implicits._
    val r = root()
    Versioned.append(Seq((1L, 1.0)).toDF("a", "x"), r)
    Versioned.evolveRename(r, "a", "b")
    assert(Versioned.currentVersion(r).get.colMap === Map("b" -> "a"))
    Versioned.evolveRename(r, "b", "c")
    assert(Versioned.currentVersion(r).get.colMap === Map("c" -> "a"),
      "physical identity is the ORIGINAL name, not the previous logical one")
    Versioned.evolveRename(r, "c", "a")
    assert(Versioned.currentVersion(r).get.colMap === Map.empty, "a→b→c→a is identity")
    assert(Versioned.read(spark, r).columns.toSeq === Seq("a", "x"))
    assert(Versioned.read(spark, r).count() === 1)
  }

  test("evolve guards the physical namespace after a rename") {
    import spark.implicits._
    val r = root()
    Versioned.append(Seq((1L, 1.0)).toDF("k", "price"), r)
    Versioned.evolveRename(r, "price", "amount")
    // adding a column named `price` would collide with the renamed-away
    // physical column still present in old files
    val e = intercept[IllegalArgumentException] {
      Versioned.evolve(r, "price DOUBLE")
    }
    assert(e.getMessage.contains("PHYSICAL"))
    // an unrelated add still works, and reads NULL over old generations
    Versioned.evolve(r, "note STRING")
    assert(Versioned.read(spark, r).columns.toSeq === Seq("k", "amount", "note"))
    assert(Versioned.read(spark, r).filter(col("note").isNull).count() === 1)
  }

  test("compact materializes the mapping: files rewrite under logical names, map drops") {
    import spark.implicits._
    val r = root()
    Versioned.appendWithStats(
      (1L to 100L).map(k => (k, k * 1.0)).toDF("k", "price").repartitionByRange(4, col("k")),
      r, "k")
    Versioned.evolveRename(r, "price", "amount")
    val v = Versioned.compact(spark, r, nFiles = 2)
    assert(v.colMap === Map.empty, "compaction drops the mapping")
    // the rewritten files carry LOGICAL names now
    val raw = spark.read.parquet(v.files.map(f =>
      java.nio.file.Paths.get(r).resolve(f).toString): _*)
    assert(raw.columns.toSeq === Seq("k", "amount"))
    assert(Versioned.read(spark, r).count() === 100)
    // pre-compact versions still read under their mapping
    assert(Versioned.read(spark, r, Some(2)).columns.toSeq === Seq("k", "amount"))
    assert(Versioned.read(spark, r, Some(1)).columns.toSeq === Seq("k", "price"))
  }

  test("COW merge and delete work through the mapping; CDC across a pure rename is empty") {
    import spark.implicits._
    val r = root()
    Versioned.appendWithStats(
      (1L to 100L).map(k => (k, k * 1.0)).toDF("k", "price").repartitionByRange(4, col("k")),
      r, "k")
    Versioned.evolveRename(r, "price", "amount") // v2
    // a pure rename shares every file: empty change set
    assert(Versioned.changes(spark, r, 1, 2).count() === 0)
    val pre = Versioned.currentVersion(r).get
    val post = Versioned.mergeInto(spark, r,
      Seq((5L, 500.0), (200L, 2000.0)).toDF("k", "amount"), Seq("k"))
    assert((pre.files.toSet -- post.files.toSet).size < pre.files.size,
      "COW blast radius holds under the mapping")
    val m = Versioned.read(spark, r).as[(Long, Double)].collect().toMap
    assert(m(5L) === 500.0 && m(200L) === 2000.0 && m.size === 101)
    Versioned.deleteWhere(spark, r, col("k") <= 10L)
    assert(Versioned.read(spark, r).count() === 91)
    // keyed CDC across the merge uses logical names end-to-end
    val ch = Versioned.changesByKey(spark, r, 2, 3, Seq("k"))
    assert(ch.filter(col("_change_type") === "update_post")
      .select("amount").as[Double].collect().toSet === Set(500.0))
  }

  test("clones carry the mapping; the native relation serves logical SQL with pruning") {
    import spark.implicits._
    val base = tmpDir()
    val src = base + "/src"; val sh = base + "/clone"
    Versioned.appendWithStats(
      (1L to 100L).map(k => (k, k * 1.0)).toDF("k", "price").repartitionByRange(4, col("k")),
      src, "k")
    Versioned.evolveRename(src, "k", "id")
    Versioned.cloneTable(src, sh)
    assert(Versioned.read(spark, sh).columns.toSeq === Seq("id", "price"))
    assert(Versioned.read(spark, sh).count() === 100)
    // native relation: logical SQL, manifest-stats pruning on the renamed col
    Versioned.table(spark, src).createOrReplaceTempView("vt24_rel")
    val q = spark.sql("SELECT id, price FROM vt24_rel WHERE id BETWEEN 1 AND 25")
    assert(q.count() === 25)
    val scanned = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray.map(_.filePath.toString).toSeq
    }.flatten
    assert(scanned.nonEmpty &&
      scanned.length < Versioned.currentVersion(src).get.files.length,
      s"pruning must survive the rename (scanned ${scanned.length})")
  }

  test("the streaming source reads renamed tables under the logical schema") {
    import spark.implicits._
    val base = tmpDir()
    val r = base + "/t"
    Versioned.append(Seq((1L, "a")).toDF("k", "tag"), r)
    Versioned.evolveRename(r, "k", "id")
    Versioned.append(Seq((2L, "b")).toDF("id", "tag"), r)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.readStream.format(classOf[graft.streaming.VersionedStreamSource].getName)
      .option("path", r).load()
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        assert(df.columns.toSeq === Seq("id", "tag"))
        df.select("id").as[Long].collect().foreach(seen.add); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(seen.iterator().asScala.toSeq.sorted === Seq(1L, 2L),
      "both file generations (pre- and post-rename commits) stream under the logical name")
  }

  test("dropping a renamed column removes its mapping entry; guards hold") {
    import spark.implicits._
    val r = root()
    Versioned.append(Seq((1L, 1.0, "x")).toDF("k", "price", "note"), r)
    Versioned.evolveRename(r, "price", "amount")
    Versioned.evolveDrop(r, Seq("amount"))
    val cur = Versioned.currentVersion(r).get
    assert(cur.colMap === Map.empty)
    assert(Versioned.read(spark, r).columns.toSeq === Seq("k", "note"))
    // time travel: the renamed generation and the original both intact
    assert(Versioned.read(spark, r, Some(2)).columns.toSeq === Seq("k", "amount", "note"))
    assert(Versioned.read(spark, r, Some(1)).columns.toSeq === Seq("k", "price", "note"))
    // guards: unknown / duplicate / non-identifier names
    intercept[IllegalArgumentException] { Versioned.evolveRename(r, "nope", "x") }
    intercept[IllegalArgumentException] { Versioned.evolveRename(r, "k", "note") }
    intercept[IllegalArgumentException] { Versioned.evolveRename(r, "k", "bad:name") }
  }

  test("the mapping survives checkpoint folds and stream-batch commits") {
    import spark.implicits._
    val r = root()
    Versioned.append(Seq((1L, 1.0)).toDF("k", "price"), r)
    Versioned.evolveRename(r, "price", "amount")
    // push past a checkpoint boundary (v10 FULL renders from commitOn's
    // state — a dropped colmap here would break every later read)
    (3 to 12).foreach(i =>
      Versioned.append(Seq((i.toLong, i * 1.0)).toDF("k", "amount"), r))
    assert(Versioned.currentVersion(r).get.colMap === Map("amount" -> "price"))
    assert(Versioned.read(spark, r).count() === 11)
    // stream-batch append under the mapping
    Versioned.appendStreamBatch(Seq((99L, 99.0)).toDF("k", "amount"), r, batchId = 0L)
    assert(Versioned.read(spark, r).filter(col("k") === 99L)
      .select("amount").as[Double].head() === 99.0)
  }
}

package graft

import graft.merge.{MergeInto, Versioned}
import graft.merge.MergeInto.MergeAction
import org.apache.spark.sql.functions._

/** M10/VT22: the full conditional-clause MERGE grammar (WHEN MATCHED [AND
  * cond] THEN UPDATE/DELETE, WHEN NOT MATCHED [AND cond] THEN INSERT).
  */
class MergeClausesSpec extends SparkSuite {

  import MergeInto.mergeClauses

  private def target() = {
    import spark.implicits._
    Seq((1L, 10.0, "keep"), (2L, 20.0, "upd"), (3L, 30.0, "del"), (4L, 40.0, "keep"))
      .toDF("k", "price", "tag")
  }

  test("clauses evaluate in order, first match wins; unmatched target carries; insert condition filters") {
    import spark.implicits._
    val src = Seq((2L, 99.0, "x"), (3L, -1.0, "x"), (5L, 500.0, "new"), (6L, 1.0, "small"))
      .toDF("k", "price", "tag")
    val out = mergeClauses(target(), src, Seq("k"),
      matched = Seq(
        MergeAction.Delete(Some(col("s.price") < 0)), // 3 deletes
        MergeAction.Update(Some(col("s.price") > 50), // 2 updates (doubled)
          Map("price" -> col("s.price") * 2))),
      insert = Some(col("s.price") > 100)) // only 5 inserts; 6 filtered
      .as[(Long, Double, String)].collect().toSet
    assert(out === Set(
      (1L, 10.0, "keep"), // unmatched target untouched
      (2L, 198.0, "upd"), // updated price only — tag kept (partial SET)
      (4L, 40.0, "keep"),
      (5L, 500.0, "new"))) // inserted; k=3 deleted; k=6 insert-filtered
  }

  test("Update with empty set updates ALL columns from source (the reference shape); no-clause match keeps the row") {
    import spark.implicits._
    val src = Seq((2L, 99.0, "SRC"), (4L, -5.0, "SRC")).toDF("k", "price", "tag")
    val out = mergeClauses(target(), src, Seq("k"),
      matched = Seq(MergeAction.Update(Some(col("s.price") > 0))), // k=4 matches NO clause
      insert = None)
      .as[(Long, Double, String)].collect().toSet
    assert(out === Set(
      (1L, 10.0, "keep"), (2L, 99.0, "SRC"), (3L, 30.0, "del"), (4L, 40.0, "keep")))
  }

  test("NULL clause conditions are false (SQL semantics); conditions can reference BOTH sides") {
    import spark.implicits._
    val t = Seq((1L, 10.0, Some("a")), (2L, 20.0, Option.empty[String])).toDF("k", "price", "tag")
    val src = Seq((1L, 100.0, "s"), (2L, 200.0, "s")).toDF("k", "price", "tag")
    val out = mergeClauses(t, src, Seq("k"),
      // length(t.tag) > 0 is NULL for k=2's NULL tag → clause does not apply
      matched = Seq(MergeAction.Update(Some(length(col("t.tag")) > 0 &&
        col("s.price") > col("t.price")), Map("price" -> col("s.price")))))
      .select("k", "price").as[(Long, Double)].collect().toSet
    assert(out === Set((1L, 100.0), (2L, 20.0)))
  }

  test("vt22: clause merge through the log — COW blast radius holds, deletes land, old version intact") {
    import spark.implicits._
    val root = tmpDir() + "/t"
    Versioned.appendWithStats(
      (1L to 100L).map(k => (k, k * 1.0)).toDF("k", "price")
        .repartitionByRange(4, col("k")), root, "k")
    val src = Seq((5L, -1.0), (6L, 600.0), (200L, 2000.0), (201L, 1.0)).toDF("k", "price")
    val pre = Versioned.currentVersion(root).get
    val post = Versioned.mergeIntoClauses(spark, root, src, Seq("k"),
      matched = Seq(
        MergeAction.Delete(Some(col("s.price") < 0)),
        MergeAction.Update(None, Map("price" -> col("s.price")))),
      insert = Some(col("s.price") > 1000))
    assert(post.op === "merge-clauses")
    // blast radius: source keys 5,6 live in the first quarter; 200/201 are
    // inserts — only key-overlapping files rewrite
    val removed = pre.files.toSet -- post.files.toSet
    assert(removed.size < pre.files.size, s"COW must not rewrite the whole table")
    val cur = Versioned.read(spark, root).as[(Long, Double)].collect().toMap
    assert(!cur.contains(5L), "matched delete lands")
    assert(cur(6L) === 600.0, "matched update lands")
    assert(cur(200L) === 2000.0 && !cur.contains(201L), "insert condition filters")
    assert(cur.size === 100 - 1 + 1)
    // time travel: v1 still holds the deleted row
    assert(Versioned.read(spark, root, Some(1)).filter(col("k") === 5L).count() === 1)
  }

  test("reserved working-column names refuse up front, not as an ambiguous-reference error") {
    import spark.implicits._
    val t = Seq((1L, "__matched")).toDF("k", "__matched")
    val s = Seq((1L, "x")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      mergeClauses(t, s.withColumnRenamed("v", "__matched"), Seq("k"),
        matched = Seq(MergeAction.Update()), insert = None)
    }
    assert(e.getMessage.contains("__matched") && e.getMessage.contains("reserves"))
    val e2 = intercept[IllegalArgumentException] {
      mergeClauses(Seq((1L, 1.0)).toDF("k", "__action"), Seq((1L, 1.0)).toDF("k", "__action"),
        Seq("k"), matched = Seq(MergeAction.Update()), insert = None)
    }
    assert(e2.getMessage.contains("__action"))
  }
}

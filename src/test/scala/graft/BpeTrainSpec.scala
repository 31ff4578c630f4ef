package graft

import graft.text.BpeTrain
import org.apache.spark.sql.functions._

/** BPE training: hand-computable planted corpus pins the merge sequence,
  * counts, leftmost-non-overlapping application (the <a><a><a> case), the
  * total tie-break, and the early stop when no repeated pair remains.
  */
class BpeTrainSpec extends SparkSuite {

  test("planted corpus: merge order, counts, run handling, early stop") {
    import spark.implicits._
    // 10 docs of "abab abab cd": distinct words abab (cnt 20), cd (cnt 10).
    // iter 0 state <a><b><a><b>: pairs (a,b)x2 + (b,a)x1 per word
    //   → (a,b) 40, (b,a) 20, (c,d) 10 → merge (a,b,40)
    // iter 1 state <ab><ab>: (ab,ab) 20 → merge (ab,ab,20)
    // iter 2: only <abab> and <c><d> remain → merge (c,d,10)
    // iter 3: no pair with count >= 2 → early stop at 3 of 5 requested
    val docs = (1 to 10).map(i => (i.toLong, "abab abab cd")).toDF("doc_id", "text")
    val got = BpeTrain.train(docs, "text", merges = 5)
      .orderBy(col("iter"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((0, "a", "b", 40L), (1, "ab", "ab", 20L), (2, "c", "d", 10L)))
  }

  test("odd run: <a><a><a> merges leftmost non-overlapping (aa + a, not a + aa)") {
    import spark.implicits._
    // "aaa" x4: iter 0 pairs (a,a) 8 → merge (a,a,8); state <aa><a>;
    // iter 1 pairs (aa,a) 4 → merge (aa,a,4) — would be (a,aa) if the
    // replace were rightmost or overlapping
    val docs = (1 to 4).map(i => (i.toLong, "aaa")).toDF("doc_id", "text")
    val got = BpeTrain.train(docs, "text", merges = 2)
      .orderBy(col("iter")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((0, "a", "a", 8L), (1, "aa", "a", 4L)))
  }

  test("tie-break is total: equal counts resolve by (left, right) ascending") {
    import spark.implicits._
    // "xy" and "uv" both cnt 4 → (u,v) wins over (x,y) lexicographically
    val docs = (1 to 4).map(i => (i.toLong, "xy uv")).toDF("doc_id", "text")
    val first = BpeTrain.train(docs, "text", merges = 1).head
    assert((first.getString(1), first.getString(2)) === (("u", "v")))
  }

  test("roundtrip: learned merges applied in training order, atomic fallback") {
    import spark.implicits._
    // corpus as in the planted test, plus one doc exercising the fallbacks.
    // merges learned: (a,b), (ab,ab), (c,d).
    //   doc 1 "abab abab cd": abab → <abab> = 1 tok (both merges apply in
    //     order: <a><b><a><b> → <ab><ab> → <abab>), cd → <cd> = 1
    //     → 1 + 1 + 1 = 3
    //   doc 11 "abab x#9 zz": abab = 1, "x#9" non-alnum → 1 atomic,
    //     zz → trainable but no learned merge applies → <z><z> = 2 → total 4
    //   doc 12 "" → 0 tokens
    val docs = ((1 to 10).map(i => (i.toLong, "abab abab cd")) ++
      Seq((11L, "abab x#9 zz"), (12L, ""))).toDF("doc_id", "text")
    val got = BpeTrain.trainAndCount(docs, "text", merges = 3)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.take(10).forall(_._2 == 3L))
    assert(got(10) === ((11L, 4L)))
    assert(got(11) === ((12L, 0L)))
  }

  test("non-ascii and mixed-case words are excluded from training") {
    import spark.implicits._
    val docs = Seq((1L, "Hello WORLD héllo 123 ok ok ok")).toDF("doc_id", "text")
    // after lowercasing, "hello"/"world"/"123"/"ok" qualify (ASCII alnum);
    // "héllo" does not. Only ok repeats → the only pair with count >= 2 is (o,k) 3
    val got = BpeTrain.train(docs, "text", merges = 1).collect()
    assert(got.length === 1)
    assert((got(0).getString(1), got(0).getString(2), got(0).getLong(3)) === (("o", "k", 3L)))
  }
}

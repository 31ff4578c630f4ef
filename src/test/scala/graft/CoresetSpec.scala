package graft

import graft.ann.Coreset

/** Greedy k-center: planted geometry pins the traversal order, the
  * cover-radius values, the duplicate-absorbing property, tie-breaks and
  * the early stop when the corpus is exhausted.
  */
class CoresetSpec extends SparkSuite {

  test("farthest-point traversal: order, radii, near-dup absorption, early stop") {
    import spark.implicits._
    val M = 1000000L
    val docs = Seq(
      (0L, Array(0f, 0f, 0f)),       // seed (smallest vec_id)
      (1L, Array(0f, 0f, 0.001f)),   // near-dup of the seed — picked LAST
      (2L, Array(1f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f)),
      (4L, Array(1f, 1f, 1f))        // far corner — picked FIRST after seed
    ).toDF("vec_id", "embedding")
    val got = Coreset.kCenter(docs, k = 8) // k > support → early stop at 5
      .orderBy("iter").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (0, 0L, 0L),
      (1, 4L, 3L * M * M),          // corner at squared distance 3
      (2, 2L, M * M),               // ties (2,3) at 1e12 → smaller vec_id
      (3, 3L, M * M),
      (4, 1L, 1000L * 1000L)))      // the near-dup only when nothing diverse remains
  }

  test("exact duplicates of a center are never selected") {
    import spark.implicits._
    val docs = Seq(
      (10L, Array(0f, 0f)), (11L, Array(0f, 0f)), (12L, Array(0f, 0f)),
      (13L, Array(5f, 5f))).toDF("vec_id", "embedding")
    val got = Coreset.kCenter(docs, k = 4).collect()
    // seed 10, then 13; the two duplicates of 10 have min_d2 = 0 → stop
    assert(got.map(_.getLong(1)).toSet === Set(10L, 13L))
  }
}

package graft

import graft.ann.Ann
import graft.dedup.Dedup
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Dedup + similarity-search behavior: planted near-duplicates must be
  * found; MinHash estimates must track exact Jaccard; brute-force ANN must
  * rank an identical vector first.
  */
class DedupAnnSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = sf("documents").select("doc_id", "text")

  test("exact dedup keeps one row per identical normalized text") {
    val dupped = docs.unionByName(
      docs.filter(col("doc_id") < 10).withColumn("doc_id", col("doc_id") + 1000))
    val out = Dedup.exact(dupped.withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", lit(0L)), "doc_id", "text")
    assert(out.count() == docs.count())
    // survivor is the smallest id
    assert(out.filter(col("doc_id") >= 1000).isEmpty)
  }

  test("minhashLsh finds planted near-duplicates and skips unrelated docs") {
    val mutated = docs.filter(col("doc_id") < 8)
      .select((col("doc_id") + 5000).as("doc_id"),
        concat(col("text"), lit(" tiny suffix")).as("text"))
    val pairs = Dedup.minhashLsh(docs.unionByName(mutated), "doc_id", "text",
      numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0 until 8).foreach { i =>
      assert(pairs.contains((i.toLong, i + 5000L)), s"missing planted pair $i")
    }
  }

  test("minhash est_jaccard tracks exact n-gram jaccard within 0.25") {
    val mutated = docs.filter(col("doc_id") < 8)
      .select((col("doc_id") + 5000).as("doc_id"),
        concat(col("text"), lit(" tiny suffix")).as("text"))
    val all = docs.unionByName(mutated)
    val cand = Dedup.minhashLsh(all, "doc_id", "text", threshold = 0.3)
    val exact = Dedup.ngramJaccard(cand.select("id_a", "id_b"), all, "doc_id", "text")
    val joined = cand.join(exact, Seq("id_a", "id_b"))
    val bad = joined.filter(abs(col("est_jaccard") - col("jaccard")) > 0.25)
    assert(bad.count() == 0, bad.collect().mkString(","))
  }

  test("simhash of identical docs is identical; near-identical within hamming 3") {
    val base = docs.filter(col("doc_id") < 5)
    val same = base.withColumn("doc_id", col("doc_id") + 7000)
    val sigs = Dedup.simhashSignatures(base.unionByName(same), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    (0 until 5).foreach(i => assert(sigs(i.toLong) == sigs(i + 7000L)))
  }

  test("brute-force ANN ranks an identical vector as the top neighbor") {
    val emb = sf("embeddings")
    val clones = emb.filter(col("vec_id") < 3)
      .withColumn("vec_id", col("vec_id") + 9000)
    val all = emb.unionByName(clones)
    val top = Ann.bruteForceTopK(all.filter(col("vec_id") >= 9000), all, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0 until 3).foreach(i => assert(top(i + 9000L) == i.toLong))
  }

  test("LSH buckets: identical vectors land in the same bucket") {
    val emb = sf("embeddings").limit(50)
    val b1 = emb.select(col("vec_id"), Ann.lshBucket(col("embedding"), 8).as("b"))
    val b2 = emb.select(col("vec_id"), Ann.lshBucket(col("embedding"), 8).as("b"))
    assert(b1.exceptAll(b2).isEmpty) // deterministic
  }

  test("fingerprint is whitespace-normalizing and stable") {
    val df = Seq((1L, "Hello  world  foo"), (2L, "hello world foo"), (3L, "different"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(df(1L) == df(2L) && df(1L) != df(3L))
  }

  test("langId detects the dominant stopword language") {
    val df = Seq(
      (1L, "the cat and the dog in the house"),
      (2L, "el perro y la casa en el sol"),
      (3L, "qqq www eee")).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(df(1L) == "en" && df(2L) == "es" && df(3L) == "unknown")
  }
}

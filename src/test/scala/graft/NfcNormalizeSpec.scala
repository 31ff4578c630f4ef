package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

/** tx12: native NFC normalization — canonicalization semantics, ASCII
  * passthrough, null handling, and codegen ≡ interpreted bit-identity.
  */
class NfcNormalizeSpec extends SparkSuite {
  import spark.implicits._

  private val decomposed = "cafe\u0301"  // e + combining acute
  private val precomposed = "caf\u00e9"  // precomposed e-acute

  test("decomposed sequences collapse to the precomposed form; ASCII unchanged") {
    val df = Seq((1L, decomposed), (2L, precomposed), (3L, "plain ascii"),
      (4L, null.asInstanceOf[String])).toDF("id", "s")
    val out = df.select(col("id"), TextOps.nfc(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === Some(precomposed))
    assert(out(2L) === Some(precomposed))
    assert(out(3L) === Some("plain ascii"))
    assert(out(4L) === None)
    // normalization actually shortens: 5 chars -> 4
    assert(decomposed.length === 5 && precomposed.length === 4)
  }

  test("codegen and interpreted paths agree on real corpus text") {
    val df = sf("documents")
      .withColumn("raw", concat(col("text"), lit(" " + decomposed)))
    def result() = df.select(col("doc_id"), TextOps.nfc(col("raw")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val codegen = result()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = result()
      assert(codegen === interpreted)
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
    assert(codegen.values.forall(_.endsWith(" " + precomposed)))
  }
}

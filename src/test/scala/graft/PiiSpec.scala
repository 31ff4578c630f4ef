package graft

import graft.text.Pii
import org.apache.spark.sql.functions._

/** tx15: PII scrub. Pass-order discipline (an IP or email's digits must
  * never double-count as a phone), boundary behavior, and clean-text
  * passthrough.
  */
class PiiSpec extends SparkSuite {
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    Pii.redact(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Int, Int, Int)].collect().map(r => r._1 -> r).toMap

  test("each family detects and redacts; counts match tags") {
    val out = run(
      (1L, "mail me at a.b+c@exa-mple.org today"),
      (2L, "server 192.168.0.1 answered"),
      (3L, "call +1 555 0123 9 now"),
      (4L, "no pii here at all"))
    assert(out(1L) === ((1L, "mail me at <EMAIL> today", 1, 0, 0)))
    assert(out(2L) === ((2L, "server <IP> answered", 0, 1, 0)))
    assert(out(3L) === ((3L, "call <PHONE> now", 0, 0, 1)))
    assert(out(4L) === ((4L, "no pii here at all", 0, 0, 0)))
  }

  test("pass order: IP octets and email digits never count as phones") {
    val out = run(
      (1L, "ip 10.222.333.444 only"),
      (2L, "user123456789@host.com wrote"))
    assert(out(1L)._4 === 1) // one IP
    assert(out(1L)._5 === 0) // zero phones — octets were consumed
    assert(out(2L)._3 === 1)
    assert(out(2L)._5 === 0)
  }

  test("multiple instances in one doc all redact") {
    val out = run((1L, "a@b.co then c@d.org via 1.2.3.4 and 5.6.7.8"))
    val (_, text, e, i, p) = out(1L)
    assert((e, i, p) === ((2, 2, 0)))
    assert(text === "<EMAIL> then <EMAIL> via <IP> and <IP>")
  }
}

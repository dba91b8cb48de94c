package graft

import org.apache.spark.sql.functions._

/** The tx38 PII battery on fixtures with KNOWN spans: every detector
  * fires where it should, stays quiet where it shouldn't, and the Luhn
  * fold separates valid from invalid card numbers (the corpus entry's
  * zero counts only prove absence; this proves presence). */
class PiiSpec extends SparkSpecBase {
  import spark.implicits._

  private def scan(rows: Seq[(Long, String, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("pii").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    SparkEntry.queries("tx38_pii_scan")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
  }

  test("each detector fires on a known span and the clean doc stays clean") {
    val m = scan(Seq(
      (1L, "contact bob.smith+x@corp-mail.example.org today", "s1"),
      (2L, "call 415-555-2671 or visit 10.0.254.3 now", "s1"),
      (3L, "ssn 078-05-1120 leaked", "s2"),
      (4L, "a perfectly clean document about widgets", "s2")))
    val s1 = m("s1"); val s2 = m("s2")
    assert((s1._3, s1._4, s1._6) === (1L, 1L, 1L), s"emails/phones/ips: $s1")
    assert(s2._5 === 1L, s"ssns: $s2")
    assert(s1._5 === 0L && s2._3 === 0L && s2._4 === 0L && s2._6 === 0L)
  }

  test("Luhn fold: classic valid PAN counts as valid, off-by-one does not; " +
    "a 20-digit run matches nowhere under both regex semantics") {
    val m = scan(Seq(
      (1L, "card 4111111111111111 on file", "s1"),      // Luhn-valid
      (2L, "card 4111111111111112 on file", "s1"),      // invalid check digit
      (3L, "ref 41111111111111112222 not a PAN", "s1"), // 20 digits: no \b match
      (4L, "amex-like 371449635398431 ok", "s2")))      // 15 digits, Luhn-valid
    assert((m("s1")._7, m("s1")._8) === (2L, 1L),
      s"s1 candidates/valid: ${m("s1")}")
    assert((m("s2")._7, m("s2")._8) === (1L, 1L))
  }

  test("phone and ssn shapes do not cross-fire (3-3-4 vs 3-2-4)") {
    val m = scan(Seq((1L, "415-555-2671 and 078-05-1120", "s1")))
    assert(m("s1")._4 === 1L, "exactly one phone")
    assert(m("s1")._5 === 1L, "exactly one ssn")
  }
}

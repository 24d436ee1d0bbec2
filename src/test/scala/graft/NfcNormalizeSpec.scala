package graft

import org.apache.spark.sql.functions._

/** The codegen `nfc_normalize` expression: NFC semantics (composed and
  * decomposed encodings collapse to one key), the no-copy ASCII fast
  * path, and codegen/interpreted agreement. Fixtures are built from
  * explicit code point escapes so the source encoding cannot lie:
  * U+00E9 is precomposed e-acute, "e" + U+0301 is the decomposed pair.
  */
class NfcNormalizeSpec extends SparkSuite {
  import spark.implicits._

  private val composed = "caf\u00e9 r\u00e9sum\u00e9"
  private val decomposed = "cafe\u0301 re\u0301sume\u0301"

  private def normed(rows: Seq[String]) = {
    graft.functions.NfcNormalize.register(spark)
    rows.toDF("s").select(expr("nfc_normalize(s)").as("n"))
      .collect().map(r => Option(r.getString(0)).orNull)
  }

  test("composed and decomposed encodings collapse to the same bytes") {
    assert(composed != decomposed, "fixtures must differ pre-NFC")
    val Array(a, b) = normed(Seq(composed, decomposed))
    assert(a == b, "NFC must unify precomposed and combining forms")
    assert(a == composed, "NFC canonical form is the precomposed one")
  }

  test("ASCII and already-normalized text pass through unchanged") {
    val rows = Seq("plain ascii text", "", "tabs\tand\nnewlines",
      "\u00fcber stra\u00dfe")
    assert(normed(rows).toSeq == rows)
  }

  test("dedup collapses the two encodings corpus-style") {
    graft.functions.NfcNormalize.register(spark)
    val df = Seq(
      (1L, "the " + composed + " menu"),
      (2L, "the " + decomposed + " menu"),
      (3L, "unrelated text")).toDF("doc_id", "text")
    val groups = df
      .groupBy(expr("md5(cast(nfc_normalize(text) AS binary))").as("fp"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("canon"))
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(groups == Map(1L -> 2L, 3L -> 1L),
      "docs 1 and 2 must share one fingerprint after NFC")
  }

  test("interpreted compute path agrees with the codegen result") {
    val s = org.apache.spark.unsafe.types.UTF8String
      .fromString("e\u0301 + \u00e9")
    val out = graft.functions.NfcNormalize.compute(s).toString
    assert(out == "\u00e9 + \u00e9")
  }
}

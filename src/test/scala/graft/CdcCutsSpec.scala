package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CdcCuts, PolyHash}

/** The CDC boundary expression: one-pass prefix-hash cuts must equal a
  * brute-force per-window fold, and chunking must carry the property
  * the operator exists for — boundary identity survives edits outside
  * the edited neighborhood.
  */
class CdcCutsSpec extends SparkSuite {

  private def bruteCuts(s: String, w: Int, maskBits: Int): Seq[Int] = {
    val bytes = s.getBytes("UTF-8")
    val mask = (1L << maskBits) - 1
    (w until bytes.length).filter { i =>
      var h = 0L
      var j = i - w
      while (j < i) { h = (h * PolyHash.Base + (bytes(j) & 0xffL)) % PolyHash.Mod; j += 1 }
      (h & mask) == 0L
    }
  }

  private def cuts(s: String, w: Int = 16, maskBits: Int = 6): Seq[Int] =
    CdcCuts.compute(UTF8String.fromString(s), w, maskBits)
      .toIntArray().toSeq

  private def chunkSet(s: String): Set[String] = {
    val bs = cuts(s)
    val bounds = 0 +: bs :+ s.getBytes("UTF-8").length
    bounds.zip(bounds.tail).map { case (a, b) =>
      new String(s.getBytes("UTF-8").slice(a, b), "ISO-8859-1")
    }.toSet
  }

  test("prefix-hash cuts equal the brute-force window fold") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).limit(30).collect().map(_.getString(0))
    assert(docs.nonEmpty)
    docs.foreach { t =>
      assert(cuts(t) == bruteCuts(t, 16, 6), s"mismatch on doc len=${t.length}")
    }
  }

  test("edges: short and empty strings produce no interior cuts") {
    assert(cuts("") == Seq.empty)
    assert(cuts("0123456789abcdef") == Seq.empty) // n == w
    assert(cuts("x", w = 16) == Seq.empty)
  }

  test("cuts are strictly interior and ascending") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).limit(30).collect().map(_.getString(0))
    docs.foreach { t =>
      val cs = cuts(t)
      val n = t.getBytes("UTF-8").length
      assert(cs.forall(c => c > 0 && c < n))
      assert(cs == cs.sorted && cs.distinct == cs)
    }
  }

  test("content-defined: chunks resynchronize after a prefix insertion") {
    // the CDC selling point vs fixed frames: prepending bytes must not
    // destroy chunk identities past the first boundary — all original
    // chunks except the (re-chunked) first survive verbatim
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).filter(length(col("text")) > 300)
      .limit(10).collect().map(_.getString(0))
    assert(docs.nonEmpty)
    // docs with <3 chunks can't show resynchronization (the one edited
    // chunk IS the doc); require the property where it's observable
    val eligible = docs.map(t => (chunkSet(t), chunkSet("INSERTED PREFIX " + t)))
      .filter(_._1.size >= 3)
    assert(eligible.nonEmpty, "fixture produced no multi-chunk docs")
    eligible.foreach { case (orig, edited) =>
      val survived = (orig & edited).size.toDouble / orig.size
      assert(survived >= 0.5,
        s"only ${(survived * 100).round}% of ${orig.size} chunks survived")
    }
  }
}

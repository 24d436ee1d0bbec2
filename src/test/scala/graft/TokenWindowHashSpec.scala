package graft

import org.apache.spark.sql.functions._

/** The rolling window-hash expression must be bit-equivalent to
  * [[graft.functions.PolyHash2]] of each window's joined token slice —
  * that identity is what makes `x_substring_dedup`'s DuckDB oracle
  * (which joins on the reconstructed window STRINGS) a valid check of
  * the fingerprint-joined engine plan.
  */
class TokenWindowHashSpec extends SparkSuite {
  import graft.functions.{PolyHash2, TokenWindowHash2}

  private def reference(text: String, k: Int): Seq[Long] = {
    val toks = text.split(" ", -1)
    if (toks.length < k) Seq.empty
    else (0 to toks.length - k).map(i =>
      PolyHash2.hashString(toks.slice(i, i + k).mkString(" ")))
  }

  private def viaExpr(texts: Seq[String], k: Int): Seq[Seq[Long]] = {
    import spark.implicits._
    TokenWindowHash2.register(spark)
    texts.toDF("text")
      .select(expr(s"token_window_hash2(text, $k)").as("h"))
      .collect().toSeq.map(_.getSeq[Long](0))
  }

  test("window hashes equal PolyHash2 of each joined token slice") {
    val texts = Seq(
      "a b c d e",
      "one two three",
      "repeat repeat repeat repeat repeat",
      "  leading and double  spaces here ",
      "über straße größer noch mehr text",
      "中文 字符 测试 空格 分词 滚动",
      "single")
    for (k <- Seq(1, 2, 3, 5)) {
      val got = viaExpr(texts, k)
      texts.zip(got).foreach { case (t, hs) =>
        assert(hs == reference(t, k), s"k=$k text='$t'")
      }
    }
  }

  test("matches on the documents corpus at k=20") {
    val texts = io.Sources.table(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    val got = viaExpr(texts, 20)
    texts.zip(got).foreach { case (t, hs) =>
      assert(hs == reference(t, 20), s"corpus text mismatch: ${t.take(60)}")
    }
  }

  test("fewer tokens than k gives an empty array, never null") {
    assert(viaExpr(Seq("a b", ""), 3) == Seq(Seq.empty, Seq.empty))
  }

  test("identical windows at different positions collide (by design)") {
    val hs = viaExpr(Seq("x y x y x y"), 2).head
    // windows: "x y", "y x", "x y", "y x", "x y"
    assert(hs.length == 5)
    assert(hs(0) == hs(2) && hs(2) == hs(4))
    assert(hs(1) == hs(3))
    assert(hs(0) != hs(1))
  }

  test("substring dedup: pairs are symmetric-free and skew cap bites") {
    val base = ext.Dedup.substringDedup(spark, sf, 20, 1000)
    val rows = base.collect()
    assert(rows.nonEmpty, "expected shared 20-token windows at sf0.001")
    // doc_a < doc_b everywhere; n_shared >= 1
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getInt(2) >= 1))
    // a tiny df cutoff must drop fingerprints and so shrink the output
    val capped = ext.Dedup.substringDedup(spark, sf, 20, 1)
    assert(capped.count() < rows.length,
      "df cutoff 1 should drop every shared fingerprint (df >= 2)")
    // a larger k can only reduce the shared-window pair set
    val k30 = ext.Dedup.substringDedup(spark, sf, 30, 1000).collect()
    assert(k30.length <= rows.length)
  }

  test("substring dedup apply: canonical copies survive, others are cut") {
    val pairs = ext.Dedup.substringDedup(spark, sf, 20, 1000).collect()
    val applied = ext.Dedup.substringDedupApply(spark, sf, 20, 1000)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(4))).toMap
    // every doc_b of a detected pair loses tokens; no doc loses them all
    pairs.map(_.getLong(1)).distinct.foreach { b =>
      val (n, removed, _) = applied(b)
      assert(removed >= 1 && removed <= n, s"doc $b: $removed of $n")
    }
    // a doc that is never a doc_b (always canonical or unshared) keeps
    // every token, and its cleaned text hashes to the original
    val bSet = pairs.map(_.getLong(1)).toSet
    val originals = io.Sources.table(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    applied.foreach { case (id, (_, removed, cleanedMd5)) =>
      if (!bSet.contains(id)) {
        assert(removed == 0, s"non-duplicate doc $id lost tokens")
        assert(cleanedMd5 == originals(id))
      }
    }
    // corpus-level: one copy of each span survives => total removed > 0
    assert(applied.values.map(_._2).sum > 0)
  }
}

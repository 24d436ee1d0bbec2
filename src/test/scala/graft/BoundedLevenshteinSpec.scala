package graft

import org.apache.spark.sql.functions._

/** Pins the custom banded-DP [[graft.functions.BoundedLevenshtein]] to
  * Spark's built-in 3-arg `levenshtein` (identical contract: distance
  * when <= k, else -1) — the equivalence that lets the edit-dedup
  * family swap the slow built-in for the codegen expression without
  * touching its DuckDB oracle.
  */
class BoundedLevenshteinSpec extends SparkSuite {

  private def builtin(a: String, b: String, k: Int): Int = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .selectExpr(s"levenshtein(a, b, $k)").head().getInt(0)
  }

  private def custom(a: String, b: String, k: Int): Int =
    graft.functions.BoundedLevenshtein.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b), k)

  test("edge cases match the built-in") {
    val cases = Seq(
      ("", "", 0), ("", "abc", 3), ("", "abc", 2), ("abc", "", 5),
      ("kitten", "sitting", 3), ("kitten", "sitting", 2),
      ("same", "same", 0), ("a", "b", 0), ("a", "b", 1),
      ("café ☕ text", "cafe ☕ test", 3), ("日本語です", "日本語だよ", 2),
      ("ab", "ba", 1), ("ab", "ba", 2))
    cases.foreach { case (a, b, k) =>
      assert(custom(a, b, k) == builtin(a, b, k),
        s"mismatch on ($a, $b, k=$k)")
    }
  }

  test("random strings match the built-in across thresholds") {
    val rnd = new scala.util.Random(7)
    def randStr(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    (0 until 300).foreach { _ =>
      val a = randStr(rnd.nextInt(60))
      val b = randStr(rnd.nextInt(60))
      val k = rnd.nextInt(25)
      assert(custom(a, b, k) == builtin(a, b, k),
        s"mismatch on ($a, $b, k=$k)")
    }
  }

  test("whole-column parity on real candidate pairs (sf0.001 documents)") {
    graft.functions.BoundedLevenshtein.register(spark)
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val a = d.toDF("doc_a", "source", "lang", "text_a")
    val b = d.toDF("doc_b", "source", "lang", "text_b")
    val diff = a.join(b, Seq("source", "lang"))
      .filter(col("doc_a") < col("doc_b"))
      .selectExpr("bounded_lev(text_a, text_b, 80) AS custom",
        "levenshtein(text_a, text_b, 80) AS builtin")
      .filter(col("custom") =!= col("builtin")).count()
    assert(diff == 0L, s"$diff pairs disagree with the built-in")
  }
}

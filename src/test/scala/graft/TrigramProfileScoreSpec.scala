package graft

import org.apache.spark.sql.functions._

/** The packed-key trigram scorer must be bit-equivalent to the
  * declarative `size(filter(trigs, t -> t IN (...)))` chain it
  * replaces — that identity is what keeps `x_lang_id`'s declarative
  * DuckDB oracle a valid check of the codegen plan.
  */
class TrigramProfileScoreSpec extends SparkSuite {
  import graft.functions.TrigramProfileScore

  private val profiles = Seq(
    Seq(" th", "the", "he ", "ing"),
    Seq(" de", "der", "ie ", "sch"),
    Seq("ión", "ue ", " qu"))

  private def declarative(padded: String, profile: Seq[String]): Int = {
    val cps = padded.codePoints().toArray
    (0 until math.max(0, cps.length - 2)).count { i =>
      profile.contains(new String(cps.slice(i, i + 3), 0, 3))
    }
  }

  test("matches the declarative IN-list formulation, incl. non-ASCII") {
    import spark.implicits._
    TrigramProfileScore.register(spark, "tps_test", profiles)
    val texts = Seq(
      " the thing is sche ", " der die das ", " canción que quiere ",
      " a ", "  ", " überschrift ", " 中文字符 the ", "xyz")
    val got = texts.toDF("padded")
      .select(expr("tps_test(padded)").as("s")).collect()
      .map(_.getSeq[Int](0))
    texts.zip(got).foreach { case (t, scores) =>
      profiles.zipWithIndex.foreach { case (p, i) =>
        assert(scores(i) == declarative(t, p), s"text='$t' profile=$i")
      }
    }
  }

  test("lang-ID scores on the corpus equal the declarative chain") {
    val docs = io.Sources.table(spark, sf, "documents")
      .withColumn("padded", concat(lit(" "), lower(col("text")), lit(" ")))
      .withColumn("trigs", expr(
        "transform(sequence(1, length(padded) - 2), i -> substring(padded, i, 3))"))
    // declarative twin computed in-plan, compared row by row
    val en = Seq(" th", "the", "he ", "ing", "ng ", " an", "and", "nd ")
    val lst = en.map(t => s"'$t'").mkString(", ")
    TrigramProfileScore.register(spark, "tps_en", Seq(en))
    val bad = docs
      .withColumn("fast", expr("tps_en(padded)").getItem(0))
      .withColumn("slow", expr(s"size(filter(trigs, t -> t IN ($lst)))"))
      .filter(col("fast") =!= col("slow"))
    assert(bad.count() == 0L)
  }

  test("shared trigrams count toward every profile that lists them") {
    import spark.implicits._
    TrigramProfileScore.register(spark, "tps_shared",
      Seq(Seq(" de"), Seq(" de"), Seq("abc")))
    val r = Seq(" de de ").toDF("p")
      .select(expr("tps_shared(p)")).head().getSeq[Int](0)
    assert(r == Seq(2, 2, 0))
  }
}

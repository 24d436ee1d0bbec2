package graft

import org.apache.spark.sql.functions._

/** The codegen `ngram_set` expression must be bit-equivalent to the
  * 5-operator built-in chain it replaces, on real corpus text and on
  * adversarial whitespace/unicode edge cases.
  */
class NgramSetSpec extends SparkSuite {
  import spark.implicits._

  private def chain(n: Int) = expr(
    s"""array_distinct(transform(sequence(1, size(words) - ${n - 1}),
        i -> concat_ws(' ', ${(0 until n).map(j => s"words[i-1+$j]")
          .mkString(", ")})))""")

  private def compareOn(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    graft.functions.NgramSet.register(spark)
    val both = df
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= n)
      .withColumn("old", chain(n))
      .withColumn("new", expr(s"ngram_set(text, $n)"))
    val bad = both.filter(col("old") =!= col("new"))
    assert(bad.count() == 0L,
      s"mismatch: ${bad.select("text", "old", "new").head(3).mkString("; ")}")
  }

  test("trigram set matches the built-in chain on the documents corpus") {
    compareOn(io.Sources.table(spark, sf, "documents"), 3)
  }

  test("bigram set matches the chain too") {
    compareOn(io.Sources.table(spark, sf, "documents"), 2)
  }

  test("whitespace and unicode edge cases match") {
    val edge = Seq(
      "a b c", "a  b  c", " a b c ", "a b c ", " a", "a b", "",
      "über straße größer noch mehr", "中文 字符 测试 空格",
      "x x x x x", "a b a b a b", "tab\tinside word three four")
      .toDF("text")
    compareOn(edge, 3)
  }

  test("chain-compat mode matches the chain with NO size filter (short rows)") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_cc",
      exprs => graft.functions.NgramSet(exprs.head, 3, chainCompat = true),
      "scala_udf")
    val edge = Seq(
      "", "a", "a b", "a  b", "a ", " b", "  ", "a b c", "a b c d",
      "über straße", "中文 字符", "x y  z")
      .toDF("text")
    val both = edge
      .withColumn("words", split(col("text"), " "))
      .withColumn("old", chain(3))
      .withColumn("new", expr("ngram_cc(text)"))
    val bad = both.filter(col("old") =!= col("new"))
    assert(bad.count() == 0L,
      s"mismatch: ${bad.select("text", "old", "new").head(5).mkString("; ")}")
  }

  test("fewer words than n yields an empty set, null stays null") {
    graft.functions.NgramSet.register(spark)
    val out = Seq(("a b"), ("solo")).toDF("text")
      .select(expr("ngram_set(text, 3)").as("g")).collect()
    assert(out.forall(_.getSeq[String](0).isEmpty))
    val nul = Seq((1, Option.empty[String])).toDF("id", "text")
      .select(expr("ngram_set(text, 3)").as("g")).collect()
    assert(nul.head.isNullAt(0))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.plans.NgramChainRewrite

/** The injected optimizer rule substitutes the codegen NgramSet
  * expression for the canonical built-in shingling chain — same
  * results, fused plan — and leaves non-canonical variants alone.
  */
class NgramChainRewriteSpec extends SparkSuite {

  private val chain3 = expr(
    """array_distinct(transform(sequence(1, size(words) - 2),
       i -> concat_ws(' ', words[i-1], words[i], words[i+1])))""")

  test("canonical trigram chain is rewritten to ngram_set, results identical") {
    val docs = io.Sources.table(spark, sf, "documents")
    def grams = docs
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .withColumn("grams", chain3)
      .select(col("doc_id"), col("grams"))
    val before = grams.orderBy(col("doc_id")).collect()

    NgramChainRewrite.enable(spark)
    try {
      val plan = grams.queryExecution.optimizedPlan.toString
      assert(plan.contains("ngram_set"),
        s"rule did not rewrite the chain:\n$plan")
      assert(!plan.contains("array_distinct"), "chain should be gone")
      val after = grams.orderBy(col("doc_id")).collect()
      assert(before.sameElements(after))
    } finally spark.conf.set(NgramChainRewrite.Flag, "false")
  }

  test("short rows (fewer than n words) match the chain, no size pre-filter") {
    import spark.implicits._
    // 0/1/2-word rows (incl. empty string, doubled + trailing spaces)
    // alongside normal rows — the chain yields [whole text] below n words
    // (implicit step -1 + out-of-range-null + concat_ws null-skip), and
    // the rewrite must reproduce exactly that, not the primitive's []
    // RDD leaf (not LocalRelation) so ConvertToLocalRelation can't fold
    // the chain away before the rule runs
    val rows = spark.createDataset(spark.sparkContext.parallelize(
      Seq("", "a", "a b", "a  b", "a ", " b", "a b c", "a b c d",
        "x y  z"))).toDF("text")
    def grams = rows
      .withColumn("words", split(col("text"), " "))
      .withColumn("grams", chain3)
      .select(col("text"), col("grams"))
    val before = grams.orderBy(col("text")).collect()

    NgramChainRewrite.enable(spark)
    try {
      val plan = grams.queryExecution.optimizedPlan.toString
      assert(plan.contains("ngram_set"),
        s"rule did not rewrite the unfiltered chain:\n$plan")
      val after = grams.orderBy(col("text")).collect()
      assert(before.sameElements(after),
        s"short-row mismatch:\n before=${before.mkString("; ")}\n after=${after.mkString("; ")}")
    } finally spark.conf.set(NgramChainRewrite.Flag, "false")
  }

  test("helper alias passed through the outer project survives the collapse") {
    import spark.implicits._
    val rows = spark.createDataset(spark.sparkContext.parallelize(
      Seq("a b c d", "a", "p q r"))).toDF("text")
    // user keeps `words` in the output alongside the grams — the collapse
    // substitutes the bare alias reference with its (non-named) child and
    // must re-wrap it in an Alias, not crash
    def both = rows
      .withColumn("words", split(col("text"), " "))
      .withColumn("grams", chain3)
      .select(col("text"), col("words"), col("grams"))
    val before = both.orderBy(col("text")).collect()

    NgramChainRewrite.enable(spark)
    try {
      val plan = both.queryExecution.optimizedPlan.toString
      assert(plan.contains("ngram_set"),
        s"rule did not rewrite the pass-through shape:\n$plan")
      val after = both.orderBy(col("text")).collect()
      assert(before.sameElements(after))
      assert(after.head.schema.fieldNames.sameElements(
        Array("text", "words", "grams")))
    } finally spark.conf.set(NgramChainRewrite.Flag, "false")
  }

  test("explicit-step chains are left untouched (they throw on short rows)") {
    NgramChainRewrite.enable(spark)
    try {
      val plan = io.Sources.table(spark, sf, "documents")
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 3)
        .withColumn("grams", expr(
          """array_distinct(transform(sequence(1, size(words) - 2, 1),
             i -> concat_ws(' ', words[i-1], words[i], words[i+1])))"""))
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("ngram_set"),
        s"must not fire on an explicit-step chain:\n$plan")
    } finally spark.conf.set(NgramChainRewrite.Flag, "false")
  }

  test("non-canonical variants are left untouched") {
    NgramChainRewrite.enable(spark)
    try {
      val docs = io.Sources.table(spark, sf, "documents")
        .withColumn("words", split(col("text"), ","))  // not a space split
      val plan = docs
        .filter(size(col("words")) >= 3)
        .withColumn("grams", chain3)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("ngram_set"), s"must not fire on comma split:\n$plan")

      // gappy offsets (i-1, i+1) — not a contiguous n-gram
      val gappy = io.Sources.table(spark, sf, "documents")
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 3)
        .withColumn("grams", expr(
          """array_distinct(transform(sequence(1, size(words) - 2),
             i -> concat_ws(' ', words[i-1], words[i+1])))"""))
        .queryExecution.optimizedPlan.toString
      assert(!gappy.contains("ngram_set"), s"must not fire on gappy offsets:\n$gappy")
    } finally spark.conf.set(NgramChainRewrite.Flag, "false")
  }
}

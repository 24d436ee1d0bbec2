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

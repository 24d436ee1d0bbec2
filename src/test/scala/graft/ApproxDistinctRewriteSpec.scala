package graft

import org.apache.spark.sql.functions._

import graft.plans.ApproxDistinctRewrite

/** The injected optimizer rule rewrites count(DISTINCT x) to an HLL++
  * sketch only when the session flag is on, and the estimate stays
  * within the sketch's error bound.
  */
class ApproxDistinctRewriteSpec extends SparkSuite {

  test("flag off: exact; flag on: HLL estimate within 5%") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    def distinctParts(): Long =
      li.agg(countDistinct(col("l_partkey"))).collect()(0).getLong(0)

    val exact = distinctParts()
    ApproxDistinctRewrite.enable(spark)
    try {
      val approx = distinctParts()
      val plan = li.agg(countDistinct(col("l_partkey")))
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        s"rule did not rewrite the aggregate:\n$plan")
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"exact=$exact approx=$approx")
    } finally ApproxDistinctRewrite.disable(spark)

    // flag off again: exact path restored (rule is config-gated, the
    // injected rule itself stays registered)
    assert(distinctParts() == exact)
  }
}

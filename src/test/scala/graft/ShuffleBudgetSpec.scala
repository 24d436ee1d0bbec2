package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Shuffle-budget contract for the analytic catalog: each audited
  * query's FINAL (post-AQE) physical plan may use at most the pinned
  * number of shuffle exchanges. Wall-clock bench deltas on a contended
  * box are noise (BENCH.md passim); a plan growing an exchange is a
  * REGRESSION — a lost broadcast, a cache barrier blocking exchange
  * reuse, a new unnecessary repartition — and this spec turns that
  * into a red test at verify scale instead of a mystery bench delta
  * three rounds later. Budgets are UPPER bounds pinned at the audited
  * plan (≤, not ==), so AQE improvements pass and only growth fails.
  *
  * Scope: pure-read analytic queries. Excluded by contract: io
  * round-trips, index/artifact writers, streaming queries, the
  * composed pipeline mains — their plan shape is dominated by sinks
  * and micro-batch scheduling, and several execute on construction.
  */
class ShuffleBudgetSpec extends SparkSuite {

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def shuffles(p: SparkPlan): Int = {
    val here = p.collect { case s: ShuffleExchangeExec => s }.size
    here + p.subqueries.map(shuffles).sum
  }

  // name -> max shuffle exchanges in the final plan (audited values;
  // discovery pass logged in the round-10 section of BENCH.md)
  private val budgets: Seq[(String, Int)] = Seq(
    "q1_agg" -> 2,
    "a4_distinct_counts" -> 2,
    "a7_summary_stats" -> 2,
    "j1_inner_join_using" -> 1,
    "j3_left_join_nullfill" -> 2,
    "j5_left_semi" -> 1,
    "u2_except" -> 2,
    "w2_rank_topk" -> 2,
    "e4_asof_join" -> 2,
    "e8_range_join" -> 4,
    "e10_funnel" -> 8,
    "x_token_stats" -> 1,
    "x_quality_score" -> 1,
    "x_exact_dedup" -> 2,
    "x_pseudonymize" -> 5,
    "x_event_anomaly" -> 3,
    "x_forget_user" -> 5,
    "x_embedding_drift" -> 3,
    "x_topic_card" -> 4,
    "x_knn_classify" -> 3,
    "x_cosine_topk" -> 2,
    "x_tfidf" -> 6)

  test("final plans stay within their pinned shuffle budgets") {
    val reg = SparkEntry.registry.map(q => q.name -> q).toMap
    val results = budgets.map { case (name, budget) =>
      val n = scala.util.Try(shuffles(finalPlan(reg(name).fn(spark, sf))))
        .getOrElse(-1)
      info(f"$name%-24s shuffles=$n budget=$budget")
      (name, n, budget)
    }
    val over = results.collect {
      case (name, n, budget) if n > budget || n < 0 =>
        s"$name: $n > $budget"
    }
    assert(over.isEmpty,
      s"shuffle budget exceeded (plan regression):\n${over.mkString("\n")}")
  }
}

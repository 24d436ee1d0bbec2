package graft

/** Every registered query must return rows on the smoke fixture — an
  * empty Spark result hash-matching an empty oracle result would "pass"
  * t2 while covering nothing, so degenerate coverage is caught here.
  */
class RowCountSpec extends SparkSuite {

  /** Queries whose CONTRACT is an empty result on clean corpora — the
    * edit-dedup reroute report names cells degraded by the block cap,
    * and the sf testdata has none (cells ~10 docs vs the 1024 cap).
    * Emptiness here is the assertion; the FIRED case is pinned on the
    * skewed fixture in `GuardFireDrillSpec`.
    */
  private val emptyByDesign = Set("x_edit_dedup_reroute_report")

  SparkEntry.registry.foreach { q =>
    if (emptyByDesign(q.name))
      test(s"${q.name} is empty by design at sf0.001") {
        assert(q.fn(spark, sf).count() == 0,
          s"${q.name} fired on a clean corpus")
      }
    else
      test(s"${q.name} returns rows at sf0.001") {
        assert(q.fn(spark, sf).count() > 0, s"${q.name} produced 0 rows")
      }
  }
}

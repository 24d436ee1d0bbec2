package graft

/** Every registered query must return rows on the smoke fixture — an
  * empty Spark result hash-matching an empty oracle result would "pass"
  * t2 while covering nothing, so degenerate coverage is caught here.
  */
class RowCountSpec extends SparkSuite {

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} returns rows at sf0.001") {
      assert(q.fn(spark, sf).count() > 0, s"${q.name} produced 0 rows")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query (BASELINE.md: "total
  * wall seconds for all queries") on SPARK_GRAFT_SF_DIR and prints ONE
  * JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{name:sec,...},"sf":...}
  *
  * Each query is forced through the noop sink — full materialization of
  * every output column (a bare `count()` would let Catalyst prune the
  * computed columns away and under-report). Set
  * SPARK_GRAFT_BENCH=headline to time only the Q.bench subset.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-bench")

    val failed = scala.collection.mutable.ListBuffer[String]()
    def run(q: Q): Double = {
      val t0 = System.nanoTime()
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += q.name
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    // JVM/Catalyst warmup on the smallest sf so headline numbers measure
    // the plan, not classloading (one tiny end-to-end query).
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    val toRun =
      if (sys.env.get("SPARK_GRAFT_BENCH").contains("headline"))
        SparkEntry.benchQueries
      else SparkEntry.registry
    val results = toRun.map(q => q.name -> run(q))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // a failed query would otherwise masquerade as a fast success in the
    // headline total — surface failures in the JSON itself
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":$failedJson}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[graft.functions.TopKStructs]] — the bounded map-side-combinable
  * top-k aggregate behind x_knn_classify / x_event_anomaly. Pinned
  * against the window-rank reference formulation on multi-partition
  * input, so the partial-aggregate, merge, and serialize paths all
  * execute.
  */
class TopKStructsSpec extends SparkSuite {
  import spark.implicits._

  graft.functions.TopKStructs.register(spark)

  private def scored(n: Int, keys: Int) = {
    // deterministic pseudo-random scores with deliberate collisions
    // (score = id*37 mod 101 -> ~6x duplicate scores per key at n=600)
    spark.range(n).select(
      pmod(col("id"), lit(keys)).as("k"),
      pmod(col("id") * 37, lit(101)).as("score"),
      col("id"))
      .repartition(7) // force partial buffers to merge across tasks
  }

  test("matches the window-rank reference under ties, across partitions") {
    val df = scored(600, 5)
    val top = df.groupBy(col("k"))
      .agg(expr("topk_structs(struct(score, -id AS nid), 4)").as("t"))
      .select(col("k"), posexplode(col("t")))
      .select(col("k"), (col("pos") + 1).as("rank"),
        col("col.score").as("score"), (-col("col.nid")).as("id"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("score").desc, col("id").asc)
    val ref = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 4)
      .select(col("k"), col("rank"), col("score"), col("id"))
    assert(top.except(ref).count() == 0 && ref.except(top).count() == 0)
  }

  test("k larger than the group returns the whole group, sorted descending") {
    val out = Seq((1L, 5L), (1L, 9L), (1L, 2L)).toDF("k", "s")
      .groupBy(col("k"))
      .agg(expr("topk_structs(struct(s), 10)").as("t"))
      .select(col("t.s")).as[Seq[Long]].head()
    assert(out == Seq(9L, 5L, 2L))
  }

  test("null struct inputs are ignored") {
    val out = Seq(Some(3L), None, Some(7L), None, Some(5L))
      .toDF("s")
      .select(when(col("s").isNotNull, struct(col("s"))).as("st"))
      .agg(expr("topk_structs(st, 2)").as("t"))
      .select(col("t.s")).as[Seq[Long]].head()
    assert(out == Seq(7L, 5L))
  }

  test("aggregate is partial+final (map-side combine), not a window funnel") {
    val df = scored(600, 5)
      .groupBy(col("k"))
      .agg(expr("topk_structs(struct(score, -id AS nid), 4)").as("t"))
    df.collect()
    // partial on the map side + final after the exchange (the nodes sit
    // inside AQE query stages, so assert on the rendered final plan)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_structs"),
      s"no map-side partial aggregate in:\n$plan")
    assert(plan.contains("functions=[topk_structs"),
      s"no final aggregate in:\n$plan")
  }
}

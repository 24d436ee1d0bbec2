package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming semantics beyond the batch-parity check in
  * OperatorInvariantsSpec: watermark-driven append-mode emission
  * (windows emit only once the watermark passes their end) and late-row
  * dropping — the state-bounding behavior a 100 TB stream needs.
  */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("append mode + watermark: only closed windows emit; late rows drop") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "value")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .select(col("window.start").as("ws"), col("n"), col("sv"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_test").start()
    try {
      // batch 1: rows in the 10:00 and 10:10 windows; max ts 10:12
      // => watermark 10:07 — no window closed yet, nothing emits
      mem.addData((ts(1), 1.0), (ts(4), 2.0), (ts(12), 3.0))
      q.processAllAvailable()
      assert(spark.table("wm_test").count() == 0)

      // batch 2: ts 10:21 => watermark 10:16 — closes the 10:00 window
      mem.addData((ts(21), 4.0))
      q.processAllAvailable()
      val emitted = spark.table("wm_test").collect()
      assert(emitted.map(_.getAs[java.sql.Timestamp]("ws")).toSeq ==
        Seq(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      assert(emitted.head.getAs[Long]("n") == 2)

      // batch 3: a LATE row for the already-closed 10:00 window is
      // dropped; a row for 10:10 plus ts 10:31 closes the 10:10 window
      // WITHOUT the late row's contribution
      mem.addData((ts(2), 100.0), (ts(31), 5.0))
      q.processAllAvailable()
      val after = spark.table("wm_test").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("ws").toString,
          r.getAs[Long]("n"), r.getAs[Double]("sv"))).sortBy(_._1)
      assert(after.toSeq == Seq(
        ("2024-01-01 10:00:00.0", 2L, 3.0),   // late 100.0 NOT included
        ("2024-01-01 10:10:00.0", 1L, 3.0)))
    } finally q.stop()
  }
}

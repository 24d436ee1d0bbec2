package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Q

/** Structured Streaming over the events table (SURVEY.md §2.10 [EXT]).
  *
  * The same tumbling-window aggregation as the batch op
  * `Eventing.e1TumblingWindow`, but executed as a streaming query:
  * `readStream` (file source) -> watermark -> windowed agg -> memory
  * sink, drained synchronously with `processAllAvailable`. Batch/stream
  * parity is exactly the Spark-native contract — one declarative plan,
  * two execution modes — so the DuckDB oracle for the batch twin also
  * oracles this.
  *
  * At scale the file source becomes Kafka and the memory sink a Delta /
  * parquet sink; watermark + windowed state bound memory per executor.
  */
object EventStream {

  /** The events schema as the parquet file source must declare it
    * (TIMESTAMP(NANOS) arrives as long under nanosAsLong).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def streamTumbling(spark: SparkSession, dir: String): DataFrame = {
    val qname = "stream_tumbling_" + math.abs(dir.hashCode).toString
    val src = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = src
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("ws"), col("n_events"),
        col("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qname)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(qname).orderBy(col("ws"))
  }

  private val streamTumblingSql =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1 ORDER BY ws"""

  val qs: Seq[Q] = Seq(
    Q("s7_stream_tumbling", streamTumbling, Some(streamTumblingSql)))
}

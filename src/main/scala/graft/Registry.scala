package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query: the Spark implementation plus an optional DuckDB
  * oracle SQL (ANSI, runnable on the same parquet tables). `bench = true`
  * marks headline queries timed by [[graft.Bench]]; `benchDefault = false`
  * excludes a query from Bench's all-queries run (used for superseded
  * API-compatibility demos — they stay registered, verified, and
  * invariant-tested, but don't count against the engine's headline total).
  *
  * This is the registration unit for every operator in SURVEY.md §2: each
  * module exposes a `qs: Seq[Q]` and [[SparkEntry]] concatenates them.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Boolean = false,
    benchDefault: Boolean = true,
    doc: String = "")

/** Registry of per-process memoized DataFrame caches (Sources table
  * cache, Similarity corpus, Clustering assembly). Each module registers
  * its memo map at construction; [[Bench]]/[[Verify]] call [[clear]]
  * between queries so a 100-query single-session run never accumulates
  * cached blocks — round 2's driver bench showed unrelated queries
  * regressing up to 7.6x from storage/GC pressure of caches created by
  * earlier queries and never released. Each query still builds (and
  * pays for) exactly the caches it uses.
  */
object Memos {
  import java.util.concurrent.ConcurrentHashMap
  private val registered =
    scala.collection.mutable.ArrayBuffer[ConcurrentHashMap[String, DataFrame]]()

  def register(m: ConcurrentHashMap[String, DataFrame])
      : ConcurrentHashMap[String, DataFrame] =
    synchronized { registered += m; m }

  /** Unpersist and forget every memoized frame (all sessions/dirs). */
  def clear(): Unit = synchronized {
    registered.foreach { m =>
      m.values.forEach(df => df.unpersist(blocking = false))
      m.clear()
    }
  }
}

/** Session factory with the engine's standard configs.
  *
  * - ANSI off: the reference (PySpark, pre-ANSI defaults) relies on
  *   cast-failure => null semantics (`pre_analysis.py:244-258` uses failed
  *   `to_timestamp`/int casts as its validity probe). Spark 4 defaults
  *   ANSI on, so we opt out explicitly.
  * - UTC session TZ so timestamps hash-match the DuckDB oracle.
  * - AQE on; shuffle partitions sized for local mode, not the 200 default.
  */
object Sessions {
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/tmp/warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

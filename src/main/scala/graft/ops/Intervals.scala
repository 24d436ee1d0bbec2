package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.io.Sources.table

/** Interval operators over the event log: the general range
  * (interval-overlap) join Spark has no native operator for, and the
  * sweep-grid concurrency profile built from the same decomposition.
  *
  * The reference's event model (onboarding events carrying dates,
  * `pre_process.py` date arithmetic) stops at point-in-time predicates;
  * interval overlap is the [EXT] completion every session/campaign
  * analysis needs. A naive overlap join (`a.s0 <= b.w1 AND b.w0 <=
  * a.s1`) has no equality conjunct, so Catalyst can only plan a
  * broadcast nested-loop or cartesian product — O(n*m) comparisons, a
  * scale-killer the moment neither side is broadcast-small.
  *
  * The Spark-first plan used here is the standard grid-bucket
  * decomposition (the same trick Spark itself applies to stream-stream
  * interval joins via watermark bins): explode every interval into the
  * fixed-width grid cells it touches, equi-join on the cell (an
  * ordinary shuffle hash join Catalyst + AQE handle like any other),
  * re-check the exact overlap predicate, and dedup pairs that met in
  * more than one shared cell. At 100 TB each side shuffles once keyed
  * by cell; cell width is chosen near the median interval length so the
  * explode factor stays O(1) per row (sessions gap-bounded at 30 min,
  * campaign windows fixed 90 min, both ~1-3 one-hour cells). Cell-grain
  * skew (everyone active in the same hour) is ordinary groupBy-key skew
  * — AQE skew-join splits it; no driver-side interval index, nothing
  * collected.
  */
object Intervals {

  /** Per-user session intervals as epoch-second bounds — the
    * `session_window` sessionization e2 already proves against the
    * DuckDB gap-and-running-sum formulation, reduced to
    * (user_id, session_start, s0, s1).
    */
  private def sessions(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("s_end"))
      .select(col("user_id"), col("session_start"),
        unix_timestamp(col("session_start")).as("s0"),
        unix_timestamp(col("s_end")).as("s1"))

  /** Arbitrary (grid-UNaligned) right side: per (event_type, day) a
    * 90-minute "campaign window" opening at that type's first event of
    * the day. Cardinality grows with the data (types x days), so the
    * join is planned as a plain shuffle join — no broadcast assumption.
    */
  private def campaignWindows(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(min(unix_timestamp(col("ts"))).as("w0"))
      .select(col("event_type"), col("w0"), (col("w0") + 5400L).as("w1"))

  private val CellSecs = 3600L

  private def withCells(df: DataFrame, lo: String, hi: String,
      cell: Long): DataFrame =
    df.withColumn("cell",
      explode(sequence((col(lo) / cell).cast("long"),
        (col(hi) / cell).cast("long"))))

  /** The generic grid-bucket overlap join (object scaladoc): both
    * interval frames exploded into `cellSecs`-wide cells, equi-joined
    * on the cell, exact overlap re-checked, multi-cell pair matches
    * deduplicated by `distinct` over the combined output columns —
    * exact because every output column is a function of the matched
    * PAIR. Bounds must be non-negative epoch seconds (the cell index
    * division truncates toward zero). Property-tested against the
    * naive cross-join formulation over arbitrary generated intervals.
    */
  def gridOverlapJoin(left: DataFrame, right: DataFrame,
      l0: String, l1: String, r0: String, r1: String,
      cellSecs: Long = CellSecs): DataFrame =
    withCells(left, l0, l1, cellSecs)
      .join(withCells(right, r0, r1, cellSecs), Seq("cell"))
      .filter(col(l0) <= col(r1) && col(r0) <= col(l1))
      .drop("cell")
      .distinct()

  /** [EXT] Range join: sessions x campaign windows on interval overlap,
    * via [[gridOverlapJoin]].
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame =
    gridOverlapJoin(sessions(spark, dir), campaignWindows(spark, dir),
      "s0", "s1", "w0", "w1")
      .select(col("user_id"), col("session_start"), col("event_type"),
        (least(col("s1"), col("w1")) - greatest(col("s0"), col("w0")))
          .as("overlap_s"))
      .distinct()
      .orderBy(col("user_id"), col("session_start"), col("event_type"),
        col("overlap_s"))

  /** Shared oracle prefix: the e2 gap/running-sum sessionization and
    * the campaign-window build, both in epoch seconds (Spark
    * `unix_timestamp` truncates to seconds; `floor(epoch(..))` is the
    * same truncation for the positive timestamps in play).
    */
  private val intervalCtes =
    """gaps AS (
         SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       sessed AS (
         SELECT user_id, ts,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS sid
         FROM gaps),
       sess AS (
         SELECT user_id, min(ts) AS session_start,
                CAST(floor(epoch(min(ts))) AS BIGINT) AS s0,
                CAST(floor(epoch(max(ts))) AS BIGINT) AS s1
         FROM sessed GROUP BY user_id, sid),
       win AS (
         SELECT event_type,
                CAST(min(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS w0,
                CAST(min(CAST(floor(epoch(ts)) AS BIGINT)) + 5400 AS BIGINT)
                  AS w1
         FROM events GROUP BY event_type, CAST(ts AS DATE))"""

  private val rangeJoinSql =
    s"""WITH $intervalCtes
       SELECT DISTINCT s.user_id, s.session_start, w.event_type,
         CAST(least(s.s1, w.w1) - greatest(s.s0, w.w0) AS BIGINT)
           AS overlap_s
       FROM sess s JOIN win w ON s.s0 <= w.w1 AND w.w0 <= s.s1
       ORDER BY user_id, session_start, event_type, overlap_s"""

  /** [EXT] Interval concurrency profile: for every one-hour grid cell
    * any session touches, how many sessions (and distinct users) were
    * active. Same explode-to-cells decomposition as [[rangeJoin]], then
    * one map-side-combined groupBy(cell) — the sweep-line alternative
    * (+1/-1 deltas, global running sum) needs a total order over all
    * boundary events, which at 100 TB is a single-partition sort; the
    * grid form is embarrassingly parallel and loses only sub-cell
    * resolution.
    */
  def intervalConcurrency(spark: SparkSession, dir: String): DataFrame =
    withCells(sessions(spark, dir), "s0", "s1", CellSecs)
      .groupBy((col("cell") * CellSecs).as("hour_epoch"))
      .agg(count(lit(1)).as("n_active"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour_epoch"))

  private val intervalConcurrencySql =
    s"""WITH $intervalCtes,
       cells AS (
         SELECT user_id,
                unnest(range(s0 // 3600, s1 // 3600 + 1)) * 3600
                  AS hour_epoch
         FROM sess)
       SELECT hour_epoch, count(*) AS n_active,
              count(DISTINCT user_id) AS n_users
       FROM cells GROUP BY 1 ORDER BY hour_epoch"""

  val qs: Seq[Q] = Seq(
    Q("e8_range_join", rangeJoin, Some(rangeJoinSql), bench = true),
    Q("e9_interval_concurrency", intervalConcurrency,
      Some(intervalConcurrencySql)))
}

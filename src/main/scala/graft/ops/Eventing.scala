package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.io.Sources.table

/** Temporal / event-stream operators (SURVEY.md §2.10 [EXT] plan).
  *
  * The reference has no streaming, but its data model (onboarding event
  * dates + flags) is an event log; these are the batch twins of the
  * Structured Streaming pipeline in `graft.streaming.EventStream` —
  * identical plans run over `readStream` there. All keyed by
  * `user_id`/window: shuffles partition by key, no global ordering.
  */
object Eventing {

  /** Tumbling window aggregate — `window(ts, "1 hour")`. Epoch-aligned
    * buckets; DuckDB twin is `time_bucket`.
    */
  def e1TumblingWindow(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("ws"), col("n_events"),
        col("sum_value"))
      .orderBy(col("ws"))

  private val e1Sql =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1 ORDER BY ws"""

  /** Session windows with a 30-minute gap (`session_window`, the batch
    * twin of streaming sessionization). A new session starts when the
    * gap to the previous event is >= 30 minutes.
    */
  def e2SessionWindow(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  private val e2Sql =
    """WITH gaps AS (
         SELECT user_id, ts, value,
                CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       sess AS (
         SELECT user_id, ts, value,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS sid
         FROM gaps)
       SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
              round(sum(value), 2) AS sum_value
       FROM sess GROUP BY user_id, sid
       ORDER BY user_id, session_start"""

  /** Sliding window aggregate — `window(ts, "1 hour", "30 minutes")`:
    * every event lands in 2 overlapping windows. The oracle expands each
    * event into its two window starts explicitly.
    */
  def e6SlidingWindow(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("ws"), col("n_events"),
        col("sum_value"))
      .orderBy(col("ws"))

  private val e6Sql =
    """WITH expanded AS (
         SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, value
         FROM events
         UNION ALL
         SELECT time_bucket(INTERVAL '30 minutes', ts)
                  - INTERVAL '30 minutes' AS ws, value
         FROM events)
       SELECT ws, count(*) AS n_events, round(sum(value), 2) AS sum_value
       FROM expanded GROUP BY ws ORDER BY ws"""

  /** JSON extraction from a string props column (`get_json_object`) with
    * cast-to-int. The oracle parses with a regex so it does not depend on
    * DuckDB's JSON extension being loadable offline.
    */
  def e3JsonExtract(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("k_val",
        get_json_object(col("props"), "$.k").cast("int"))
      .select(col("event_id"), col("event_type"), col("k_val"))
      .orderBy(col("event_id"))

  private val e3Sql =
    """SELECT event_id, event_type,
       TRY_CAST(regexp_extract(props, '"k":\s*(-?[0-9]+)', 1) AS INT) AS k_val
       FROM events ORDER BY event_id"""

  /** Structured JSON parse: `from_json` with a declared schema into a
    * typed struct column (§1.4 nested/struct mapping) — extracting the
    * same value as `e3_json_extract` but through the StructType path.
    */
  def e7FromJson(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("parsed", from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))))
      .select(col("event_id"), col("parsed.k").as("k_val"),
        col("parsed").isNotNull.cast("int").as("parse_ok"))
      .orderBy(col("event_id"))

  private val e7Sql =
    """SELECT event_id,
       TRY_CAST(regexp_extract(props, '"k":\s*(-?[0-9]+)', 1) AS INT) AS k_val,
       CAST(props IS NOT NULL AS INT) AS parse_ok
       FROM events ORDER BY event_id"""

  /** As-of join: for each purchase, the latest strictly-prior click of
    * the same user. Spark-first formulation: ONE shuffle on user_id and a
    * keyed ordered window (`last(..., ignoreNulls)` over preceding rows)
    * instead of the naive range self-join + re-aggregation — the plan
    * that survives 100 TB (sort within user partitions, no pair
    * explosion). The oracle states the same semantics relationally.
    */
  def e4AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    // deterministic total order: at equal ts, purchases sort BEFORE
    // clicks so the preceding-rows frame can never include an equal-ts
    // click — matching the oracle's strict c.ts < p.ts without relying
    // on Spark's arbitrary tie-break among equal sort keys
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"),
        when(col("event_type") === "purchase", 0).otherwise(1),
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // ROW-ATOMIC pick: a single struct max over (ts, event_id, value)
    // selects the latest click and carries ITS value in the same
    // aggregate — the earlier two-aggregate form (max ts + last value
    // ignoreNulls) could return a DIFFERENT row's value if the latest
    // click's value were NULL, silently diverging from the oracle.
    // event_id (unique) seals the order before value, so value never
    // influences which row wins.
    table(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("lc",
        max(when(col("event_type") === "click",
          struct(col("ts"), col("event_id"), col("value")))).over(w))
      .filter(col("event_type") === "purchase" && col("lc").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("lc.ts").as("last_click_ts"),
        col("lc.value").as("last_click_value"))
      .orderBy(col("event_id"))
  }

  private val e4Sql =
    """SELECT p.event_id, p.user_id,
       c.ts AS last_click_ts, c.value AS last_click_value
       FROM events p
       JOIN events c ON c.user_id = p.user_id AND c.ts < p.ts
                    AND c.event_type = 'click'
       WHERE p.event_type = 'purchase'
       QUALIFY row_number() OVER (PARTITION BY p.event_id
         ORDER BY c.ts DESC, c.event_id DESC) = 1
       ORDER BY p.event_id"""

  /** [EXT] FORWARD as-of join — e4's mirror (pandas `merge_asof
    * direction='forward'`): for each purchase, the FIRST click strictly
    * after it (post-purchase behavior attribution). Same
    * one-shuffle-per-key windowed formulation, frame flipped to
    * following rows; at equal timestamps clicks sort BEFORE purchases
    * so the strictly-after contract holds without relying on Spark's
    * arbitrary tie-break, and `event_id` completes the total order so
    * same-instant clicks resolve identically in both engines.
    */
  def e4bAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"),
        when(col("event_type") === "click", 0).otherwise(1),
        col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    // ROW-ATOMIC pick, mirroring [[e4AsofJoin]]: one struct min over
    // (ts, event_id, value) so next_click_value always comes from the
    // SAME row as next_click_ts even if that click's value is NULL
    // (the earlier first(value, ignoreNulls) would have skipped to a
    // later click's value — a latent cross-engine divergence).
    table(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("nc",
        min(when(col("event_type") === "click",
          struct(col("ts"), col("event_id"), col("value")))).over(w))
      .filter(col("event_type") === "purchase" && col("nc").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("nc.ts").as("next_click_ts"),
        col("nc.value").as("next_click_value"))
      .orderBy(col("event_id"))
  }

  private val e4bSql =
    """SELECT p.event_id, p.user_id,
       c.ts AS next_click_ts, c.value AS next_click_value
       FROM events p
       JOIN events c ON c.user_id = p.user_id AND c.ts > p.ts
                    AND c.event_type = 'click'
       WHERE p.event_type = 'purchase'
       QUALIFY row_number() OVER (PARTITION BY p.event_id
         ORDER BY c.ts, c.event_id) = 1
       ORDER BY p.event_id"""

  /** Pivot (FIXTURES.md onboarding mapping: event-type presence matrix
    * per user). The pivot values are declared explicitly — no extra
    * distinct-scan job, and the column set is stable at any scale.
    */
  def e5Pivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    table(spark, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0, types)
      .orderBy(col("user_id"))
  }

  private val e5Sql =
    """SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'error') AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'view') AS view
       FROM events GROUP BY user_id ORDER BY user_id"""

  /** [EXT] Ordered funnel — view -> click -> purchase, each step's
    * timestamp strictly after the previous step's FIRST completion (the
    * standard product-analytics funnel semantics). Computed as a chain
    * of per-user conditional minima: step k's candidate events join the
    * step k-1 table on user_id and keep the minimum timestamp past the
    * prior step.
    *
    * Scale shape: every stage is keyed by user_id — the per-step filter
    * prunes to one event type BEFORE its shuffle, each join is
    * co-partitioned with the previous step's (much smaller) user table,
    * and each groupBy is map-side combined to one row per user. No
    * per-user event arrays are materialized (the collect_list
    * formulation this replaces shuffles every event's payload into one
    * list per user — a skew bomb for power users; the min-chain carries
    * two timestamps per user, whatever the activity).
    */
  def e10Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    def step(of: String, after: DataFrame): DataFrame =
      ev.filter(col("event_type") === of)
        .join(after, Seq("user_id"))
        .filter(col("ts") > col("t_prev"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_prev"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_prev"))
    val s2 = step("click", s1)
    val s3 = step("purchase", s2)
    def level(df: DataFrame, n: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(n).as("step"), lit(name).as("step_name"),
          col("n_users"))
    level(s1, 1, "view").unionAll(level(s2, 2, "click"))
      .unionAll(level(s3, 3, "purchase"))
      .orderBy(col("step"))
  }

  private val e10Sql =
    """WITH s1 AS (SELECT user_id, min(ts) AS t_prev FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
       s2 AS (SELECT e.user_id, min(e.ts) AS t_prev
              FROM events e JOIN s1 ON e.user_id = s1.user_id
              WHERE e.event_type = 'click' AND e.ts > s1.t_prev
              GROUP BY e.user_id),
       s3 AS (SELECT e.user_id, min(e.ts) AS t_prev
              FROM events e JOIN s2 ON e.user_id = s2.user_id
              WHERE e.event_type = 'purchase' AND e.ts > s2.t_prev
              GROUP BY e.user_id)
       SELECT 1 AS step, 'view' AS step_name, count(*) AS n_users FROM s1
       UNION ALL
       SELECT 2, 'click', count(*) FROM s2
       UNION ALL
       SELECT 3, 'purchase', count(*) FROM s3
       ORDER BY step"""

  /** [EXT] Retention cohorts — users grouped by first-seen day, active
    * counts per day offset for the first week. Two aggregates and one
    * user-keyed join: the (user, day) activity table is deduplicated
    * map-side before the join, the cohort table is one row per user,
    * and the final groupBy carries (cohort_day, offset) — tiny domain,
    * map-side combined. The classic warehouse query, shaped so nothing
    * bigger than one row per (user, active-day) ever shuffles.
    */
  def e11Retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val active = ev.select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    active.join(cohort, Seq("user_id"))
      .withColumn("day_offset", datediff(col("d"), col("cohort_day")))
      .filter(col("day_offset") <= 7)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  private val e11Sql =
    """WITH cohort AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
                       FROM events GROUP BY user_id),
       active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                  FROM events)
       SELECT cohort_day,
         CAST(date_diff('day', cohort_day, d) AS INT) AS day_offset,
         count(*) AS n_active
       FROM active JOIN cohort USING (user_id)
       WHERE date_diff('day', cohort_day, d) <= 7
       GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""

  /** [EXT] Event-transition model — the behavioral bigram: per-user
    * consecutive event-type pairs, counted and normalized to
    * per-source-type shares (`share_bps`, integer basis points via
    * `div` so both engines quantize identically). The Markov-chain
    * counting pass behind next-action prediction and anomaly scoring.
    *
    * Scale shape: ONE shuffle keyed by user_id feeds the lag window
    * (each user's history sorts within its partition — no global
    * sort); the pair count is a map-side-combined groupBy over a
    * |types|^2 domain, and the per-source totals it normalizes by are
    * derived from the SAME counted table (one extra tiny aggregate +
    * broadcast join), never a second pass over the events.
    */
  def e12EventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 10000L) div n_from").as("share_bps"))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val e12Sql =
    """WITH seq AS (
         SELECT event_type AS to_type,
           lag(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS from_type
         FROM events),
       p AS (SELECT from_type, to_type, count(*) AS n FROM seq
             WHERE from_type IS NOT NULL GROUP BY 1, 2),
       t AS (SELECT from_type, sum(n) AS n_from FROM p GROUP BY 1)
       SELECT from_type, to_type, n,
         CAST((n * 10000) // CAST(n_from AS BIGINT) AS BIGINT) AS share_bps
       FROM p JOIN t USING (from_type)
       ORDER BY from_type, to_type"""

  val qs: Seq[Q] = Seq(
    Q("e1_tumbling_window", e1TumblingWindow, Some(e1Sql), bench = true),
    Q("e2_session_window", e2SessionWindow, Some(e2Sql), bench = true),
    Q("e6_sliding_window", e6SlidingWindow, Some(e6Sql)),
    Q("e3_json_extract", e3JsonExtract, Some(e3Sql)),
    Q("e7_from_json", e7FromJson, Some(e7Sql)),
    Q("e4_asof_join", e4AsofJoin, Some(e4Sql), bench = true),
    Q("e4b_asof_forward", e4bAsofForward, Some(e4bSql)),
    Q("e5_pivot", e5Pivot, Some(e5Sql)),
    Q("e10_funnel", e10Funnel, Some(e10Sql)),
    Q("e11_retention", e11Retention, Some(e11Sql)),
    Q("e12_event_transitions", e12EventTransitions, Some(e12Sql)))
}

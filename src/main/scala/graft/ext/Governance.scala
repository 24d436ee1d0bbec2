package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.io.Sources.table

/** [EXT] Data-governance operators over the event log — the privacy /
  * data-quality surface a production training-data pipeline runs before
  * anything leaves the raw zone:
  *
  *  - [[pseudonymize]]: salted-hash identifier tokenization with
  *    k-anonymity suppression — user-level analytics without exposing
  *    raw identifiers.
  *  - [[eventAnomaly]]: per-type z-score outlier screening — the
  *    numeric twin of the text quality gate (streaming twin:
  *    `s19_stream_anomaly`, which runs this object's code on the
  *    event stream).
  *  - [[embeddingDrift]]: per-dimension embedding mean-shift — the
  *    encoder-regression release check.
  *
  * Money/metric math rides on integer cents throughout (`floor(v*100
  * + 0.5)` per row, then exact integer sums), so no aggregate is
  * exposed to float summation order and every oracle compare is
  * hash-exact.
  */
object Governance {

  /** Minimum anonymity-set size: a released record's generalized
    * quasi-identifier combination must be shared by >= k users, or the
    * record is suppressed (k-anonymity, the standard release gate).
    */
  val KAnonymity = 50

  /** |z| flag threshold (bps) shared by the batch screen's streaming
    * twin (`s19_stream_anomaly`) and its oracle.
    */
  val AnomalyFlagBps = 16000L

  /** Tokenization pepper. Sourced from the environment
    * (`SPARK_GRAFT_PEPPER`) — in production this comes from a secret
    * manager, NEVER from source control: anyone holding the pepper can
    * dictionary-attack the token space of an enumerable id domain. The
    * in-source default exists only so the test harness runs without
    * setup, and the operator's privacy posture is documented
    * accordingly (see [[pseudonymize]]). Read once at class init so
    * the Spark plan and the oracle SQL interpolation cannot diverge
    * within one process.
    */
  val Pepper: String =
    sys.env.getOrElse("SPARK_GRAFT_PEPPER", "graft-test-pepper:")

  /** Generalization band widths for the released quasi-identifiers:
    * per-user event counts round down to multiples of [[NBandWidth]],
    * per-user value sums (integer cents) to multiples of
    * [[CentsBandWidth]]. Widths are a release-policy choice: wide
    * enough that (band, band) cohorts clear [[KAnonymity]] on real
    * traffic, narrow enough that the released aggregate stays useful.
    */
  val NBandWidth = 8L
  val CentsBandWidth = 500000L

  /** Identifier pseudonymization + k-anonymity release gate.
    *
    * Two distinct guarantees, deliberately not conflated:
    *
    *  1. PSEUDONYMIZATION: `user_id` never appears in the output —
    *     each user becomes a 16-hex salted-SHA-256 token, deterministic
    *     under [[Pepper]] so separate runs join on token. This is
    *     reversible by anyone holding the pepper (GDPR's
    *     "pseudonymisation", not anonymisation) — hence the pepper is
    *     config-sourced, not code.
    *  2. K-ANONYMITY of the released attributes: exact per-user counts
    *     and sums are a re-identification fingerprint even under
    *     pseudonyms, so the output releases only GENERALIZED bands
    *     (event count and cents rounded down to [[NBandWidth]] /
    *     [[CentsBandWidth]]), and a token is released at all only if
    *     its (n_band, cents_band) cohort holds >= [[KAnonymity]]
    *     users; smaller cohorts collapse into one 'suppressed' row
    *     (bands masked to -1). Every released row is therefore
    *     indistinguishable from >= k-1 others on everything released.
    *
    * Scale shape: one map-side-combined aggregate keyed on user_id
    * (the shuffle carries (id, count, cents) — never event payloads);
    * the cohort-size table is bands-sized and broadcast back onto the
    * TINY per-user frame; the final re-group merges only the
    * suppressed bucket. At 100 TB the first aggregate is the only
    * corpus-sized stage.
    */
  def pseudonymize(spark: SparkSession, dir: String): DataFrame = {
    val perUser = table(spark, dir, "events")
      .select(col("user_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents"))
    val banded = perUser.select(col("user_id"),
      (floor(col("n_events") / NBandWidth) * NBandWidth)
        .cast("long").as("n_band"),
      (floor(col("cents") / CentsBandWidth) * CentsBandWidth)
        .cast("long").as("cents_band"))
    val cohorts = banded.groupBy(col("n_band"), col("cents_band"))
      .agg(count(lit(1)).as("cohort_n"))
    banded.join(broadcast(cohorts), Seq("n_band", "cents_band"))
      .select(
        when(col("cohort_n") < KAnonymity, lit("suppressed"))
          .otherwise(substring(sha2(concat(lit(Pepper),
            col("user_id").cast("string")), 256), 1, 16)).as("token"),
        when(col("cohort_n") < KAnonymity, lit(-1L))
          .otherwise(col("n_band")).as("n_band"),
        when(col("cohort_n") < KAnonymity, lit(-1L))
          .otherwise(col("cents_band")).as("cents_band"),
        col("cohort_n"))
      .groupBy(col("token"), col("n_band"), col("cents_band"))
      .agg(count(lit(1)).as("n_merged"), min(col("cohort_n")).as("min_c"))
      .select(col("token"), col("n_band"), col("cents_band"),
        when(col("token") === "suppressed", col("n_merged"))
          .otherwise(col("min_c")).as("anonymity_set"))
      .orderBy(col("token"))
  }

  private val pseudonymizeSql =
    s"""WITH pu AS (
         SELECT user_id, count(*) AS n_events,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
         FROM events GROUP BY user_id),
       b AS (SELECT user_id,
               CAST(floor(n_events / $NBandWidth) * $NBandWidth
                 AS BIGINT) AS n_band,
               CAST(floor(cents / $CentsBandWidth) * $CentsBandWidth
                 AS BIGINT) AS cents_band
             FROM pu),
       c AS (SELECT n_band, cents_band, count(*) AS cohort_n
             FROM b GROUP BY n_band, cents_band),
       t AS (SELECT
               CASE WHEN cohort_n < $KAnonymity THEN 'suppressed'
                 ELSE substr(sha256('${Pepper.replace("'", "''")}'
                   || CAST(user_id AS VARCHAR)), 1, 16) END AS token,
               CASE WHEN cohort_n < $KAnonymity THEN -1
                 ELSE n_band END AS n_band,
               CASE WHEN cohort_n < $KAnonymity THEN -1
                 ELSE cents_band END AS cents_band,
               cohort_n
             FROM b JOIN c USING (n_band, cents_band))
       SELECT token, CAST(n_band AS BIGINT) AS n_band,
         CAST(cents_band AS BIGINT) AS cents_band,
         CAST(CASE WHEN token = 'suppressed' THEN count(*)
           ELSE min(cohort_n) END AS BIGINT) AS anonymity_set
       FROM t GROUP BY token, n_band, cents_band ORDER BY token"""

  /** (event_id, event_type, cents) projection of the event log — the
    * shared first step of the batch screen and its streaming twin
    * (`s19_stream_anomaly` applies the same projection to a stream).
    */
  private[graft] def centsProjection(df: DataFrame): DataFrame =
    df.select(col("event_id"), col("event_type"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))

  /** Per-type count / sum / sum-of-squares — the broadcastable stats
    * table both screens score against (the stream scores against
    * YESTERDAY's batch stats, the standing-reference posture of
    * s14/s15).
    */
  private[graft] def typeStats(spark: SparkSession, dir: String)
      : DataFrame =
    centsProjection(table(spark, dir, "events"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"),
        sum(col("cents") * col("cents")).as("sc2"))

  /** Score a cents frame against a stats table: z (exact-integer-sum
    * mean/variance, identical IEEE double sequence in both engines)
    * and its quantized magnitude. Map-only after the broadcast join —
    * safe on a stream with zero state. One definition executed in both
    * modes, the `gateSignals` discipline: the stream runs THIS code,
    * not a copy that could drift.
    */
  private[graft] def withZ(cents: DataFrame, stats: DataFrame)
      : DataFrame =
    cents.join(broadcast(stats), Seq("event_type"))
      // variance > 0 guard: a type whose cents are all equal (or a
      // single-event type) would otherwise yield zr = NaN, which
      // Spark's non-ANSI CAST silently turns into 0 while DuckDB
      // errors on CAST(floor(NaN) AS BIGINT) — degenerate types pin
      // z to 0 in BOTH engines instead (SQL mirror in the oracles)
      .withColumn("varr",
        (col("sc2") - col("sc").cast("double") * col("sc")
          / col("n")) / col("n"))
      .withColumn("zr",
        when(col("varr") > 0,
          (col("cents") - col("sc").cast("double") / col("n")) /
            sqrt(col("varr"))).otherwise(lit(0.0)))
      .withColumn("az_bps",
        floor(abs(col("zr")) * 10000 + lit(0.5)).cast("long"))

  /** Per-type z-score outlier screen: the top-5 most anomalous events
    * per event_type by |(x - mean) / stddev|, on integer cents.
    *
    * Exactness: mean/variance derive from exact integer sums (sum,
    * sum-of-squares, count — all map-side-combinable; sum(cents^2)
    * stays under 2^63 to ~3.7e9 rows per type at these magnitudes,
    * past which the sums move to decimal/Welford), so the z double is
    * the identical IEEE sequence in both engines and the quantized
    * |z| bps is hash-exact.
    *
    * Scale shape: stats are a tiny per-type aggregate broadcast back;
    * the top-5 uses [[graft.functions.TopKStructs]], so the shuffle
    * moves at most 5 rows per type per map partition and — unlike the
    * window-rank form, whose WindowGroupLimit prune first locally
    * sorts every event — the hot skew-prone event_type key costs one
    * streaming O(n·k) pass, no per-partition sort, no spill surface.
    */
  def eventAnomaly(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TopKStructs.register(spark)
    val c = centsProjection(table(spark, dir, "events"))
    val z = withZ(c, typeStats(spark, dir))
    z.groupBy(col("event_type"))
      .agg(expr("topk_structs(struct(az_bps, -event_id AS nid, cents), 5)")
        .as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
        (-col("col.nid")).as("event_id"),
        col("col.cents").as("value_cents"), col("col.az_bps").as("az_bps"))
      .orderBy(col("event_type"), col("rank"))
  }

  private val eventAnomalySql =
    """WITH c AS (SELECT event_id, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
       s AS (SELECT event_type, count(*) AS n, sum(cents) AS sc,
               sum(cents * cents) AS sc2 FROM c GROUP BY event_type),
       z AS (SELECT c.event_id, c.event_type, c.cents,
               CASE WHEN (sc2 - CAST(sc AS DOUBLE) * sc / n) / n > 0
                 THEN (c.cents - CAST(sc AS DOUBLE) / n)
                   / sqrt((sc2 - CAST(sc AS DOUBLE) * sc / n) / n)
                 ELSE 0 END AS zr
             FROM c JOIN s ON c.event_type = s.event_type),
       rk AS (SELECT event_id, event_type, cents,
                CAST(floor(abs(zr) * 10000 + 0.5) AS BIGINT) AS az_bps,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY floor(abs(zr) * 10000 + 0.5) DESC, event_id)
                  AS rank
              FROM z)
       SELECT event_type, CAST(rank AS INT) AS rank, event_id,
         cents AS value_cents, az_bps
       FROM rk WHERE rank <= 5 ORDER BY event_type, rank"""

  /** [EXT] Right-to-be-forgotten purge audit (GDPR Art. 17 / CCPA
    * deletion): given a deletion-request batch — here the
    * deterministic `user_id % 97 == 0` slice standing in for the DSR
    * queue, which is TINY by nature — emit the per-type purge
    * manifest (events/users kept and purged) plus the verification
    * every DSR process must attach: zero requested users survive.
    *
    * Scale shape, two jobs by design:
    *  - the MANIFEST is one map-side-combined aggregate over a flag
    *    column (requested?) — one corpus pass, no join, shuffle
    *    carries per-type partial counts only;
    *  - the VERIFICATION runs the production purge itself (request
    *    set broadcast, left_anti to purge) and then re-applies the
    *    DELETION POLICY PREDICATE — not the same requests frame —
    *    to the purge output: counting `user_id % 97 == 0` survivors
    *    checks the request-set derivation and the join key end to
    *    end, where a left_semi on the identical requests frame would
    *    be empty by construction and verify nothing. At 100 TB both
    *    are single-pass over events with a request-set broadcast;
    *    `OperatorInvariantsSpec` pins the flag-aggregate manifest
    *    equal to counts over the real anti-join output.
    */
  def forgetUser(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("event_type"), col("user_id"),
        (pmod(col("user_id"), lit(97)) === 0).as("req"))
    val manifest = ev.groupBy(col("event_type"))
      .agg(sum(when(!col("req"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("req"), 1L).otherwise(0L)).as("n_purged"),
        countDistinct(when(!col("req"), col("user_id"))).as("users_kept"),
        countDistinct(when(col("req"), col("user_id"))).as("users_purged"))
    val requests = ev.filter(col("req"))
      .select(col("user_id")).distinct()
    val purged = table(spark, dir, "events")
      .join(broadcast(requests), Seq("user_id"), "left_anti")
    // survivors by POLICY PREDICATE, independent of the requests frame
    val survivors = purged
      .filter(pmod(col("user_id"), lit(97)) === 0)
      .agg(count(lit(1)).as("n_survivors"))
      .select((col("n_survivors") === 0).as("no_survivors"))
    manifest.crossJoin(broadcast(survivors))
      .select(col("event_type"), col("n_kept"), col("n_purged"),
        col("users_kept"), col("users_purged"), col("no_survivors"))
      .orderBy(col("event_type"))
  }

  private val forgetUserSql =
    """WITH f AS (SELECT event_type, user_id,
             user_id % 97 = 0 AS req FROM events)
       SELECT event_type,
         CAST(sum(CASE WHEN NOT req THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
         CAST(sum(CASE WHEN req THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purged,
         CAST(count(DISTINCT CASE WHEN NOT req THEN user_id END)
           AS BIGINT) AS users_kept,
         CAST(count(DISTINCT CASE WHEN req THEN user_id END)
           AS BIGINT) AS users_purged,
         TRUE AS no_survivors
       FROM f GROUP BY event_type ORDER BY event_type"""

  /** Embedding-distribution drift monitor: per-dimension mean shift
    * between two corpus slices (here the deterministic vec_id parity
    * halves; production compares yesterday's embedding batch against
    * today's before letting a new encoder version into the index).
    * A drifting dimension is the first signal of encoder regression /
    * domain shift — checked per release the way [[pseudonymize]] is.
    *
    * Exactness: each float element quantizes to integer bps BEFORE
    * aggregation, so the per-dim sums are exact integers and the mean
    * drift is the identical IEEE division in both engines — float
    * summation order can never move a hash.
    *
    * Scale shape: posexplode to (dim, half) keyed rows, ONE
    * map-side-combined aggregate — the shuffle carries 128 partial
    * sums per map partition, not the corpus; no per-vector state, no
    * collect. At 100 TB this is a single pass over the embedding
    * column with a 64-row result.
    */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "embeddings")
      .select(pmod(col("vec_id"), lit(2)).as("half"),
        posexplode(expr(
          "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)" +
            " * 10000 + 0.5) AS BIGINT))")))
      .select(col("half"), (col("pos") + 1).as("dim"), col("col").as("bps"))
    val agg = e.groupBy(col("dim"), col("half"))
      .agg(count(lit(1)).as("n"), sum(col("bps")).as("s"))
    agg.groupBy(col("dim"))
      .agg(sum(when(col("half") === 0, col("n"))).as("n_a"),
        sum(when(col("half") === 0, col("s"))).as("s_a"),
        sum(when(col("half") === 1, col("n"))).as("n_b"),
        sum(when(col("half") === 1, col("s"))).as("s_b"))
      .select(col("dim").cast("int").as("dim"),
        col("n_a"), col("n_b"),
        floor(col("s_a").cast("double") / col("n_a") + lit(0.5))
          .cast("long").as("mean_a_bps"),
        floor(col("s_b").cast("double") / col("n_b") + lit(0.5))
          .cast("long").as("mean_b_bps"),
        abs(floor(col("s_a").cast("double") / col("n_a") + lit(0.5))
          - floor(col("s_b").cast("double") / col("n_b") + lit(0.5)))
          .cast("long").as("drift_bps"))
      .orderBy(col("dim"))
  }

  private val embeddingDriftSql =
    """WITH q AS (
         SELECT vec_id % 2 AS half, i AS dim,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000 + 0.5)
             AS BIGINT) AS bps
         FROM embeddings, range(1, 65) t(i)),
       a AS (SELECT dim, half, count(*) AS n, sum(bps) AS s
             FROM q GROUP BY dim, half),
       p AS (SELECT dim,
               sum(CASE WHEN half = 0 THEN n END) AS n_a,
               sum(CASE WHEN half = 0 THEN s END) AS s_a,
               sum(CASE WHEN half = 1 THEN n END) AS n_b,
               sum(CASE WHEN half = 1 THEN s END) AS s_b
             FROM a GROUP BY dim)
       SELECT CAST(dim AS INT) AS dim,
         CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         CAST(floor(CAST(s_a AS DOUBLE) / n_a + 0.5) AS BIGINT)
           AS mean_a_bps,
         CAST(floor(CAST(s_b AS DOUBLE) / n_b + 0.5) AS BIGINT)
           AS mean_b_bps,
         CAST(abs(floor(CAST(s_a AS DOUBLE) / n_a + 0.5)
           - floor(CAST(s_b AS DOUBLE) / n_b + 0.5)) AS BIGINT)
           AS drift_bps
       FROM p ORDER BY dim"""

  val qs: Seq[Q] = Seq(
    Q("x_pseudonymize", pseudonymize, Some(pseudonymizeSql)),
    Q("x_event_anomaly", eventAnomaly, Some(eventAnomalySql),
      confs = Q.KBoundedAggConfs),
    Q("x_forget_user", forgetUser, Some(forgetUserSql)),
    Q("x_embedding_drift", embeddingDrift, Some(embeddingDriftSql)))
}

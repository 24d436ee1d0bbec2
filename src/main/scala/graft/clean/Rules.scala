package graft.clean

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.io.Sources.table

/** Cleaning-rule pipeline (reference stage 2, `pre_process.py`).
  *
  * The reference derives per-user onboarding flags/dates, then applies 7
  * consistency rules: filters + anti-joins that DELETE violating rows,
  * with one rule (R4, `pre_process.py:180-185`) deliberately DETECTED BUT
  * NOT APPLIED — an asymmetry we preserve. Violation counts come from one
  * fused aggregate pass (SURVEY.md §4.3.3) instead of per-rule count()
  * jobs.
  *
  * The onboarding-shaped table is derived from `events` (FIXTURES.md
  * mapping): flags are computed over an early window while dates come
  * from the whole log, so flag/date inconsistencies genuinely occur —
  * the same shape the reference cleans.
  */
object Rules {

  /** Derive the onboarding-shaped frame: one row per user with flags and
    * first-event dates. Flag window: signup counts only if before
    * 2024-01-15 (dates span the whole log) — that mismatch manufactures
    * the reference's dt-without-flag inconsistencies.
    */
  def onboarding(spark: SparkSession, dir: String): DataFrame =
    onboardingDf(table(spark, dir, "events"))

  def onboardingDf(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        max(when(col("event_type") === "signup" &&
          col("ts") < lit("2024-01-15").cast("timestamp"), 1).otherwise(0))
          .as("signup"),
        min(when(col("event_type") === "signup", col("ts"))).as("signup_ts"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("purchase"),
        min(when(col("event_type") === "purchase", col("ts")))
          .as("purchase_ts"),
        min(when(col("event_type") === "error", col("ts")))
          .as("first_error_ts"),
        count(lit(1)).as("n_events"))

  private val onbSql =
    """SELECT user_id,
       min(ts) AS first_ts,
       max(ts) AS last_ts,
       max(CASE WHEN event_type = 'signup' AND ts < TIMESTAMP '2024-01-15'
                THEN 1 ELSE 0 END) AS signup,
       min(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
       max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase,
       min(CASE WHEN event_type = 'purchase' THEN ts END) AS purchase_ts,
       min(CASE WHEN event_type = 'error' THEN ts END) AS first_error_ts,
       count(*) AS n_events
       FROM events GROUP BY user_id"""

  /** The rule set: (name, violation predicate, applied?). Null-safe by
    * construction (explicit isNotNull guards). R4's `applied = false`
    * mirrors `pre_process.py:180-185`. Rules are [[RuleEngine.Rule]]s —
    * the generic engine handles composition and reporting.
    */
  type Rule = RuleEngine.Rule
  val Rule = RuleEngine.Rule

  def ruleSet: Seq[Rule] = Seq(
    Rule("r1_dt_without_flag",
      col("signup_ts").isNotNull && col("signup") === 0, applied = true),
    Rule("r3_purchase_without_signup",
      col("purchase") === 1 && col("signup") === 0, applied = true),
    Rule("r4_purchase_before_signup",
      col("purchase_ts").isNotNull && col("signup_ts").isNotNull &&
        col("purchase_ts") < col("signup_ts"), applied = false),
    Rule("r5_error_before_signup",
      col("first_error_ts").isNotNull && col("signup_ts").isNotNull &&
        col("first_error_ts") < col("signup_ts"), applied = true))

  /** Apply the applied-rules as a single composed filter (Catalyst folds
    * the conjunction into one scan predicate — vs. the reference's
    * sequential anti-join per rule, each a full shuffle).
    */
  def cleaned(spark: SparkSession, dir: String): DataFrame =
    cleanedDf(onboarding(spark, dir))

  /** Apply the applied-rules to an already-derived onboarding frame. */
  def cleanedDf(onb: DataFrame): DataFrame =
    RuleEngine.clean(onb, ruleSet).orderBy(col("user_id"))

  private[graft] val cleanedSql =
    s"""WITH onb AS ($onbSql)
        SELECT * FROM onb
        WHERE NOT coalesce(signup_ts IS NOT NULL AND signup = 0, false)
          AND NOT coalesce(purchase = 1 AND signup = 0, false)
          AND NOT coalesce(first_error_ts IS NOT NULL AND signup_ts IS NOT NULL
                AND first_error_ts < signup_ts, false)
        ORDER BY user_id"""

  /** Per-rule violation counts in ONE aggregate pass (all four rules,
    * including detected-only R4).
    */
  def ruleCounts(spark: SparkSession, dir: String): DataFrame =
    RuleEngine.report(onboarding(spark, dir), ruleSet)

  private val ruleCountsSql =
    s"""WITH onb AS ($onbSql)
        SELECT count(*) AS n_total,
        CAST(sum(CASE WHEN signup_ts IS NOT NULL AND signup = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS r1_dt_without_flag,
        CAST(sum(CASE WHEN purchase = 1 AND signup = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS r3_purchase_without_signup,
        CAST(sum(CASE WHEN purchase_ts IS NOT NULL AND signup_ts IS NOT NULL
                 AND purchase_ts < signup_ts
                 THEN 1 ELSE 0 END) AS BIGINT) AS r4_purchase_before_signup,
        CAST(sum(CASE WHEN first_error_ts IS NOT NULL AND signup_ts IS NOT NULL
                 AND first_error_ts < signup_ts
                 THEN 1 ELSE 0 END) AS BIGINT) AS r5_error_before_signup
        FROM onb"""

  val qs: Seq[Q] = Seq(
    Q("clean1_pipeline", cleaned, Some(cleanedSql), bench = true),
    Q("clean2_rule_counts", ruleCounts, Some(ruleCountsSql)))
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.io.Sources.{dirKey, table, tmpDir}

/** Reference-shaped END-TO-END parity (round-15 directive 4; widened to
  * the FULL rule surface in round 16 — verdict item 6): the reference
  * quirks — the multiline lk_users CSV read (`pre_analysis.py:52-59`),
  * the habito null-fill with the STRING "0" (`pre_process.py:110-111`),
  * the R4 detected-but-not-applied asymmetry (`pre_process.py:180-185`),
  * the string-"0" transaction-count null-fill with implicit cross-cast
  * (`pre_process.py:260`), the activacion repair's otherwise-less `when`
  * (`pre_process.py:270-276`), and the otherwise-less activity label
  * (`transform.py:274-276`) — composed through ONE job the way the
  * reference composes them, now with ALL SEVEN cleaning rules
  * (`pre_process.py:121-235`) plus the repair in reference order:
  *
  *  - input dedup first, as the reference opens (`pre_process.py:52-54`):
  *    full-row `dropDuplicates` on bt and users, KEYED on
  *    lk_onboarding — load-bearing, because the fixture plants exact
  *    duplicate rows (the oracle replays from the un-duplicated source
  *    tables, so a skipped dedup hash-fails);
  *  - `_c0` renamed to `serial_onboarding` (the reference's anti-join
  *    key, `pre_process.py:68-73`) and `Unnamed: 0` pruned;
  *  - R1 dt-without-flag, all FOUR columns (habito/activacion/setup/
  *    return — the reference unions four violation frames and
  *    subtracts, `pre_process.py:121-139`; the composed conjunction is
  *    row-equivalent);
  *  - R2 drop null first_login_dt (`pre_process.py:150`);
  *  - R3 delete activacion=0 ∧ habito=1 (`pre_process.py:161-168`);
  *  - R4 habito_dt < activacion_dt DETECTED into a flag, deliberately
  *    NOT applied (`pre_process.py:180-185` has no anti-join);
  *  - R5 delete activacion_dt < setup_dt (`pre_process.py:194-201`);
  *  - R6 delete activacion=1 ∧ setup=0 (`pre_process.py:214-219`);
  *  - R7 delete return_dt < first_login_dt (`pre_process.py:230-235`);
  *  - repair: per-user qualifying-transaction count LEFT-joined, "0"
  *    string fill + cross-cast compare, activacion := 0 where
  *    activacion=1 ∧ count=0, activacion_dt nulled via the
  *    otherwise-less `when` (`pre_process.py:250-276`).
  *
  * `ref1_pipeline_parity` stands up an MLB-shaped CSV trio
  * (`bt_users_transactions` / `lk_onboarding` / `lk_users`) derived
  * DETERMINISTICALLY from the sf tables (events + customer). Every rule
  * is exercised with real violating rows: the fixture stripes
  * deterministic per-user corruptions (prime-modulus bands on user_id,
  * so every sf dir produces violators for every rule) on top of the
  * flag-window inconsistencies `clean.Rules.onboardingDf` already
  * manufactures — exactly the shape of the reference's dirty
  * lk_onboarding. Rules compose as filters on STRING columns with
  * explicit casts (the reference reads with no schema): timestamps are
  * formatted at microsecond precision so string order == chronological
  * order, and the `_c0` / `Unnamed: 0` serial columns are dropped
  * (`pre_process.py:68-73`).
  *
  * The DuckDB oracle replays the whole derivation — stripes, rules,
  * repair, labels — from the same source tables, making the composed
  * result fully hash-checked end to end.
  *
  * Scale shape: one aggregate over events (map-side combined), two
  * broadcast-sized joins (users and counts are per-user rows); the CSV
  * trio is fixture plumbing, written once per sf dir.
  */
object RefParity {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private def f(c: Column) = date_format(c, TsFmt)

  private def allString(names: Seq[String]): StructType =
    StructType(names.map(n => StructField(n, StringType)))

  /** Write the MLB-shaped trio for `dir` (idempotent overwrite — the
    * derivation is deterministic, so rewriting is safe) and return its
    * root. The lk_onboarding stripes (prime-modulus bands on user_id)
    * plant violators for every rule the parity job must delete:
    *
    *  - %29==7: first_login_dt NULL                      → R2
    *  - %23==2: habito NULL (the "0"-fill's input)       → fill + R1
    *  - %37==3: activacion "0", activacion_dt kept       → R1-activacion
    *  - %41==5: activacion "0", activacion_dt NULL       → R3 (habito=1)
    *  - %43==6: setup "0", setup_dt NULL                 → R6 (activacion=1)
    *  - %47==8: setup "0", setup_dt kept                 → R1-setup
    *  - %53==9: return "0", return_dt = last event       → R1-return
    *  - %31==1 (and >20 events): return_dt = first event − 1 day → R7
    *
    * R5 (activacion_dt < setup_dt) fires on natural data — first
    * purchase before first error is ~half the users — and R4's
    * detect-only flag (habito_dt < activacion_dt) is true for most
    * survivors (signup precedes purchase), keeping both
    * non-degenerate without a stripe.
    */
  private[graft] def writeTrio(spark: SparkSession, dir: String): String = {
    val root = tmpDir("ref1_parity") + "/" + dirKey(dir)
    val events = table(spark, dir, "events")

    // planted EXACT duplicates (round 16): the reference opens its
    // pipeline with dropDuplicates on every input — full-row on
    // bt/users, keyed on lk_onboarding (pre_process.py:52-54) — so the
    // fixture writes a deterministic stripe of rows TWICE and the
    // parity job's dedups are load-bearing, not dead ops. Duplicates
    // are byte-identical copies, so the dedup'd frame — and the DuckDB
    // oracle, which replays from the un-duplicated source tables — is
    // unchanged.
    def withDups(df: DataFrame, dupStripe: Column): DataFrame =
      df.unionAll(df.filter(dupStripe))

    // bt_users_transactions: one row per event, stringly
    withDups(events.select(
      col("event_id").cast("string").as("_c0"),
      concat(lit("MLB"), col("user_id")).as("user_id"),
      f(col("ts")).as("transaction_dt"),
      col("event_type").as("type"),
      col("value").cast("string").as("monto"),
      (pmod(col("user_id"), lit(2)) + 1).cast("string").as("segment")),
      pmod(col("_c0").cast("long"), lit(101)) === 0)
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(s"$root/bt_users_transactions")

    // lk_onboarding: per-user flags/dates with the reference's
    // habito/activacion naming (clean.Rules.onboardingDf is the shared
    // derivation) plus the rule-violation stripes documented above
    def stripe(p: Int, r: Int): Column = pmod(col("user_id"), lit(p)) === r
    withDups(clean.Rules.onboardingDf(events).select(
      col("user_id").cast("string").as("_c0"),
      col("user_id").cast("string").as("Unnamed: 0"),
      when(stripe(29, 7), lit(null).cast("string"))
        .otherwise(f(col("first_ts"))).as("first_login_dt"),
      date_format(col("first_ts"), "yyyy").as("week_year"),
      concat(lit("MLB"), col("user_id")).as("user_id"),
      when(stripe(23, 2), lit(null).cast("string"))
        .otherwise(col("signup").cast("string")).as("habito"),
      f(col("signup_ts")).as("habito_dt"),
      when(stripe(37, 3) || stripe(41, 5), "0")
        .otherwise(col("purchase").cast("string")).as("activacion"),
      when(stripe(41, 5), lit(null).cast("string"))
        .otherwise(f(col("purchase_ts"))).as("activacion_dt"),
      when(stripe(43, 6) || stripe(47, 8), "0")
        .when(col("first_error_ts").isNotNull, "1").otherwise("0")
        .as("setup"),
      when(stripe(43, 6), lit(null).cast("string"))
        .otherwise(f(col("first_error_ts"))).as("setup_dt"),
      when(stripe(53, 9), "0")
        .when(col("n_events") > 20, "1").otherwise("0").as("return"),
      when(stripe(53, 9), f(col("last_ts")))
        .when(stripe(31, 1) && col("n_events") > 20,
          f(col("first_ts") - expr("INTERVAL 1 DAY")))
        .when(col("n_events") > 20, f(col("last_ts")))
        .otherwise(lit(null).cast("string")).as("return_dt")),
      pmod(col("_c0").cast("long"), lit(19)) === 4)
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(s"$root/lk_onboarding")

    // lk_users: the MULTILINE quirk — address embeds a newline, so the
    // writer quotes it and a non-multiline reader would shred the file
    withDups(table(spark, dir, "customer").select(
      col("c_custkey").cast("string").as("_c0"),
      concat(lit("MLB"), col("c_custkey")).as("user_id"),
      col("c_name").as("name"),
      concat(col("c_name"), lit("@example.com")).as("email"),
      concat(lit("Street "), col("c_custkey"), lit("\n"),
        col("c_mktsegment"), lit(" district")).as("address"),
      concat(lit("19"), (pmod(col("c_custkey"), lit(30)) + lit(70))
        .cast("string"), lit("-01-01")).as("birth_dt"),
      concat(lit("+55"), col("c_custkey")).as("phone"),
      lit("individual").as("type"),
      col("c_mktsegment").as("rubro")),
      pmod(col("_c0").cast("long"), lit(59)) === 11)
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"").csv(s"$root/lk_users")
    root
  }

  def ref1PipelineParity(spark: SparkSession, dir: String): DataFrame = {
    val root = writeTrio(spark, dir)

    // stringly reads, reference options (no schema inference)
    val bt = spark.read.schema(allString(Seq("_c0", "user_id",
      "transaction_dt", "type", "monto", "segment")))
      .option("header", "true").csv(s"$root/bt_users_transactions")
    val onb = spark.read.schema(allString(Seq("_c0", "Unnamed: 0",
      "first_login_dt", "week_year", "user_id", "habito", "habito_dt",
      "activacion", "activacion_dt", "setup", "setup_dt", "return",
      "return_dt")))
      .option("header", "true").csv(s"$root/lk_onboarding")
    val users = spark.read.schema(allString(Seq("_c0", "user_id", "name",
      "email", "address", "birth_dt", "phone", "type", "rubro")))
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"").csv(s"$root/lk_users")

    // input dedup, reference order (pre_process.py:52-54): full-row on
    // bt and users, KEYED on lk_onboarding — the fixture plants exact
    // duplicate rows so each of these is load-bearing
    // (`EdgeSemanticsSpec` pins the raw reads as genuinely duplicated).
    // The keyed dedup is deterministic here because the planted
    // duplicates are byte-identical copies of their originals.
    val btD = bt.dropDuplicates()
    val onbD = onb.dropDuplicates(Seq("user_id"))
    val usersD = users.dropDuplicates()

    // serial rename + serial-column prune (pre_process.py:68-73): _c0
    // becomes serial_onboarding — the reference's anti-join key; our
    // composed filters don't need it, but it rides the chain like the
    // reference's and is pruned only at the output projection
    val onbClean = onbD.withColumnRenamed("_c0", "serial_onboarding")
      .drop("Unnamed: 0")
    val usersClean = usersD.drop("_c0")

    // habito null-fill with the STRING "0", then explicit int cast —
    // the reference's exact two-step (pre_process.py:110-111)
    val filled = onbClean
      .withColumn("habito",
        when(col("habito").isNull, "0").otherwise(col("habito")))
      .withColumn("habito_i", col("habito").cast("int"))
      .withColumn("activacion_i", col("activacion").cast("int"))
      .withColumn("setup_i", col("setup").cast("int"))
      .withColumn("return_i", col("return").cast("int"))

    // the full rule chain in reference order, on STRING dt columns
    // (microsecond-formatted strings order chronologically). Sequential
    // deletes compose to one conjunction — Catalyst folds it into a
    // single scan predicate, vs the reference's per-rule anti-join.
    def viol(c: Column): Column = coalesce(c, lit(false))
    val flagged = filled
      // R1: dt-without-flag, all four columns (121-139)
      .filter(!viol(col("habito_dt").isNotNull && col("habito_i") === 0))
      .filter(!viol(col("activacion_dt").isNotNull &&
        col("activacion_i") === 0))
      .filter(!viol(col("setup_dt").isNotNull && col("setup_i") === 0))
      .filter(!viol(col("return_dt").isNotNull && col("return_i") === 0))
      // R2: null first_login_dt (150)
      .filter(col("first_login_dt").isNotNull)
      // R3: activacion=0 ∧ habito=1 (161-168)
      .filter(!viol(col("activacion_i") === 0 && col("habito_i") === 1))
      // R4: habito_dt < activacion_dt — DETECTED, not applied (180-185)
      .withColumn("r4_flag",
        viol(col("habito_dt") < col("activacion_dt")))
      // R5: activacion_dt < setup_dt (194-201)
      .filter(!viol(col("activacion_dt") < col("setup_dt")))
      // R6: activacion=1 ∧ setup=0 (214-219)
      .filter(!viol(col("activacion_i") === 1 && col("setup_i") === 0))
      // R7: return_dt < first_login_dt (230-235)
      .filter(!viol(col("return_dt") < col("first_login_dt")))

    // repair (250-276): LEFT join per-user qualifying-transaction
    // counts (high-value purchases — the bt rows that play the role of
    // the reference's transactions; the monto string -> double cast is
    // the stringly-CSV cross-cast again), so ~20% of users genuinely
    // have NO qualifying row and the "0" fill + rewrite are exercised
    val txCounts = btD.filter(col("type") === "purchase" &&
        col("monto").cast("double") > 100.0)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val repaired = flagged.join(txCounts, Seq("user_id"), "left")
      // null-fill with the STRING "0" (260) — transaction_count is a
      // string column from here on, compared against int literals via
      // the reference's implicit cross-cast
      .withColumn("transaction_count",
        when(col("cnt").isNull, "0").otherwise(col("cnt").cast("string")))
      // activacion := 0 where activacion=1 ∧ count=0 (270-273)
      .withColumn("activacion_rep",
        when(col("activacion_i") === 1 && col("transaction_count") === 0,
          0).otherwise(col("activacion_i")))
      // activacion_dt := null via the otherwise-less when (274-276)
      .withColumn("activacion_dt_rep",
        when(!(col("activacion_dt").isNotNull &&
          col("transaction_count") === 0), col("activacion_dt")))
      // the final int cast (transform.py:190)
      .withColumn("tx_count", col("transaction_count").cast("int"))

    // user join + multiline proof + otherwise-less activity label
    repaired.join(usersClean, Seq("user_id"))
      .withColumn("addr_lines",
        size(split(col("address"), "\n")).cast("int"))
      .withColumn("activity",
        when(col("tx_count") >= 3, "alta")
          .when(col("tx_count") >= 1, "media"))
      .select(col("user_id"),
        col("addr_lines"),
        col("tx_count"),
        col("habito_i").as("habito"),
        col("activacion_rep").as("activacion"),
        col("activacion_dt_rep").isNull.as("activacion_dt_nulled"),
        col("setup_i").as("setup"),
        col("return_i").as("return_flag"),
        col("r4_flag"),
        col("activity"))
      .orderBy(col("user_id"))
  }

  private val ref1Sql =
    """WITH onb AS (
         SELECT user_id,
           min(ts) AS first_ts,
           max(ts) AS last_ts,
           max(CASE WHEN event_type = 'signup'
                    AND ts < TIMESTAMP '2024-01-15'
                    THEN 1 ELSE 0 END) AS signup,
           min(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS purchase,
           min(CASE WHEN event_type = 'purchase' THEN ts END)
             AS purchase_ts,
           min(CASE WHEN event_type = 'error' THEN ts END) AS error_ts,
           count(*) AS n_events
         FROM events GROUP BY user_id),
       shaped AS (
         SELECT user_id,
           CASE WHEN user_id % 29 = 7 THEN NULL
                ELSE first_ts END AS first_login_ts,
           CASE WHEN user_id % 23 = 2 THEN 0 ELSE signup END AS habito,
           signup_ts AS habito_ts,
           CASE WHEN user_id % 37 = 3 OR user_id % 41 = 5 THEN 0
                ELSE purchase END AS activacion,
           CASE WHEN user_id % 41 = 5 THEN NULL
                ELSE purchase_ts END AS activacion_ts,
           CASE WHEN user_id % 43 = 6 OR user_id % 47 = 8 THEN 0
                WHEN error_ts IS NOT NULL THEN 1 ELSE 0 END AS setup,
           CASE WHEN user_id % 43 = 6 THEN NULL
                ELSE error_ts END AS setup_ts,
           CASE WHEN user_id % 53 = 9 THEN 0
                WHEN n_events > 20 THEN 1 ELSE 0 END AS return_flag,
           CASE WHEN user_id % 53 = 9 THEN last_ts
                WHEN user_id % 31 = 1 AND n_events > 20
                  THEN first_ts - INTERVAL 1 DAY
                WHEN n_events > 20 THEN last_ts END AS return_ts
         FROM onb),
       kept AS (
         SELECT *,
           coalesce(habito_ts < activacion_ts, false) AS r4_flag
         FROM shaped
         WHERE NOT coalesce(habito_ts IS NOT NULL AND habito = 0, false)
           AND NOT coalesce(activacion_ts IS NOT NULL AND activacion = 0,
                 false)
           AND NOT coalesce(setup_ts IS NOT NULL AND setup = 0, false)
           AND NOT coalesce(return_ts IS NOT NULL AND return_flag = 0,
                 false)
           AND first_login_ts IS NOT NULL
           AND NOT coalesce(activacion = 0 AND habito = 1, false)
           AND NOT coalesce(activacion_ts < setup_ts, false)
           AND NOT coalesce(return_ts < first_login_ts, false)),
       kept6 AS (
         SELECT * FROM kept
         WHERE NOT coalesce(activacion = 1 AND setup = 0, false)),
       tx AS (SELECT user_id, count(*) AS cnt FROM events
              WHERE event_type = 'purchase' AND value > 100.0
              GROUP BY user_id),
       rep AS (
         SELECT k.*,
           coalesce(tx.cnt, 0) AS tx_count_i
         FROM kept6 k LEFT JOIN tx ON tx.user_id = k.user_id),
       rep2 AS (
         SELECT *,
           CASE WHEN activacion = 1 AND tx_count_i = 0 THEN 0
                ELSE activacion END AS activacion_rep,
           CASE WHEN NOT (activacion_ts IS NOT NULL AND tx_count_i = 0)
                THEN activacion_ts END AS activacion_ts_rep
         FROM rep),
       j AS (
         SELECT 'MLB' || CAST(k.user_id AS VARCHAR) AS user_id,
           CAST(len(string_split('Street ' || CAST(c.c_custkey AS VARCHAR)
             || chr(10) || c.c_mktsegment || ' district', chr(10)))
             AS INT) AS addr_lines,
           CAST(k.tx_count_i AS INT) AS tx_count,
           CAST(k.habito AS INT) AS habito,
           CAST(k.activacion_rep AS INT) AS activacion,
           k.activacion_ts_rep IS NULL AS activacion_dt_nulled,
           CAST(k.setup AS INT) AS setup,
           CAST(k.return_flag AS INT) AS return_flag,
           k.r4_flag AS r4_flag
         FROM rep2 k
         JOIN customer c ON c.c_custkey = k.user_id)
       SELECT user_id, addr_lines, tx_count, habito, activacion,
         activacion_dt_nulled, setup, return_flag, r4_flag,
         CASE WHEN tx_count >= 3 THEN 'alta'
              WHEN tx_count >= 1 THEN 'media' END AS activity
       FROM j ORDER BY user_id"""

  val qs: Seq[Q] = Seq(
    Q("ref1_pipeline_parity", ref1PipelineParity, Some(ref1Sql)))
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** The reference's edge semantics, each deliberately preserved
  * (SURVEY.md §7.4.3): cast-to-null, string "0" null-fill with implicit
  * cross-cast compare, `when` without `otherwise` => null, except =
  * EXCEPT DISTINCT, union is positional/ALL.
  */
class EdgeSemanticsSpec extends SparkSuite {
  import spark.implicits._

  test("failed casts yield null (non-ANSI), the validity-probe idiom") {
    // pre_analysis.py:244-258 uses failed casts as its validity test
    val df = Seq("123", "1-URGENT", "x", "2024-01-05").toDF("s")
      .select(col("s").cast("int").as("i"), to_date(col("s")).as("d"))
    val rows = df.collect()
    assert(rows.map(_.isNullAt(0)).toSeq == Seq(false, true, true, true))
    assert(rows.map(_.isNullAt(1)).toSeq == Seq(true, true, true, false))
  }

  test("string \"0\" null-fill then numeric compare cross-casts") {
    // pre_process.py:260-266: fills string "0" into transaction_count,
    // then compares == 0 relying on implicit cross-cast
    val df = Seq(Some("3"), None).toDF("cnt")
      .withColumn("filled", when(col("cnt").isNull, "0").otherwise(col("cnt")))
      .withColumn("is_zero", col("filled") === 0)
    assert(df.collect().map(_.getBoolean(2)).toSeq == Seq(false, true))
  }

  test("when without otherwise yields null") {
    // pre_process.py:274-276 nulls activacion_dt this way
    val df = Seq(1, 0).toDF("flag")
      .withColumn("v", when(col("flag") === 1, lit("x")))
    assert(df.collect().map(_.isNullAt(1)).toSeq == Seq(false, true))
  }

  test("except is EXCEPT DISTINCT (PySpark subtract semantics)") {
    // pre_process.py:139: df.subtract(bad) removes AND dedups
    val a = Seq(1, 1, 2, 3).toDF("k")
    val b = Seq(3).toDF("k")
    assert(a.except(b).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("union is positional and keeps duplicates (UNION ALL)") {
    // pre_analysis.py:434-437 stacks user_id columns positionally
    val a = Seq((1, "a")).toDF("x", "y")
    val b = Seq((2, "b")).toDF("x", "y")
    assert(a.union(b).union(a).count() == 3)
  }

  test("R4 is detected but NOT applied (pre_process.py:180-185 asymmetry)") {
    // a user whose purchase precedes signup: counted by r4, not removed
    val events = Seq(
      (1L, "2024-01-02 10:00:00", 7L, "purchase", 5.0, "{}"),
      (2L, "2024-01-03 10:00:00", 7L, "signup", 0.0, "{}"),
      (3L, "2024-01-02 09:00:00", 8L, "signup", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
    val onb = clean.Rules.onboardingDf(events)
    val cleaned = clean.Rules.cleanedDf(onb)
    // user 7 violates r4 (purchase_ts < signup_ts) but survives cleaning
    assert(cleaned.filter(col("user_id") === 7).count() == 1)
    val counts = onb.agg(
      sum(when(clean.Rules.ruleSet.find(_.name.startsWith("r4")).get.violation,
        1).otherwise(0))).collect()(0).getLong(0)
    assert(counts == 1)
  }

  test("cleaning is idempotent and applied rules hold on output") {
    val onb = clean.Rules.onboarding(spark, sf)
    val once = clean.Rules.cleanedDf(onb)
    val twice = clean.Rules.cleanedDf(once)
    assert(once.count() == twice.count())
    clean.Rules.ruleSet.filter(_.applied).foreach { r =>
      assert(once.filter(r.violation).count() == 0, s"rule ${r.name}")
    }
  }

  test("normalize: schema-driven cast-to-null + per-column failure counts") {
    import org.apache.spark.sql.types._
    val target = StructType(Seq(StructField("k", LongType),
      StructField("price", DoubleType), StructField("day", DateType)))
    val raw = Seq(
      ("1", "9.5", "2024-01-05"),
      ("2", "N/A", "2024-02-29"),  // bad price; valid leap day
      ("x", "1.25", "not-a-date"), // bad key; bad date
      (null, null, null))          // already-null everywhere
      .toDF("k", "price", "day")
    val typed = schema.Normalize.normalize(raw, target)
    assert(typed.schema == target)
    assert(typed.collect().map(r => (0 until 3).count(r.isNullAt)).toSeq
      == Seq(0, 1, 2, 3))
    val rep = schema.Normalize.castReport(raw, target).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rep == Map("day" -> ((4L, 1L, 1L)), "k" -> ((4L, 1L, 1L)),
      "price" -> ((4L, 1L, 1L))))
  }

  test("scd2: changed key closes old row and opens new; intervals abut") {
    val out = ops.Relational.m2Scd2Merge(spark, sf)
      .filter(col("row_status") === "closed")
      .withColumnRenamed("valid_to", "closed_at")
      .select(col("c_custkey"), col("closed_at"))
      .join(ops.Relational.m2Scd2Merge(spark, sf)
        .filter(col("row_status") === "current" && col("valid_to").isNull &&
          col("valid_from") =!= "1990-01-01"), Seq("c_custkey"))
    // every closed row has a successor whose valid_from == its valid_to
    assert(out.filter(col("closed_at") =!= col("valid_from")).count() == 0)
    assert(out.count() > 0)
  }

  test("stratified sample: quota respected per stratum, keeps all when small") {
    val s = ext.TextAnalysis.stratifiedSample(spark, sf)
      .groupBy(col("source")).count().collect()
    assert(s.forall(_.getLong(1) <= 10))
    // sf0.001 strata are tiny (< quota) => everything kept
    val total = io.Sources.table(spark, sf, "documents").count()
    assert(s.map(_.getLong(1)).sum == math.min(total,
      s.length * 10L))
  }

  test("grid overlap join edges: empty side, touching bounds, zero-length") {
    import spark.implicits._
    val l = Seq((1L, 100L, 200L)).toDF("l_id", "l0", "l1")
    val emptyR = Seq.empty[(Long, Long, Long)].toDF("r_id", "r0", "r1")
    assert(ops.Intervals.gridOverlapJoin(l, emptyR,
      "l0", "l1", "r0", "r1", 3600L).count() == 0)
    // closed-interval semantics: bounds that merely TOUCH overlap,
    // one past the end does not; zero-length intervals still match
    val r = Seq(
      (10L, 200L, 300L),  // touches l1 exactly
      (11L, 201L, 300L),  // one past — disjoint
      (12L, 150L, 150L),  // zero-length inside
      (13L, 0L, 99L)      // ends one before l0 — disjoint
    ).toDF("r_id", "r0", "r1")
    val hits = ops.Intervals.gridOverlapJoin(l, r,
        "l0", "l1", "r0", "r1", 3600L)
      .select("r_id").collect().map(_.getLong(0)).toSet
    assert(hits == Set(10L, 12L), s"got $hits")
  }

  test("funnel emits every step row even when a step has zero users") {
    // conditional-min chain on an event log with no 'purchase' at all:
    // the funnel must still report step 3 with zero users, not drop it
    import spark.implicits._
    val ev = io.Sources.table(spark, sf, "events")
    val noPurchase = ev.filter(col("event_type") =!= "purchase")
    val tmp = io.Sources.tmpDir("funnel_edge")
    noPurchase.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val f = ops.Eventing.e10Funnel(spark, tmp).collect()
    assert(f.map(r => r.getInt(0) -> r.getLong(2)).toMap.get(3)
      .contains(0L), s"step 3 must report zero users: ${f.toSeq}")
  }

  /** The ref1 parity fixture genuinely REQUIRES the reference's
    * multiline read (round 15): reading lk_users without
    * multiLine=true must shred the quoted embedded-newline address
    * field into extra phantom rows — so `ref1_pipeline_parity`'s
    * hash-green result really does prove the quirk is composed, not
    * that the fixture happens to parse either way.
    */
  test("ref1 lk_users fixture is unreadable without the multiline quirk") {
    import org.apache.spark.sql.functions._
    val root = RefParity.writeTrio(spark, sf)
    val schema = org.apache.spark.sql.types.StructType(
      Seq("_c0", "user_id", "name", "email", "address", "birth_dt",
        "phone", "type", "rubro").map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType)))
    def readRows(multiline: Boolean): Long =
      spark.read.schema(schema).option("header", "true")
        .option("multiLine", multiline.toString).option("escape", "\"")
        .csv(s"$root/lk_users").count()
    val customer = graft.io.Sources.table(spark, sf, "customer")
    // one row per customer PLUS the planted full-row duplicates
    // (c_custkey % 59 == 11 — the dropDuplicates composition's stripe)
    val nRows = customer.count() +
      customer.filter(pmod(col("c_custkey"), lit(59)) === 11).count()
    assert(readRows(multiline = true) == nRows,
      "multiline read must parse one row per written customer row")
    assert(readRows(multiline = false) != nRows,
      "the fixture parses identically without multiLine — the quirk " +
        "is not exercised and the parity claim is hollow")
  }

  /** Round-16 (verdict item 6): `ref1_pipeline_parity` now composes
    * ALL SEVEN reference rules plus the tx-count repair — this pins
    * that each is EXERCISED on the fixture (fires on >= 1 real row),
    * so none of the seven is a dead predicate that hash-matches
    * vacuously. Violation counts are measured on the stringly
    * lk_onboarding exactly as the parity job reads it.
    */
  test("ref1 fixture plants live violators for every rule and the repair") {
    import org.apache.spark.sql.functions._
    val root = RefParity.writeTrio(spark, sf)
    val onb = spark.read.schema(org.apache.spark.sql.types.StructType(
      Seq("_c0", "Unnamed: 0", "first_login_dt", "week_year", "user_id",
        "habito", "habito_dt", "activacion", "activacion_dt", "setup",
        "setup_dt", "return", "return_dt").map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType))))
      .option("header", "true").csv(s"$root/lk_onboarding")
      .withColumn("habito_f",
        when(col("habito").isNull, "0").otherwise(col("habito"))
          .cast("int"))
      .withColumn("act_i", col("activacion").cast("int"))
      .withColumn("setup_i", col("setup").cast("int"))
      .withColumn("ret_i", col("return").cast("int"))
      .cache()
    def n(c: org.apache.spark.sql.Column): Long = onb.filter(c).count()
    val violations = Seq(
      "habito null (the \"0\"-fill input)" -> n(col("habito").isNull),
      "R1 habito dt-without-flag" ->
        n(col("habito_dt").isNotNull && col("habito_f") === 0),
      "R1 activacion dt-without-flag" ->
        n(col("activacion_dt").isNotNull && col("act_i") === 0),
      "R1 setup dt-without-flag" ->
        n(col("setup_dt").isNotNull && col("setup_i") === 0),
      "R1 return dt-without-flag" ->
        n(col("return_dt").isNotNull && col("ret_i") === 0),
      "R2 null first_login_dt" -> n(col("first_login_dt").isNull),
      "R3 activacion=0 and habito=1" ->
        n(col("act_i") === 0 && col("habito_f") === 1 &&
          col("activacion_dt").isNull),
      "R4 habito_dt < activacion_dt (detected)" ->
        n(col("habito_dt") < col("activacion_dt")),
      "R5 activacion_dt < setup_dt" ->
        n(col("activacion_dt") < col("setup_dt")),
      "R6 activacion=1 and setup=0 (dt null)" ->
        n(col("act_i") === 1 && col("setup_i") === 0 &&
          col("setup_dt").isNull),
      "R7 return_dt < first_login_dt" ->
        n(col("return_dt") < col("first_login_dt")))
    val dead = violations.collect { case (name, 0L) => name }
    assert(dead.isEmpty,
      s"rules with no live violators on the fixture: $dead")
    // the opening dropDuplicates steps are load-bearing too: the raw
    // reads really are duplicated (pre_process.py:52-54 composition)
    assert(onb.count() > onb.dropDuplicates(Seq("user_id")).count(),
      "lk_onboarding fixture has no planted keyed duplicates")
    // the repair is exercised GENUINELY (round-16 ADVICE 1: the old
    // predicate also matched users whose activacion was naturally 0 —
    // zero purchase events gives activacion=0, null dt, tx_count=0
    // with NO rewrite, so the repair could be a dead path while the
    // test stayed green). Pin it on users whose RAW fixture activacion
    // is the string "1": the R1-R7 rules only DELETE rows, never
    // rewrite a flag, so a raw-"1" user appearing in the output with
    // activacion=0 and its dt nulled proves the tx-count repair fired.
    val rawActivated = onb.filter(col("activacion") === "1")
      .select(col("user_id")).distinct()
    assert(rawActivated.count() > 0,
      "fixture census: no raw activacion=\"1\" users at all")
    val out = RefParity.ref1PipelineParity(spark, sf)
    val rewritten = out.join(rawActivated, Seq("user_id"))
      .filter(col("activacion") === 0 &&
        col("activacion_dt_nulled") && col("tx_count") === 0)
    assert(rewritten.count() > 0,
      "the tx-count repair never rewrote a raw activacion=1 user on " +
        "the fixture — the repair is a dead path or the fixture lost " +
        "its zero-qualifying-purchase activated users")
    onb.unpersist(blocking = false)
    // the otherwise-less activity label leaves zero-tx users NULL
    assert(out.filter(col("activity").isNull &&
        col("tx_count") === 0).count() > 0,
      "the otherwise-less activity label has no NULL rows to prove it")
  }
}

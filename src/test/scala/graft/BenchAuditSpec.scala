package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the BenchAudit classifier (round-15 verdict item 7): the
  * round-15 driver headline needed manual stage-diff forensics to be
  * exonerated as contention — this is the forensics as a function, and
  * these are the cases it must keep separating. Pure JSON in/out, no
  * Spark session.
  */
class BenchAuditSpec extends AnyFunSuite {

  import org.json4s.jackson.JsonMethods

  private def artifact(
      queries: Map[String, Double],
      stages: Map[String, Long],
      runs: Map[String, Seq[Double]] = Map.empty,
      fits: Map[String, Long] = Map.empty): String = {
    def m[T](xs: Map[String, T], f: T => String): String =
      xs.toSeq.sortBy(_._1)
        .map { case (k, v) => Bench.jstr(k) + ":" + f(v) }
        .mkString("{", ",", "}")
    val total = queries.values.sum
    s"""{"metric":"total","value":$total,""" +
      s""""queries":${m[Double](queries, _.toString)},""" +
      s""""stages":${m[Long](stages, _.toString)},""" +
      s""""runs":${m[Seq[Double]](runs, _.mkString("[", ",", "]"))},""" +
      s""""fit_counts":${m[Long](fits, _.toString)}}"""
  }

  private val reference = artifact(
    queries = Map("q1" -> 0.4, "x_heavy" -> 3.0, "pipe1_end_to_end" -> 4.0),
    stages = Map("q1" -> 4L, "x_heavy" -> 20L, "pipe1_end_to_end" -> 46L))

  test("a contended foreign draw at identical plans reads as noise") {
    // 1.9x headline, wide runs, stage counts within the band — the
    // round-15 driver shape
    val foreign = artifact(
      queries = Map("q1" -> 0.8, "x_heavy" -> 6.2,
        "pipe1_end_to_end" -> 7.5),
      stages = Map("q1" -> 5L, "x_heavy" -> 21L,
        "pipe1_end_to_end" -> 47L),
      runs = Map("x_heavy" -> Seq(2.9, 6.2, 15.0),
        "pipe1_end_to_end" -> Seq(4.1, 7.5, 18.0)))
    val parsed = JsonMethods.parse(
      BenchAudit.auditJson(foreign, reference, "f", "r"))
    assert((parsed \ "verdict").values == "contention_noise")
    assert((parsed \ "plan_changes").values ==
      Map.empty[String, Any])
    val contended = (parsed \ "contended").values
      .asInstanceOf[Map[String, Any]]
    assert(contended.keySet == Set("x_heavy", "pipe1_end_to_end"))
  }

  test("a stage-count jump reads as plan change, naming the query") {
    // the round-15 x_quality_model shape: +13 stages (an extra fit)
    val foreign = artifact(
      queries = Map("q1" -> 0.4, "x_heavy" -> 5.4,
        "pipe1_end_to_end" -> 4.1),
      stages = Map("q1" -> 4L, "x_heavy" -> 33L,
        "pipe1_end_to_end" -> 46L))
    val parsed = JsonMethods.parse(
      BenchAudit.auditJson(foreign, reference, "f", "r"))
    assert((parsed \ "verdict").values == "plan_change")
    val pc = (parsed \ "plan_changes").values.asInstanceOf[Map[String, Any]]
    assert(pc.keySet == Set("x_heavy"))
  }

  test("the composed mains get the ±1 async-exchange allowance on top") {
    // 46 -> 49 is 3 over: within band for pipe1 (2+1), over for others
    val foreign = artifact(
      queries = Map("pipe1_end_to_end" -> 4.2, "x_heavy" -> 3.0),
      stages = Map("pipe1_end_to_end" -> 49L, "x_heavy" -> 23L))
    val parsed = JsonMethods.parse(
      BenchAudit.auditJson(foreign, reference, "f", "r"))
    val pc = (parsed \ "plan_changes").values.asInstanceOf[Map[String, Any]]
    assert(pc.keySet == Set("x_heavy"),
      "pipe1 at +3 stages must sit inside its band; x_heavy at +3 must not")
  }

  test("a foreign fit count above one reads as plan change (refit)") {
    val foreign = artifact(
      queries = Map("q1" -> 0.4, "x_heavy" -> 3.1,
        "pipe1_end_to_end" -> 4.0),
      stages = Map("q1" -> 4L, "x_heavy" -> 20L,
        "pipe1_end_to_end" -> 46L),
      fits = Map("quality_model_lbfgs" -> 3L, "ml_kmeans" -> 1L))
    val parsed = JsonMethods.parse(
      BenchAudit.auditJson(foreign, reference, "f", "r"))
    assert((parsed \ "verdict").values == "plan_change")
    assert((parsed \ "refits" \ "quality_model_lbfgs").values == 3L)
  }

  test("a headline-only artifact (no stage maps) refuses to classify") {
    val headlineOnly =
      """{"metric":"total","value":213.7,"queries":{"q1":0.5}}"""
    val parsed = JsonMethods.parse(
      BenchAudit.auditJson(headlineOnly, reference, "f", "r"))
    assert((parsed \ "verdict").values == "insufficient_artifact",
      "no plan evidence must not read as consistency")
  }

  test("a moved headline at flat plans WITHOUT runs evidence is " +
      "insufficient, not consistent") {
    // round-16 ADVICE 2: stages present, no runs arrays, 1.9x headline
    // at in-band stage counts — the noise verdict's evidence is absent,
    // so the classifier must refuse rather than default to consistent
    val foreign = artifact(
      queries = Map("q1" -> 0.8, "x_heavy" -> 6.2,
        "pipe1_end_to_end" -> 7.5),
      stages = Map("q1" -> 5L, "x_heavy" -> 21L,
        "pipe1_end_to_end" -> 47L))
    val parsed = JsonMethods.parse(
      BenchAudit.auditJson(foreign, reference, "f", "r"))
    assert((parsed \ "verdict").values == "insufficient_artifact")
  }

  test("a moved headline at flat plans with TIGHT runs is " +
      "headline_moved_unexplained") {
    // runs present and tight (max/min <= 2): contention can't explain
    // the 1.9x move, so it surfaces as its own verdict a human must
    // read — never a silent pass
    val foreign = artifact(
      queries = Map("q1" -> 0.8, "x_heavy" -> 6.2,
        "pipe1_end_to_end" -> 7.5),
      stages = Map("q1" -> 5L, "x_heavy" -> 21L,
        "pipe1_end_to_end" -> 47L),
      runs = Map("x_heavy" -> Seq(5.9, 6.2, 6.8),
        "pipe1_end_to_end" -> Seq(7.1, 7.5, 7.9)))
    val parsed = JsonMethods.parse(
      BenchAudit.auditJson(foreign, reference, "f", "r"))
    assert((parsed \ "verdict").values == "headline_moved_unexplained")
  }

  test("a missing or non-positive headline total refuses to classify") {
    // round-16 ADVICE 2: value absent -> ratio was silently 0.000 and
    // the verdict fell through to consistent; both degenerate totals
    // must read as insufficient_artifact instead
    val noValue =
      """{"metric":"total","queries":{"q1":0.4},"stages":{"q1":4}}"""
    val parsedNoValue = JsonMethods.parse(
      BenchAudit.auditJson(noValue, reference, "f", "r"))
    assert((parsedNoValue \ "verdict").values == "insufficient_artifact")

    val zeroRef =
      """{"metric":"total","value":0.0,"queries":{"q1":0.4},""" +
        """"stages":{"q1":4}}"""
    val parsedZeroRef = JsonMethods.parse(
      BenchAudit.auditJson(reference, zeroRef, "f", "r"))
    assert((parsedZeroRef \ "verdict").values == "insufficient_artifact")
  }

  test("cross-width draws read as config_mismatch, never plan_change") {
    // round-17: Sessions.local sizes shuffle partitions to the core
    // count, so a 4-core draw has genuinely different plans and its
    // stage counts would read as spurious plan changes against a
    // 32-core reference — the audit must name the config problem first
    val narrow =
      """{"metric":"total","value":30.0,"queries":{"q1":0.9},""" +
        """"stages":{"q1":9},"cpus":4}"""
    val wide =
      """{"metric":"total","value":7.4,"queries":{"q1":0.4},""" +
        """"stages":{"q1":4},"cpus":32}"""
    val parsed = JsonMethods.parse(
      BenchAudit.auditJson(narrow, wide, "f", "r"))
    assert((parsed \ "verdict").values == "config_mismatch")
    // absent cpus on either side (pre-round-17 artifacts): fall through
    // to the evidence ladder, don't invent a mismatch
    val legacy = JsonMethods.parse(
      BenchAudit.auditJson(reference, wide, "f", "r"))
    assert((legacy \ "verdict").values != "config_mismatch")
  }

  test("matching artifacts read as consistent") {
    val parsed = JsonMethods.parse(
      BenchAudit.auditJson(reference, reference, "f", "r"))
    assert((parsed \ "verdict").values == "consistent")
    assert((parsed \ "headline_ratio").values.toString.toDouble == 1.0)
  }
}

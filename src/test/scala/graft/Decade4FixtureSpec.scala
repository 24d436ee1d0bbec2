package graft

import org.apache.spark.sql.functions._

/** Pins the decade-4 fixture's DESIGN CLAIM (round 15): the 4th sweep
  * point's flattening evidence is only valid if the 10x fixture really
  * holds per-key statistical depth at sf0.1 levels while growing
  * volume 10x — otherwise the measured 1.5-2.8x ratios would be an
  * artifact of easier data, not engine amortization. Three properties
  * are measured, not assumed:
  *
  *  1. posting density: the max (source, gram) document frequency on
  *     the 10x documents fixture stays within 2x of sf0.1's max (the
  *     dialect-vocabulary construction holds per-block df flat; a
  *     broken suffix would collapse the dialects into one 31-word
  *     vocabulary and multiply dfs ~10x);
  *  2. volume: the fixture really is ~10x sf0.1 (docs, orders,
  *     lineitem row counts);
  *  3. graph degree: customers and suppliers keep sf0.1's vertex
  *     degree (edges grow with |V|, not per-vertex — a fixed key range
  *     would deepen degree 10x and re-measure the data model).
  *
  * The fixture is deterministic and cached under target/, so this
  * suite builds it on first run exactly as ScalingBench does.
  */
class Decade4FixtureSpec extends SparkSuite {

  private lazy val d4 = ScalingBench.ensureDecadeFixture(spark)
  private val sf01 = "/root/testdata/sf0.1"

  private def maxPostingDf(dir: String): Long = {
    graft.functions.NgramSet.register(spark)
    graft.io.Sources.table(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("source"),
        explode(expr("ngram_set(text, 3)")).as("gram"))
      .groupBy(col("source"), col("gram"))
      .agg(count(lit(1)).as("df"))
      .agg(max(col("df"))).head().getLong(0)
  }

  test("10x documents hold per-(source, gram) posting df at sf0.1 levels") {
    val dfSf01 = maxPostingDf(sf01)
    val dfD4 = maxPostingDf(d4)
    assert(dfD4 <= 2 * dfSf01,
      s"decade4 max posting df $dfD4 vs sf0.1 $dfSf01 — the dialect " +
        "construction no longer holds per-key density flat; the " +
        "flattening evidence would be measuring easier data")
  }

  test("the fixture is ~10x sf0.1 by volume") {
    def n(dir: String, t: String): Long =
      graft.io.Sources.table(spark, dir, t).count()
    for ((t, lo, hi) <- Seq(("documents", 8.0, 12.0),
        ("orders", 8.0, 12.0), ("lineitem", 8.0, 12.0),
        ("customer", 8.0, 12.0), ("events", 8.0, 12.0))) {
      val ratio = n(d4, t).toDouble / n(sf01, t)
      assert(ratio >= lo && ratio <= hi,
        s"decade4 $t is ${ratio}x sf0.1 — not a 10x point")
    }
  }

  test("events keep sf0.1's per-user depth: 10x users, same events/user") {
    // the composed mains' cleaning stage groups events by user — if
    // the 10x point deepened per-user logs 10x instead of widening the
    // user population, pipe1's ratio would measure the data model's
    // per-group term, not the engine's amortization
    def depth(dir: String): Double = {
      val e = graft.io.Sources.table(spark, dir, "events")
      e.count().toDouble / e.select("user_id").distinct().count()
    }
    val sfDepth = depth(sf01)
    val d4Depth = depth(d4)
    assert(math.abs(d4Depth / sfDepth - 1.0) < 0.25,
      s"events/user drifted: sf0.1 $sfDepth vs decade4 $d4Depth")
  }

  test("graph degree is constant: 10x vertices, 10x edges, same degree") {
    def degrees(dir: String): (Double, Double) = {
      val o = graft.io.Sources.table(spark, dir, "orders")
      val l = graft.io.Sources.table(spark, dir, "lineitem")
      val edges = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_suppkey"))
      val n = edges.count().toDouble
      (n / edges.select("o_custkey").distinct().count(),
        n / edges.select("l_suppkey").distinct().count())
    }
    val (custSf, suppSf) = degrees(sf01)
    val (custD4, suppD4) = degrees(d4)
    assert(math.abs(custD4 / custSf - 1.0) < 0.25,
      s"customer degree drifted: sf0.1 $custSf vs decade4 $custD4")
    assert(math.abs(suppD4 / suppSf - 1.0) < 0.25,
      s"supplier degree drifted: sf0.1 $suppSf vs decade4 $suppD4")
  }
}

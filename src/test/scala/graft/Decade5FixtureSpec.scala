package graft

import org.apache.spark.sql.functions._

/** Pins the decade-5 fixture's DESIGN CLAIM, the same three properties
  * `Decade4FixtureSpec` measures for the 10x point (a 100x point whose
  * per-key depth silently deepened would measure easier-or-harder DATA,
  * not engine amortization — the design claim is what makes the
  * committed ratios evidence):
  *
  *  1. posting density: max (source, gram) df on the 100x documents
  *     stays within 2x of sf0.1's (100 disjoint dialect vocabularies x
  *     2000 sources — breadth growth, flat per-key df);
  *  2. volume: documents/orders/lineitem really are ~100x sf0.1;
  *  3. graph degree: constant (1.5M customers / 100k suppliers scale
  *     WITH the edges, so |E| ~ 100x at sf0.1 degree).
  *
  * The max-df measurement explodes 3-grams over 500k docs — the most
  * expensive assertion in the suite (~30 s) and worth it: the decade5
  * section red-lines the two steepest trajectories in the catalog, and
  * this is the test that keeps its fixture honest.
  */
class Decade5FixtureSpec extends SparkSuite {

  private lazy val d5 = ScalingBench.ensureDecade5Fixture(spark)
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

  test("100x documents hold per-(source, gram) posting df at sf0.1 " +
      "levels") {
    val dfSf01 = maxPostingDf(sf01)
    val dfD5 = maxPostingDf(d5)
    assert(dfD5 <= 2 * dfSf01,
      s"decade5 max posting df $dfD5 vs sf0.1 $dfSf01 — the dialect " +
        "construction no longer holds per-key density flat at 100x")
  }

  test("the fixture is ~100x sf0.1 by volume") {
    def n(dir: String, t: String): Long =
      graft.io.Sources.table(spark, dir, t).count()
    for ((t, lo, hi) <- Seq(("documents", 80.0, 120.0),
        ("orders", 80.0, 120.0), ("lineitem", 80.0, 120.0),
        // v2 (round 16): the composed mains join the 100x point, so
        // the fixture carries their full table set too
        ("customer", 80.0, 120.0), ("events", 80.0, 120.0))) {
      val ratio = n(d5, t).toDouble / n(sf01, t)
      assert(ratio >= lo && ratio <= hi,
        s"decade5 $t is ${ratio}x sf0.1 — not a 100x point")
    }
  }

  test("graph degree is constant: 100x vertices, 100x edges, same " +
      "degree") {
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
    val (custD5, suppD5) = degrees(d5)
    assert(math.abs(custD5 / custSf - 1.0) < 0.25,
      s"customer degree drifted: sf0.1 $custSf vs decade5 $custD5")
    assert(math.abs(suppD5 / suppSf - 1.0) < 0.25,
      s"supplier degree drifted: sf0.1 $suppSf vs decade5 $suppD5")
  }
}

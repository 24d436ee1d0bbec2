package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.Rounding.rN
import graft.io.Sources.table

/** Full pairwise Pearson correlation matrices (reference:
  * `pre_analysis.py:653,678,693,711` — pandas `.corr()` over collected
  * cast columns, including over a 3-way join).
  *
  * Spark-native design: ALL pairs are computed in ONE distributed
  * aggregate pass — k·(k-1)/2 `corr` aggregate columns over a single
  * scan, then unpivoted to tidy (col_a, col_b, pearson) rows driver-side
  * in the plan (explode of a constant-shaped array). No collect, no
  * per-pair job; at 100 TB this is one scan regardless of matrix size.
  */
object Correlation {

  /** All-pairs correlation matrix (upper triangle, tidy long form) in a
    * single aggregate job. `cols` must be numeric (cast beforehand —
    * mirrors the reference's cast-then-corr discipline).
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      corr(col(a), col(b)).as(s"__corr_${a}__$b") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = pairs.map { case (a, b) => struct(
      lit(a).as("col_a"), lit(b).as("col_b"),
      col(s"__corr_${a}__$b").as("pearson")) }
    one.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_a").as("col_a"), col("e.col_b").as("col_b"),
        rN(col("e.pearson"), 4).as("pearson"))
      .orderBy(col("col_a"), col("col_b"))
  }

  private val lineitemCols =
    Seq("l_discount", "l_extendedprice", "l_linenumber", "l_quantity",
      "l_tax")

  /** t2 entry: 5-column (10-pair) matrix over lineitem, with an int
    * column cast to double first (the reference always casts before
    * correlating, `pre_analysis.py:647-693`).
    */
  def corrMatrixQ(spark: SparkSession, dir: String): DataFrame =
    corrMatrix(
      table(spark, dir, "lineitem")
        .withColumn("l_linenumber", col("l_linenumber").cast("double")),
      lineitemCols)

  private val corrMatrixSql = {
    val pairs = for {
      i <- lineitemCols.indices; j <- (i + 1) until lineitemCols.size
    } yield (lineitemCols(i), lineitemCols(j))
    val selects = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
          floor(corr($a, $b) * 10000 + 0.5) / 10000 AS pearson
          FROM lineitem""" }
    selects.mkString("", " UNION ALL ", " ORDER BY col_a, col_b")
  }

  /** t2 entry: correlation across a 3-way join (the reference's joint
    * matrix, `pre_analysis.py:702-711`) — one numeric column from each
    * of lineitem ⋈ orders ⋈ customer. The dims are broadcast; the corr
    * aggregates fold into the same single pass as the join output.
    */
  def corrJoinedQ(spark: SparkSession, dir: String): DataFrame = {
    val joined = table(spark, dir, "lineitem")
      .join(table(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"), "inner")
      .join(broadcast(table(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"), "inner")
    corrMatrix(joined, Seq("c_acctbal", "l_extendedprice", "o_totalprice"))
  }

  private val corrJoinedSql = {
    val cols = Seq("c_acctbal", "l_extendedprice", "o_totalprice")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val selects = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b,
          floor(corr($a, $b) * 10000 + 0.5) / 10000 AS pearson
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey""" }
    selects.mkString("", " UNION ALL ", " ORDER BY col_a, col_b")
  }

  val qs: Seq[Q] = Seq(
    Q("a8b_corr_matrix", corrMatrixQ, Some(corrMatrixSql)),
    Q("a8c_corr_joined", corrJoinedQ, Some(corrJoinedSql)))
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.io.Sources.table

/** Scale utilities: the shuffle-shaping tools a 100 TB deployment needs
  * (SURVEY.md §4.3.5). AQE handles moderate skew automatically
  * (`spark.sql.adaptive.skewJoin`); `saltedJoin` is the explicit
  * fallback for pathological hot keys, and bucketed co-located joins
  * (see `BucketingSpec`) remove the shuffle entirely for repeated joins
  * on the same key.
  */
object Scale {

  /** Skew-resistant inner equi-join: the left (skewed) side gets a
    * random-free, DETERMINISTIC salt derived from a row hash; the right
    * side is exploded across all salt values. Result is identical to the
    * plain join — verified by the oracle of `scale1_salted_join` — but
    * the shuffle key becomes (key, salt), splitting a hot key across
    * `salt` reducers.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salt: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(salt))
        .cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"), "inner")
      .drop("__salt")
  }

  /** t2 entry: salted join of lineitem (skew side) to orders, proven
    * result-identical to the plain equi-join by the oracle.
    */
  def saltedJoinQ(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val o = table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    saltedJoin(li, o, "l_orderkey", "o_orderkey", 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("o_totalprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val saltedJoinSql =
    """SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       ORDER BY l_orderkey, l_linenumber"""

  /** Pre-partitioned (repartition-by-key) aggregation: an explicit
    * repartition on the grouping key lets several downstream keyed ops
    * reuse one shuffle (partitioning-reuse pattern). Result equals the
    * plain aggregation.
    */
  def repartitionedAggQ(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .repartition(col("l_suppkey"))
    li.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2)
        .as("sum_qty"))
      .orderBy(col("l_suppkey"))
  }

  private val repartitionedAggSql =
    """SELECT l_suppkey, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
       FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey"""

  val qs: Seq[Q] = Seq(
    Q("scale1_salted_join", saltedJoinQ, Some(saltedJoinSql)),
    Q("scale2_repartitioned_agg", repartitionedAggQ,
      Some(repartitionedAggSql)))
}

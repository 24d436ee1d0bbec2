package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.Q
import graft.io.Sources.table

/** Schema-driven normalization of stringly-read data (SURVEY.md §1.4).
  *
  * The reference reads CSV with no schema — every column lands as string
  * (`pre_analysis.py:36-38`) — and types everything with downstream casts
  * whose failures become null (`pre_analysis.py:244-258` uses exactly
  * that as its validity probe, casts at `:647-757`). `normalize` is the
  * reusable operator form: apply a target `StructType` to any DataFrame
  * with cast-to-null semantics (the engine session runs ANSI off);
  * `castReport` counts per-column cast failures in ONE aggregate pass —
  * both the data and its quality report come from a single scan.
  */
object Normalize {

  /** Cast every field of `schema` onto `df` (cast-to-null semantics,
    * column order and names from the schema).
    */
  def normalize(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)

  /** Per-column cast-failure report, fused into one aggregate: for each
    * field, how many source values were null already vs non-null but
    * uncastable. Long-form output (column_name, target_type, n_total,
    * n_src_null, n_cast_fail).
    */
  def castReport(df: DataFrame, schema: StructType): DataFrame = {
    val fields = schema.fields.toSeq
    val aggs =
      count(lit(1)).as("n_total") +:
      fields.flatMap(f => Seq(
        sum(when(col(f.name).isNull, 1).otherwise(0)).cast("long")
          .as(s"__null_${f.name}"),
        sum(when(col(f.name).isNotNull &&
          col(f.name).cast(f.dataType).isNull, 1).otherwise(0)).cast("long")
          .as(s"__fail_${f.name}")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = fields.map(f => struct(
      lit(f.name).as("column_name"),
      lit(f.dataType.simpleString).as("target_type"),
      col(s"__null_${f.name}").as("n_src_null"),
      col(s"__fail_${f.name}").as("n_cast_fail")))
    one.select(col("n_total"), explode(array(entries: _*)).as("e"))
      .select(col("e.column_name").as("column_name"),
        col("e.target_type").as("target_type"), col("n_total"),
        col("e.n_src_null").as("n_src_null"),
        col("e.n_cast_fail").as("n_cast_fail"))
      .orderBy(col("column_name"))
  }

  /** t2 entry: rebuild the reference's stringly CSV shape from orders
    * (every column cast to string), deterministically corrupt two
    * columns (every 97th key's price, every 101st key's date), then
    * report cast failures against the real orders schema.
    */
  def normalizeReportQ(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val raw = o.select(
      col("o_orderkey").cast("string").as("o_orderkey"),
      col("o_custkey").cast("string").as("o_custkey"),
      col("o_orderstatus"),
      when(col("o_orderkey") % 97 === 0, lit("N/A"))
        .otherwise(col("o_totalprice").cast("string")).as("o_totalprice"),
      when(col("o_orderkey") % 101 === 0, lit("not-a-date"))
        .otherwise(col("o_orderdate").cast("string")).as("o_orderdate"),
      col("o_orderpriority"))
    castReport(raw, Schemas.orders)
  }

  private val normalizeReportSql = {
    val cols = Seq(
      "o_orderkey" -> "BIGINT", "o_custkey" -> "BIGINT",
      "o_orderstatus" -> "VARCHAR", "o_totalprice" -> "DOUBLE",
      "o_orderdate" -> "TIMESTAMP", "o_orderpriority" -> "VARCHAR")
    val sparkTypeName = Map("BIGINT" -> "bigint", "VARCHAR" -> "string",
      "DOUBLE" -> "double", "TIMESTAMP" -> "timestamp")
    val selects = cols.map { case (c, t) =>
      s"""SELECT '$c' AS column_name, '${sparkTypeName(t)}' AS target_type,
          count(*) AS n_total,
          CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_src_null,
          CAST(sum(CASE WHEN $c IS NOT NULL
            AND TRY_CAST($c AS $t) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_cast_fail
          FROM raw""" }
    s"""WITH raw AS (SELECT
          CAST(o_orderkey AS VARCHAR) AS o_orderkey,
          CAST(o_custkey AS VARCHAR) AS o_custkey,
          o_orderstatus,
          CASE WHEN o_orderkey % 97 = 0 THEN 'N/A'
               ELSE CAST(o_totalprice AS VARCHAR) END AS o_totalprice,
          CASE WHEN o_orderkey % 101 = 0 THEN 'not-a-date'
               ELSE CAST(o_orderdate AS VARCHAR) END AS o_orderdate,
          o_orderpriority
          FROM orders)
        ${selects.mkString("", " UNION ALL ", "")}
        ORDER BY column_name"""
  }

  val qs: Seq[Q] = Seq(
    Q("c2_normalize_report", normalizeReportQ, Some(normalizeReportSql)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Deterministic fixed-point rounding shared by every operator:
  * `floor(x * 10^d + 0.5) / 10^d` instead of `round(x, d)`.
  *
  * Why (the single source of truth for this rationale): Spark's round is
  * decimal HALF_UP while DuckDB rounds doubles half-to-even, so values
  * sitting exactly on a half boundary (common when 2-decimal money
  * multiplies) diverge between engines. The floor formulation is the
  * same IEEE op sequence on both sides, hence bit-identical. The Scala
  * mirror (`jvm`) is used by row-level code (mapPartitions decoders,
  * the stateful sessionizer) so JVM-side math matches plan-side math.
  */
object Rounding {
  def rN(c: Column, digits: Int): Column = {
    val m = math.pow(10, digits)
    floor(c * m + lit(0.5)) / m
  }

  def r2(c: Column): Column = rN(c, 2)
  def r4(c: Column): Column = rN(c, 4)

  /** Scala-side equivalent for per-row JVM code. */
  def jvm(x: Double, digits: Int): Double = {
    val m = math.pow(10, digits)
    math.floor(x * m + 0.5) / m
  }
}

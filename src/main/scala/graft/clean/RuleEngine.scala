package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic cleaning-rule engine — the reusable form of the reference's
  * per-table rule chain (`pre_process.py` R1-R7), decoupled from any
  * schema: give it a frame and a rule set, get the cleaned frame and a
  * one-pass violation report.
  *
  * - `clean`: applied rules compose into ONE conjunction filter (a
  *   single scan predicate after Catalyst folding) — not the
  *   reference's sequential anti-join per rule (each a full shuffle).
  * - `report`: all rules (applied or detect-only) counted in ONE fused
  *   aggregate pass (`sum(when(...))` per rule).
  * - Detect-only rules (`applied = false`) are counted but never
  *   filtered — the reference's R4 asymmetry as a first-class concept.
  */
object RuleEngine {

  /** One rule: name, violation predicate, whether violations are
    * removed (vs only counted).
    */
  final case class Rule(name: String, violation: Column,
      applied: Boolean = true)

  /** Null-safe keep-predicate for the applied rules. */
  private def keep(rules: Seq[Rule]): Column =
    rules.filter(_.applied)
      .map(r => !coalesce(r.violation, lit(false)))
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** Cleaned frame: rows violating any applied rule removed. */
  def clean(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.filter(keep(rules))

  /** Violation counts for EVERY rule plus the total, in one pass. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = count(lit(1)).as("n_total") +:
      rules.map(r => sum(when(r.violation, 1).otherwise(0)).as(r.name))
    df.agg(aggs.head, aggs.tail: _*)
  }
}

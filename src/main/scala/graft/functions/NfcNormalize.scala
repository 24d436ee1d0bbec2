package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen Expression — the first step
  * of any multilingual curation pipeline: the same visible string can
  * arrive as precomposed (U+00E9) or decomposed (U+0065 U+0301) code
  * points depending on the source (macOS filenames, OCR, web forms),
  * and every downstream byte-keyed operator (md5 dedup fingerprints,
  * n-gram sets, MinHash shingles) silently treats them as different
  * documents. Spark ships no normalization builtin; a Scala UDF would
  * box every row — this stays inside whole-stage codegen with a static
  * call.
  *
  * Semantics match DuckDB's core `nfc_normalize` (both defer to the
  * Unicode NFC spec), which is what keeps normalization-keyed queries
  * hash-oracle-able.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires a string argument, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {

  /** ASCII (and already-composed) fast path: `isNormalized` scans
    * without allocating and NFC is the identity there, so the common
    * case returns the input UTF8String untouched — no copy, no boxing.
    */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Register `nfc_normalize(text)` for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => {
        require(exprs.length == 1,
          s"nfc_normalize(str) takes exactly 1 argument, got ${exprs.length}")
        NfcNormalize(exprs.head)
      }, "scala_udf")
}

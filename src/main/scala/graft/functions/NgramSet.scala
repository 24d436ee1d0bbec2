package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram set of a string, as ONE native Catalyst
  * expression — the shingling primitive under the whole near-dup tier
  * (n-gram Jaccard, MinHash banding, contamination checks).
  *
  * Replaces the 5-operator chain
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * words[i-1], words[i], words[i+1])))` over `split(text, ' ')`, which
  * materializes the word array, an index sequence, and every gram
  * string per row (and, being lambda-based, evaluates interpreted even
  * inside a codegen stage). This expression makes one byte scan to find
  * word boundaries and then emits each gram as a ZERO-COPY slice of the
  * original UTF-8 bytes — splitting on every single space byte means
  * consecutive words are separated by exactly one 0x20, so the n-gram
  * `words[i..i+n-1]` joined by single spaces IS the original byte range
  * from the start of word i to the end of word i+n-1 (0x20 never occurs
  * inside a multi-byte UTF-8 sequence). First-occurrence order is kept,
  * matching `array_distinct` semantics exactly (equivalence
  * property-tested in `NgramSetSpec`).
  */
case class NgramSet(child: Expression, n: Int, chainCompat: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngram_set requires (string, n >= 1), got (${child.dataType}, $n)")
  override def prettyName: String = "ngram_set"

  override protected def nullSafeEval(input: Any): Any =
    NgramSet.compute(input.asInstanceOf[UTF8String], n, chainCompat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramSet.compute($c, $n, $chainCompat);")

  override protected def withNewChildInternal(newChild: Expression): NgramSet =
    copy(child = newChild)
}

object NgramSet {

  /** Single-pass n-gram set builder (called from generated code — keep
    * the signature Java-friendly). Words are the maximal runs between
    * single space bytes (so doubled spaces yield empty words, exactly
    * like `split(text, ' ')`); each gram is a slice of the input bytes.
    *
    * `chainCompat` selects the short-row (fewer than n words) result:
    *  - false (the `ngram_set` primitive): empty array — "no complete
    *    n-gram exists".
    *  - true (the optimizer-rewrite twin): `[whole string]` — what the
    *    canonical built-in chain actually produces. Its
    *    `sequence(1, size-(n-1))` has no explicit step, so for short
    *    rows Spark picks step -1 and enumerates i = 1 down to
    *    size-n+1; every window [i-1, i+n-2] clipped by GetArrayItem's
    *    out-of-range-null + concat_ws null-skipping then covers ALL
    *    words (right edge >= size-1 and left edge <= 0 for every
    *    enumerated i), so each element is the full text reconstructed
    *    (split on ' ' rejoined by ' ' is byte-identical, including
    *    empty words from doubled spaces) and array_distinct collapses
    *    them to one.
    */
  def compute(s: UTF8String, n: Int): ArrayData = compute(s, n, false)

  def compute(s: UTF8String, n: Int, chainCompat: Boolean): ArrayData = {
    val bytes = s.getBytes
    // word k spans [starts(k), ends(k))
    var nWords = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val starts = new Array[Int](nWords)
    val ends = new Array[Int](nWords)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = bytes.length
    if (nWords < n)
      return if (chainCompat) new GenericArrayData(Array[AnyRef](s))
      else new GenericArrayData(new Array[AnyRef](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var k = 0
    while (k + n <= nWords) {
      val from = starts(k)
      val until = ends(k + n - 1)
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      k += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Register `ngram_set(text, n)` (n must be an integer literal). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_set", exprs => {
        require(exprs.length == 2,
          s"ngram_set(str, n) takes exactly 2 arguments, got ${exprs.length}")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
              if v.isInstanceOf[Int] => v.asInstanceOf[Int]
          case other =>
            throw new IllegalArgumentException(
              s"ngram_set n must be an integer literal, got $other")
        }
        NgramSet(exprs.head, n)
      }, "scala_udf")
}

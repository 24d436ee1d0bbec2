package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Rolling k-token window fingerprints: for a space-tokenized document
  * with tokens t_0..t_{m-1}, emits one 61-bit fingerprint per window
  * `t_i .. t_{i+k-1}` (i = 0..m-k), where each fingerprint is EXACTLY
  * [[PolyHash2]] of the window's text (`concat_ws(' ', slice(...))`) —
  * the substring-granularity dedup key of Lee et al.'s "Deduplicating
  * Training Data" shape, computed the scalable way.
  *
  * Why a custom expression: hashing each window independently re-reads
  * every byte k times (a 50-token window over a 100 TB corpus = 50x the
  * corpus bytes through the hash). This computes all windows in ONE
  * byte pass via prefix hashes + precomputed base powers:
  *
  *   P[j+1] = (P[j] * B + byte_j) mod M      (prefix hash)
  *   H(a, b) = (P[b] - P[a] * B^(b-a)) mod M (window = byte range [a,b))
  *
  * run for both of PolyHash2's (base, mod) pairs and packed the same
  * way (`h1 * 2^31 + h2`). Both mods are < 2^31, so every intermediate
  * product fits a 64-bit long — no overflow, and (like PolyHash2) the
  * result is exactly replayable in ANSI SQL, which is what lets the
  * DuckDB oracle verify the operator by joining on the reconstructed
  * window STRINGS (bit-identical grouping, since the fingerprint is a
  * pure function of the window text and 61 bits make collisions
  * negligible at any realistic window count).
  *
  * A window's byte range spans from the first byte of t_i to the last
  * byte of t_{i+k-1} INCLUSIVE of the interior separator bytes — which
  * is byte-identical to `concat_ws(' ', ...)` of the token slice
  * because single-space splitting then single-space joining is the
  * identity on that range (empty tokens from consecutive spaces
  * round-trip too).
  *
  * Codegen: stays inside whole-stage codegen via a static call (the
  * loop body is too stateful to inline profitably; the call avoids
  * boxing and virtual dispatch the way Spark's own regexp expressions
  * do).
  */
case class TokenWindowHash2(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_window_hash2 requires a string argument, got ${child.dataType}")
    else if (k < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_window_hash2 window size must be >= 1, got $k")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def prettyName: String = "token_window_hash2"

  override protected def nullSafeEval(input: Any): Any =
    TokenWindowHash2.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} =
         |  graft.functions.TokenWindowHash2.compute($c, $k);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): TokenWindowHash2 = copy(child = newChild)
}

object TokenWindowHash2 {

  /** One byte pass + O(1) per window; exactly PolyHash2 per window. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // token start/end byte offsets under single-space splitting (empty
    // tokens included, matching split(text, ' ') semantics)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var tokStart = 0
    var i = 0
    while (i < n) {
      if (bytes(i) == ' '.toByte) {
        starts.add(tokStart); ends.add(i); tokStart = i + 1
      }
      i += 1
    }
    starts.add(tokStart); ends.add(n)
    val m = starts.size()
    if (m < k) return new GenericArrayData(Array.empty[Long])
    // prefix hashes + powers for both (base, mod) pairs
    val p1 = new Array[Long](n + 1); val p2 = new Array[Long](n + 1)
    val w1 = new Array[Long](n + 1); val w2 = new Array[Long](n + 1)
    w1(0) = 1L; w2(0) = 1L
    i = 0
    while (i < n) {
      val b = bytes(i) & 0xffL
      p1(i + 1) = (p1(i) * PolyHash2.Base1 + b) % PolyHash2.Mod1
      p2(i + 1) = (p2(i) * PolyHash2.Base2 + b) % PolyHash2.Mod2
      w1(i + 1) = w1(i) * PolyHash2.Base1 % PolyHash2.Mod1
      w2(i + 1) = w2(i) * PolyHash2.Base2 % PolyHash2.Mod2
      i += 1
    }
    val out = new Array[Long](m - k + 1)
    var j = 0
    while (j <= m - k) {
      val a = starts.get(j).intValue()
      val b = ends.get(j + k - 1).intValue()
      val h1 = ((p1(b) - p1(a) * w1(b - a)) % PolyHash2.Mod1
        + PolyHash2.Mod1) % PolyHash2.Mod1
      val h2 = ((p2(b) - p2(a) * w2(b - a)) % PolyHash2.Mod2
        + PolyHash2.Mod2) % PolyHash2.Mod2
      out(j) = h1 * 2147483648L + h2
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Register `token_window_hash2(text, k)` (k a foldable int literal)
    * for `expr(...)` / SQL use.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_window_hash2", exprs => {
        require(exprs.length == 2,
          "token_window_hash2(text, k) takes exactly 2 arguments, got " +
            exprs.length)
        require(exprs(1).foldable,
          "token_window_hash2 window size must be a literal")
        val kv = exprs(1).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"token_window_hash2 window size must be an integer, got $other")
        }
        TokenWindowHash2(exprs.head, kv)
      }, "scala_udf")
}

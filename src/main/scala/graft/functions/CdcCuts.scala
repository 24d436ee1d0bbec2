package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries: the byte offsets `i` (in `[w, n)`)
  * where the [[PolyHash]] of the trailing `w`-byte window satisfies
  * `h % 2^maskBits == 0` — the gear/Rabin chunking rule of
  * content-addressable storage dedup (LBFS, restic, borg): boundaries
  * are decided by CONTENT, not position, so inserting or deleting bytes
  * only re-chunks the neighborhood of the edit while every chunk after
  * resynchronization keeps its identity (fixed-size slicing loses all
  * alignment after one insertion — the failure mode
  * [[graft.ext.Multimodal.mediaDedup]]'s fixed frames accept and this
  * operator removes).
  *
  * One byte pass via prefix hashes (the [[TokenWindowHash2]] technique,
  * single (base, mod) pair):
  *
  *   P[j+1] = (P[j] * 131 + byte_j) mod (1e9+7)
  *   H(i)   = (P[i] - P[i-w] * 131^w) mod (1e9+7)   (the window hash)
  *
  * — computing each window independently would re-read every byte `w`
  * times. The mod is < 2^31 so every product fits a long, which keeps
  * the recurrence exactly replayable in ANSI SQL: the DuckDB oracle
  * folds the same recurrence over each window's bytes directly
  * (O(n·w) there — verification work, not the operator).
  *
  * Expected chunk size = 2^maskBits bytes (uniform hash). No min/max
  * chunk bounds: the pure predicate keeps every position's verdict
  * independent (stateful min-skip would make the oracle a sequential
  * fold); production CDC adds bounds as a straightforward refinement.
  */
case class CdcCuts(child: Expression, w: Int, maskBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cdc_cuts requires a string argument, got ${child.dataType}")
    else if (w < 1 || maskBits < 1 || maskBits > 30)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cdc_cuts needs w >= 1 and maskBits in [1, 30], got ($w, $maskBits)")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def prettyName: String = "cdc_cuts"

  override protected def nullSafeEval(input: Any): Any =
    CdcCuts.compute(input.asInstanceOf[UTF8String], w, maskBits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.CdcCuts.compute($c, $w, $maskBits);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): CdcCuts = copy(child = newChild)
}

object CdcCuts {

  /** Interior cut offsets (strictly between 0 and n), ascending. */
  def compute(s: UTF8String, w: Int, maskBits: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n <= w) return new GenericArrayData(Array.empty[Int])
    val p = new Array[Long](n + 1)
    var i = 0
    while (i < n) {
      p(i + 1) = (p(i) * PolyHash.Base + (bytes(i) & 0xffL)) % PolyHash.Mod
      i += 1
    }
    var pw = 1L
    i = 0
    while (i < w) { pw = pw * PolyHash.Base % PolyHash.Mod; i += 1 }
    val mask = (1L << maskBits) - 1
    val buf = new java.util.ArrayList[Integer]()
    var j = w
    while (j < n) {
      val h = ((p(j) - p(j - w) * pw % PolyHash.Mod) % PolyHash.Mod
        + PolyHash.Mod) % PolyHash.Mod
      if ((h & mask) == 0L) buf.add(j)
      j += 1
    }
    val out = new Array[Int](buf.size())
    i = 0
    while (i < out.length) { out(i) = buf.get(i).intValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** Register `cdc_cuts(text, w, maskBits)` (both knobs foldable int
    * literals) for `expr(...)` / SQL use.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_cuts", exprs => {
        require(exprs.length == 3,
          "cdc_cuts(text, w, maskBits) takes exactly 3 arguments, got " +
            exprs.length)
        def lit(e: Expression, what: String): Int = {
          require(e.foldable, s"cdc_cuts $what must be a literal")
          // accept every integral literal width, but range-check before
          // narrowing: a silent Long.toInt would truncate e.g.
          // cdc_cuts(text, 16, 4294967302) to maskBits=6
          e.eval(null) match {
            case b: Byte => b.toInt
            case s: Short => s.toInt
            case i: Int => i
            case l: Long =>
              require(l >= Int.MinValue && l <= Int.MaxValue,
                s"cdc_cuts $what out of Int range: $l")
              l.toInt
            case other => throw new IllegalArgumentException(
              s"cdc_cuts $what must be an integer, got $other")
          }
        }
        CdcCuts(exprs.head, lit(exprs(1), "window"), lit(exprs(2), "maskBits"))
      }, "scala_udf")
}

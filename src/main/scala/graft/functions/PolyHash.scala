package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * `h = (h * 131 + byte) mod 1_000_000_007` — document fingerprinting
  * for LLM-data dedup pipelines, as a native Catalyst `Expression` with
  * whole-stage codegen (`doGenCode`), not a Scala UDF: stays inside the
  * generated loop, no boxing, no serialization.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_hash requires a string argument, got ${child.dataType}")
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bts = ctx.freshName("bts")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bts = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bts.length; $i++) {
         |  $h = ($h * 131L + ($bts[$i] & 0xffL)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Two independent polynomial rolling hashes over a string's UTF-8
  * bytes, packed into one 61-bit value:
  *
  *   `h1 = (h1 * 131 + byte) mod 1_000_000_007`   (bits 31..60)
  *   `h2 = (h2 * 137 + byte) mod 2_147_483_647`   (bits  0..30)
  *   `poly_hash2 = h1 * 2^31 + h2`
  *
  * The wide-hash twin of [[PolyHash]], built for [[SimHashAgg]]: a
  * simhash signature needs ~64 iid hash bits per token, and a single
  * mod-1e9+7 hash only carries 30. Every intermediate product fits a
  * 64-bit integer (each accumulator stays < 2^31), so — unlike
  * `xxhash64`, whose avalanche rounds need mod-2^64 wraparound — the
  * recurrence is exactly replayable in ANSI SQL: the DuckDB oracle
  * hex-decodes the UTF-8 bytes and folds both recurrences with
  * `list_reduce`, making simhash signatures bit-identical across
  * engines (bits 61-63 are structurally zero in both).
  */
case class PolyHash2(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_hash2 requires a string argument, got ${child.dataType}")
  override def prettyName: String = "poly_hash2"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash2.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bts = ctx.freshName("bts")
      val i = ctx.freshName("i")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val b = ctx.freshName("b")
      s"""
         |byte[] $bts = $c.getBytes();
         |long $h1 = 0L;
         |long $h2 = 0L;
         |for (int $i = 0; $i < $bts.length; $i++) {
         |  long $b = $bts[$i] & 0xffL;
         |  $h1 = ($h1 * 131L + $b) % 1000000007L;
         |  $h2 = ($h2 * 137L + $b) % 2147483647L;
         |}
         |${ev.value} = $h1 * 2147483648L + $h2;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash2 =
    copy(child = newChild)
}

object PolyHash2 {
  val Mod1 = 1000000007L
  val Base1 = 131L
  val Mod2 = 2147483647L
  val Base2 = 137L

  /** Reference implementation (used by tests and `nullSafeEval`). */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xffL
      h1 = (h1 * Base1 + b) % Mod1
      h2 = (h2 * Base2 + b) % Mod2
      i += 1
    }
    h1 * 2147483648L + h2
  }

  def hashString(s: String): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Register `poly_hash2` for `expr("poly_hash2(col)")` / SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash2", exprs => {
        require(exprs.length == 1,
          s"poly_hash2(str) takes exactly 1 argument, got ${exprs.length}")
        PolyHash2(exprs.head)
      }, "scala_udf")
}

object PolyHash {
  val Mod = 1000000007L
  val Base = 131L

  /** Reference implementation (used by tests and `nullSafeEval`). */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xffL)) % Mod
      i += 1
    }
    h
  }

  def hashString(s: String): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Register `poly_hash` in the session's function registry so it is
    * usable from `expr("poly_hash(col)")` / SQL.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => {
        require(exprs.length == 1,
          s"poly_hash(str) takes exactly 1 argument, got ${exprs.length}")
        PolyHash(exprs.head)
      }, "scala_udf")
}

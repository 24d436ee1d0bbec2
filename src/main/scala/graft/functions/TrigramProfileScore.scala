package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** All language-profile trigram scores in ONE text pass: for the
  * (already lower-cased, boundary-padded) input, emits
  * `array(en_hits, de_hits, fr_hits, es_hits)` — exactly
  * `size(filter(trigs, t -> t IN (<profile>)))` per profile, where
  * `trigs` is every 3-code-point window of the input.
  *
  * Why a custom expression: the declarative form materializes ~|text|
  * 3-char substrings and scans each against four ~35-literal IN lists —
  * ~140 string comparisons per window, which benchmarked at 4.4 s for
  * the lang-ID query (second-slowest in the catalog). Here each window
  * is packed into one long (3 x 21-bit code points) and binary-searched
  * in a sorted key table whose values are 4-bit per-profile membership
  * masks: ~8 long compares per window, no substring allocation at all.
  * Bit-equivalence with the declarative chain is pinned in
  * `TrigramProfileScoreSpec`; the DuckDB oracle keeps the declarative
  * formulation.
  *
  * The profile tables are built once at construction and travel into
  * generated code as reference objects (same pattern as
  * [[LshSignature]]'s plane matrix).
  */
case class TrigramProfileScore(child: Expression,
    profiles: Seq[Seq[String]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "trigram_scores"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"trigram_scores requires a string argument, got ${child.dataType}")
    else if (profiles.isEmpty || profiles.length > 30 ||
      profiles.exists(_.exists(t => t.codePointCount(0, t.length) != 3)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "trigram_scores profiles must be 1..30 lists of 3-code-point strings")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  /** (sorted packed-trigram keys, per-key profile-membership masks). */
  @transient private lazy val tables: (Array[Long], Array[Int]) =
    TrigramProfileScore.buildTables(profiles)

  override protected def nullSafeEval(input: Any): Any =
    TrigramProfileScore.compute(input.asInstanceOf[UTF8String],
      tables._1, tables._2, profiles.length)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val keysRef = ctx.addReferenceObj("trigramKeys", tables._1, "long[]")
    val masksRef = ctx.addReferenceObj("trigramMasks", tables._2, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.TrigramProfileScore.compute(
         |  $c, $keysRef, $masksRef, ${profiles.length});""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TrigramProfileScore = copy(child = newChild)
}

object TrigramProfileScore {

  /** 3 code points -> one long key (21 bits each; cp <= 0x10FFFF). */
  private def pack(a: Int, b: Int, c: Int): Long =
    (a.toLong << 42) | (b.toLong << 21) | c.toLong

  def buildTables(profiles: Seq[Seq[String]]): (Array[Long], Array[Int]) = {
    val masks = scala.collection.mutable.LongMap[Int]()
    profiles.zipWithIndex.foreach { case (ts, p) =>
      ts.foreach { t =>
        val cps = t.codePoints().toArray
        require(cps.length == 3, s"profile trigram '$t' is not 3 code points")
        val k = pack(cps(0), cps(1), cps(2))
        masks(k) = masks.getOrElse(k, 0) | (1 << p)
      }
    }
    val keys = masks.keys.toArray.sorted
    (keys, keys.map(masks))
  }

  /** One pass over the code points (called from generated code). */
  def compute(s: UTF8String, keys: Array[Long], masks: Array[Int],
      nProfiles: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val counts = new Array[Int](nProfiles)
    var i = 0
    while (i + 2 < cps.length) {
      val idx = java.util.Arrays.binarySearch(keys,
        pack(cps(i), cps(i + 1), cps(i + 2)))
      if (idx >= 0) {
        var m = masks(idx)
        var p = 0
        while (m != 0) {
          if ((m & 1) != 0) counts(p) += 1
          m >>>= 1; p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Register `trigram_scores(padded)` with a fixed profile set. */
  def register(spark: SparkSession, name: String,
      profiles: Seq[Seq[String]]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => {
        require(exprs.length == 1,
          s"$name(text) takes exactly 1 argument, got ${exprs.length}")
        TrigramProfileScore(exprs.head, profiles)
      }, "scala_udf")
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash as a single custom `TypedImperativeAggregate`: the buffer is
  * one `Array[Int]` of 64 bit-counters plus the element count; `eval`
  * packs the per-bit majority into the 64-bit signature.
  *
  * Replaces the 65-aggregate-column formulation (64 `sum((h>>b)&1)` +
  * count): one buffer per group instead of 65 unsafe-row slots, one
  * update loop per row, and a mergeable state that partial-aggregates
  * map-side like any built-in — the custom-aggregate tier of the
  * build-vs-compose ladder (sketches, HLL-style state).
  *
  * Input: the per-token 64-bit hash (e.g. `xxhash64(word)`).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_agg requires a bigint token hash, got ${child.dataType}")

  // buffer layout: 64 bit-counters + total count at index 64
  override def createAggregationBuffer(): Array[Int] = new Array[Int](65)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buf(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      buf(64) += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 65) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    val n = buf(64)
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) * 2 > n) sig |= 1L << b
      b += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(65 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(65)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Register `simhash_agg` for `expr("simhash_agg(xxhash64(w))")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_agg", exprs => {
        require(exprs.length == 1,
          s"simhash_agg(hash) takes exactly 1 argument, got ${exprs.length}")
        SimHashAgg(exprs.head).toAggregateExpression()
      }, "scala_udf")
}

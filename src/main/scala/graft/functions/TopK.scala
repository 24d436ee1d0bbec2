package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k as a custom `TypedImperativeAggregate`: keep the k
  * largest struct rows by the struct's natural (lexicographic field)
  * ordering, emitted as a descending-sorted array.
  *
  * Why not `row_number().over(Window.partitionBy(key))` + filter?
  * Since Spark 3.5 the optimizer DOES map-side-prune that pattern
  * (`WindowGroupLimit` partial mode keeps k rows per partition before
  * the exchange — `x_domain_cap` relies on it), so the shuffle volume
  * is comparable. What the window path still pays is a FULL SORT of
  * every candidate row inside each map partition (O(n log n) compute
  * plus sort-buffer/spill exposure on wide candidate sets) before the
  * limit can prune, and it only applies when the optimizer's
  * rank-filter pattern-match fires. The bounded aggregate streams the
  * candidates in one O(n·k) pass with exactly k rows of state, never
  * sorts, never spills, and — being a real aggregate — fuses with the
  * groupBy (no separate sort+window stage, composable with other
  * aggregates in the same pass). (Spark has no public built-in at
  * this tier: `max_by` keeps one row; collect_list + slice buffers
  * the full group.)
  *
  * The buffer is a flat array of at most k row copies with a cached
  * min index — O(1) reject of losing rows (the overwhelming majority),
  * O(k) insert; for the k <= ~100 this is built for, that beats a heap
  * in constant factor and code size. Ties: the FULL struct ordering
  * decides, so make the struct's trailing fields a deterministic
  * tiebreak (e.g. `struct(score, -id)`) — equal complete structs keep
  * the first seen, which is only reachable for genuinely duplicate
  * (score, tiebreak) tuples.
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[InternalRow]] {

  private lazy val childStruct = child.dataType.asInstanceOf[StructType]
  private lazy val ord =
    TypeUtils.getInterpretedOrdering(child.dataType)
  private lazy val toUnsafe = UnsafeProjection.create(childStruct)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(childStruct, containsNull = false)
  override def prettyName: String = "topk_structs"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StructType if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case _: StructType => TypeCheckResult.TypeCheckFailure(
        s"topk_structs k must be >= 1, got $k")
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_structs requires a struct input, got $other")
    }

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    new ArrayBuffer[InternalRow](k)

  private def minIndex(buf: ArrayBuffer[InternalRow]): Int = {
    var m = 0
    var i = 1
    while (i < buf.length) {
      if (ord.compare(buf(i), buf(m)) < 0) m = i
      i += 1
    }
    m
  }

  private def insert(buf: ArrayBuffer[InternalRow], row: InternalRow)
      : Unit =
    if (buf.length < k) {
      buf += row.copy()
    } else {
      val m = minIndex(buf)
      if (ord.compare(row, buf(m)) > 0) buf(m) = row.copy()
    }

  override def update(buf: ArrayBuffer[InternalRow], input: InternalRow)
      : ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[InternalRow])
    buf
  }

  override def merge(a: ArrayBuffer[InternalRow],
      b: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(
      buf.sorted(ord.reverse).map(_.asInstanceOf[Any]).toArray)

  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    val rows = buf.map(r => toUnsafe(r).copy())
    val total = 4 + rows.map(r => 4 + r.getSizeInBytes).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { r =>
      bb.putInt(r.getSizeInBytes)
      r.writeTo(bb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[InternalRow](math.max(n, k))
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(childStruct.length)
      row.pointTo(rowBytes, len)
      buf += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStructs =
    copy(child = newChildren.head)
}

object TopKStructs {
  /** Register `topk_structs(struct_col, k)` — k must be a literal. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_structs", exprs => {
        require(exprs.length == 2,
          s"topk_structs(struct, k) takes 2 arguments, got ${exprs.length}")
        require(exprs(1).foldable, "topk_structs k must be a literal")
        val k = exprs(1).eval().asInstanceOf[Number].intValue()
        TopKStructs(exprs.head, k).toAggregateExpression()
      }, "scala_udf")
}

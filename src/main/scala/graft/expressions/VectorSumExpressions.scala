// Hosted under org.apache.spark.sql for the Column↔Expression bridge
// (see VectorExpressions.scala).
package org.apache.spark.sql.graftx

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Accumulator for [[LongVectorSumAgg]]: one fixed-width long array,
  * summed element-wise — order-free exact integer sums, so merges are
  * bit-identical on any partitioning.
  */
final class LongVectorBuffer(val dim: Int) {
  val acc = new Array[Long](dim)

  /** Null array = all zeros; null elements = 0; rows longer than `dim`
    * are clamped (extra elements never touch the buffer).
    */
  def add(arr: ArrayData): Unit = {
    if (arr == null) return
    val n = math.min(arr.numElements(), dim)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) acc(i) += arr.getLong(i)
      i += 1
    }
  }

  def mergeFrom(other: LongVectorBuffer): Unit = {
    var k = 0
    while (k < dim) { acc(k) += other.acc(k); k += 1 }
  }
}

/** Element-wise sum of an array<long> column — the register-per-vertex
  * reduction the packed multi-source graph operators need ([[graft
  * .operators.Graph.betweennessInt]]): per-seed counters ride ONE array
  * per vertex, so an |E|-row join aggregates into |V| groups instead of
  * an |E|·|S| pair fan-out into |S|·|V| groups (Bader & Madduri's
  * multi-source organization; cf. Boldi & Vigna, HyperANF, for the
  * bitmap analogue). Map-side partials collapse the fan-out before any
  * exchange; long sums are exact and order-free, so results are
  * bit-identical on any partitioning.
  *
  * Output: array<long> of exactly `dim` elements.
  */
case class LongVectorSumAgg(
    vec: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongVectorBuffer] with UnaryLike[Expression]
  with ExpectsInputTypes {

  require(dim >= 1, s"vector_sum_long needs dim >= 1, got $dim")

  override def child: Expression = vec
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vector_sum_long"

  override def createAggregationBuffer(): LongVectorBuffer =
    new LongVectorBuffer(dim)

  override def update(buffer: LongVectorBuffer,
      input: InternalRow): LongVectorBuffer = {
    buffer.add(vec.eval(input).asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: LongVectorBuffer,
      other: LongVectorBuffer): LongVectorBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: LongVectorBuffer): Any =
    new GenericArrayData(buffer.acc.map(x => x: Any))

  override def serialize(buffer: LongVectorBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.acc.length * 8)
    buffer.acc.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongVectorBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    var k = 0
    while (k < buf.acc.length) { buf.acc(k) = bb.getLong; k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): LongVectorSumAgg =
    copy(vec = newChild)
}

object VectorSumExpressions {
  /** Element-wise sum of an array<long> column into a fixed `dim`-wide
    * array (null arrays/elements contribute zero; longer rows clamp).
    */
  def vectorSumLong(vec: Column, dim: Int): Column =
    ExpressionUtils.column(
      LongVectorSumAgg(ExpressionUtils.expression(vec), dim)
        .toAggregateExpression())
}

// Hosted under org.apache.spark.sql for the Column↔Expression bridge
// (see VectorExpressions.scala).
package org.apache.spark.sql.graftx

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded-k heap buffer for [[BoundedTopKAgg]]: a binary heap whose root is
  * the WORST kept element under the total order (score, id) — ascending
  * (smallest scores kept) or descending (largest kept), ties always to the
  * smaller id. Insertion is O(log k) and the buffer never exceeds k entries,
  * so a partial aggregate ships at most k (double, long) pairs per
  * (partition, key) instead of every scored row.
  *
  * The kept set is partition-order-invariant: (score, id) is a total order
  * over distinct ids, so "the k best" is a unique set regardless of
  * insertion order — a merge of partials is bit-identical to a single-pass
  * fold, which is what lets the oracle compare the aggregate against a
  * row_number window formulation exactly.
  */
final class TopKBuffer(val k: Int, val desc: Boolean) {
  val scores = new Array[Double](math.max(k, 1))
  val ids = new Array[Long](math.max(k, 1))
  var size = 0

  // strict "ranks worse than" under the keep order
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    if (s1 != s2) (if (desc) s1 < s2 else s1 > s2) else i1 > i2

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  def insert(s: Double, id: Long): Unit = {
    if (k == 0) return
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id
      size += 1
      var p = (i - 1) / 2
      while (i > 0 && worse(scores(i), ids(i), scores(p), ids(p))) {
        swap(i, p); i = p; p = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true
        else { swap(i, w); i = w }
      }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var j = 0
    while (j < other.size) { insert(other.scores(j), other.ids(j)); j += 1 }
  }

  /** Kept entries ranked best-first (rank order = the window's orderBy). */
  def ranked: Array[(Double, Long)] = {
    val arr = Array.tabulate(size)(j => (scores(j), ids(j)))
    arr.sortWith((a, b) => worse(b._1, b._2, a._1, a._2))
  }

  def serialized: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + size * 16)
    bb.putInt(size)
    var j = 0
    while (j < size) { bb.putDouble(scores(j)); bb.putLong(ids(j)); j += 1 }
    bb.array()
  }
}

/** Per-key bounded top-k as a [[TypedImperativeAggregate]]: keeps the k best
  * (score, id) pairs — partial heaps per partition, merged at the final
  * aggregation. This is the scale-correct reduction for exhaustive scoring
  * paths (brute-force / ADC search): the alternative `row_number() OVER
  * (PARTITION BY key)` ships EVERY scored row of a key to one reducer —
  * |corpus| rows per query at billions of vectors — where this aggregate's
  * exchange carries at most partitions·k pairs per key.
  *
  * Output: array<struct<score double, id bigint>> in rank order (index i =
  * rank i+1), identical to the window formulation's result by the
  * total-order argument on [[TopKBuffer]].
  */
case class BoundedTopKAgg(
    score: Expression,
    idExpr: Expression,
    k: Int,
    desc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression]
  with ExpectsInputTypes {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def left: Expression = score
  override def right: Expression = idExpr
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, desc)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.ranked.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.serialized

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.insert(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopKAgg =
    copy(score = newLeft, idExpr = newRight)
}

object TopKExpressions {
  /** Aggregate (score, id) pairs into the k best as
    * array<struct<score, id>> in rank order; `descending = true` keeps the
    * largest scores. Ties break to the smaller id in both directions.
    */
  def boundedTopK(score: Column, id: Column, k: Int,
      descending: Boolean): Column =
    ExpressionUtils.column(BoundedTopKAgg(
      ExpressionUtils.expression(score), ExpressionUtils.expression(id),
      k, descending).toAggregateExpression())
}

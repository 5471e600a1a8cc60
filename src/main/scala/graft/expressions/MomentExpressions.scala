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

/** Accumulator for [[VectorMomentAgg]]: row count, quantized first moments
  * Σ round(xᵢ·Q) and upper-triangle second moments Σ round(xᵢ·xⱼ·Q) as
  * longs — order-free integer sums, so merges are bit-identical on any
  * partitioning. Layout: [n, sx(0..dim-1), sxy(i ≤ j, row-major)].
  */
final class MomentBuffer(val dim: Int) {
  val acc = new Array[Long](1 + dim + dim * (dim + 1) / 2)

  @inline def triIdx(i: Int, j: Int): Int = // j >= i
    1 + dim + i * dim - i * (i - 1) / 2 + (j - i)

  // Spark round(double, 0) semantics (BigDecimal.valueOf(x).setScale(0,
  // HALF_UP)). Fast path: floor(v + 0.5) — but the IEEE ADD can round a
  // value just BELOW a half boundary up onto it (the JDK-8010430 case:
  // v = 0.49999999999999994 → v + 0.5 == 1.0 exactly), where HALF_UP on
  // the shortest-decimal value gives 0. So any result landing within one
  // part in 1e9 of its half boundary re-rounds through the exact
  // BigDecimal path Spark itself uses — the guard fires ~never on real
  // data, keeping the fast path hot.
  @inline private def q(x: Double): Long = {
    val v = x * MomentBuffer.Q
    val eps = math.ulp(math.abs(v) + 0.5) * 2 // hazard zone of the ADD
    if (v >= 0) {
      val r = math.floor(v + 0.5)
      if (math.abs(v - (r - 0.5)) <= eps)
        java.math.BigDecimal.valueOf(v)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      else r.toLong
    } else {
      val r = math.ceil(v - 0.5)
      if (math.abs(v - (r + 0.5)) <= eps)
        java.math.BigDecimal.valueOf(v)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      else r.toLong
    }
  }

  /** Mirror of Pca.momentSums element semantics: every row counts; moments
    * accumulate over the elements the row actually has, CLAMPED to `dim`
    * (momentSums' element_at never reads past dim; without the clamp an
    * over-length row would corrupt the sxy region and overrun the buffer).
    */
  def add(arr: ArrayData): Unit = {
    acc(0) += 1
    if (arr == null) return
    val n = math.min(arr.numElements(), dim)
    var i = 0
    while (i < n) {
      // element_at semantics: a NULL element yields null, which the
      // exploded form's sum() skips — mirror that here (for sxy either
      // null operand nulls the product)
      if (!arr.isNullAt(i)) {
        val xi = arr.getDouble(i)
        acc(1 + i) += q(xi)
        var j = i
        while (j < n) {
          if (!arr.isNullAt(j)) acc(triIdx(i, j)) += q(xi * arr.getDouble(j))
          j += 1
        }
      }
      i += 1
    }
  }

  def mergeFrom(other: MomentBuffer): Unit = {
    var k = 0
    while (k < acc.length) { acc(k) += other.acc(k); k += 1 }
  }
}

object MomentBuffer { val Q = 1e8 }

/** One-pass quantized first+second moment sums of a vector column — the
  * covariance inputs PCA needs, WITHOUT the ×dim(dim+1)/2 per-row pair
  * explosion of the DataFrame formulation (`Pca.momentSums`): the buffer
  * is a single long array per partition, the exchange carries one
  * ~dim²/2-long array per partition instead of millions of exploded rows,
  * and the result is BIT-IDENTICAL to the exploded groupBy (same
  * quantization, same order-free long sums — spec-asserted), which is what
  * lets `v_covariance_check` keep gating the exploded form against DuckDB
  * while fit runs this one.
  *
  * Output: array<long> = [n, sx(0..dim-1), sxy(i ≤ j row-major)].
  */
case class VectorMomentAgg(
    vec: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentBuffer] with UnaryLike[Expression]
  with ExpectsInputTypes {

  require(dim >= 1, s"vector_moments needs dim >= 1, got $dim")

  override def child: Expression = vec
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vector_moments"

  override def createAggregationBuffer(): MomentBuffer = new MomentBuffer(dim)

  override def update(buffer: MomentBuffer, input: InternalRow): MomentBuffer = {
    buffer.add(vec.eval(input).asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: MomentBuffer, other: MomentBuffer): MomentBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MomentBuffer): Any =
    new GenericArrayData(buffer.acc.map(x => x: Any))

  override def serialize(buffer: MomentBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.acc.length * 8)
    buffer.acc.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MomentBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    var k = 0
    while (k < buf.acc.length) { buf.acc(k) = bb.getLong; k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMomentAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMomentAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMomentAgg =
    copy(vec = newChild)
}

/** Accumulator for [[VectorCrossMomentAgg]]: row count + the FULL dim×dim
  * quantized cross-product sums Σ round(xᵢ·yⱼ·Q) — the X^T·Ŷ correlation
  * matrix OPQ's orthogonal-Procrustes step needs (not symmetric, so no
  * triangle packing). Same quantization and order-free long sums as
  * [[MomentBuffer]]. Layout: [n, m(i·dim + j)].
  */
final class CrossMomentBuffer(val dim: Int) {
  val acc = new Array[Long](1 + dim * dim)

  @inline private def q(x: Double): Long = {
    val v = x * MomentBuffer.Q
    val eps = math.ulp(math.abs(v) + 0.5) * 2
    if (v >= 0) {
      val r = math.floor(v + 0.5)
      if (math.abs(v - (r - 0.5)) <= eps)
        java.math.BigDecimal.valueOf(v)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      else r.toLong
    } else {
      val r = math.ceil(v - 0.5)
      if (math.abs(v - (r + 0.5)) <= eps)
        java.math.BigDecimal.valueOf(v)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      else r.toLong
    }
  }

  def add(x: ArrayData, y: ArrayData): Unit = {
    acc(0) += 1
    if (x == null || y == null) return
    val nx = math.min(x.numElements(), dim)
    val ny = math.min(y.numElements(), dim)
    var i = 0
    while (i < nx) {
      if (!x.isNullAt(i)) {
        val xi = x.getDouble(i)
        var j = 0
        while (j < ny) {
          if (!y.isNullAt(j)) acc(1 + i * dim + j) += q(xi * y.getDouble(j))
          j += 1
        }
      }
      i += 1
    }
  }

  def mergeFrom(other: CrossMomentBuffer): Unit = {
    var k = 0
    while (k < acc.length) { acc(k) += other.acc(k); k += 1 }
  }
}

/** One-pass quantized cross-moment matrix of two vector columns — the
  * distributed input to OPQ's rotation update (minimize ‖X·Rᵀ − Ŷ‖² over
  * orthonormal R ⇒ SVD of Σ x·ŷᵀ). One long-array accumulator per
  * partition, exchange = one dim²-long array per partition; bit-identical
  * on any partitioning (quantized order-free long sums).
  *
  * Output: array<long> = [n, m(i·dim + j)] with m = Σ round(xᵢ·yⱼ·10⁸).
  */
case class VectorCrossMomentAgg(
    left: Expression,
    right: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CrossMomentBuffer]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression]
  with ExpectsInputTypes {

  require(dim >= 1, s"vector_cross_moments needs dim >= 1, got $dim")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vector_cross_moments"

  override def createAggregationBuffer(): CrossMomentBuffer =
    new CrossMomentBuffer(dim)

  override def update(buffer: CrossMomentBuffer,
      input: InternalRow): CrossMomentBuffer = {
    buffer.add(left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: CrossMomentBuffer,
      other: CrossMomentBuffer): CrossMomentBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: CrossMomentBuffer): Any =
    new GenericArrayData(buffer.acc.map(x => x: Any))

  override def serialize(buffer: CrossMomentBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.acc.length * 8)
    buffer.acc.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CrossMomentBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    var k = 0
    while (k < buf.acc.length) { buf.acc(k) = bb.getLong; k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): VectorCrossMomentAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): VectorCrossMomentAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorCrossMomentAgg =
    copy(left = newLeft, right = newRight)
}

object MomentExpressions {
  /** One-pass moment sums of an array<double> column (cast float arrays
    * first): array<long> = [n, sx…, upper-tri sxy…], quantized to 1e-8
    * units exactly like `Pca.momentSums`.
    */
  def vectorMoments(vec: Column, dim: Int): Column =
    ExpressionUtils.column(
      VectorMomentAgg(ExpressionUtils.expression(vec), dim)
        .toAggregateExpression())

  /** One-pass cross-moment matrix Σ round(xᵢ·yⱼ·10⁸) of two array<double>
    * columns: array<long> = [n, dim×dim row-major].
    */
  def vectorCrossMoments(x: Column, y: Column, dim: Int): Column =
    ExpressionUtils.column(
      VectorCrossMomentAgg(ExpressionUtils.expression(x),
        ExpressionUtils.expression(y), dim)
        .toAggregateExpression())
}

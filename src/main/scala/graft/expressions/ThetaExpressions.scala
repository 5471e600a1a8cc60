// Hosted under org.apache.spark.sql for the private[sql] type-coercion API
// and the Column↔Expression bridge (see VectorExpressions.scala).
package org.apache.spark.sql.graftx

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch distinct-SET algebra (Apache DataSketches).
  *
  * HLL answers "how many distinct" and unions; theta sketches additionally
  * support INTERSECTION and DIFFERENCE on the sketched sets — "how many
  * doc_ids appear in BOTH shards / in A but not B" — computed on
  * kilobyte-sized summaries that merge associatively. At 100 TB that is the
  * only viable shape for cross-partition set overlap: per-shard sketches
  * build in one pass with map-side partial aggregation (raw ids never
  * cross the network), persist beside the data, and any pair of shards /
  * days / sources combines in O(sketch bytes) on the driver or in a 1-row
  * plan — no re-scan, no distinct shuffle.
  *
  * Accuracy contract: a theta sketch is EXACT while its retained-entry
  * count stays under the nominal 2^lgK (no sampling has kicked in); beyond
  * that, relative standard error ≈ 1/√(2^lgK) (~0.8% at lgK=14), and
  * intersection error scales with the Jaccard gap per the DataSketches
  * bounds. The gate queries run in the exact regime, so estimates are
  * value-exact against the DuckDB oracle; at production scale the same code
  * degrades gracefully to the published error bounds.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression]
  with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(IntegerType, LongType, StringType))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case LongType => buffer.update(v.asInstanceOf[Long])
      case StringType => buffer.update(v.asInstanceOf[UTF8String].toString)
      case other => throw new IllegalStateException(s"unexpected input $other")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Rounded distinct estimate of a serialized theta sketch. In the exact
  * regime (retained < 2^lgK) the estimate is an integral double and the
  * round is lossless.
  */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType

  def estimate(bytes: Array[Byte]): Long =
    Math.round(Sketches.wrapSketch(Memory.wrap(bytes)).getEstimate)

  override def nullSafeEval(v: Any): Any =
    estimate(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("thetaEstExpr", this, classOf[ThetaEstimate].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.estimate($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "theta_estimate"
}

/** Pairwise set operation on two serialized theta sketches → serialized
  * result sketch. `op` ∈ union | intersect | diff (diff = A \ B).
  */
case class ThetaCombine(left: Expression, right: Expression, op: String,
    lgK: Int = 14)
    extends BinaryExpression with ExpectsInputTypes {

  require(Set("union", "intersect", "diff")(op), s"unknown theta op: $op")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType

  def combine(ab: Array[Byte], bb: Array[Byte]): Array[Byte] = {
    val a = Sketches.wrapSketch(Memory.wrap(ab))
    val b = Sketches.wrapSketch(Memory.wrap(bb))
    val out: CompactSketch = op match {
      case "union" =>
        // The union gadget prunes to ITS OWN nominal-entry budget, not the
        // inputs': the library default (lgK=12 / 4096) silently drops a
        // union of two exact lgK=14 sketches into estimation mode at >4096
        // retained entries (caught at sf0.1: union of 14981 exact keys
        // estimated 14884). Size the gadget to the aggregator's lgK so
        // union stays exact over the same regime as the inputs.
        val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
        u.union(a); u.union(b); u.getResult
      case "intersect" =>
        val i = SetOperation.builder().buildIntersection()
        i.intersect(a); i.intersect(b); i.getResult
      case "diff" =>
        SetOperation.builder().buildANotB().aNotB(a, b)
    }
    out.toByteArray
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    combine(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("thetaCombExpr", this, classOf[ThetaCombine].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.combine($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = s"theta_$op($lgK)"
}

object ThetaExpressions {
  /** Aggregate a column into a serialized theta sketch. */
  def thetaAgg(key: Column, lgK: Int = 14): Column =
    ExpressionUtils.column(
      ThetaSketchAgg(ExpressionUtils.expression(key), lgK)
        .toAggregateExpression())

  def thetaEstimate(sketch: Column): Column =
    ExpressionUtils.column(ThetaEstimate(ExpressionUtils.expression(sketch)))

  def thetaUnion(a: Column, b: Column): Column = combine(a, b, "union")
  def thetaIntersect(a: Column, b: Column): Column = combine(a, b, "intersect")
  def thetaDiff(a: Column, b: Column): Column = combine(a, b, "diff")

  private def combine(a: Column, b: Column, op: String): Column =
    ExpressionUtils.column(ThetaCombine(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), op))
}

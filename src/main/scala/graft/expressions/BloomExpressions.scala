// Hosted under org.apache.spark.sql for the same reason as
// VectorExpressions.scala: the private[sql] type-coercion API and the
// Column↔Expression bridge.
package org.apache.spark.sql.graftx

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` membership probe against a pre-built bloom filter, as a
  * codegen'd predicate over an integral key column.
  *
  * The filter travels SERIALIZED (`filterBytes`, the spark-sketch wire
  * format) and is deserialized lazily once per JVM-deserialized expression
  * instance — i.e. once per executor task-binary fetch, not per row and not
  * per task (the task binary containing the plan is itself broadcast once
  * per stage). Codegen installs the deserialized filter in the references
  * array and emits a single virtual call per row, keeping the probe inside
  * whole-stage codegen.
  *
  * Membership contract (must mirror `DataFrameStatFunctions.bloomFilter`,
  * which is how callers build the filter): every integral type is widened to
  * long and probed via `mightContainLong` — the same normalization the
  * builder applies on insert, so a key present in the build side can NEVER
  * probe false (no false negatives). False positives occur at the
  * configured fpp and are harmless to join pruning: a surviving non-matching
  * row is dropped by the exact join that follows.
  */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ByteType, ShortType, IntegerType, LongType))

  override def dataType: DataType = BooleanType

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any = {
    val key = v match {
      case b: Byte => b.toLong
      case s: Short => s.toLong
      case i: Int => i.toLong
      case l: Long => l
    }
    filter.mightContainLong(key)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainLong((long) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain_long"
}

object BloomExpressions {
  /** Column-level bloom membership probe backed by [[BloomMightContainLong]]. */
  def bloomMightContain(key: Column, filterBytes: Array[Byte]): Column =
    ExpressionUtils.column(BloomMightContainLong(
      ExpressionUtils.expression(key), filterBytes))
}

// Hosted under org.apache.spark.sql for the Column↔Expression bridge
// (see VectorExpressions.scala).
package org.apache.spark.sql.graftx

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving stream summary (Metwally, Agrawal, El Abbadi, ICDT 2005)
  * holding at most `capacity` (key → count, err) entries. `count`
  * OVERESTIMATES the true frequency by at most `err`; any key with true
  * frequency > N/capacity is guaranteed present. While no eviction has
  * occurred (distinct keys ≤ capacity) every err is 0 and counts are
  * EXACT — the regime the oracle gate runs in; at scale the published
  * ε = 1/capacity bound takes over.
  *
  * Merge follows the mergeable-summaries construction (Agarwal et al.,
  * PODS 2012): a key missing from one side is assumed to have that side's
  * minimum count (the summary's per-side floor), counts and errors add,
  * and the union is re-trimmed to the capacity's top counts. The merged
  * bound count − err ≤ true ≤ count is preserved, so partial aggregation
  * over any partitioning keeps the guarantee.
  */
final class SpaceSavingBuffer(val capacity: Int) {
  val counts = new mutable.HashMap[String, Long]()
  val errs = new mutable.HashMap[String, Long]()

  private def minKey: String =
    counts.minBy { case (k, c) => (c, k) }._1 // deterministic victim

  def add(key: String, weight: Long): Unit = {
    counts.get(key) match {
      case Some(c) => counts.update(key, c + weight)
      case None if counts.size < capacity =>
        counts.update(key, weight); errs.update(key, 0L)
      case None =>
        val victim = minKey
        val floor = counts(victim)
        counts.remove(victim); errs.remove(victim)
        counts.update(key, floor + weight)
        errs.update(key, floor)
    }
  }

  def mergeFrom(other: SpaceSavingBuffer): Unit = {
    if (other.counts.isEmpty) return
    // per-side floors: what a summary can claim about absent keys. A side
    // that never evicted (size < capacity, all errs 0) proves absence —
    // its floor is 0.
    def floorOf(b: SpaceSavingBuffer): Long =
      if (b.counts.size < b.capacity && b.errs.valuesIterator.forall(_ == 0L)) 0L
      else if (b.counts.isEmpty) 0L
      else b.counts.valuesIterator.min
    val fSelf = floorOf(this)
    val fOther = floorOf(other)
    val keys = counts.keySet ++ other.counts.keySet
    val merged = keys.toSeq.map { k =>
      val (cA, eA) = (counts.get(k), errs.getOrElse(k, 0L))
      val (cB, eB) = (other.counts.get(k), other.errs.getOrElse(k, 0L))
      val c = cA.getOrElse(fSelf) + cB.getOrElse(fOther)
      val e = (if (cA.isEmpty) fSelf else eA) + (if (cB.isEmpty) fOther else eB)
      (k, c, e)
    }
    counts.clear(); errs.clear()
    merged.sortBy { case (k, c, _) => (-c, k) }.take(capacity).foreach {
      case (k, c, e) => counts.update(k, c); errs.update(k, e)
    }
  }

  def serialized: Array[Byte] = {
    val entries = counts.toSeq.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c, errs.getOrElse(k, 0L))
    }
    val n = entries.map(_._1.length + 4 + 16).sum
    val bb = ByteBuffer.allocate(4 + n)
    bb.putInt(entries.size)
    entries.foreach { case (kb, c, e) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  /** Entries by (count desc, key asc) — the heavy-hitter report order. */
  def ranked: Seq[(String, Long, Long)] =
    counts.toSeq.map { case (k, c) => (k, c, errs.getOrElse(k, 0L)) }
      .sortBy { case (k, c, _) => (-c, k) }
}

case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "space_saving"

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L)
    buffer
  }

  override def merge(buffer: SpaceSavingBuffer,
      other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: SpaceSavingBuffer): Any =
    new GenericArrayData(buffer.ranked.map { case (k, c, e) =>
      InternalRow(UTF8String.fromString(k), c, e)
    }.toArray[Any])

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] =
    buffer.serialized

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val kl = bb.getInt
      val kb = new Array[Byte](kl)
      bb.get(kb)
      val c = bb.getLong
      val e = bb.getLong
      val k = new String(kb, StandardCharsets.UTF_8)
      buf.counts.update(k, c)
      buf.errs.update(k, e)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingAgg =
    copy(child = newChild)
}

object SpaceSavingExpressions {
  /** Aggregate string keys into the SpaceSaving top-`capacity` summary:
    * array<struct<key, cnt, err>> by (cnt desc, key). cnt − err ≤ true
    * frequency ≤ cnt; exact (err 0) while distinct keys ≤ capacity.
    */
  def spaceSaving(key: Column, capacity: Int): Column =
    ExpressionUtils.column(SpaceSavingAgg(
      ExpressionUtils.expression(key), capacity).toAggregateExpression())
}

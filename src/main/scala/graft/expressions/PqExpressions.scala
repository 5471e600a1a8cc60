// Hosted under org.apache.spark.sql for the Column↔Expression bridge
// (see VectorExpressions.scala).
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native product-quantization kernels ([[graft.operators.Pq]]). The
  * codebooks (m × k × sub doubles) are driver-side model state embedded in
  * the expression — the [[CharLmScore]] shape: a Column-DSL formulation of
  * the same argmin is an m·k-dot literal TREE that Janino must compile per
  * plan (measured: compilation dominated the train loop and the ADC table
  * build), where these kernels are one tight JVM loop behind a single
  * codegen'd call, keeping whole-stage codegen intact at any m·k.
  *
  * Bit-exactness contract (the `v_pq_check` gates depend on it): every dot
  * product and ‖c‖² is an ascending-index left fold and the per-entry
  * scalar shapes are `‖c‖² − 2·v·c` (assign) and `(q·q − 2·q·c) + ‖c‖²`
  * (table) — identical op order to the broadcast-DataFrame recompute built
  * from [[VectorDotProduct]], so cross-mechanism comparisons demand
  * equality, not tolerance. Argmin ties break to the smallest index
  * (strict `<` scan).
  */
case class PqCodes(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val books: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val cn2: Array[Array[Double]] =
    books.map(_.map(c => c.foldLeft(0.0)((a, x) => a + x * x)))

  def codes(arr: ArrayData): ArrayData = {
    val v = arr.toDoubleArray()
    val m = books.length
    val sub = books(0)(0).length
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val off = mi * sub
      val cb = books(mi)
      var bestJ = 0
      var bestS = Double.PositiveInfinity
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var d = 0.0
        var i = 0
        while (i < sub) { d += v(off + i) * c(i); i += 1 }
        val s = cn2(mi)(j) - 2.0 * d
        if (s < bestS) { bestS = s; bestJ = j }
        j += 1
      }
      out(mi) = bestJ
      mi += 1
    }
    ArrayData.toArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    codes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodesExpr", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.codes($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_codes"
}

/** Per-query ADC distance table: entry [m][j] is the full squared L2
  * distance between the query's m-th subvector and codebook centroid
  * (m, j). Built ONCE per query row; ADC scoring is then `m` array
  * lookups per (query, vector) pair.
  */
case class PqDistTable(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  @transient private lazy val books: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val cn2: Array[Array[Double]] =
    books.map(_.map(c => c.foldLeft(0.0)((a, x) => a + x * x)))

  def table(arr: ArrayData): ArrayData = {
    val v = arr.toDoubleArray()
    val m = books.length
    val sub = books(0)(0).length
    val rows = new Array[AnyRef](m)
    var mi = 0
    while (mi < m) {
      val off = mi * sub
      var qq = 0.0
      var i = 0
      while (i < sub) { qq += v(off + i) * v(off + i); i += 1 }
      val cb = books(mi)
      val row = new Array[Double](cb.length)
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var qc = 0.0
        i = 0
        while (i < sub) { qc += v(off + i) * c(i); i += 1 }
        row(j) = qq - 2.0 * qc + cn2(mi)(j)
        j += 1
      }
      rows(mi) = ArrayData.toArrayData(row)
      mi += 1
    }
    ArrayData.toArrayData(rows)
  }

  override def nullSafeEval(input: Any): Any =
    table(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqTblExpr", this, classOf[PqDistTable].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.table($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_dist_table"
}

object PqExpressions {
  def pqCodes(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqCodes(ExpressionUtils.expression(v), codebooks))

  def pqDistTable(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqDistTable(ExpressionUtils.expression(v), codebooks))
}

// Hosted under org.apache.spark.sql for the private[sql] type-coercion API
// and the Column↔Expression bridge (see VectorExpressions.scala).
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-pattern occurrence counts of a FIXED pattern list in one linear
  * pass — the Aho-Corasick automaton (Aho & Corasick, CACM 1975): goto
  * trie + BFS failure links + merged output sets, so a 10⁴-entry
  * blocklist costs the same single scan of each document as one pattern
  * (a per-pattern `contains` loop scans the corpus P times — the naive
  * shape that dies first on a 100 TB blocklist screen). ALL occurrences
  * count, overlapping included (the automaton's natural semantics; the
  * oracle mirrors it with per-position substring equality). Matching is
  * raw and case-sensitive — compose with the normalize chain upstream
  * when case folding is wanted.
  *
  * The automaton builds lazily ONCE per executor from the plan-literal
  * pattern list and is shared by every row the task scores; scoring is a
  * zero-shuffle whole-stage-codegen projection like [[CharLmScore]].
  *
  * Returns `array<long>` of counts, index-aligned with `patterns`.
  */
case class AhoCorasickCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(patterns.nonEmpty, "pattern list must be non-empty")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** goto/fail/output tables. Nodes are dense ints; children are per-node
    * hash maps (the alphabet is unbounded — text is arbitrary unicode);
    * `out` holds EVERY pattern index whose string is a suffix of the
    * node's string (own endings merged with the fail target's list during
    * the BFS, so scanning never chases suffix links per position).
    */
  @transient private lazy val automaton: AhoCorasickCounts.Automaton =
    AhoCorasickCounts.build(patterns)

  def countsOf(input: UTF8String): ArrayData = {
    val a = automaton
    val counts = new Array[Long](patterns.length)
    val s = input.toString
    var node = 0
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      var n = node
      var next = a.child(n).get(c)
      while (next == null && n != 0) {
        n = a.fail(n)
        next = a.child(n).get(c)
      }
      node = if (next == null) 0 else next.intValue()
      val out = a.out(node)
      var j = 0
      while (j < out.length) {
        counts(out(j)) += 1L
        j += 1
      }
      i += 1
    }
    ArrayData.toArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    countsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acExpr", this, classOf[AhoCorasickCounts].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.countsOf($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "aho_corasick_counts"
}

object AhoCorasickCounts {

  /** child(n): char → next node; fail(n): longest proper-suffix node;
    * out(n): pattern indices ending at n (suffix-closed).
    */
  final case class Automaton(child: Array[java.util.HashMap[Character, Integer]],
      fail: Array[Int], out: Array[Array[Int]])

  def build(patterns: Seq[String]): Automaton = {
    val children = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val endings = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    // trie
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { c =>
        val nxt = children(node).get(c)
        node = if (nxt != null) nxt.intValue()
        else {
          children += new java.util.HashMap[Character, Integer]()
          endings += scala.collection.mutable.ArrayBuffer.empty[Int]
          val id = children.length - 1
          children(node).put(c, id)
          id
        }
      }
      endings(node) += pi
    }
    // BFS failure links; out = own endings ++ out(fail) (already complete
    // for shallower nodes when a node is dequeued)
    val n = children.length
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    out(0) = endings(0).toArray
    val queue = new java.util.ArrayDeque[Integer]()
    children(0).forEach { (_, v) =>
      fail(v) = 0
      out(v) = endings(v).toArray
      queue.add(v)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      children(u).forEach { (c, v) =>
        var f = fail(u)
        var t = children(f).get(c)
        while (t == null && f != 0) {
          f = fail(f)
          t = children(f).get(c)
        }
        val fv = if (t == null) 0 else t.intValue()
        fail(v) = if (fv == v.intValue()) 0 else fv
        out(v) = endings(v).toArray ++ out(fail(v))
        queue.add(v)
      }
    }
    Automaton(children.toArray, fail, out)
  }
}

object AhoCorasickExpressions {
  /** Column-level per-pattern occurrence counts backed by
    * [[AhoCorasickCounts]].
    */
  def multiPatternCounts(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(AhoCorasickCounts(
      ExpressionUtils.expression(text), patterns))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Temporal join operators Spark's built-in surface lacks: backward as-of
  * join and bounded-interval (range) join. Both are expressed as ONE
  * key-partitioned shuffle — never a BroadcastNestedLoopJoin — so they
  * survive a 1000-executor scale-up.
  *
  * The reference pipeline has no temporal joins (its whole surface is two
  * Glue ETL scripts — see SURVEY.md §2.5); these ship as engine extensions
  * for the event-stream side of a training-data pipeline (e.g. attribute
  * every impression to the latest prior purchase; count conversions within
  * an attribution window).
  */
object Temporal {

  /** Backward as-of join: for every left row, attach the single right row
    * with the same `key` and the greatest right `ts` ≤ the left row's `ts`
    * (LEFT semantics — unmatched left rows keep nulls).
    *
    * Implementation is union-tag + running window, NOT a range join: tag
    * right rows side=0 and left rows side=1, sort each key partition by
    * (ts, side) — so a right row at the exact left timestamp is visible to
    * it — and carry the latest right payload forward with
    * `last(_, ignoreNulls)` over an unbounded-preceding running frame.
    * Cost: one shuffle on `key`, O(1) window state per row, no candidate
    * blowup however dense the right side is. A per-key sort replaces the
    * per-pair predicate evaluation a non-equi join would do.
    *
    * Right rows must be unique per (key, ts) — with duplicates "the latest
    * right row" is ill-defined (DuckDB's ASOF JOIN has the same
    * precondition); pre-aggregate the right side to enforce it.
    *
    * Output: every left column, then `asof_<ts>` (the matched right
    * timestamp) and `asof_<v>` for each requested right value column.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightVals: Seq[String]): DataFrame = {
    val lPayType = StructType(left.schema.fields)
    val rPayType = StructType(
      StructField("__rts", right.schema(ts).dataType) +:
        rightVals.map(v => right.schema(v)))

    val l2 = left.select(
      col(key).as("__k"), col(ts).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__lpay"),
      lit(null).cast(rPayType).as("__rpay"))
    val r2 = right.select(
      col(key).as("__k"), col(ts).as("__t"), lit(0).as("__side"),
      lit(null).cast(lPayType).as("__lpay"),
      struct((col(ts).as("__rts") +: rightVals.map(col)).toIndexedSeq: _*)
        .as("__rpay"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l2.unionByName(r2)
      .withColumn("__asof", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(c => col(s"__lpay.$c").as(c)) ++
        (col("__asof.__rts").as(s"asof_$ts") +:
          rightVals.map(v => col(s"__asof.$v").as(s"asof_$v")))).toIndexedSeq: _*)
  }

  /** Bounded-interval range join: all (left, right) pairs with equal `key`
    * where `lower < right.ts − left.ts ≤ upper` (seconds). Returns inner
    * pairs — compose with a left join for outer counting.
    *
    * Implementation is the banded equi-join: both sides bucket their epoch
    * seconds by the window span W = upper − lower, the left side explodes
    * into the ≤2 candidate buckets its interval can overlap, the join runs
    * as a plain shuffled equi-join on (key, bucket), and the exact interval
    * predicate filters candidates inside the join condition. Cost: one
    * equi-shuffle and ≤2× left amplification — a naive non-equi join plans
    * as BroadcastNestedLoopJoin, which is O(|L|·|R|) and driver-bound.
    *
    * Column names other than `key` must be disjoint between the two inputs
    * (pre-project/rename); `leftTs`/`rightTs` are timestamp columns.
    */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      lowerExclusiveSec: Long, upperInclusiveSec: Long): DataFrame = {
    require(upperInclusiveSec > lowerExclusiveSec,
      "range join window must be non-empty")
    val span = upperInclusiveSec - lowerExclusiveSec

    // Right sec r matches iff lsec+lower < r ≤ lsec+upper, so r spans at
    // most ⌈span⌉ consecutive values → at most 2 buckets of width `span`.
    val l2 = left
      .withColumn("__lsec", unix_timestamp(col(leftTs)))
      .withColumn("__bucket", explode(array_distinct(array(
        floor((col("__lsec") + lit(lowerExclusiveSec) + lit(1)) / lit(span)),
        floor((col("__lsec") + lit(upperInclusiveSec)) / lit(span))))))
    val r2 = right
      .withColumnRenamed(key, "__rk")
      .withColumn("__rsec", unix_timestamp(col(rightTs)))
      .withColumn("__bucket2", floor(col("__rsec") / lit(span)))

    l2.join(r2,
        col(key) === col("__rk") && col("__bucket") === col("__bucket2") &&
          col("__rsec") > col("__lsec") + lit(lowerExclusiveSec) &&
          col("__rsec") <= col("__lsec") + lit(upperInclusiveSec))
      .drop("__lsec", "__bucket", "__rk", "__rsec", "__bucket2")
  }

  /** Interval-overlap join: all (left, right) pairs whose CLOSED intervals
    * `[lStart, lEnd]` and `[rStart, rEnd]` intersect (timestamp columns,
    * second precision). Inner pairs, every left/right column kept.
    *
    * Implementation is the grid-bucketed equi-join: each interval explodes
    * into the epoch-second buckets of width `bucketSec` it touches, the
    * join runs as a plain shuffled equi-join on the bucket, the exact
    * overlap predicate filters inside the join condition, and each
    * qualifying pair is emitted EXACTLY once — only in the bucket containing
    * `greatest(left start, right start)`, which overlapping intervals
    * always share (max of starts ≤ min of ends), so no post-join distinct
    * over wide rows is needed. A naive overlap theta-join plans as
    * BroadcastNestedLoopJoin — O(|L|·|R|) and driver-bound.
    *
    * Cost: amplification = interval length / `bucketSec` + 1 per row, so
    * size `bucketSec` to the TYPICAL interval length (amplification ≈ 2);
    * within a bucket the work is all-pairs, so the bucket width also bounds
    * the worst-case candidate count — the classic grid-join trade. Epoch
    * seconds must be non-negative (truncating `div` = floor there).
    * Column names must be disjoint between the two inputs (pre-rename).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketSec: Long): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val l2 = left
      .withColumn("__ls", unix_timestamp(col(lStart)))
      .withColumn("__le", unix_timestamp(col(lEnd)))
      .withColumn("__bk", explode(sequence(
        expr(s"__ls div ${bucketSec}L"), expr(s"__le div ${bucketSec}L"))))
    val r2 = right
      .withColumn("__rs", unix_timestamp(col(rStart)))
      .withColumn("__re", unix_timestamp(col(rEnd)))
      .withColumn("__bk2", explode(sequence(
        expr(s"__rs div ${bucketSec}L"), expr(s"__re div ${bucketSec}L"))))
    l2.join(r2,
        col("__bk") === col("__bk2") &&
          col("__ls") <= col("__re") && col("__rs") <= col("__le") &&
          col("__bk") === expr(s"greatest(__ls, __rs) div ${bucketSec}L"))
      .drop("__ls", "__le", "__bk", "__rs", "__re", "__bk2")
  }
}

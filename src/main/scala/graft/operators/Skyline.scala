package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, maximize both axes): the rows no other
  * row dominates, where p dominates q iff p.x ≥ q.x ∧ p.y ≥ q.y with at
  * least one strict — the "best trade-off set" query (price/recency
  * frontiers, quality/length frontiers for training-data selection).
  *
  * The 2-D case needs no dominance join: within one x value only the
  * max-y rows can survive (anything lower is dominated by that max in
  * strict y), and across the distinct x values — sorted descending — a
  * candidate survives iff its y strictly exceeds every higher-x
  * candidate's y. So the whole frontier is ONE map-combinable per-x max,
  * one running-max filter over the distinct-x candidates, and a semi-join
  * back that keeps every row tied with a frontier point (exact (x, y)
  * duplicates don't dominate each other, so all of them belong).
  *
  * Scale shape: the per-x reduction shuffles |distinct x| narrow rows;
  * the running-max filter is DISTRIBUTIVE (frontier(S) =
  * frontier(∪ᵢ frontier(x-slabᵢ))), so phase 1 filters per range
  * partition in parallel and only per-slab survivors — O(log n) of a
  * uniform-random slab — reach the single-partition phase-2 window. A
  * fully anticorrelated input degrades phase 2 to the full frontier;
  * that is the size of the ANSWER, not a plan defect.
  */
object Skyline {

  /** The Pareto-maximal rows of `df` under (`xCol`, `yCol`), both
    * maximized (negate a column upstream to minimize it). Exact
    * duplicates of a frontier point are all kept. Output: the input
    * columns, frontier rows only.
    */
  def skyline2(df: DataFrame, xCol: String, yCol: String,
      partitions: Int = 32): DataFrame = {
    val cand = df.groupBy(col(xCol)).agg(max(col(yCol)).as("__my"))
    def pass(in: DataFrame, part: Seq[org.apache.spark.sql.Column])
        : DataFrame = {
      val w = Window.partitionBy(part: _*).orderBy(col(xCol).desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      in.withColumn("__mp", max(col("__my")).over(w))
        .filter(col("__mp").isNull || col("__my") > col("__mp"))
        .drop("__mp")
    }
    val staged = cand
      .repartitionByRange(partitions, col(xCol).desc)
      .withColumn("__pid", spark_partition_id())
    val local = pass(staged, Seq(col("__pid")))
    val frontier = pass(local.withColumn("__pid", lit(0)), Seq(col("__pid")))
      .select(col(xCol), col("__my").as(yCol))
    df.join(frontier, Seq(xCol, yCol), "left_semi")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection — "keep the highest-quality documents
  * until the budget is spent" — WITHOUT the global sort that the naive
  * `ORDER BY quality DESC` + running-sum formulation needs (one reducer
  * holding 100 TB of ordered rows):
  *
  *  1. every row buckets against literal quality edges (exact order
  *     statistics at gate scale; at cluster scale feed edges from the
  *     mergeable quantile sketch — the operator only sees doubles);
  *  2. one bounded groupBy yields per-bucket costs; the cumulative
  *     best-first walk over ≤ |edges|+1 rows runs on the driver
  *     (model-state small);
  *  3. buckets strictly better than the boundary are kept WHOLE — no
  *     sort at all; only the single boundary bucket (~n/buckets rows)
  *     is ranked by one per-bucket window and cut at the remaining
  *     budget.
  *
  * Boundary ties break by id, costs are integer longs, and the edges are
  * plan literals — so the kept SET is deterministic and engine-exact,
  * which is what lets the oracle reproduce it row for row.
  */
object Budget {

  /** Rows of `df` selected best-quality-first until adding a row would
    * exceed `budget` total `costCol` (the greedy prefix of the
    * quality-descending order, computed boundary-bucket-locally).
    * Output: (`id`, `qualityCol`, `costCol`).
    */
  def selectByBudget(df: DataFrame, id: String, qualityCol: String,
      costCol: String, budget: Long, edges: Seq[Double]): DataFrame = {
    require(edges.nonEmpty, "need at least one quality edge")
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val bExpr = edges.map(e => when(col(qualityCol) > lit(e), 1).otherwise(0))
      .reduce(_ + _)
    val bucketed = df
      .select(col(id), col(qualityCol), col(costCol).cast("long").as("__cost"))
      .withColumn("__b", bExpr)
      .localCheckpoint() // scanned by the bucket costs and both keep branches
    val perBucket = bucketed.groupBy(col("__b"))
      .agg(sum(col("__cost")).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(-_._1) // best bucket first
    var remaining = budget
    var full = List.empty[Int]
    var boundary = -1
    perBucket.foreach { case (b, c) =>
      if (boundary < 0) {
        if (c <= remaining) { full = b :: full; remaining -= c }
        else boundary = b
      }
    }
    val fullDf =
      if (full.isEmpty) bucketed.filter(lit(false))
      else bucketed.filter(col("__b").isin(full: _*))
    val boundaryDf =
      if (boundary < 0) bucketed.filter(lit(false))
      else {
        val w = Window.partitionBy(col("__b"))
          .orderBy(col(qualityCol).desc, col(id))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bucketed.filter(col("__b") === boundary)
          .withColumn("__cum", sum(col("__cost")).over(w))
          .filter(col("__cum") <= remaining)
          .drop("__cum")
      }
    fullDf.unionByName(boundaryDf)
      .select(col(id), col(qualityCol), col("__cost").as(costCol))
  }
}

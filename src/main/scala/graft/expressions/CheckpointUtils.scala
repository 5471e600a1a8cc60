// Hosted under org.apache.spark.sql to reach the classic Dataset's
// queryExecution and the LogicalRDD node that backs a localCheckpoint —
// same packaging rationale as VectorExpressions.
package org.apache.spark.sql.graftx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle helper for iterative algorithms that localCheckpoint per round:
  * Spark gives no public handle on the RDD persisted by
  * `Dataset.localCheckpoint`, so superseded rounds would pin
  * MEMORY_AND_DISK blocks until the session dies (an n-round loop holds n
  * copies of the working set). This frees the blocks behind a checkpointed
  * DataFrame once the next round's checkpoint is materialized.
  */
object CheckpointUtils {

  /** Unpersist (non-blocking) every RDD backing a localCheckpoint in `df`'s
    * plan. No-op for plans with no checkpoint. Only call once nothing live
    * still reads from `df` — the blocks are gone, and the LogicalRDD has no
    * lineage to recompute them.
    */
  def unpersistLocalCheckpoint(df: DataFrame): Unit = df match {
    case d: ClassicDataset[_] =>
      d.queryExecution.analyzed
        .collect { case lr: LogicalRDD => lr.rdd }
        .foreach(_.unpersist(blocking = false))
    case _ => ()
  }

  /** BLOCKING unpersist of every persisted RDD in the session — the
    * between-samples hygiene the bench mains share. Queries that stage
    * intermediates via localCheckpoint (jaccard, tfidf, ivf, simhash, …)
    * pin MEMORY_AND_DISK RDDs nothing unpersists once the query returns;
    * across repeated samples the pinned sf0.1 materializations squeeze
    * execution memory under the unified manager and shuffle-heavy
    * queries start spilling (d_dedup_clusters measured 12.1 s in-bench
    * vs 3.2 s isolated before the purge; a multi-query BenchOne list
    * manufactured a 1.4× phantom the same way). BLOCKING because an
    * async unpersist bleeds its block-removal churn into the next timed
    * sample (measured: the query after a heavy purge inflates 2-4×).
    * Only call in an UNTIMED gap with no live frame still reading its
    * checkpoint.
    */
  def purgeAllPersisted(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
}

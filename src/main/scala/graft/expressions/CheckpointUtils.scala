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
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Stream-static enrichment: a streaming fact joined to a dimension
  * snapshot — the standard "enrich events with the customer table" shape
  * (the reference's gold tables aggregate one silver table; enrichment
  * joins are the north-star extension, see SURVEY §2.5).
  *
  * Scale posture: the join is STATELESS — unlike stream-stream joins there
  * is no watermark and no state store; each micro-batch joins against the
  * static side, which broadcasts (hinted), so the unbounded stream side
  * never shuffles for the join. A file-backed static side is re-resolved
  * per micro-batch, so dimension refreshes land without a restart. For a
  * dimension too large to broadcast, pre-bucket both sides on the key
  * (`io.Sinks.writeBucketed`) and the per-batch join plans exchange-free —
  * the same layout PlanSpec asserts for the batch fact⋈dim path.
  */
object StreamEnrich {

  /** Left-join `stream` to the static `dim` on `key`, broadcast-hinted.
    * Works identically on a batch frame (same plan), which is how the spec
    * proves stream ≡ batch.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}

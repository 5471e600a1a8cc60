package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the streaming expression of the batch
  * `Dedup.exactGroups` / `Cleaning.dedupByKey` operators.
  *
  * Two variants with different state-size contracts:
  *
  *   - [[dedupWithinWatermark]] keys state on the id column but evicts
  *     entries once the watermark passes their event time
  *     (`dropDuplicatesWithinWatermark`): state is bounded by (arrival rate ×
  *     watermark horizon), independent of total stream length. This is the
  *     only shape that survives a forever-running 100 TB/day ingest — exact
  *     global dedup state would grow without bound.
  *   - [[dedupExact]] (`dropDuplicates`) keeps every id seen since the query
  *     started. Kept for parity with the batch semantics and for bounded
  *     backfills, where the id universe fits in the state store.
  *
  * Duplicate-window semantics: within the watermark horizon, the FIRST
  * arrival wins and later copies are dropped — same keep-one contract as the
  * batch `dedupByKey` (which keeps an arbitrary row per key; the
  * deterministic variant orders explicitly).
  */
object StreamDedup {

  /** Bounded-state dedup: drop rows whose `idCols` were already seen within
    * the watermark horizon over `tsCol`.
    */
  def dedupWithinWatermark(
      events: DataFrame,
      tsCol: String,
      watermark: String,
      idCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Unbounded-state exact dedup (bounded backfills only). */
  def dedupExact(events: DataFrame, idCols: Seq[String]): DataFrame =
    events.dropDuplicates(idCols)
}

/** Stream-stream equi-join with event-time bounds — the streaming
  * expression of the batch temporal joins in `graft.operators.Temporal`.
  *
  * Both sides carry a watermark and the join condition bounds the
  * event-time distance, so the state store can evict rows on BOTH sides
  * once the other side's watermark passes the bound: state is (rate ×
  * (watermark + horizon)) per side, not the whole history. An unbounded
  * stream-stream join (no time condition) would pin both streams in state
  * forever — Spark rejects it in append mode, and so does this API by
  * construction.
  */
object StreamJoin {

  /** Join two event streams on `key` where the right event happens within
    * `[0, horizonMinutes]` AFTER the left event.
    *
    * Column contract: left columns keep their names; right contributes
    * `right_id` and `right_ts`. Inner join — unmatched rows age out of
    * state silently.
    */
  def joinWithinHorizon(
      left: DataFrame,
      right: DataFrame,
      key: String,
      watermark: String,
      horizonMinutes: Int): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right
      .withColumnRenamed("ts", "right_ts")
      .withColumnRenamed("event_id", "right_id")
      .withWatermark("right_ts", watermark)
    l.join(
      r,
      l(key) === r(key) &&
        col("right_ts") >= col("ts") &&
        col("right_ts") <= col("ts") + expr(s"INTERVAL $horizonMinutes MINUTES"))
      // explicit projection: a plain drop() leaves streaming and batch
      // plans with different column orders
      .select(left.columns.map(l(_)) :+ col("right_id") :+ col("right_ts"): _*)
  }
}

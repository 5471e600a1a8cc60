package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming windowed aggregations over an event stream — the Structured
  * Streaming expression of the batch `e_hourly_windows` query: tumbling
  * windows with a watermark bounding state.
  *
  * Scale posture: state is keyed (window × event_type) — low cardinality —
  * and the 2-hour watermark lets the state store evict closed windows, so a
  * forever-running stream holds a bounded number of open windows regardless
  * of input volume. Late rows inside the watermark update their window;
  * later ones are dropped (the batch gold recompute picks them up — same
  * late-data story as the reference's append+full-recompute).
  */
object EventStreamAggs {

  /** Hourly event-type counts and value totals with a 2-hour watermark.
    * Works on both streaming and batch DataFrames (same plan).
    */
  def hourlyByType(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
}

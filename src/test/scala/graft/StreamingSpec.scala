package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStreamAggs, Sessionize}

/** Structured Streaming: watermarked windowed aggregation driven through a
  * real streaming query (file source → memory sink), checked against the
  * identical batch plan.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming hourly windows equal the batch computation over the same files") {
    val dir = Files.createTempDirectory("graft-stream").toString
    // materialize events with micros timestamps (the raw testdata parquet is
    // TIMESTAMP(NANOS), unreadable by a fresh schema'd stream)
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"event_type", $"value")
    events.write.parquet(s"$dir/in")

    val stream = spark.readStream
      .schema(events.schema)
      .parquet(s"$dir/in")
    val q = EventStreamAggs.hourlyByType(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly_stream")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_stream")
        .orderBy($"window_start", $"event_type").collect()
      val batch = EventStreamAggs.hourlyByType(events)
        .orderBy($"window_start", $"event_type").collect()
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessions: closed stream output equals batch") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"ts", $"value")
    val tuples = events.as[(Long, Long, Timestamp, Double)].collect().toSeq
    val maxTs = tuples.map(_._3.getTime).max

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Timestamp, Double)]
    val input = ms.toDF().toDF("event_id", "user_id", "ts", "value")
    val q = Sessionize.sessionsStream(input, gapMinutes = 30, "1 second")
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_stream").start()
    try {
      ms.addData(tuples)
      q.processAllAvailable()
      // two flush batches: the first advances the watermark past every
      // real session's end + gap; the second makes the event-time timeouts
      // fire under that watermark
      ms.addData(Seq((-1L, -1L, new Timestamp(maxTs + 86400000L), 0.0)))
      q.processAllAvailable()
      ms.addData(Seq((-2L, -2L, new Timestamp(maxTs + 2 * 86400000L), 0.0)))
      q.processAllAvailable()
      val streamed = spark.table("sessions_stream")
        .filter($"user_id" >= 0)
        .orderBy($"user_id", $"session_start")
        .collect().toSeq
      val batch = Sessionize.sessionsBatch(events, gapMinutes = 30)
        .orderBy($"user_id", $"session_start")
        .collect().toSeq
      assert(batch.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("watermarked stream keeps bounded state keys (windows × types)") {
    val dir = Files.createTempDirectory("graft-stream2").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"event_type", $"value")
    events.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = EventStreamAggs.hourlyByType(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("hourly_bounded").start()
    try {
      q.processAllAvailable()
      val nKeys = spark.table("hourly_bounded").count()
      val expected = events
        .select(date_trunc("hour", $"ts").as("w"), $"event_type")
        .distinct().count()
      assert(nKeys == expected)
    } finally q.stop()
  }
}

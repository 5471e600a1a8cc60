package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

/** Edge-case tests for the temporal join operators: as-of tie/no-match
  * semantics and the range join's interval boundaries — including pairs
  * that straddle a bucket boundary, the case a broken banded implementation
  * silently drops.
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoinBackward: greatest right ts <= left ts; equal ts matches; no prior -> null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after both rights
      (2L, 10L, ts("2024-01-01 09:00:00")), // exactly at a right row
      (3L, 10L, ts("2024-01-01 07:59:59")), // before every right row
      (4L, 20L, ts("2024-01-01 12:00:00"))  // key with no right rows at all
    ).toDF("event_id", "user_id", "ts2")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), 1.0),
      (10L, ts("2024-01-01 09:00:00"), 2.0)
    ).toDF("user_id", "ts2", "pvalue")

    val out = Temporal.asofJoinBackward(left, right, "user_id", "ts2", Seq("pvalue"))
      .select(col("event_id"), col("asof_ts2"), col("asof_pvalue"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.toString), Option(r.get(2)))).toMap

    assert(out(1L) === (Some("2024-01-01 09:00:00.0"), Some(2.0)))
    assert(out(2L) === (Some("2024-01-01 09:00:00.0"), Some(2.0)))
    assert(out(3L) === (None, None))
    assert(out(4L) === (None, None))
  }

  test("asofJoinBackward keeps every left row exactly once") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 10:00:00")), // duplicate left ts is fine
      (3L, 10L, ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "ts2")
    val right = Seq((10L, ts("2024-01-01 09:00:00"), 7.0))
      .toDF("user_id", "ts2", "pvalue")
    val out = Temporal.asofJoinBackward(left, right, "user_id", "ts2", Seq("pvalue"))
    assert(out.count() === 3)
    assert(out.filter(col("asof_pvalue") === 7.0).count() === 3)
  }

  test("bandedRangeJoin: exclusive lower / inclusive upper boundaries") {
    // window (0, 600] after each left ts
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts2")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00")), // +0s: excluded (lower exclusive)
      (10L, ts("2024-01-01 10:00:01")), // +1s: included
      (10L, ts("2024-01-01 10:10:00")), // +600s: included (upper inclusive)
      (10L, ts("2024-01-01 10:10:01")), // +601s: excluded
      (20L, ts("2024-01-01 10:05:00"))  // other key: excluded
    ).toDF("user_id", "c_ts2")
    val pairs = Temporal.bandedRangeJoin(left, right, "user_id", "ts2", "c_ts2",
      lowerExclusiveSec = 0, upperInclusiveSec = 600)
    val got = pairs.select(col("c_ts2")).collect().map(_.get(0).toString).sorted
    assert(got === Array("2024-01-01 10:00:01.0", "2024-01-01 10:10:00.0"))
  }

  test("bandedRangeJoin finds pairs that straddle a bucket boundary") {
    // span = 600 so buckets are [..., 600k) epochs; pick a left ts near the
    // end of its bucket so every match lives in the NEXT bucket.
    val base = ts("2024-01-01 00:09:59") // epoch % 600 == 599
    val left = Seq((1L, 10L, base)).toDF("event_id", "user_id", "ts2")
    val right = Seq(
      (10L, ts("2024-01-01 00:10:30")), // +31s, next bucket: included
      (10L, ts("2024-01-01 00:19:58")), // +599s, next bucket: included
      (10L, ts("2024-01-01 00:20:00"))  // +601s: excluded
    ).toDF("user_id", "c_ts2")
    val pairs = Temporal.bandedRangeJoin(left, right, "user_id", "ts2", "c_ts2", 0, 600)
    assert(pairs.count() === 2)
  }

  test("bandedRangeJoin agrees with a naive non-equi join on random data") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 200).map(i =>
      (i.toLong, (i % 7).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)))
      .toDF("event_id", "user_id", "ts2")
    val right = (1 to 300).map(_ =>
      ((rnd.nextInt(9)).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)))
      .toDF("user_id", "c_ts2")
    val banded = Temporal.bandedRangeJoin(left, right, "user_id", "ts2", "c_ts2", 0, 600)
      .select(col("event_id"), col("c_ts2")).as[(Long, Timestamp)].collect().toSet
    val naive = left.as("l").join(right.as("r"),
        col("l.user_id") === col("r.user_id") &&
          unix_timestamp(col("c_ts2")) > unix_timestamp(col("l.ts2")) &&
          unix_timestamp(col("c_ts2")) <= unix_timestamp(col("l.ts2")) + 600)
      .select(col("event_id"), col("c_ts2")).as[(Long, Timestamp)].collect().toSet
    assert(naive.nonEmpty && banded === naive)
  }

  test("intervalOverlapJoin matches the naive theta join, each pair once") {
    // intervals spanning 1-3 hour buckets, exact-touch boundaries (closed
    // intervals: end == start overlaps), nested and disjoint cases
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      (2L, ts("2024-01-01 10:59:00"), ts("2024-01-01 13:05:00")), // 4 buckets
      (3L, ts("2024-01-01 15:00:00"), ts("2024-01-01 15:00:00")) // point
    ).toDF("lid", "st_a", "en_a")
    val right = Seq(
      (10L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:10:00")), // touches 1, overlaps 2
      (20L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:01")), // inside 2
      (30L, ts("2024-01-01 14:00:00"), ts("2024-01-01 15:00:00")), // touches 3
      (40L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:59:59")) // disjoint
    ).toDF("rid", "st_b", "en_b")
    val got = Temporal.intervalOverlapJoin(left, right,
        "st_a", "en_a", "st_b", "en_b", bucketSec = 3600L)
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSeq
    val naive = left.join(right,
        unix_timestamp(col("st_a")) <= unix_timestamp(col("en_b")) &&
          unix_timestamp(col("st_b")) <= unix_timestamp(col("en_a")))
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSeq
    assert(got.size === got.toSet.size, "a pair was emitted twice")
    assert(got.toSet === naive.toSet)
    assert(got.toSet === Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("temporal query plans never fall back to BroadcastNestedLoopJoin") {
    val dir = "/root/testdata/sf0.001"
    Seq("e_asof_purchase", "e_range_clicks", "e_overlap_sessions").foreach { q =>
      val p = SparkEntry.queries(q)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
    }
  }

  test("SAX motifs: rank-quartile symbols on a monotone series give the " +
      "staircase motif counts, per-user discretization is independent") {
    // user 1: strictly increasing values 1..8 in time order ->
    // symbols 0 0 1 1 2 2 3 3 -> motifs 001,011,112,122,223,233
    // user 2: decreasing 4-value series -> symbols 3 2 1 0 -> 321, 210
    val rows =
      (1 to 8).map(i => (1L, i.toLong, ts(f"2024-01-01 00:00:0${i - 1}"),
        i.toDouble)) ++
      (1 to 4).map(i => (2L, 100L + i, ts(f"2024-01-01 00:01:0${i - 1}"),
        (10 - i).toDouble))
    val df = rows.toDF("user_id", "event_id", "ts", "value")
    val tmp = java.nio.file.Files.createTempDirectory("sax").toString
    df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // reuse the real table loader path so ts normalization is exercised
    val got = graft.SparkEntry.queries("e_sax_motifs")(spark, tmp)
      .as[(String, Long)].collect().toMap
    val want = Map("001" -> 1L, "011" -> 1L, "112" -> 1L, "122" -> 1L,
      "223" -> 1L, "233" -> 1L, "321" -> 1L, "210" -> 1L)
    assert(got === want, got.toString)
  }
}

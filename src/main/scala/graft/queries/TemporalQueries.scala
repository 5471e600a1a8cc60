package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Temporal

/** Temporal-join queries over the `events` table, exercising
  * [[graft.operators.Temporal]]: backward as-of enrichment (attribute each
  * click to the latest prior purchase) and bounded-interval counting
  * (clicks within 10 minutes after each purchase).
  *
  * Both DuckDB oracles use the engine-native formulations (ASOF JOIN /
  * non-equi join) — structurally different implementations, so a hash match
  * is strong evidence the banded/windowed Spark plans are semantically
  * right. Event timestamps are truncated to seconds first (the parquet ts
  * is nanos; see Tables.events).
  */
object TemporalQueries extends QueryPack {

  private def ev(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts2"), col("value"))

  override def queries: Map[String, Query] = Map(
    // As-of: every click joined to the latest purchase (same user) at or
    // before the click. Purchases pre-aggregate to unique (user, ts) —
    // the as-of precondition — keeping the max value on ties.
    "e_asof_purchase" -> ((s, dir) => {
      val e = ev(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts2"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts2"))
        .agg(max(col("value")).as("pvalue"))
      Temporal.asofJoinBackward(clicks, purchases, "user_id", "ts2",
          Seq("pvalue"))
        .select(col("event_id"), col("user_id"),
          col("asof_ts2").as("purchase_ts"),
          col("asof_pvalue").as("purchase_value"))
        .orderBy(col("event_id"))
    }),

    // Range join: clicks of the same user within (0, 600] seconds after
    // each purchase, counted per purchase (zero-click purchases kept).
    "e_range_clicks" -> ((s, dir) => {
      val e = ev(s, dir)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts2"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts2").as("c_ts2"))
      val pairs = Temporal.bandedRangeJoin(p, c, "user_id", "ts2", "c_ts2",
        lowerExclusiveSec = 0, upperInclusiveSec = 600)
      val counts = pairs.groupBy(col("event_id")).agg(count(lit(1)).as("__n"))
      p.join(counts, Seq("event_id"), "left_outer")
        .select(col("event_id"), col("user_id"),
          coalesce(col("__n"), lit(0L)).as("n_clicks_10m"))
        .orderBy(col("event_id"))
    }),

    // Interval-overlap join: concurrent sessions of DIFFERENT users —
    // sessionize (30-min gap), then grid-bucket the session intervals into
    // hour cells and equi-join on the cell (the 30-min gap bounds the
    // spacing BETWEEN events, not session length, so a long event chain can
    // span many cells and bucket amplification grows with session length —
    // unbounded in principle; correctness is unaffected because the
    // emit-once bucket condition below is independent of interval length,
    // and no pair needs a distinct;
    // the oracle is DuckDB's native theta overlap join — a structurally
    // different plan). Output: per user pair, overlap count and total
    // overlapping seconds — all integer arithmetic, engine-exact.
    "e_overlap_sessions" -> ((s, dir) => {
      val sess = graft.streaming.Sessionize
        .sessionsBatch(Tables.load(s, dir, "events"), gapMinutes = 30)
        .select(col("user_id"), col("session_start"), col("session_end"))
        .localCheckpoint() // sessionized once, self-joined below
      val a = sess.select(col("user_id").as("user_a"),
        col("session_start").as("st_a"), col("session_end").as("en_a"))
      val b = sess.select(col("user_id").as("user_b"),
        col("session_start").as("st_b"), col("session_end").as("en_b"))
      Temporal.intervalOverlapJoin(a, b, "st_a", "en_a", "st_b", "en_b",
          bucketSec = 3600L)
        .filter(col("user_a") < col("user_b"))
        .groupBy(col("user_a"), col("user_b"))
        .agg(count(lit(1)).as("n_overlaps"),
          sum(least(unix_timestamp(col("en_a")), unix_timestamp(col("en_b"))) -
            greatest(unix_timestamp(col("st_a")), unix_timestamp(col("st_b"))))
            .as("overlap_sec"))
        .orderBy(col("user_a"), col("user_b"))
    }))

  override def oracleSql: Map[String, String] = Map(
    "e_asof_purchase" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    date_trunc('second', ts) AS ts2, value FROM events),
        |c AS (SELECT event_id, user_id, ts2 FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts2, max(value) AS pvalue FROM e
        |      WHERE event_type = 'purchase' GROUP BY user_id, ts2)
        |SELECT c.event_id, c.user_id, p.ts2 AS purchase_ts,
        |  p.pvalue AS purchase_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts2 >= p.ts2
        |ORDER BY c.event_id""".stripMargin,

    "e_range_clicks" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    date_trunc('second', ts) AS ts2 FROM events),
        |p AS (SELECT event_id, user_id, ts2 FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts2 FROM e WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, COUNT(c.ts2) AS n_clicks_10m
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND date_diff('second', p.ts2, c.ts2) > 0
        |  AND date_diff('second', p.ts2, c.ts2) <= 600
        |GROUP BY p.event_id, p.user_id
        |ORDER BY p.event_id""".stripMargin,

    "e_overlap_sessions" ->
      """WITH e AS (SELECT event_id, user_id, date_trunc('second', ts) AS ts2
        |  FROM events),
        |m AS (SELECT *, CASE WHEN lag(ts2) OVER w IS NULL
        |    OR date_diff('second', lag(ts2) OVER w, ts2) > 1800 THEN 1 ELSE 0
        |    END AS nw
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts2, event_id)),
        |s AS (SELECT *, SUM(nw) OVER (PARTITION BY user_id
        |    ORDER BY ts2, event_id) AS sid
        |  FROM m),
        |sess AS (SELECT user_id, min(ts2) AS st, max(ts2) AS en
        |  FROM s GROUP BY user_id, sid)
        |SELECT a.user_id AS user_a, b.user_id AS user_b,
        |  CAST(count(*) AS BIGINT) AS n_overlaps,
        |  CAST(SUM(date_diff('second', greatest(a.st, b.st),
        |    least(a.en, b.en))) AS BIGINT) AS overlap_sec
        |FROM sess a JOIN sess b ON a.user_id < b.user_id
        |  AND a.st <= b.en AND b.st <= a.en
        |GROUP BY a.user_id, b.user_id
        |ORDER BY user_a, user_b""".stripMargin)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.Tables
import graft.ops.{Aggregations, Cleaning, Derivations}

/** The reference pipeline's operator surface (SURVEY.md §2: P1–P7, E1–E11,
  * A1–A4) declared as oracle-checked queries over the driver testdata.
  *
  * The `events` table plays the bronze transaction stream (FIXTURES.md §4):
  * event_id→transaction_id, user_id→customer_id, value→amount,
  * ts→transaction_date, event_type→transaction_type.
  *
  * Timestamps are truncated to seconds at the source view: the parquet stores
  * nanosecond precision, which Spark (micros) and DuckDB read differently;
  * second truncation makes both engines agree exactly, mirroring the
  * reference's second-granularity `yyyy-MM-dd HH:mm:ss` dates.
  */
object PipelineQueries extends QueryPack {

  /** Bronze view: events projected into the transaction shape. */
  def transactions(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events").select(
      col("event_id").cast(StringType).as("transaction_id"),
      col("user_id").cast(StringType).as("customer_id"),
      col("value").as("amount"),
      date_trunc("second", col("ts")).as("transaction_date"),
      col("event_type").as("transaction_type"))

  private val txSql =
    """tx AS (
      |  SELECT CAST(event_id AS VARCHAR) AS transaction_id,
      |         CAST(user_id AS VARCHAR) AS customer_id,
      |         value AS amount,
      |         date_trunc('second', ts) AS transaction_date,
      |         event_type AS transaction_type
      |  FROM events
      |)""".stripMargin

  /** Silver pipeline: P2+P3 filters → P1 dedup (deterministic variant) →
    * E4 quality score → E6 date parts → E7/E8 buckets.
    * (E5 processed_timestamp and gold created_at are wall-clock columns — they
    * live in the job layer, [[graft.jobs]], not in oracle-compared queries.)
    */
  def cleaned(spark: SparkSession, dir: String): DataFrame = {
    val tx = transactions(spark, dir)
    val filtered = Cleaning.positiveAmount(
      Cleaning.requireNonNull(tx,
        Seq("transaction_id", "customer_id", "amount", "transaction_date")))
    val deduped = Cleaning.dedupDeterministic(filtered, "transaction_id",
      Seq(col("transaction_date"), col("amount"), col("customer_id")))
    Derivations.withIntegralityTag(
      Derivations.withAmountCategory(
        Derivations.withDateParts(
          Derivations.withQualityScore(deduped))))
  }

  /** Shared oracle CTE chain mirroring [[cleaned]]. */
  private val cleanedSql =
    s"""WITH $txSql, filtered AS (
       |  SELECT * FROM tx
       |  WHERE transaction_id IS NOT NULL AND customer_id IS NOT NULL
       |    AND amount IS NOT NULL AND transaction_date IS NOT NULL
       |    AND amount > 0
       |), deduped AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY transaction_id
       |      ORDER BY transaction_date, amount, customer_id) AS __rn
       |    FROM filtered) WHERE __rn = 1
       |), cleaned AS (
       |  SELECT transaction_id, customer_id, amount, transaction_date,
       |    transaction_type,
       |    CAST(1.0 AS DOUBLE) AS data_quality_score,
       |    CAST(year(transaction_date) AS INTEGER) AS year,
       |    CAST(month(transaction_date) AS INTEGER) AS month,
       |    CAST(day(transaction_date) AS INTEGER) AS day,
       |    CAST(hour(transaction_date) AS INTEGER) AS hour,
       |    CASE WHEN amount < 100 THEN 'small'
       |         WHEN amount < 1000 THEN 'medium'
       |         ELSE 'large' END AS amount_category,
       |    CASE WHEN amount = trunc(amount) THEN 'whole_number'
       |         ELSE 'decimal' END AS transaction_type_derived
       |  FROM deduped
       |)""".stripMargin

  // decimal→varchar→double: see Aggregations.sumStable for why the string hop
  private val stableSum =
    "CAST(CAST(SUM(CAST(amount AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"

  private val aggMeasuresSql =
    s"""COUNT(transaction_id) AS transaction_count,
       |  $stableSum AS total_amount,
       |  $stableSum / COUNT(amount) AS avg_amount,
       |  MIN(amount) AS min_amount,
       |  MAX(amount) AS max_amount,
       |  COUNT(DISTINCT transaction_id) AS unique_transactions""".stripMargin

  override def queries: Map[String, Query] = Map(
    "p_parse_timestamp" -> ((s, dir) =>
      // E1: string→timestamp parse with null-on-failure semantics
      // (bronze_to_silver.py:123). Round-trips ts through the reference's
      // wire format.
      Tables.load(s, dir, "events").select(
        col("event_id"),
        to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
          "yyyy-MM-dd HH:mm:ss").as("parsed_ts"))
        .orderBy(col("event_id"))),

    "p_clean_transactions" -> ((s, dir) =>
      cleaned(s, dir).orderBy(col("transaction_id"))),

    "p_daily_agg" -> ((s, dir) =>
      Aggregations.daily(cleaned(s, dir))
        .orderBy(col("year"), col("month"), col("day"), col("customer_id"))),

    "p_monthly_agg" -> ((s, dir) =>
      Aggregations.monthly(cleaned(s, dir))
        .orderBy(col("year"), col("month"), col("customer_id"))),

    "p_customer_insights" -> ((s, dir) =>
      Aggregations.customerInsights(cleaned(s, dir))
        .orderBy(col("customer_id"))),

    "p_quality_counts" -> ((s, dir) => {
      // A4/P6: conservation metrics — initial vs post-clean row counts
      // (bronze_to_silver.py:30,47,118). One row.
      val initial = transactions(s, dir).agg(count(lit(1)).as("initial_count"))
      val fin = cleaned(s, dir).agg(count(lit(1)).as("final_count"))
      initial.crossJoin(fin)
    }),

    // One-pass column profiler: every metric for every profiled column
    // comes out of ONE aggregation over ONE scan (the per-column-loop
    // alternative is N full scans of 100 TB). Exact distincts + decimal-
    // exact means keep the row hash engine-independent.
    "p_profile_columns" -> ((s, dir) =>
      graft.ops.Profile.numericProfile(
        Tables.load(s, dir, "documents"), Seq("doc_id", "n_chars"))
        .orderBy(col("column"))),

    // Incremental gold maintenance gate: the cleaned transactions re-played
    // as 3 MONTH-SLICED silver batches through SilverToGold.runIncremental
    // — each run re-aggregates and dynamically overwrites only the y/m
    // partitions its batch touches, from a silver scan statically pruned
    // to those partitions. The final on-disk gold daily table must equal
    // the one-shot full aggregation (the p_daily_agg oracle): per-partition
    // re-aggregation is idempotent in how the rows arrived. Batch subdirs
    // are overwritten per invocation (idempotent under bench re-runs);
    // the path is applicationId-suffixed (no cross-JVM race).
    "p_gold_incremental" -> ((s, dir) => {
      import graft.jobs.SilverToGold
      val base = cleaned(s, dir).localCheckpoint()
      val tmp = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_gold_inc_${s.sparkContext.applicationId}").toString
      val cfg = graft.config.PipelineConfig(
        rawPath = tmp, silverPath = s"$tmp/silver", goldPath = s"$tmp/gold",
        clock = Some(java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
      for (i <- 0 until 3) {
        val batch = base.filter(pmod(col("month"), lit(3)) === i)
          .localCheckpoint()
        batch.hint("rebalance", "year", "month", "day") // see Sinks.writeSilver
          .write.mode("overwrite")
          .partitionBy("year", "month", "day")
          .option("compression", "snappy")
          .parquet(s"$tmp/silver/batch=$i")
        SilverToGold.runIncremental(s, cfg, batch)
      }
      s.read.parquet(cfg.goldDailyPath)
        .select(col("year"), col("month"), col("day"), col("customer_id"),
          col("transaction_count"), col("total_amount"), col("avg_amount"),
          col("min_amount"), col("max_amount"), col("unique_transactions"),
          col("aggregation_level"))
        .orderBy(col("year"), col("month"), col("day"), col("customer_id"))
    }),

    // WARC/WET crawl ingestion: every document is framed as a real
    // WARC/1.0 record, records pack 8-per-archive with EACH record its own
    // gzip member (the WET random-access convention), and the parser walks
    // the inflated stream back to rows by the spec's framing (version
    // line, headers, Content-Length-bounded body). The oracle recomputes
    // every field from the encode law — a hash match proves the
    // multi-member gzip round trip, the header parse, and the octet-exact
    // body framing (content_length is UTF-8 bytes, not chars).
    "s_warc_ingest" -> ((s, dir) => {
      import s.implicits._
      import graft.io.Warc
      val archives = Tables.load(s, dir, "documents")
        .select(expr("doc_id div 8").as("aid"),
          struct(col("doc_id"), col("source"), col("text")).as("r"))
        .groupBy(col("aid"))
        .agg(sort_array(collect_list(col("r"))).as("rs"))
        .as[(Long, Seq[(Long, String, String)])]
        .map { case (aid, rs) =>
          (s"arc$aid", Warc.encodeArchive(rs.map { case (id, src, text) =>
            Warc.WarcRecord("conversion", s"urn:graft:$id",
              s"http://$src.example/$id",
              Option(text).getOrElse("").getBytes("UTF-8"))
          }))
        }
      Warc.docsFromArchives(archives).toDF()
        .select(substring(col("record_id"), 11, 20).cast("long").as("doc_id"),
          col("record_type"), col("target_uri"), col("content_length"),
          md5(col("text")).as("text_md5"))
        .orderBy(col("doc_id"))
    }),

    // Erasure PROVENANCE card gate: same pipeline as p_gdpr_erasure, but
    // the checked output is the tombstone card runErasure publishes once
    // every tier's mutation has succeeded (counts measured pre-mutation)
    // — per touched partition per tier, how many of the subject's
    // rows existed. The oracle recomputes every count from the cleaned
    // law: silver rows per day partition, gold daily/monthly aggregate
    // rows per their partitions (distinct group keys containing an erased
    // customer), and the customer-table row count. Consumers prove
    // freshness against the epoch instead of re-scanning for the subject.
    "p_erasure_card" -> ((s, dir) => {
      import graft.jobs.SilverToGold
      val base = cleaned(s, dir).localCheckpoint()
      val tmp = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_gdpr_card_${s.sparkContext.applicationId}").toString
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // clean re-runs
      val cfg = graft.config.PipelineConfig(
        rawPath = tmp, silverPath = s"$tmp/silver", goldPath = s"$tmp/gold",
        clock = Some(java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
      base.hint("rebalance", "year", "month", "day") // see Sinks.writeSilver
        .write.partitionBy("year", "month", "day")
        .option("compression", "snappy").parquet(cfg.silverPath)
      SilverToGold.run(s, cfg)
      val erased = base
        .filter(substring(md5(col("customer_id")), 1, 1) === "0")
        .select(col("customer_id")).distinct()
      SilverToGold.runErasure(s, cfg, erased,
        provenance = Some((s"$tmp/provenance", 42L)))
      s.read.parquet(s"$tmp/provenance")
        .select(col("tombstone_epoch"), col("tier"), col("partition"),
          col("rows_erased"))
        .orderBy(col("tier"), col("partition"))
    }),

    // Snapshot-versioned table with erasure-aware redaction: two appends
    // commit two time-travelable versions; an erasure rewrites only the
    // touched segments, purges the replaced bytes, and floors time travel
    // at the new version (reads below the floor throw — resurrecting an
    // erased subject via an old manifest is the failure mode table
    // formats hide). The oracle recomputes each version's row count and
    // content checksum plus the post-erasure readability flags.
    "s_versioned_read" -> ((s, dir) => {
      import graft.io.Versioned
      val docs = Tables.load(s, dir, "documents").localCheckpoint()
      val tmp = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_versioned_${s.sparkContext.applicationId}").toString
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // clean re-runs
      Versioned.append(s, tmp, docs.filter(pmod(col("doc_id"), lit(2)) === 0))
      Versioned.append(s, tmp, docs.filter(pmod(col("doc_id"), lit(2)) =!= 0))
      def stats(v: Int) = Versioned.read(s, tmp, v)
        .agg(count(lit(1)).as("n_rows"),
          sum(conv(substring(md5(concat(col("doc_id").cast("string"),
            lit(":"), col("text"))), 1, 8), 16, 10).cast("long"))
            .as("checksum"))
        .select(lit(v).as("version"), col("n_rows"), col("checksum"))
      // pre-erasure snapshots must evaluate BEFORE the erase (laziness)
      val before = stats(0).unionByName(stats(1)).localCheckpoint()
      Versioned.erase(s, tmp,
        docs.filter(substring(md5(col("doc_id").cast("string")), 1, 1)
          === "0").select(col("doc_id")),
        "doc_id", tombstoneEpoch = 7L)
      def readable(v: Int): Int =
        try { Versioned.read(s, tmp, v).limit(1).count(); 1 }
        catch { case _: IllegalStateException => 0 }
      import s.implicits._
      val flags = Seq(0, 1, 2).map(v => (v, readable(v)))
        .toDF("version", "readable")
      before.unionByName(stats(2)).join(flags, Seq("version"))
        .orderBy(col("version"))
    }),

    // Manifest-level DATA SKIPPING on the versioned table: three id-range
    // appends record per-segment doc_id min/max stats; a range read
    // covering exactly the middle segment must (a) return precisely the
    // range law's rows — the residual filter keeps skipping an I/O
    // decision, never a semantic one — and (b) OPEN exactly one segment
    // (segs_read is derived from the files the returned plan actually
    // scans, so a pruning regression flips it to 3 and the hash check
    // fails). The oracle recomputes rows + checksum from the same
    // id-range arithmetic and states the expected segment counts.
    "s_versioned_skip" -> ((s, dir) => {
      import graft.io.Versioned
      val docs = Tables.load(s, dir, "documents").localCheckpoint()
      val tmp = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_vskip_${s.sparkContext.applicationId}").toString
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // clean re-runs
      val w = docs.agg(max(col("doc_id"))).head().getLong(0) / 3 + 1
      for (i <- 0L until 3L)
        Versioned.append(s, tmp, docs.filter(expr(s"doc_id div $w") === i),
          statsCols = Seq("doc_id"))
      val pruned = Versioned.readWhere(s, tmp, "doc_id", w, 2 * w - 1)
      val segsRead = pruned.inputFiles
        .map(f => new java.io.File(f).getParent).distinct.length
      pruned.agg(count(lit(1)).as("n_rows"),
          sum(conv(substring(md5(concat(col("doc_id").cast("string"),
            lit(":"), col("text"))), 1, 8), 16, 10).cast("long"))
            .as("checksum"))
        .select(col("n_rows"), col("checksum"),
          lit(3).as("segs_total"), lit(segsRead).as("segs_read"))
    }),

    // BLOOM-sidecar equality skipping: three segments hold INTERLEAVED
    // doc_id classes (mod 3), so min/max ranges fully overlap and can
    // prune nothing — the per-segment bloom alone must reject the two
    // segments that cannot hold the key (no statsCols recorded, to
    // prove the bloom does the work). segs_read derives from the files
    // the returned plan actually opens; the residual filter keeps a
    // (1e-3, fixed-seed-deterministic) false positive an I/O cost only.
    "s_versioned_bloom" -> ((s, dir) => {
      import graft.io.Versioned
      val docs = Tables.load(s, dir, "documents").localCheckpoint()
      val tmp = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_vbloom_${s.sparkContext.applicationId}").toString
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // clean re-runs
      for (i <- 0 until 3)
        Versioned.append(s, tmp,
          docs.filter(pmod(col("doc_id"), lit(3)) === i),
          bloomCols = Seq("doc_id"))
      val hit = Versioned.readEquals(s, tmp, "doc_id", 41L)
      val segsRead = hit.inputFiles
        .map(f => new java.io.File(f).getParent).distinct.length
      hit.agg(count(lit(1)).as("n_rows"),
          sum(conv(substring(md5(concat(col("doc_id").cast("string"),
            lit(":"), col("text"))), 1, 8), 16, 10).cast("long"))
            .as("checksum"))
        .select(col("n_rows"), col("checksum"),
          lit(3).as("segs_total"), lit(segsRead).as("segs_read"))
    }),

    // GDPR erasure gate: full silver + gold, then forget every customer
    // whose md5 starts with '0' (~1/16 of them, both engines derive the
    // same set) through the partition-restricted erasure job. The final
    // ON-DISK gold daily table must equal a from-scratch recompute over
    // cleaned-minus-erased — proving the day-partition rewrite, the
    // touched-gold re-aggregation, and the emptied-partition drops
    // compose to exactly "as if they never existed".
    "p_gdpr_erasure" -> ((s, dir) => {
      import graft.jobs.SilverToGold
      val base = cleaned(s, dir).localCheckpoint()
      val tmp = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_gdpr_${s.sparkContext.applicationId}").toString
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // clean re-runs
      val cfg = graft.config.PipelineConfig(
        rawPath = tmp, silverPath = s"$tmp/silver", goldPath = s"$tmp/gold",
        clock = Some(java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
      base.hint("rebalance", "year", "month", "day") // see Sinks.writeSilver
        .write.partitionBy("year", "month", "day")
        .option("compression", "snappy").parquet(cfg.silverPath)
      SilverToGold.run(s, cfg)
      val erased = base
        .filter(substring(md5(col("customer_id")), 1, 1) === "0")
        .select(col("customer_id")).distinct()
      SilverToGold.runErasure(s, cfg, erased)
      s.read.parquet(cfg.goldDailyPath)
        .select(col("year"), col("month"), col("day"), col("customer_id"),
          col("transaction_count"), col("total_amount"), col("avg_amount"),
          col("min_amount"), col("max_amount"), col("unique_transactions"),
          col("aggregation_level"))
        .orderBy(col("year"), col("month"), col("day"), col("customer_id"))
    }))

  override def oracleSql: Map[String, String] = Map(
    // the WARC encode law replayed directly: identity fields from the
    // document row, content_length = UTF-8 octet length of the body
    "s_warc_ingest" ->
      """SELECT doc_id, 'conversion' AS record_type,
        |  'http://' || source || '.example/' || CAST(doc_id AS VARCHAR)
        |    AS target_uri,
        |  CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT)
        |    AS content_length,
        |  md5(coalesce(text, '')) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // per-version row counts + 32-bit-md5-slice checksums; v0/v1 are
    // unreadable after the erasure (redaction floor), v2 is the retained
    // corpus
    "s_versioned_read" ->
      """WITH cs AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
        |      1, 8)) AS BIGINT) AS h,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' AS erased
        |  FROM documents)
        |SELECT 0 AS version, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(h) AS BIGINT) AS checksum, 0 AS readable
        |FROM cs WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT 1, CAST(count(*) AS BIGINT), CAST(sum(h) AS BIGINT), 0
        |FROM cs
        |UNION ALL
        |SELECT 2, CAST(count(*) AS BIGINT), CAST(sum(h) AS BIGINT), 1
        |FROM cs WHERE NOT erased
        |ORDER BY version""".stripMargin,

    // exactly one mod-3 segment holds doc 41, and the bloom (fpp 1e-3,
    // deterministic fixed-seed hashes over fixed fixture data) rejects
    // the other two — segs_read is 1 by the law
    "s_versioned_bloom" ->
      """WITH x AS (SELECT doc_id, text FROM documents WHERE doc_id = 41)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |    || ':' || text), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum,
        |  3 AS segs_total, 1 AS segs_read
        |FROM x""".stripMargin,

    // the middle id-range segment's rows + checksum; exactly one of the
    // three segments can hold the range, so segs_read is 1 by the law
    "s_versioned_skip" ->
      """WITH b AS (SELECT max(doc_id) // 3 + 1 AS w FROM documents),
        |x AS (SELECT d.doc_id, d.text FROM documents d, b
        |      WHERE d.doc_id >= b.w AND d.doc_id <= 2 * b.w - 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |    || ':' || text), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum,
        |  3 AS segs_total, 1 AS segs_read
        |FROM x""".stripMargin,

    "p_profile_columns" ->
      """WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(CASE WHEN doc_id IS NULL THEN 1 END) AS BIGINT) AS d_nulls,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS d_distinct,
        |  min(CAST(doc_id AS DOUBLE)) AS d_min,
        |  max(CAST(doc_id AS DOUBLE)) AS d_max,
        |  CAST(CAST(SUM(CAST(doc_id AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
        |    / count(doc_id) AS d_mean,
        |  CAST(count(CASE WHEN n_chars IS NULL THEN 1 END) AS BIGINT) AS c_nulls,
        |  CAST(count(DISTINCT n_chars) AS BIGINT) AS c_distinct,
        |  min(CAST(n_chars AS DOUBLE)) AS c_min,
        |  max(CAST(n_chars AS DOUBLE)) AS c_max,
        |  CAST(CAST(SUM(CAST(n_chars AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
        |    / count(n_chars) AS c_mean
        |  FROM documents)
        |SELECT 'doc_id' AS "column", n_rows, d_nulls AS n_nulls,
        |  d_distinct AS n_distinct, d_min AS min_val, d_max AS max_val,
        |  d_mean AS mean_val FROM a
        |UNION ALL
        |SELECT 'n_chars', n_rows, c_nulls, c_distinct, c_min, c_max, c_mean
        |FROM a ORDER BY "column"""".stripMargin,

    "p_parse_timestamp" ->
      """SELECT event_id,
        |  strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed_ts
        |FROM events ORDER BY event_id""".stripMargin,

    "p_clean_transactions" ->
      s"$cleanedSql SELECT * FROM cleaned ORDER BY transaction_id",

    "p_daily_agg" ->
      s"""$cleanedSql
         |SELECT year, month, day, customer_id,
         |  $aggMeasuresSql,
         |  'daily' AS aggregation_level
         |FROM cleaned GROUP BY year, month, day, customer_id
         |ORDER BY year, month, day, customer_id""".stripMargin,

    "p_monthly_agg" ->
      s"""$cleanedSql
         |SELECT year, month, customer_id,
         |  $aggMeasuresSql,
         |  'monthly' AS aggregation_level
         |FROM cleaned GROUP BY year, month, customer_id
         |ORDER BY year, month, customer_id""".stripMargin,

    "p_customer_insights" ->
      s"""$cleanedSql
         |SELECT customer_id,
         |  COUNT(transaction_id) AS lifetime_transactions,
         |  $stableSum AS lifetime_value,
         |  $stableSum / COUNT(amount) AS avg_transaction_amount,
         |  MIN(transaction_date) AS first_transaction_date,
         |  MAX(transaction_date) AS last_transaction_date,
         |  COUNT(DISTINCT (year, month, day)) AS active_days,
         |  CAST(datediff('day', CAST(MIN(transaction_date) AS DATE),
         |       CAST(MAX(transaction_date) AS DATE)) AS INTEGER) AS customer_tenure_days,
         |  CASE WHEN $stableSum > 10000 THEN 'high_value'
         |       WHEN $stableSum > 5000 THEN 'medium_value'
         |       ELSE 'low_value' END AS customer_segment
         |FROM cleaned GROUP BY customer_id ORDER BY customer_id""".stripMargin,

    "p_quality_counts" ->
      s"""$cleanedSql
         |SELECT (SELECT COUNT(*) FROM tx) AS initial_count,
         |       (SELECT COUNT(*) FROM cleaned) AS final_count""".stripMargin,

    // the incremental maintenance must land exactly on the full recompute
    "p_gold_incremental" ->
      s"""$cleanedSql
         |SELECT year, month, day, customer_id,
         |  $aggMeasuresSql,
         |  'daily' AS aggregation_level
         |FROM cleaned GROUP BY year, month, day, customer_id
         |ORDER BY year, month, day, customer_id""".stripMargin,

    // every provenance count recomputed from the cleaned law; the card's
    // gold rows are the aggregate GROUPS the subject appears in
    "p_erasure_card" ->
      s"""$cleanedSql, erased AS (
         |  SELECT * FROM cleaned WHERE substr(md5(customer_id), 1, 1) = '0'
         |), card AS (
         |  SELECT 'silver' AS tier,
         |    'year=' || CAST(year AS VARCHAR) || '/month='
         |      || CAST(month AS VARCHAR) || '/day=' || CAST(day AS VARCHAR)
         |      AS "partition",
         |    count(*) AS n
         |  FROM erased GROUP BY year, month, day
         |  UNION ALL
         |  SELECT 'gold_daily',
         |    'year=' || CAST(year AS VARCHAR) || '/month='
         |      || CAST(month AS VARCHAR),
         |    count(*)
         |  FROM (SELECT DISTINCT year, month, day, customer_id FROM erased)
         |  GROUP BY year, month
         |  UNION ALL
         |  SELECT 'gold_monthly', 'year=' || CAST(year AS VARCHAR), count(*)
         |  FROM (SELECT DISTINCT year, month, customer_id FROM erased)
         |  GROUP BY year
         |  UNION ALL
         |  SELECT 'gold_customer', '', count(DISTINCT customer_id)
         |  FROM erased
         |)
         |SELECT CAST(42 AS BIGINT) AS tombstone_epoch, tier, "partition",
         |  CAST(n AS BIGINT) AS rows_erased
         |FROM card ORDER BY tier, "partition"""".stripMargin,

    "p_gdpr_erasure" ->
      s"""$cleanedSql
         |SELECT year, month, day, customer_id,
         |  $aggMeasuresSql,
         |  'daily' AS aggregation_level
         |FROM cleaned
         |WHERE substr(md5(customer_id), 1, 1) <> '0'
         |GROUP BY year, month, day, customer_id
         |ORDER BY year, month, day, customer_id""".stripMargin)
}

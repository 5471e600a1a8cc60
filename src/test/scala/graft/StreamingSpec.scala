package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStreamAggs, IncrementalDedupStream, Sessionize, StreamDedup, StreamEnrich, StreamJoin}

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

  test("streaming SpaceSaving heavy hitters equal the batch summary") {
    import org.apache.spark.sql.graftx.SpaceSavingExpressions.spaceSaving
    // the mergeable summary is exactly what makes the aggregate legal in a
    // streaming aggregation: partials fold into the state store per batch
    val dir = Files.createTempDirectory("graft-hh-stream").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"event_type")
    // two separate file drops → at least two micro-batches of partials
    events.filter($"event_id" % 2 === 0).write.parquet(s"$dir/in")
    events.filter($"event_id" % 2 === 1).write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = stream.agg(spaceSaving($"event_type", 64).as("hh"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hh_stream")
        .select(explode($"hh").as("e"))
        .select($"e.key", $"e.cnt", $"e.err")
        .as[(String, Long, Long)].collect().toSet
      val batch = events.agg(spaceSaving($"event_type", 64).as("hh"))
        .select(explode($"hh").as("e"))
        .select($"e.key", $"e.cnt", $"e.err")
        .as[(String, Long, Long)].collect().toSet
      assert(streamed.nonEmpty && streamed == batch)
      assert(streamed.forall(_._3 == 0L)) // exact regime either way
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

  test("streaming dedup within watermark equals batch dropDuplicates") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"event_type", $"value")
    val rows = events.as[(Long, Timestamp, String, Double)].collect().toSeq
    // plant exact duplicates: every 3rd row appears twice, adjacent in
    // arrival order (well inside the watermark horizon)
    val withDups = rows.zipWithIndex.flatMap { case (r, i) =>
      if (i % 3 == 0) Seq(r, r) else Seq(r)
    }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String, Double)]
    val input = ms.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = StreamDedup.dedupWithinWatermark(input, "ts", "30 days", Seq("event_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    try {
      ms.addData(withDups)
      q.processAllAvailable()
      val streamed = spark.table("dedup_stream")
        .orderBy($"event_id").collect().toSeq
      val batch = StreamDedup.dedupExact(events, Seq("event_id"))
        .orderBy($"event_id").collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedup state is bounded by the watermark horizon") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"event_type", $"value")
    val rows = events.as[(Long, Timestamp, String, Double)].collect()
      .sortBy(_._2.getTime).toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String, Double)]
    val input = ms.toDF().toDF("event_id", "ts", "event_type", "value")
    // 10-minute horizon over a multi-day event stream: after the watermark
    // advances past the first chunk, its ids must leave the state store
    val q = StreamDedup.dedupWithinWatermark(input, "ts", "10 minutes", Seq("event_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_bounded").start()
    try {
      val (early, late) = rows.splitAt(rows.length / 2)
      ms.addData(early)
      q.processAllAvailable()
      ms.addData(late)
      q.processAllAvailable()
      // one more empty-ish batch so progress reflects post-eviction state
      ms.addData(Seq(rows.last))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows < rows.length / 2,
        s"state held $stateRows rows; expected eviction below ${rows.length / 2}")
    } finally q.stop()
  }

  test("stream-stream join within horizon equals the batch join") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"user_id", $"event_type")
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id", $"ts", $"user_id")
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"ts", $"user_id")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val msL = MemoryStream[(Long, Timestamp, Long)]
    val msR = MemoryStream[(Long, Timestamp, Long)]
    val left = msL.toDF().toDF("event_id", "ts", "user_id")
    val right = msR.toDF().toDF("event_id", "ts", "user_id")
    val q = StreamJoin.joinWithinHorizon(left, right, "user_id",
        "1 hour", horizonMinutes = 120)
      .writeStream.outputMode("append").format("memory")
      .queryName("join_stream").start()
    try {
      msL.addData(clicks.as[(Long, Timestamp, Long)].collect().toSeq)
      msR.addData(purchases.as[(Long, Timestamp, Long)].collect().toSeq)
      q.processAllAvailable()
      val streamed = spark.table("join_stream")
        .orderBy($"event_id", $"right_id").collect().toSeq
      val batch = StreamJoin.joinWithinHorizon(clicks, purchases, "user_id",
          "1 hour", horizonMinutes = 120)
        .orderBy($"event_id", $"right_id").collect().toSeq
      assert(batch.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-static dim enrichment equals the batch join and broadcasts") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"user_id", $"value")
    // even user_ids only, so odd-id events exercise the left-join null path
    val dim = spark.range(0, 1000).filter($"id" % 2 === 0)
      .select($"id".as("user_id"),
        concat(lit("seg"), ($"id" % 5).cast("string")).as("segment"))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Long, Double)]
    val stream = ms.toDF().toDF("event_id", "ts", "user_id", "value")
    val q = StreamEnrich.enrichWithDim(stream, dim, "user_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_stream").start()
    try {
      ms.addData(events.as[(Long, Timestamp, Long, Double)].collect().toSeq)
      q.processAllAvailable()
      val streamed = spark.table("enrich_stream")
        .orderBy($"event_id").collect().toSeq
      val batch = StreamEnrich.enrichWithDim(events, dim, "user_id")
        .orderBy($"event_id").collect().toSeq
      assert(batch.nonEmpty)
      assert(streamed == batch)
      // unmatched stream rows survive (left join), matched ones enrich
      assert(streamed.exists(_.getAs[String]("segment") != null))
      assert(streamed.exists(r => r.isNullAt(r.fieldIndex("segment"))))
    } finally q.stop()
    // stateless broadcast join: dim broadcasts, no state store operator
    val p = StreamEnrich.enrichWithDim(events, dim, "user_id")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("streaming CDC apply: upserts accumulate, conflicts resolve, replay is idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.CdcApplyStream
    val dimPath = Files.createTempDirectory("graft-cdc-dim").toString
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long)]
    val stream = ms.toDF().toDF("id", "name", "seq")
    val q = CdcApplyStream.attach(stream, dimPath, Seq("id"), "seq", ckpt)
    try {
      ms.addData(Seq((1L, "a1", 10L), (2L, "b1", 11L)))
      q.processAllAvailable()
      // batch 2: update id=1 (two conflicting rows — seq 21 must win),
      // insert id=3
      ms.addData(Seq((1L, "a2", 20L), (1L, "a3", 21L), (3L, "c1", 22L)))
      q.processAllAvailable()
    } finally q.stop()
    val dim = CdcApplyStream.current(spark, dimPath).get
      .orderBy($"id").as[(Long, String, Long)].collect().toSeq
    assert(dim == Seq((1L, "a3", 21L), (2L, "b1", 11L), (3L, "c1", 22L)))

    // at-least-once replay: re-applying the same change set as a new epoch
    // leaves the dimension unchanged (upsert idempotence)
    val replay = Seq((1L, "a2", 20L), (1L, "a3", 21L), (3L, "c1", 22L))
      .toDF("id", "name", "seq")
    CdcApplyStream.applyBatch(replay, dimPath, Seq("id"), "seq", epoch = 99L)
    val dim2 = CdcApplyStream.current(spark, dimPath).get
      .orderBy($"id").as[(Long, String, Long)].collect().toSeq
    assert(dim2 == dim)
    // superseded epoch dirs are retired; only the live one remains
    val epochs = new java.io.File(dimPath).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(epochs == Seq("e99"), epochs.toString)
  }

  test("PII redaction and mixture keep run identically under readStream") {
    // both are stateless per-row projections, so they must compose into a
    // streaming ingest unchanged — the property a cleaning pipeline relies
    // on when the same transform serves backfill (batch) and live (stream)
    val dir = Files.createTempDirectory("graft-stream-pii").toString
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(200)
    docs.write.parquet(s"$dir/in")
    val rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0)
    def transform(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("red", graft.functions.PiiFunctions.redactPii(
        concat($"text", lit(" mail "), $"doc_id", lit("@x.example.com"))))
      .withColumn("keep", graft.ops.Sampling.mixtureKeep(
        $"doc_id", $"source", rates))
      .select($"doc_id", $"red", $"keep")
    val q = transform(spark.readStream.schema(docs.schema).parquet(s"$dir/in"))
      .writeStream.outputMode("append").format("memory")
      .queryName("pii_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("pii_stream").orderBy($"doc_id").collect()
      val batch = transform(spark.read.parquet(s"$dir/in"))
        .orderBy($"doc_id").collect()
      assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
      assert(streamed.forall(_.getString(1).contains("<EMAIL>")))
    } finally q.stop()
  }

  test("span corruption streams ≡ batch (stateless hash-masked projection)") {
    // the denoising-objective generator must produce the SAME pairs in a
    // live ingest as in backfill — guaranteed because masking is a pure
    // function of (doc_id, position), never of arrival order
    val dir = Files.createTempDirectory("graft-stream-corrupt").toString
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(150)
    docs.write.parquet(s"$dir/in")
    def transform(df: org.apache.spark.sql.DataFrame) =
      graft.ops.SpanCorrupt.corrupt(df, "doc_id", "text")
        .select($"doc_id", $"n_masked", $"n_spans",
          concat_ws(" ", $"input_tokens").as("inp"),
          concat_ws(" ", $"target_tokens").as("tgt"))
    val q = transform(spark.readStream.schema(docs.schema).parquet(s"$dir/in"))
      .writeStream.outputMode("append").format("memory")
      .queryName("corrupt_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("corrupt_stream").orderBy($"doc_id").collect()
      val batch = transform(spark.read.parquet(s"$dir/in"))
        .orderBy($"doc_id").collect()
      assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
      assert(streamed.exists(_.getLong(2) > 0)) // spans actually occur
    } finally q.stop()
  }

  test("curation pipeline (quality gate + decontaminate) streams ≡ batch") {
    // the corpus-curation chain is per-document given a broadcast benchmark
    // (quality score: stateless projection; decontamination: per-doc gram
    // overlap vs a static set) — so running it per micro-batch in
    // foreachBatch must reproduce the batch run over the union exactly.
    // That equivalence is what lets one pipeline serve backfill and live
    // ingest without a second implementation.
    val dir = Files.createTempDirectory("graft-stream-curate").toString
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bench = docs.filter($"doc_id" % 17 === 0)
      .select($"doc_id", $"text").localCheckpoint()
    val corpus = docs.filter($"doc_id" % 17 =!= 0)
    // two ingest waves → two micro-batches at maxFilesPerTrigger=1
    corpus.filter($"doc_id" % 2 === 0).coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    corpus.filter($"doc_id" % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(s"$dir/in")
    def curate(df: org.apache.spark.sql.DataFrame) = {
      val scored = df.withColumn("q",
        graft.functions.TextFunctions.qualityScore($"text"))
        .filter($"q" > 0.2)
      graft.operators.Decontaminate
        .decontaminate(scored, "doc_id", "text", bench, "text", n = 3)
        .select($"doc_id", $"q")
    }
    val q = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        curate(batch).write.mode("append").parquet(s"$dir/out"): Unit
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(s"$dir/out")
      .as[(Long, Double)].collect().toSeq.sorted
    val batch = curate(spark.read.parquet(s"$dir/in"))
      .as[(Long, Double)].collect().toSeq.sorted
    assert(streamed.nonEmpty && streamed == batch)
    // both gates actually fired: some docs were cut by each stage
    assert(streamed.size < corpus.count())
  }

  test("incremental dedup stream emits each near-dup pair exactly once") {
    import graft.operators.Dedup
    val base = Files.createTempDirectory("graft-incdedup").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // two ingest waves, one file each → two micro-batches at
    // maxFilesPerTrigger=1; a pair must surface exactly when its LATER
    // member arrives (same wave or the next), never twice
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write
      .mode("append").parquet(s"$base/in")
    docs.filter($"doc_id" % 2 =!= 0).coalesce(1).write
      .mode("append").parquet(s"$base/in")
    val q = IncrementalDedupStream.attach(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/in"),
      "doc_id", "text", s"$base/store", s"$base/ckpt", minJaccard = 0.5)
    try q.processAllAvailable() finally q.stop()
    val got = IncrementalDedupStream.pairs(spark, s"$base/store")
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val full = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(full.nonEmpty)
    assert(got.length == got.toSet.size, "a pair was emitted twice")
    assert(got.toSet == full)
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

  test("naive bayes scoring streams ≡ batch (frozen model, stateless projection)") {
    // the production deployment: train the reference classifier offline,
    // then score live ingest with the frozen model — scoring is a
    // stateless zero-shuffle projection, so it must compose into
    // readStream unchanged and reproduce the batch scores exactly
    import graft.ops.NaiveBayes
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-nb").toString
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(300).localCheckpoint()
    val model = NaiveBayes.train(docs, "text",
      $"source".isin("src0", "src1", "src2"), vocabSize = 200)
    docs.write.parquet(s"$dir/in")
    val q = NaiveBayes.score(
        spark.readStream.schema(docs.schema).parquet(s"$dir/in"), "text", model)
      .select($"doc_id", $"margin_q", $"pred")
      .writeStream.outputMode("append").format("memory")
      .queryName("nb_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("nb_stream")
        .as[(Long, Long, Long)].collect().toSeq.sorted
      val batch = NaiveBayes
        .score(spark.read.parquet(s"$dir/in"), "text", model)
        .select($"doc_id", $"margin_q", $"pred")
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("dedup store erasure: bucket-pruned corpus/index rewrite matches a " +
    "from-scratch rebuild on the retained docs, pairs lose both sides, " +
    "and ingest continues correctly afterwards") {
    import graft.operators.{Dedup, IncrementalDedup}
    val base = Files.createTempDirectory("graft-dedup-erase").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .localCheckpoint()
    val w0 = docs.filter($"doc_id" % 3 === 0)
    val w1 = docs.filter($"doc_id" % 3 === 1)
    val w2 = docs.filter($"doc_id" % 3 === 2)
    IncrementalDedupStream.ingestBatch(w0, "doc_id", "text", s"$base/store",
      minJaccard = 0.5)
    IncrementalDedupStream.ingestBatch(w1, "doc_id", "text", s"$base/store",
      minJaccard = 0.5)
    // erase every ingested doc whose md5(doc_id) starts with '0'
    val ingested = w0.unionByName(w1)
    val erased = ingested
      .filter(substring(md5($"doc_id".cast("string")), 1, 1) === "0")
      .select($"doc_id").localCheckpoint()
    val erasedIds = erased.as[Long].collect().toSet
    assert(erasedIds.nonEmpty, "fixture must select some docs to erase")
    IncrementalDedupStream.erase(spark, s"$base/store", erased, "doc_id")
    val retained = ingested.filter(!$"doc_id".isin(erasedIds.toSeq: _*))
      .localCheckpoint()
    // corpus store == retained rows (id set equality)
    val corpusIds = spark.read.parquet(s"$base/store/corpus")
      .select($"doc_id").as[Long].collect().toSet
    assert(corpusIds == retained.select($"doc_id").as[Long].collect().toSet)
    // index store == bandIndex rebuilt from scratch on the retained docs
    val idxAfter = spark.read.parquet(s"$base/store/index")
      .select($"doc_id", $"band", $"bucket")
    val idxRebuilt = IncrementalDedup.bandIndex(retained, "doc_id", "text")
    assert(idxAfter.exceptAll(idxRebuilt).isEmpty &&
      idxRebuilt.exceptAll(idxAfter).isEmpty,
      "erased index != from-scratch rebuild")
    // pairs == all-pairs law over the retained corpus (both sides retained)
    val pairsAfter = IncrementalDedupStream.pairs(spark, s"$base/store")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val pairsWant = Dedup.minhashLshPairs(retained, "doc_id", "text", 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairsAfter == pairsWant)
    // the store stays a valid ingest target: a post-erasure wave dedups
    // against the retained corpus exactly as a full recompute would
    IncrementalDedupStream.ingestBatch(w2, "doc_id", "text", s"$base/store",
      minJaccard = 0.5)
    val finalPairs = IncrementalDedupStream.pairs(spark, s"$base/store")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val finalWant = Dedup
      .minhashLshPairs(retained.unionByName(w2), "doc_id", "text", 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(finalPairs == finalWant,
      "post-erasure ingest diverged from the full recompute law")
  }


  test("compacting a dedup store fully erased down to its schema anchor " +
    "no-ops (already maximally compact) instead of tripping the " +
    "epoch-management check, and the store stays ingestable after") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(40).localCheckpoint()
    val base = Files.createTempDirectory("graft-anchor-compact").toString
    IncrementalDedupStream.ingestBatch(docs, "doc_id", "text",
      s"$base/store", minJaccard = 0.5, epoch = Some(0L))
    // erase EVERYTHING: pairs swaps down to the flat schema anchor
    // (no __wv column, zero rows) — exactly the state ingestBatch
    // treats as bootstrap, which compact used to reject
    IncrementalDedupStream.erase(spark, s"$base/store",
      docs.select($"doc_id"), "doc_id")
    IncrementalDedupStream.compact(spark, s"$base/store", minFiles = 0)
    // compacting behind a frontier that excludes a pending epoch throws
    val base2 = Files.createTempDirectory("graft-frontier").toString
    IncrementalDedupStream.ingestBatch(docs, "doc_id", "text",
      s"$base2/store", minJaccard = 0.5, epoch = Some(0L))
    IncrementalDedupStream.ingestBatch(
      docs.withColumn("doc_id", $"doc_id" + 100000L), "doc_id", "text",
      s"$base2/store", minJaccard = 0.5, epoch = Some(5L))
    val fe = intercept[IllegalArgumentException] {
      IncrementalDedupStream.compact(spark, s"$base2/store", minFiles = 0,
        frontier = Some(4L))
    }
    assert(fe.getMessage.contains("frontier"), fe.getMessage)
    // NO frontier: the marker ingestBatch published (= 4, the epoch
    // before the possibly-in-flight 5) bounds a PARTIAL fold — epoch 0
    // folds into -1, epoch 5's partitions carry through so its crash
    // replay still finds its own __wv to overwrite
    IncrementalDedupStream.compact(spark, s"$base2/store", minFiles = 0)
    val wvs = spark.read.parquet(s"$base2/store/corpus")
      .select($"__wv").distinct().as[Long].collect().toSet
    assert(wvs == Set(-1L, 5L),
      s"marker-bounded fold must keep the in-flight epoch: $wvs")
    val beforeReplay = spark.read.parquet(s"$base2/store/corpus").count()
    IncrementalDedupStream.ingestBatch(
      docs.withColumn("doc_id", $"doc_id" + 100000L), "doc_id", "text",
      s"$base2/store", minJaccard = 0.5, epoch = Some(5L)) // crash replay
    assert(spark.read.parquet(s"$base2/store/corpus").count()
      == beforeReplay, "replay after the marker-bounded fold double-added")
    // at the explicit frontier it folds fully; the erased store stays
    // ingestable
    IncrementalDedupStream.compact(spark, s"$base2/store", minFiles = 0,
      frontier = Some(5L))
    IncrementalDedupStream.ingestBatch(docs, "doc_id", "text",
      s"$base/store", minJaccard = 0.5, epoch = Some(1L))
    assert(spark.read.parquet(s"$base/store/corpus")
      .select($"doc_id").count() == docs.count())
  }

  test("epoch-tagged ingest over a NON-empty legacy (no __wv) dedup " +
    "store fails loudly instead of silently deduping against nothing; " +
    "negative epochs are rejected") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50).localCheckpoint()
    val base = Files.createTempDirectory("graft-legacy-store").toString
    // a legacy store: flat append-mode layout, real accumulated state
    IncrementalDedupStream.ingestBatch(docs, "doc_id", "text",
      s"$base/store", minJaccard = 0.5)
    val e = intercept[IllegalStateException] {
      IncrementalDedupStream.ingestBatch(docs, "doc_id", "text",
        s"$base/store", minJaccard = 0.5, epoch = Some(1L))
    }
    assert(e.getMessage.contains("legacy"), e.getMessage)
    val neg = intercept[IllegalArgumentException] {
      IncrementalDedupStream.ingestBatch(docs, "doc_id", "text",
        s"$base/store2", minJaccard = 0.5, epoch = Some(-2L))
    }
    assert(neg.getMessage.contains("reserved"), neg.getMessage)
  }

  test("dedup-store compaction folds epochs into __wv=-1 keeping the " +
    "bucket layout: post-compaction ingest, pairs, and erasure equal an " +
    "uncompacted twin, and the file count drops to ~one per bucket") {
    import graft.operators.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .localCheckpoint()
    val waves = (0 to 2).map(i => docs.filter($"doc_id" % 3 === i))
    def fileCount(p: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(p))
    }
    val plain = Files.createTempDirectory("graft-compact-a").toString
    val comp = Files.createTempDirectory("graft-compact-b").toString
    for (root <- Seq(plain, comp); i <- 0 to 1)
      IncrementalDedupStream.ingestBatch(waves(i), "doc_id", "text",
        s"$root/store", minJaccard = 0.5, epoch = Some(i.toLong))
    val before = fileCount(s"$comp/store/corpus")
    // explicit frontier = the caller's assertion that both epochs are
    // final: everything folds (the marker-default partial fold is
    // spec'd separately)
    IncrementalDedupStream.compact(spark, s"$comp/store", minFiles = 0,
      frontier = Some(1L))
    assert(fileCount(s"$comp/store/corpus") < before,
      s"corpus file count must drop (was $before)")
    // one file per bucket (16 default buckets) + the flat schema anchor
    assert(fileCount(s"$comp/store/corpus") <= 17)
    assert(new java.io.File(s"$comp/store/corpus").listFiles()
      .exists(f => f.getName.startsWith("__bk=") &&
        new java.io.File(f, "__wv=-1").exists()),
      "bucket layout must survive with the reserved epoch inside")
    // the next epoch ingests identically; erasure lands identically
    for (root <- Seq(plain, comp))
      IncrementalDedupStream.ingestBatch(waves(2), "doc_id", "text",
        s"$root/store", minJaccard = 0.5, epoch = Some(2L))
    val erased = docs
      .filter(substring(md5($"doc_id".cast("string")), 1, 1) === "0")
      .select($"doc_id").localCheckpoint()
    for (root <- Seq(plain, comp))
      IncrementalDedupStream.erase(spark, root + "/store", erased, "doc_id")
    def state(root: String) = (
      spark.read.parquet(s"$root/store/corpus")
        .select($"doc_id").as[Long].collect().toSet,
      spark.read.parquet(s"$root/store/index")
        .select($"doc_id", $"band", $"bucket").as[(Long, Int, Long)]
        .collect().toSet,
      IncrementalDedupStream.pairs(spark, s"$root/store")
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet)
    assert(state(comp) == state(plain),
      "compacted store diverged from the uncompacted twin")
  }

  test("WET archives landing across triggers flow through ingestWave to " +
    "exactly the batch composition's manifest (first mile ∘ incremental " +
    "law, one path)") {
    val dir = "/root/testdata/sf0.001"
    // the gate: per-wave WET encode → checkpointed warcStream →
    // foreachBatch ingestWave → manifest over the accumulated corpus
    val got = SparkEntry.queries("p_pretrain_warc_stream")(spark, dir)
      .collect().toSeq
    // the arbiter: the fused batch composition over the same documents
    val want = graft.jobs.PretrainCorpus
      .manifest(Tables.load(spark, dir, "documents"))
      .orderBy($"source").collect().toSeq
    assert(got.nonEmpty && got == want,
      s"streamed WARC ingest diverged from the batch law:\n" +
        s" got=$got\nwant=$want")
  }

  test("streaming WARC ingestion: archives landing across triggers parse " +
    "to exactly the batch scan's rows, each file once") {
    import graft.io.Warc
    val base = Files.createTempDirectory("graft-warc-stream").toString
    def writeArc(name: String, ids: Seq[Long]): Unit = {
      val f = new java.io.FileOutputStream(s"$base/in/$name")
      f.write(Warc.encodeArchive(ids.map(i => Warc.WarcRecord("conversion",
        s"urn:graft:$i", s"http://s.example/$i",
        s"stream body $i with some words".getBytes("UTF-8")))))
      f.close()
    }
    new java.io.File(s"$base/in").mkdirs()
    writeArc("w1.warc.gz", Seq(1L, 2L))
    val q = Warc.warcStream(spark, s"$base/in").toDF()
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    // a second archive lands; a NEW AvailableNow run ingests only it
    writeArc("w2.warc.wet.gz", Seq(3L, 4L, 5L))
    val q2 = Warc.warcStream(spark, s"$base/in").toDF()
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q2.awaitTermination() finally q2.stop()
    val streamed = spark.read.parquet(s"$base/out")
      .select($"record_id", $"target_uri", $"content_length", $"text")
      .collect().map(_.toSeq).toSeq
    val batch = Warc.warcScan(spark, s"$base/in").toDF()
      .select($"record_id", $"target_uri", $"content_length", $"text")
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed.sortBy(_.toString) ==
      batch.sortBy(_.toString),
      "streamed WARC rows != batch scan")
    assert(streamed.size == streamed.distinct.size,
      "a record was ingested twice across triggers")
  }

}

package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col, lit, pmod, xxhash64}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IncrementalDedup

/** Streaming front end for [[graft.operators.IncrementalDedup]]: a
  * `foreachBatch` sink that maintains the three stores of a continuously
  * deduped corpus —
  *
  *   - `<storeDir>/corpus`: every ingested document (append),
  *   - `<storeDir>/index`:  the (id, band, bucket) LSH rows (append),
  *   - `<storeDir>/pairs`:  near-dup pairs, each emitted EXACTLY ONCE, in
  *     the micro-batch where the pair's later member arrived.
  *
  * Per micro-batch the work is O(batch + collisions) — the accumulated
  * corpus is only touched by the collision point-fetch, so the sink's cost
  * does not grow with corpus age. That is the property that lets the same
  * code run forever against an unbounded source.
  *
  * Corpus and index rows are hive-partitioned by an ID-HASH BUCKET
  * (`__bk = xxhash64(id) mod nBuckets`): a right-to-be-forgotten request
  * ([[erase]]) then rewrites only the subject's bucket directories — cost
  * bounded by corpus/nBuckets per erased id, never the whole store. Size
  * `nBuckets` so one bucket is a tractable rewrite (at 100 TB and 1024
  * buckets, ~100 GB per bucket).
  *
  * Delivery note: `foreachBatch` is at-least-once across crash recovery —
  * a production deployment writes each store under an epoch-tagged path (or
  * a transactional table format) so replayed batches overwrite instead of
  * double-append. The semantics of the dedup math are unaffected either way.
  */
object IncrementalDedupStream {

  /** Attach the incremental-dedup sink to a streaming document frame.
    * `checkpointDir` is the Structured Streaming checkpoint location.
    */
  def attach(stream: DataFrame, id: String, text: String, storeDir: String,
      checkpointDir: String, minJaccard: Double, n: Int = 3,
      numHashes: Int = 64, bands: Int = 16,
      maxBucketSize: Int = 10000, nBuckets: Int = 16): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, id, text, storeDir, minJaccard, n, numHashes,
          bands, maxBucketSize, nBuckets)
      }
      .start()

  private def exists(df: DataFrame, p: String): Boolean = {
    val hp = new Path(p)
    hp.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      .exists(hp)
  }

  /** One ingest step: dedup `batch` against the store, then fold the batch
    * into it. Also usable directly for a batch (backfill) ingest loop —
    * stream and backfill share this exact code path.
    */
  def ingestBatch(batch: DataFrame, id: String, text: String,
      storeDir: String, minJaccard: Double, n: Int = 3, numHashes: Int = 64,
      bands: Int = 16, maxBucketSize: Int = 10000,
      nBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    val corpusPath = s"$storeDir/corpus"
    val indexPath = s"$storeDir/index"
    val pairsPath = s"$storeDir/pairs"
    // the batch feeds three consumers (pairs, index rows, corpus append) —
    // pin it so the source isn't re-read per consumer
    val stable = batch.localCheckpoint()
    // bootstrap: an absent store behaves as an empty corpus with an empty
    // index of the matching schema (limit(0) keeps column names/types)
    val oldDocs =
      if (exists(batch, corpusPath)) spark.read.parquet(corpusPath)
      else stable.limit(0)
    val oldIndex =
      if (exists(batch, indexPath)) spark.read.parquet(indexPath)
      else IncrementalDedup.bandIndex(stable.limit(0), id, text, n, numHashes, bands)
    IncrementalDedup
      .incrementalPairs(stable, id, text, oldIndex, oldDocs, minJaccard,
        n, numHashes, bands, maxBucketSize)
      .write.mode("append").parquet(pairsPath)
    def bucketed(df: DataFrame) =
      df.withColumn("__bk", pmod(xxhash64(col(id)), lit(nBuckets.toLong)))
    bucketed(IncrementalDedup.bandIndex(stable, id, text, n, numHashes, bands))
      .write.mode("append").partitionBy("__bk").parquet(indexPath)
    bucketed(stable).write.mode("append").partitionBy("__bk")
      .parquet(corpusPath)
  }

  /** Right-to-be-forgotten erasure of the dedup stores: remove the `ids`
    * documents from corpus and index by rewriting ONLY their id-hash
    * bucket directories (the bucket set is computed from the ids alone —
    * no store scan to find the footprint), and drop every pair touching an
    * erased id from the pairs store (atomic staged swap — the pairs store
    * is collisions-only, orders of magnitude smaller than the corpus).
    * End state is spec-proven to hash-match stores rebuilt from scratch on
    * the retained corpus, and the store stays ingestable afterwards.
    *
    * `ids`' first column must have the same type the store was ingested
    * with (the bucket hash is type-sensitive).
    */
  def erase(spark: org.apache.spark.sql.SparkSession, storeDir: String,
      ids: DataFrame, id: String, nBuckets: Int = 16): Unit = {
    val keys = ids.select(col(ids.columns.head).as(id)).distinct()
      .localCheckpoint()
    try {
      // the subject's bucket footprint: bounded driver state by definition
      val buckets = keys
        .select(pmod(xxhash64(col(id)), lit(nBuckets.toLong)).as("__bk"))
        .distinct().collect().map(_.getLong(0)).toSeq
      for (store <- Seq("corpus", "index")) {
        val path = s"$storeDir/$store"
        if (buckets.nonEmpty && exists(keys, path)) {
          // statically pruned to the subject's buckets; staged before the
          // dynamic partition overwrite (it reads the path it replaces)
          val retained = spark.read.parquet(path)
            .filter(col("__bk").isin(buckets: _*))
            .join(broadcast(keys), Seq(id), "left_anti")
            .localCheckpoint()
          try {
            retained.write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("__bk").parquet(path)
            // partition columns read back type-inferred (int): cast
            val still = retained.select(col("__bk").cast("long")).distinct()
              .collect().map(_.getLong(0)).toSet
            graft.io.Sinks.deletePartitionDirs(spark, path,
              buckets.filterNot(still).map(b => s"__bk=$b"))
          } finally org.apache.spark.sql.graftx.CheckpointUtils
            .unpersistLocalCheckpoint(retained)
        }
      }
      val pairsPath = s"$storeDir/pairs"
      if (exists(keys, pairsPath)) {
        val ka = keys.select(col(id).as("id_a"))
        val kb = keys.select(col(id).as("id_b"))
        graft.io.Sinks.stagedSwapParquet(spark,
          spark.read.parquet(pairsPath)
            .join(broadcast(ka), Seq("id_a"), "left_anti")
            .join(broadcast(kb), Seq("id_b"), "left_anti"),
          pairsPath)
      }
    } finally org.apache.spark.sql.graftx.CheckpointUtils
      .unpersistLocalCheckpoint(keys)
  }

  /** The accumulated pair store, or an empty frame if nothing collided yet. */
  def pairs(spark: org.apache.spark.sql.SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(s"$storeDir/pairs")
      .select(col("id_a"), col("id_b"), col("jaccard"))
}

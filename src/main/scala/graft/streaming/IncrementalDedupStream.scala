package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
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
      maxBucketSize: Int = 10000): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, id, text, storeDir, minJaccard, n, numHashes,
          bands, maxBucketSize)
      }
      .start()

  /** One ingest step: dedup `batch` against the store, then fold the batch
    * into it. Also usable directly for a batch (backfill) ingest loop —
    * stream and backfill share this exact code path.
    */
  def ingestBatch(batch: DataFrame, id: String, text: String,
      storeDir: String, minJaccard: Double, n: Int = 3, numHashes: Int = 64,
      bands: Int = 16, maxBucketSize: Int = 10000): Unit = {
    val spark = batch.sparkSession
    val corpusPath = s"$storeDir/corpus"
    val indexPath = s"$storeDir/index"
    val pairsPath = s"$storeDir/pairs"
    def exists(p: String): Boolean = {
      val hp = new Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
    }
    // the batch feeds three consumers (pairs, index rows, corpus append) —
    // pin it so the source isn't re-read per consumer
    val stable = batch.localCheckpoint()
    // bootstrap: an absent store behaves as an empty corpus with an empty
    // index of the matching schema (limit(0) keeps column names/types)
    val oldDocs =
      if (exists(corpusPath)) spark.read.parquet(corpusPath) else stable.limit(0)
    val oldIndex =
      if (exists(indexPath)) spark.read.parquet(indexPath)
      else IncrementalDedup.bandIndex(stable.limit(0), id, text, n, numHashes, bands)
    IncrementalDedup
      .incrementalPairs(stable, id, text, oldIndex, oldDocs, minJaccard,
        n, numHashes, bands, maxBucketSize)
      .write.mode("append").parquet(pairsPath)
    IncrementalDedup.bandIndex(stable, id, text, n, numHashes, bands)
      .write.mode("append").parquet(indexPath)
    stable.write.mode("append").parquet(corpusPath)
  }

  /** The accumulated pair store, or an empty frame if nothing collided yet. */
  def pairs(spark: org.apache.spark.sql.SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(s"$storeDir/pairs")
      .select(col("id_a"), col("id_b"), col("jaccard"))
}

package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Merge

/** Streaming CDC apply: a `foreachBatch` sink that maintains a Type-1
  * dimension table under `dimPath` by upserting each micro-batch of change
  * rows (`ops.Merge.upsert`) — the lakehouse "MERGE INTO from a stream"
  * pattern without a table format.
  *
  * Storage protocol: each applied batch writes a COMPLETE new dimension
  * snapshot under `dimPath/e<epoch>/`, then atomically repoints
  * `dimPath/MANIFEST` at it — the snapshot being read is never overwritten
  * (Spark cannot safely overwrite a path it is reading), and readers
  * always see a whole epoch or the previous one, never a torn write.
  *
  * Delivery: `foreachBatch` is at-least-once across crash recovery; a
  * replayed epoch rewrites ITS OWN epoch dir and repoints the manifest to
  * the same place, so the apply is idempotent (spec-proven). Old epochs
  * are retired as soon as the manifest moves on (best-effort delete).
  *
  * Scale posture: the apply is `Merge.upsert`'s single keyed shuffle with
  * ≤(1 + batch dups)-row window partitions; within-batch conflicts
  * resolve deterministically by `seqCol` BEFORE the merge (last writer
  * wins, id-tiebroken), so replays and re-partitionings converge to the
  * same dimension. Rewriting the full snapshot per batch is the
  * no-table-format cost — at 100 TB dimensions one partitions the
  * snapshot by key range and rewrites only the ranges a batch touches
  * (same manifest protocol, per-range entries).
  */
object CdcApplyStream {

  def attach(stream: DataFrame, dimPath: String, keys: Seq[String],
      seqCol: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        applyBatch(batch, dimPath, keys, seqCol, epoch)
      }
      .start()

  /** One apply step (shared by stream and batch backfill). */
  def applyBatch(batch: DataFrame, dimPath: String, keys: Seq[String],
      seqCol: String, epoch: Long): Unit = {
    val spark = batch.sparkSession
    // deterministic last-writer-wins inside the batch: highest seqCol,
    // then the key columns themselves can't break ties (equal by
    // definition) — seqCol must be unique per key per batch, as a real
    // CDC log's LSN is
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    val latest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val next = current(spark, dimPath) match {
      case Some(cur) => Merge.upsert(cur, latest.select(cur.columns.map(col): _*), keys)
      case None => latest
    }
    val target = s"$dimPath/e$epoch"
    next.write.mode("overwrite").parquet(target)
    val prev = currentEpochDir(dimPath)
    publishManifest(dimPath, target)
    prev.filter(_ != target).foreach(retire)
  }

  /** The live dimension snapshot, if any batch has been applied yet. */
  def current(spark: SparkSession, dimPath: String): Option[DataFrame] =
    currentEpochDir(dimPath).map(spark.read.parquet(_))

  private def manifest(dimPath: String) = Paths.get(dimPath, "MANIFEST")

  private def currentEpochDir(dimPath: String): Option[String] = {
    val m = manifest(dimPath)
    if (Files.exists(m))
      Some(new String(Files.readAllBytes(m), StandardCharsets.UTF_8).trim)
    else None
  }

  private def publishManifest(dimPath: String, target: String): Unit = {
    Files.createDirectories(Paths.get(dimPath))
    val tmp = Paths.get(dimPath, s"MANIFEST.tmp")
    Files.write(tmp, target.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifest(dimPath), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def retire(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      val files = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      files.foreach(f => try Files.delete(f) catch { case _: Exception => () })
    }
  }
}

package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Poor-man's snapshot-versioned table (the Iceberg/Delta idea at the
  * file-manifest level, without a table format): every commit publishes a
  * JSON manifest listing the segment directories that version reads, so
  *
  *  - appends are O(batch): a new segment plus one manifest — readers of
  *    older versions keep a consistent file list (no read-overwrite race);
  *  - `read(version)` is time travel: the union of exactly that
  *    manifest's segments;
  *  - commits are atomic: the manifest is written to a temp name and
  *    RENAMED into `_commits/` (a metadata-only publish — a crash leaves
  *    either the old latest or the new one, never a torn table).
  *
  * The GDPR tension is handled honestly rather than hidden: time travel
  * must NOT resurrect an erased subject, so [[erase]] rewrites the
  * touched segments, PURGES the replaced segment bytes, and stamps the
  * new manifest with `redacted_below` — reads of any older version then
  * fail loudly with the tombstone epoch instead of silently returning a
  * view that no longer exists on disk. Versions after the erasure
  * time-travel normally.
  *
  * Scale shape: appends never rewrite history; erasure cost is one scan
  * of the latest version (segment membership decides rewrite-vs-share,
  * so untouched segments stay byte-identical and shared across
  * manifests); manifests are O(segments) JSON lines.
  */
object Versioned {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitPath(root: String, v: Int) =
    f"$root/_commits/v$v%05d.json"

  /** All committed version numbers, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val dir = new Path(s"$root/_commits")
    val f = fs(spark, root)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
      .sorted.toSeq
  }

  private[graft] case class Manifest(version: Int, files: Seq[String],
      redactedBelow: Int, tombstoneEpoch: Long)

  private def readManifest(spark: SparkSession, root: String,
      v: Int): Manifest = {
    val row = spark.read.json(commitPath(root, v)).head()
    Manifest(
      row.getAs[Long]("version").toInt,
      row.getSeq[String](row.fieldIndex("files")).toSeq,
      row.getAs[Long]("redacted_below").toInt,
      row.getAs[Long]("tombstone_epoch"))
  }

  /** Atomic manifest publish: temp write + rename. Single-writer per
    * version is ENFORCED, not assumed: two appenders that both read the
    * same latest version race to publish the same `v`, and on POSIX
    * filesystems the second rename silently replaces the first — so a
    * pre-existing commit file for `v` fails loudly here (the losing
    * writer retries against the new latest). The residual window between
    * the exists-check and the rename is the filesystem's rename
    * atomicity, the same guarantee every manifest-based table format
    * leans on.
    */
  private[graft] def writeManifest(spark: SparkSession, root: String,
      m: Manifest): Unit = {
    val f = fs(spark, root)
    f.mkdirs(new Path(s"$root/_commits"))
    if (f.exists(new Path(commitPath(root, m.version))))
      throw new java.io.IOException(
        s"concurrent writer detected: v${m.version} is already committed " +
          s"at $root — re-read the latest version and retry")
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") +
      "\""
    val json = s"""{"version":${m.version},"files":[${
      m.files.map(q).mkString(",")}],"redacted_below":${m.redactedBelow},""" +
      s""""tombstone_epoch":${m.tombstoneEpoch}}"""
    val tmp = new Path(s"$root/_commits/.tmp_v${m.version}.json")
    val out = f.create(tmp, true)
    out.write((json + "\n").getBytes("UTF-8"))
    out.close()
    if (!f.rename(tmp, new Path(commitPath(root, m.version))))
      throw new java.io.IOException(s"manifest publish failed: v${m.version}")
  }

  /** Append `df` as a new version; returns the committed version number. */
  def append(spark: SparkSession, root: String, df: DataFrame): Int = {
    val vs = versions(spark, root)
    val prev = vs.lastOption.map(readManifest(spark, root, _))
    val v = vs.lastOption.map(_ + 1).getOrElse(0)
    val seg = s"$root/seg-$v-${spark.sparkContext.applicationId}"
    df.write.mode(SaveMode.Overwrite).option("compression", "snappy")
      .parquet(seg)
    writeManifest(spark, root, Manifest(v,
      prev.map(_.files).getOrElse(Nil) :+ seg,
      prev.map(_.redactedBelow).getOrElse(0),
      prev.map(_.tombstoneEpoch).getOrElse(0L)))
    v
  }

  /** Read a specific committed version (default: latest). Versions below
    * the latest commit's redaction floor fail LOUDLY — their bytes were
    * purged by an erasure and a silent partial read would misrepresent
    * what that version contained.
    */
  def read(spark: SparkSession, root: String,
      version: Int = Int.MaxValue): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no commits at $root")
    val v = if (version == Int.MaxValue) vs.last else version
    require(vs.contains(v), s"unknown version $v (have $vs)")
    val latest = readManifest(spark, root, vs.last)
    if (v < latest.redactedBelow)
      throw new IllegalStateException(
        s"version $v was redacted by the erasure at tombstone epoch " +
          s"${latest.tombstoneEpoch} (redaction floor " +
          s"${latest.redactedBelow}): its segments were purged and time " +
          s"travel below the floor would resurrect an erased subject")
    val m = readManifest(spark, root, v)
    spark.read.parquet(m.files: _*)
  }

  /** Right-to-be-forgotten erasure: rewrite only the segments holding the
    * subject's rows (untouched segments stay byte-identical and shared),
    * purge the replaced segments' bytes, and publish a new version whose
    * redaction floor makes every OLDER version unreadable — stated, not
    * silent. Returns the new version.
    *
    * The hit-segment set is found in ONE job: the latest version is read
    * as a single union, semi-joined to the keys, and the distinct
    * `input_file_name()` parent directories (≤ one per segment — segments
    * are unpartitioned, so part files sit directly under the segment dir)
    * are collected. At thousands of commits that is one scan instead of
    * thousands of driver-sequenced per-segment probe jobs; driver state
    * is bounded by the segment count.
    *
    * A GHOST erasure — no segment held the subject — publishes a version
    * with the SAME files and leaves the previous redaction floor in
    * place: nothing was purged, so time travel to the fully-intact older
    * versions stays legal.
    */
  def erase(spark: SparkSession, root: String, keys: DataFrame,
      keyCol: String, tombstoneEpoch: Long): Int = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no commits at $root")
    val latest = readManifest(spark, root, vs.last)
    val v = vs.last + 1
    val k = keys.select(col(keys.columns.head).as(keyCol)).distinct()
      .localCheckpoint()
    try {
      val f = fs(spark, root)
      // one probe pass over the latest version: which segment dirs hold
      // the subject? (dirname of every matched file, distinct)
      import org.apache.spark.sql.functions.{input_file_name, regexp_replace}
      val hitDirs = spark.read.parquet(latest.files: _*)
        .join(broadcast(k), Seq(keyCol), "left_semi")
        .select(regexp_replace(input_file_name(), "/[^/]*$", "").as("d"))
        .distinct().collect()
        .map(r => new Path(r.getString(0)).toUri.getPath).toSet
      var replaced = List.empty[String]
      val newFiles = latest.files.zipWithIndex.map { case (seg, i) =>
        if (!hitDirs.contains(new Path(seg).toUri.getPath)) seg
        else {
          val out = s"$root/seg-$v-$i-${spark.sparkContext.applicationId}"
          spark.read.parquet(seg)
            .join(broadcast(k), Seq(keyCol), "left_anti")
            .write.mode(SaveMode.Overwrite).option("compression", "snappy")
            .parquet(out)
          replaced ::= seg
          out
        }
      }
      if (replaced.isEmpty)
        writeManifest(spark, root, Manifest(v, newFiles,
          latest.redactedBelow, latest.tombstoneEpoch))
      else {
        writeManifest(spark, root,
          Manifest(v, newFiles, redactedBelow = v, tombstoneEpoch))
        // the subject's bytes die AFTER the new manifest is durable: a
        // crash in between leaves a readable latest either way
        replaced.foreach(seg => f.delete(new Path(seg), true))
      }
      v
    } finally org.apache.spark.sql.graftx.CheckpointUtils
      .unpersistLocalCheckpoint(k)
  }
}

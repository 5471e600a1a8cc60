package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing queries: document text bytes stand in for encoded
  * media payloads; the decode stage is a documented deterministic stub
  * (see [[graft.multimodal.Multimodal]]), the schema/partition-batch
  * plumbing is real.
  */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // Metadata path is fully SQL-expressible → oracle-checked.
    "m_media_meta" -> ((s, dir) =>
      Multimodal.fromDocuments(Tables.load(s, dir, "documents")).toDF()
        .select(col("media_id"), col("kind"), length(col("bytes")).as("n_bytes"))
        .orderBy(col("media_id"))),

    // Stub-decoded feature vectors + a similarity hop over them — rows-only
    // (feature values come from the stub decoder, not SQL-expressible).
    "m_media_features" -> ((s, dir) => {
      val feats = Multimodal.featureTable(s, Tables.load(s, dir, "documents"))
      feats.select(col("media_id"), col("kind"), col("n_bytes"),
        graft.functions.VectorFunctions.l2Norm(col("feature")).as("feature_norm"))
        .orderBy(col("media_id"))
    }),

    "m_frame_samples" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(Tables.load(s, dir, "documents"))
      Multimodal.sampleFrames(media).toDF()
        .select(col("media_id"), col("frame_index"),
          length(col("frame_bytes")).as("n_bytes"))
        .orderBy(col("media_id"), col("frame_index"))
    }))

  override def oracleSql: Map[String, String] = Map(
    "m_media_meta" ->
      """SELECT doc_id AS media_id, 'image' AS kind,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin)
}

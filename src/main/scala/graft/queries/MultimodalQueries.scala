package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing queries. `m_decode_meta` is a REAL decode path:
  * genuine BMP/PNG payloads parsed back through ImageCodec. The feature /
  * frame queries still ride the documented deterministic stub decoder
  * (see [[graft.multimodal.Multimodal]]); their schema/partition-batch
  * plumbing is real.
  */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // Metadata path is fully SQL-expressible → oracle-checked.
    "m_media_meta" -> ((s, dir) =>
      Multimodal.fromDocuments(Tables.load(s, dir, "documents")).toDF()
        .select(col("media_id"), col("kind"), length(col("bytes")).as("n_bytes"))
        .orderBy(col("media_id"))),

    // REAL decode roundtrip: payloads are genuine BMP/PNG encodings (pixel
    // bytes from the text), and every output field is parsed back out of
    // the file headers by ImageCodec. The oracle recomputes the expected
    // format/dims from doc_id — a hash match proves the decoder read what
    // the encoder wrote.
    "m_decode_meta" -> ((s, dir) =>
      Multimodal.decodeMetaTable(
        Multimodal.imageTable(Tables.load(s, dir, "documents"))).toDF()
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
        |FROM documents ORDER BY media_id""".stripMargin,

    "m_decode_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
        |  CAST(doc_id % 64 + 16 AS INTEGER) AS width,
        |  CAST(doc_id % 48 + 12 AS INTEGER) AS height
        |FROM documents ORDER BY media_id""".stripMargin)
}

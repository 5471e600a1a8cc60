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

    // REAL pixel decode: BMP rows de-padded, PNG inflated + de-filtered;
    // exact integer channel sums. The oracle recomputes them from the text
    // bytes the encoder cycled into the pixels (documents are pure ASCII,
    // so char codes == payload bytes) — a hash match proves the decoder
    // reconstructed the full pixel stream bit-for-bit.
    "m_pixel_stats" -> ((s, dir) =>
      Multimodal.pixelStats(
        Multimodal.imageTable(Tables.load(s, dir, "documents"))).toDF()
        .orderBy(col("media_id"))),

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
        |FROM documents ORDER BY media_id""".stripMargin,

    "m_pixel_stats" -> {
      // channel c sum = Σ over pixel-stream positions i ≡ c (mod 3) of the
      // text byte at i mod len (the encoder cycles text bytes into pixels)
      def chan(c: Int) =
        s"""CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
           |    ELSE CAST(list_sum(list_transform(range($c, 3 * w * h, 3),
           |      i -> ord(substr(text, CAST(i % length(text) AS INTEGER) + 1, 1))))
           |      AS BIGINT) END AS c${c}_sum""".stripMargin
      s"""WITH d AS (SELECT doc_id, text,
         |    doc_id % 64 + 16 AS w, doc_id % 48 + 12 AS h
         |  FROM documents)
         |SELECT doc_id AS media_id,
         |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         |  CAST(w * h AS BIGINT) AS n_pixels,
         |  ${chan(0)}, ${chan(1)}, ${chan(2)}
         |FROM d ORDER BY media_id""".stripMargin
    },

    // The stub slicer's geometry is a pure function of the payload length
    // (frame i covers bytes [i·1024, i·1024+256), ⌈max(1, len/1024)⌉
    // frames), so the oracle recomputes every (media_id, frame_index,
    // n_bytes) row from octet_length — the plumbing (flatMap fan-out,
    // per-frame byte slicing) is what the hash match verifies.
    "m_frame_samples" ->
      """WITH d AS (SELECT doc_id AS media_id,
        |    octet_length(encode(text)) AS len FROM documents),
        |f AS (SELECT media_id, len,
        |    unnest(range(0, greatest(1, len // 1024))) AS fi FROM d)
        |SELECT media_id, CAST(fi AS INTEGER) AS frame_index,
        |  CAST(least(len - fi * 1024, 256) AS INTEGER) AS n_bytes
        |FROM f ORDER BY media_id, frame_index""".stripMargin)
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing queries. `m_decode_meta`/`m_pixel_stats` are REAL
  * image decode paths (genuine BMP/PNG parsed back through ImageCodec);
  * `m_audio_meta`/`m_video_frames`/`m_frame_samples` are REAL container
  * decode paths (genuine WAV / AVI / animated LZW-compressed GIF parsed
  * back through MediaContainers — the GIF frames reconstruct through a
  * real LZW dictionary decode).
  */
object MultimodalQueries extends QueryPack {

  /** Shared oracle CTEs: per-doc WHT band energies (es, 1-based list,
    * E(b,m) = es[b*8+m+1]) and the 63-bit audio fingerprint (f.afp) —
    * the closed-form mirror of Multimodal.audioFingerprint.
    */
  private val AudioFpCtes: String =
    """d AS (SELECT doc_id AS media_id, text, length(text) AS len,
      |    doc_id % 500 + 100 AS n,
      |    LEAST((doc_id % 500 + 100 + 31) // 32, 10) AS nb FROM documents),
      |e AS (SELECT media_id, nb, list_transform(range(0, nb * 8), t ->
      |    CAST(list_sum(list_transform(
      |      list_transform(range((t % 8) * 4, (t % 8) * 4 + 4), k ->
      |        CAST(list_sum(list_transform(range(0, 32), j ->
      |          (CASE WHEN (t // 8) * 32 + j >= n OR len = 0 THEN 0
      |            ELSE (ord(substr(text,
      |              CAST(((t // 8) * 32 + j) % len AS INTEGER) + 1, 1)) - 96)
      |              * 256 END)
      |          * (CASE WHEN bit_count(j & k) % 2 = 1 THEN -1 ELSE 1 END)))
      |          AS BIGINT)),
      |      w -> w * w)) AS BIGINT)) AS es FROM d),
      |f AS (SELECT media_id,
      |  CAST(COALESCE(list_sum(list_transform(range(0, (nb - 1) * 7), p ->
      |    CASE WHEN
      |      (es[CAST((p // 7 + 1) * 8 + p % 7 + 1 AS INTEGER)]
      |       - es[CAST((p // 7 + 1) * 8 + p % 7 + 2 AS INTEGER)])
      |      - (es[CAST((p // 7) * 8 + p % 7 + 1 AS INTEGER)]
      |       - es[CAST((p // 7) * 8 + p % 7 + 2 AS INTEGER)]) > 0
      |    THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER))
      |    ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS afp
      |  FROM e)""".stripMargin

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

    // REAL animated-GIF frame sampling: payloads are genuine GIF89a files
    // with LZW-COMPRESSED frames; every 2nd frame's pixel stream is
    // reconstructed through the LZW dictionary decode and summed. The
    // oracle recomputes geometry + pixel sums from (doc_id, text) — a hash
    // match proves the compressed stream round-tripped bit-for-bit.
    "m_frame_samples" -> ((s, dir) => {
      val media = Multimodal.gifTable(Tables.load(s, dir, "documents"))
      Multimodal.sampleGifFrames(media).toDF()
        .orderBy(col("media_id"), col("frame_index"))
    }),

    // REAL baseline-JPEG decode: payloads are genuine quality-50 JPEGs
    // (full DCT + huffman bitstream) with CONSTANT 8×8 blocks cycling the
    // text bytes; JpegCodec decodes them back through huffman + DC
    // prediction + dequant + IDCT. Constant blocks make the lossy
    // round-trip a closed-form integer function (see JpegCodec), so the
    // oracle recomputes every pixel sum exactly — a hash match proves the
    // entire compressed path end to end.
    "m_jpeg_stats" -> ((s, dir) =>
      Multimodal.jpegStats(
        Multimodal.jpegTable(Tables.load(s, dir, "documents"))).toDF()
        .orderBy(col("media_id"))),

    // REAL resize: decode (BMP de-pad / PNG inflate+defilter), halve both
    // axes by nearest-neighbor, sum the RESIZED channels. The oracle
    // recomputes each resized pixel's source byte straight from
    // (doc_id, text) with the same floor mapping — a hash match proves
    // decode AND resample byte-for-byte.
    "m_resize_stats" -> ((s, dir) =>
      Multimodal.resizeStats(
        Multimodal.imageTable(Tables.load(s, dir, "documents"))).toDF()
        .orderBy(col("media_id"))),

    // REAL pooled features: 4×4 grid luminance sums over genuinely decoded
    // pixels — a hash match proves decode + pooling byte-for-byte against
    // the oracle's recomputation from the source text.
    "m_grid_features" -> ((s, dir) =>
      Multimodal.gridFeatures(
        Multimodal.imageTable(Tables.load(s, dir, "documents"))).toDF()
        .orderBy(col("media_id"), col("cell"))),

    // Perceptual-hash image dedup: aHash bits from the REAL decoded-pixel
    // grid features (integer cross-multiplied mean compares — no division),
    // plus each image's count of ≤1-bit-Hamming partners found via a
    // banded equi-join (pigeonhole-complete). The oracle recomputes hashes
    // from the source bytes and partner counts from a brute-force
    // all-pairs compare — an independent plan end to end.
    "m_ahash_dups" -> ((s, dir) => {
      val gf = Multimodal.gridFeatures(
        Multimodal.imageTable(Tables.load(s, dir, "documents"))).toDF()
      Multimodal.ahashNearDupCounts(Multimodal.averageHash(gf), maxDist = 1)
        .orderBy(col("media_id"))
    }),

    // Image dup CLUSTERS: connected components over the ≤1-bit aHash pair
    // graph (transitive near-dup groups — the keep-one-per-cluster unit),
    // singletons labeled by themselves. The oracle recomputes the pair
    // graph brute-force and the closure as a recursive CTE — independent
    // of both the banded join and the min-label propagation.
    "m_ahash_clusters" -> ((s, dir) => {
      val hashes = Multimodal.averageHash(Multimodal.gridFeatures(
        Multimodal.imageTable(Tables.load(s, dir, "documents"))).toDF())
        .localCheckpoint() // feeds pairs AND the singleton left join
      val pairs = Multimodal.ahashNearDupPairs(hashes, maxDist = 1)
      // star variant: Hamming-1 chains through a dense hash space can run
      // far past min-label propagation's diameter budget (the sf0.1 depth
      // gate caught exactly that — 32 mislabeled vertices at 20 rounds);
      // large/small-star converges in O(log² n) rounds regardless
      val comp = graft.operators.Graph
        .connectedComponentsStar(pairs, "id_a", "id_b")
      hashes.join(comp.withColumnRenamed("vertex", "media_id"),
          Seq("media_id"), "left")
        .select(col("media_id"),
          coalesce(col("component"), col("media_id")).as("cluster_id"))
        .orderBy(col("media_id"))
    }),

    // Perceptual DCT hash (pHash) near-dups: quantized cell means through
    // a separable integer 2-D DCT (Q10 fixed-point basis), bits = AC
    // coefficient vs the exact AC median, then the banded Hamming join at
    // distance ≤ 8 (9 bands × 7 bits — pigeonhole-complete over 63 bits).
    // The oracle replays every DCT coefficient from the pixel law with
    // the SAME embedded integer basis table and brute-forces the pairs.
    "m_phash_dups" -> ((s, dir) => {
      val gf = Multimodal.gridFeatures(
        Multimodal.imageTable(Tables.load(s, dir, "documents")), grid = 8)
        .toDF()
      Multimodal.ahashNearDupCounts(
          Multimodal.dctHash(gf).withColumnRenamed("phash", "ahash"),
          maxDist = 8, bandBits = 7)
        .withColumnRenamed("ahash", "phash")
        .orderBy(col("media_id"))
    }),

    // REAL audio decode: payloads are genuine RIFF/WAVE PCM16 files; every
    // output field is parsed from the fmt/data chunks and sample_sum is
    // recomputed from the decoded PCM stream. The oracle recomputes all of
    // it from (doc_id, text) — a hash match proves the WAV round-trip
    // bit-for-bit.
    "m_audio_meta" -> ((s, dir) =>
      Multimodal.audioMetaTable(
        Multimodal.audioTable(Tables.load(s, dir, "documents"))).toDF()
        .orderBy(col("media_id"))),

    // REAL compressed-audio headers: payloads are genuine CBR MPEG-1
    // Layer III frame streams (junk prefix, then frames whose 4-byte
    // headers carry the bitrate/samplerate nibbles); every output field
    // is parsed back out of the header bit-fields and the CBR frame walk
    // by MediaContainers.parseMp3Meta. The oracle recomputes the whole
    // row from doc_id via the encode law - a hash match proves the sync
    // scan, the bit-field parse, and the frame-length arithmetic.
    "m_mp3_meta" -> ((s, dir) =>
      Multimodal.mp3MetaTable(
        Multimodal.mp3Table(Tables.load(s, dir, "documents"))).toDF()
        .orderBy(col("media_id"))),

    // REAL VBR MP3s behind ID3v2 false-sync traps: the tag body is all
    // 0xFF bytes, so a hash match proves the parser skips by the
    // declared syncsafe size (header_offset = 10 + tag size) AND walks
    // per-frame bitrate changes (min/max kbps over the cycling pattern).
    "m_mp3_vbr" -> ((s, dir) =>
      Multimodal.mp3VbrMetaTable(
        Multimodal.mp3VbrTable(Tables.load(s, dir, "documents"))).toDF()
        .orderBy(col("media_id"))),

    // REAL MP4 metadata: payloads are genuine minimal ISO-BMFF files;
    // every output field comes from the box walk (size/type framing,
    // unknown boxes skipped, mvhd + per-trak tkhd). The oracle
    // recomputes the whole row from doc_id via the encode law.
    "m_mp4_meta" -> ((s, dir) =>
      Multimodal.mp4MetaTable(
        Multimodal.mp4Table(Tables.load(s, dir, "documents"))).toDF()
        .orderBy(col("media_id"))),

    // Speech front end over REAL WAVs: 160-sample frames every 80 samples,
    // integer energy / zero-crossing / peak per frame. The oracle re-derives
    // every frame value from (doc_id, text) through the documented sample
    // law — a hash match proves decode + framing + all three features.
    "m_audio_frames" -> ((s, dir) =>
      Multimodal.audioFrameFeatures(
        Multimodal.audioTable(Tables.load(s, dir, "documents"))).toDF()
        .orderBy(col("media_id"), col("frame_index"))),

    // Walsh–Hadamard band energies over REAL WAVs: 32-sample blocks, 8 bands
    // of 4 Hadamard-order coefficients, all exact integers. The engine runs
    // the O(n log n) butterfly; the oracle recomputes every coefficient from
    // the closed form (−1)^popcount(j AND k) — two structurally different
    // algorithms that must agree bit-for-bit.
    "m_wht_spectrum" -> ((s, dir) =>
      Multimodal.whtSpectrum(
        Multimodal.audioTable(Tables.load(s, dir, "documents"))).toDF()
        .orderBy(col("media_id"), col("block_index"), col("band"))),

    // Contrast screen: Shannon entropy of the 8-bucket gray histogram over
    // the REAL pixel decode — flat/synthetic images score near 0, textured
    // photos near ln 8. Per-bucket micro-nat terms quantize BEFORE the
    // order-free integer sum (the t_token_entropy convention).
    "m_image_entropy" -> ((s, dir) => {
      val hist = Multimodal.grayHistogram(
        Multimodal.imageTable(Tables.load(s, dir, "documents"))).toDF()
        .localCheckpoint() // read by totals and the per-bucket terms
      val tot = hist.groupBy(col("media_id")).agg(sum(col("n_px")).as("n"))
      hist.join(tot, Seq("media_id"))
        .select(col("media_id"), col("n"),
          round(negate(col("n_px").cast("double") / col("n").cast("double")
              * log(col("n_px").cast("double") / col("n").cast("double")))
            * lit(1e6)).cast("long").as("q"))
        .groupBy(col("media_id"))
        .agg(max(col("n")).as("n_px"), count(lit(1)).as("n_buckets"),
          sum(col("q")).as("entropy_q"))
        .orderBy(col("media_id"))
    }),

    // Sharpness screen: central-difference gradient energy over the REAL
    // BMP/PNG pixel decode, exact integers both axes. Oracle recomputes
    // both sums from the pixel law.
    "m_gradient_energy" -> ((s, dir) =>
      Multimodal.gradientEnergy(
        Multimodal.imageTable(Tables.load(s, dir, "documents"))).toDF()
        .orderBy(col("media_id"))),

    // Gradient (difference) hash near-dups: brightness-shift-invariant
    // sibling of m_ahash_dups on the same real pixel decode. Oracle
    // recomputes the 24-bit gradient hash from the pixel law and
    // brute-forces the Hamming pairs the banded join must reproduce.
    "m_dhash_dups" -> ((s, dir) => {
      val gf = Multimodal.gridFeatures(
        Multimodal.imageTable(Tables.load(s, dir, "documents"))).toDF()
      Multimodal.ahashNearDupCounts(
          Multimodal.differenceHash(gf).withColumnRenamed("dhash", "ahash"),
          maxDist = 1)
        .withColumnRenamed("ahash", "dhash")
        .orderBy(col("media_id"))
    }),

    // Perceptual audio fingerprints (Haitsma–Kalker shape) over the WHT
    // band energies: 7 sign-of-energy-delta bits per block, ≤63 bits total.
    // Oracle recomputes every energy from the closed form and reassembles
    // the bit pattern — an exact end-to-end audio-hash check.
    "m_audio_fp" -> ((s, dir) =>
      Multimodal.audioFingerprint(
        Multimodal.audioTable(Tables.load(s, dir, "documents")))
        .orderBy(col("media_id"))),

    // Near-duplicate audio: banded Hamming self-join over the fingerprints
    // (pigeonhole-complete at distance ≤ 2). Oracle brute-forces all pairs
    // with bit_count(xor) — a structurally different (quadratic) algorithm
    // that the banded join must reproduce exactly.
    "m_audio_fp_dups" -> ((s, dir) =>
      Multimodal.audioNearDupPairs(
        Multimodal.audioTable(Tables.load(s, dir, "documents")), maxDist = 2)
        .orderBy(col("id_a"), col("id_b"))),

    // Shot-boundary detection on REAL AVI payloads: per-transition byte-sum
    // delta + cut flag at threshold 40. Oracle recomputes sums from the
    // frame law and takes the lag window — decode + delta + threshold all
    // proven exact.
    "m_shot_bounds" -> ((s, dir) =>
      Multimodal.shotBoundaries(
        Multimodal.videoTable(Tables.load(s, dir, "documents"))).toDF()
        .orderBy(col("media_id"), col("frame_index"))),

    // Integer-FIR 2:1 decimation aggregates over REAL WAVs: [1,2,1] in
    // exact quarter-units, per-clip count/sum/|sum|/peak.
    "m_audio_decimate" -> ((s, dir) =>
      Multimodal.audioDecimate(
        Multimodal.audioTable(Tables.load(s, dir, "documents"))).toDF()
        .orderBy(col("media_id"))),

    // REAL video frame sampling: payloads are genuine AVI containers; every
    // 2nd frame is parsed out of the movi list and byte-summed. Oracle
    // recomputes frame geometry + sums from (doc_id, text).
    "m_video_frames" -> ((s, dir) =>
      Multimodal.sampleContainerFrames(
        Multimodal.videoTable(Tables.load(s, dir, "documents"))).toDF()
        .orderBy(col("media_id"), col("frame_index"))))

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

    "m_jpeg_stats" -> {
      // per block b: v = text byte at b mod len (0 for empty text);
      // quality-50 DC round-trip r = round_half_away((v−128)/2),
      // pixel = clamp(2r+128); the block contributes 64·pixel
      s"""WITH d AS (SELECT doc_id, text,
         |    8 * (doc_id % 5 + 2) AS w, 8 * (doc_id % 3 + 2) AS h
         |  FROM documents)
         |SELECT doc_id AS media_id,
         |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         |  CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(64 * list_sum(list_transform(
         |      range(0, (w // 8) * (h // 8), 1),
         |      b -> LEAST(255, GREATEST(0, 2 * CAST(ROUND(
         |        (ord(substr(text, CAST(b % length(text) AS INTEGER) + 1, 1))
         |          - 128) / 2.0) AS INTEGER) + 128)))) AS BIGINT) END
         |    AS px_sum
         |FROM d ORDER BY media_id""".stripMargin
    },

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

    "m_resize_stats" -> {
      // resized pixel (x, y) samples source (x*w//w2, y*h//h2); its channel-c
      // byte sits at stream position (sy*w + sx)*3 + c, which the encoder
      // filled with text byte (pos mod len)
      def chan(c: Int) =
        s"""CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
           |    ELSE CAST(list_sum(list_transform(range(0, w2 * h2),
           |      j -> ord(substr(text, CAST(
           |        (((j // w2) * h // h2 * w + (j % w2) * w // w2) * 3 + $c)
           |          % length(text) AS INTEGER) + 1, 1))))
           |      AS BIGINT) END AS c${c}_sum""".stripMargin
      s"""WITH d AS (SELECT doc_id, text,
         |    doc_id % 64 + 16 AS w, doc_id % 48 + 12 AS h,
         |    greatest((doc_id % 64 + 16) // 2, 1) AS w2,
         |    greatest((doc_id % 48 + 12) // 2, 1) AS h2
         |  FROM documents)
         |SELECT doc_id AS media_id,
         |  CAST(w AS INTEGER) AS src_w, CAST(h AS INTEGER) AS src_h,
         |  CAST(w2 AS INTEGER) AS out_w, CAST(h2 AS INTEGER) AS out_h,
         |  ${chan(0)}, ${chan(1)}, ${chan(2)}
         |FROM d ORDER BY media_id""".stripMargin
    },

    "m_grid_features" ->
      """WITH d AS (SELECT doc_id, text,
        |    doc_id % 64 + 16 AS w, doc_id % 48 + 12 AS h FROM documents),
        |px AS (SELECT doc_id, text, w, h,
        |    unnest(range(0, w * h)) AS i FROM d),
        |c AS (SELECT doc_id,
        |    CAST((i // w) * 4 // h * 4 + (i % w) * 4 // w AS INTEGER) AS cell,
        |    CASE WHEN length(text) = 0 THEN 0 ELSE
        |      ord(substr(text, CAST((i * 3) % length(text) AS INTEGER) + 1, 1))
        |      + ord(substr(text, CAST((i * 3 + 1) % length(text) AS INTEGER) + 1, 1))
        |      + ord(substr(text, CAST((i * 3 + 2) % length(text) AS INTEGER) + 1, 1))
        |    END AS lum
        |  FROM px)
        |SELECT doc_id AS media_id, cell, CAST(count(*) AS BIGINT) AS n_px,
        |  CAST(sum(lum) AS BIGINT) AS lum_sum
        |FROM c GROUP BY doc_id, cell ORDER BY media_id, cell""".stripMargin,

    // every DCT coefficient re-derived from the pixel law with the SAME
    // integer basis table the engine embeds; pairs brute-forced
    "m_phash_dups" -> {
      val vals = Multimodal.dctTable(8)
        .map { case (u, x, w) => s"($u,$x,$w)" }.mkString(",")
      s"""WITH d AS (SELECT doc_id, text,
         |    doc_id % 64 + 16 AS w, doc_id % 48 + 12 AS h FROM documents),
         |px AS (SELECT doc_id, text, w, h,
         |    unnest(range(0, w * h)) AS i FROM d),
         |c AS (SELECT doc_id,
         |    CAST((i // w) * 8 // h * 8 + (i % w) * 8 // w AS INTEGER) AS cell,
         |    CASE WHEN length(text) = 0 THEN 0 ELSE
         |      ord(substr(text, CAST((i * 3) % length(text) AS INTEGER) + 1, 1))
         |      + ord(substr(text, CAST((i * 3 + 1) % length(text) AS INTEGER) + 1, 1))
         |      + ord(substr(text, CAST((i * 3 + 2) % length(text) AS INTEGER) + 1, 1))
         |    END AS lum
         |  FROM px),
         |g AS (SELECT doc_id, cell, CAST(count(*) AS BIGINT) AS n_px,
         |    CAST(sum(lum) AS BIGINT) AS lum_sum
         |  FROM c GROUP BY doc_id, cell),
         |ct(u, x, cw) AS (SELECT * FROM (VALUES $vals) t(u, x, cw)),
         |q AS (SELECT doc_id, cell % 8 AS cx, cell // 8 AS cy,
         |    (lum_sum * 256) // n_px AS qv FROM g),
         |gp AS (SELECT doc_id, ct.u, q.cy, sum(ct.cw * q.qv) AS gv
         |  FROM q JOIN ct ON ct.x = q.cx GROUP BY 1, 2, 3),
         |fc AS (SELECT doc_id, gp.u, ct.u AS v, sum(ct.cw * gv) AS fv
         |  FROM gp JOIN ct ON ct.x = gp.cy GROUP BY 1, 2, 3),
         |ac AS (SELECT doc_id, u * 8 + v AS pos, fv FROM fc
         |  WHERE NOT (u = 0 AND v = 0)),
         |med AS (SELECT doc_id, list_sort(list(fv))[32] AS med
         |  FROM ac GROUP BY doc_id),
         |hsh AS (SELECT ac.doc_id AS media_id,
         |    CAST(sum(CASE WHEN fv > med
         |      THEN (CAST(1 AS BIGINT) << CAST(pos - 1 AS INTEGER))
         |      ELSE 0 END) AS BIGINT) AS phash
         |  FROM ac JOIN med ON ac.doc_id = med.doc_id GROUP BY 1),
         |pairs AS (SELECT a.media_id AS ia, b.media_id AS ib
         |  FROM hsh a JOIN hsh b ON a.media_id < b.media_id
         |  WHERE bit_count(xor(a.phash, b.phash)) <= 8),
         |pc AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_neardups
         |  FROM (SELECT ia AS media_id FROM pairs
         |        UNION ALL SELECT ib FROM pairs)
         |  GROUP BY media_id)
         |SELECT h.media_id, h.phash, COALESCE(pc.n_neardups, 0) AS n_neardups
         |FROM hsh h LEFT JOIN pc USING (media_id)
         |ORDER BY media_id""".stripMargin
    },

    // hash re-derived from the byte-reconstruction CTE; partner counts via
    // brute-force all-pairs bit_count(xor) — independent of the banded join
    "m_ahash_dups" ->
      """WITH d AS (SELECT doc_id, text,
        |    doc_id % 64 + 16 AS w, doc_id % 48 + 12 AS h FROM documents),
        |px AS (SELECT doc_id, text, w, h,
        |    unnest(range(0, w * h)) AS i FROM d),
        |c AS (SELECT doc_id,
        |    CAST((i // w) * 4 // h * 4 + (i % w) * 4 // w AS INTEGER) AS cell,
        |    CASE WHEN length(text) = 0 THEN 0 ELSE
        |      ord(substr(text, CAST((i * 3) % length(text) AS INTEGER) + 1, 1))
        |      + ord(substr(text, CAST((i * 3 + 1) % length(text) AS INTEGER) + 1, 1))
        |      + ord(substr(text, CAST((i * 3 + 2) % length(text) AS INTEGER) + 1, 1))
        |    END AS lum
        |  FROM px),
        |g AS (SELECT doc_id, cell, CAST(count(*) AS BIGINT) AS n_px,
        |    CAST(sum(lum) AS BIGINT) AS lum_sum
        |  FROM c GROUP BY doc_id, cell),
        |t AS (SELECT doc_id, CAST(sum(n_px) AS BIGINT) AS tn,
        |    CAST(sum(lum_sum) AS BIGINT) AS tl FROM g GROUP BY doc_id),
        |hsh AS (SELECT g.doc_id AS media_id,
        |    CAST(sum(CASE WHEN lum_sum * tn > tl * n_px
        |      THEN CAST(power(2, cell) AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS ahash
        |  FROM g JOIN t ON g.doc_id = t.doc_id GROUP BY g.doc_id),
        |pairs AS (SELECT a.media_id AS ia, b.media_id AS ib
        |  FROM hsh a JOIN hsh b ON a.media_id < b.media_id
        |  WHERE bit_count(xor(a.ahash, b.ahash)) <= 1),
        |pc AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_neardups
        |  FROM (SELECT ia AS media_id FROM pairs
        |        UNION ALL SELECT ib FROM pairs)
        |  GROUP BY media_id)
        |SELECT h.media_id, h.ahash,
        |  COALESCE(pc.n_neardups, 0) AS n_neardups
        |FROM hsh h LEFT JOIN pc USING (media_id)
        |ORDER BY media_id""".stripMargin,

    // brute-force pair graph + recursive-CTE closure — independent of the
    // banded candidate join AND the distributed min-label propagation
    "m_ahash_clusters" ->
      """WITH RECURSIVE d AS (SELECT doc_id, text,
        |    doc_id % 64 + 16 AS w, doc_id % 48 + 12 AS h FROM documents),
        |px AS (SELECT doc_id, text, w, h,
        |    unnest(range(0, w * h)) AS i FROM d),
        |c AS (SELECT doc_id,
        |    CAST((i // w) * 4 // h * 4 + (i % w) * 4 // w AS INTEGER) AS cell,
        |    CASE WHEN length(text) = 0 THEN 0 ELSE
        |      ord(substr(text, CAST((i * 3) % length(text) AS INTEGER) + 1, 1))
        |      + ord(substr(text, CAST((i * 3 + 1) % length(text) AS INTEGER) + 1, 1))
        |      + ord(substr(text, CAST((i * 3 + 2) % length(text) AS INTEGER) + 1, 1))
        |    END AS lum
        |  FROM px),
        |g AS (SELECT doc_id, cell, CAST(count(*) AS BIGINT) AS n_px,
        |    CAST(sum(lum) AS BIGINT) AS lum_sum
        |  FROM c GROUP BY doc_id, cell),
        |tt AS (SELECT doc_id, CAST(sum(n_px) AS BIGINT) AS tn,
        |    CAST(sum(lum_sum) AS BIGINT) AS tl FROM g GROUP BY doc_id),
        |hsh AS (SELECT g.doc_id AS media_id,
        |    CAST(sum(CASE WHEN lum_sum * tn > tl * n_px
        |      THEN CAST(power(2, cell) AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS ahash
        |  FROM g JOIN tt ON g.doc_id = tt.doc_id GROUP BY g.doc_id),
        |jp AS (SELECT a.media_id AS ia, b.media_id AS ib
        |  FROM hsh a JOIN hsh b ON a.media_id < b.media_id
        |  WHERE bit_count(xor(a.ahash, b.ahash)) <= 1),
        |edges AS (SELECT ia AS a, ib AS b FROM jp
        |  UNION ALL SELECT ib, ia FROM jp),
        |reach(s, t2) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.s, e.b FROM reach r JOIN edges e ON r.t2 = e.a),
        |comp AS (SELECT s AS media_id, least(s, min(t2)) AS cluster_id
        |  FROM reach GROUP BY s)
        |SELECT h.media_id,
        |  COALESCE(comp.cluster_id, h.media_id) AS cluster_id
        |FROM hsh h LEFT JOIN comp USING (media_id)
        |ORDER BY media_id""".stripMargin,

    // GIF geometry is a pure function of doc_id (w = id%10+4, h = id%8+3,
    // frames = id%5+2); frame f's pixel j is text byte (f+j) mod len.
    // Sampled stride = 2. The pixel sums can only match if the LZW decode
    // reconstructed every frame's full index stream.
    "m_frame_samples" ->
      """WITH d AS (SELECT doc_id AS media_id, text,
        |    (doc_id % 10 + 4) * (doc_id % 8 + 3) AS npx,
        |    doc_id % 5 + 2 AS nf FROM documents),
        |g AS (SELECT media_id, text, npx,
        |    unnest(range(0, nf, 2)) AS fi FROM d)
        |SELECT media_id, CAST(fi AS INTEGER) AS frame_index,
        |  CAST(npx AS INTEGER) AS n_px,
        |  CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(list_sum(list_transform(range(0, npx),
        |      j -> ord(substr(text, CAST((fi + j) % length(text) AS INTEGER) + 1, 1))))
        |      AS BIGINT) END AS pix_sum
        |FROM g ORDER BY media_id, frame_index""".stripMargin,

    // WAV encode parameters are pure functions of (doc_id, text): n samples
    // = doc_id%500+100, sample i = (ord(text[i mod len]) - 96) * 256
    // (documents are pure ASCII, so char codes == payload bytes).
    "m_audio_meta" ->
      """WITH d AS (SELECT doc_id AS media_id, text,
        |    doc_id % 500 + 100 AS n FROM documents)
        |SELECT media_id, CAST(1 AS INTEGER) AS channels,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(16 AS INTEGER) AS bits_per_sample,
        |  CAST(n AS INTEGER) AS n_samples,
        |  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(list_sum(list_transform(range(0, n),
        |      i -> (ord(substr(text, CAST(i % length(text) AS INTEGER) + 1, 1))
        |            - 96) * 256)) AS BIGINT) END AS sample_sum
        |FROM d ORDER BY media_id""".stripMargin,

    // the vbr encode law: id%7+3 frames cycling bitrate 9+((id+f)%3)
    // over {128,160,192} - >=3 frames always cover all three, so min 128
    // / max 192 / vbr 1; header sits past the 10-byte ID3v2 header plus
    // its id%100+10 body bytes
    "m_mp3_vbr" ->
      """SELECT doc_id AS media_id,
        |  CAST(doc_id % 7 + 3 AS INTEGER) AS n_frames,
        |  CAST(128 AS INTEGER) AS min_kbps,
        |  CAST(192 AS INTEGER) AS max_kbps,
        |  CAST(1 AS INTEGER) AS is_vbr,
        |  CAST((doc_id % 7 + 3) * 1152 * 1000
        |    // (CASE doc_id % 2 WHEN 0 THEN 44100 ELSE 48000 END)
        |    AS BIGINT) AS duration_ms,
        |  CAST(doc_id % 100 + 20 AS INTEGER) AS header_offset
        |FROM documents ORDER BY media_id""".stripMargin,

    // the mp4 encode law: timescale by id%3 from {600,1000,90000},
    // id%4000+600 duration units, id%2+1 tracks, track-1 geometry
    // (id%5+1)*160 x (id%4+1)*120, duration_ms = units*1000//timescale;
    // track 1 is hdlr 'vide', track 2 (present when id%2=1) is 'soun'
    // with mdhd timescale (= audio sample rate) 8000*(id%6+1)
    "m_mp4_meta" ->
      """WITH d AS (SELECT doc_id AS media_id,
        |    CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
        |      ELSE 90000 END AS tc,
        |    doc_id % 4000 + 600 AS du
        |  FROM documents)
        |SELECT media_id, CAST(tc AS INTEGER) AS timescale,
        |  CAST(du AS BIGINT) AS duration_units,
        |  CAST(du * 1000 // tc AS BIGINT) AS duration_ms,
        |  CAST(media_id % 2 + 1 AS INTEGER) AS n_tracks,
        |  CAST((media_id % 5 + 1) * 160 AS INTEGER) AS width,
        |  CAST((media_id % 4 + 1) * 120 AS INTEGER) AS height,
        |  CAST(1 AS INTEGER) AS n_video_tracks,
        |  CAST(media_id % 2 AS INTEGER) AS n_audio_tracks,
        |  CAST(CASE WHEN media_id % 2 = 1 THEN 8000 * (media_id % 6 + 1)
        |    ELSE 0 END AS INTEGER) AS audio_sample_rate
        |FROM d ORDER BY media_id""".stripMargin,

    // the mp3 encode law: kbps by id%3 from {128,160,192}, sample rate
    // by id%2 from {44100,48000}, id%7+3 frames, stereo (mode 0), frame
    // length floor(144000*kbps/sr), duration floor(n*1152*1000/sr)
    "m_mp3_meta" ->
      """WITH d AS (SELECT doc_id AS media_id,
        |    CASE doc_id % 3 WHEN 0 THEN 128 WHEN 1 THEN 160
        |      ELSE 192 END AS kbps,
        |    CASE doc_id % 2 WHEN 0 THEN 44100 ELSE 48000 END AS sr,
        |    doc_id % 7 + 3 AS nf
        |  FROM documents)
        |SELECT media_id, CAST(kbps AS INTEGER) AS bitrate_kbps,
        |  CAST(sr AS INTEGER) AS sample_rate,
        |  CAST(0 AS INTEGER) AS channel_mode,
        |  CAST(nf AS INTEGER) AS n_frames,
        |  CAST(144000 * kbps // sr AS INTEGER) AS frame_bytes,
        |  CAST(nf * 1152 * 1000 // sr AS BIGINT) AS duration_ms
        |FROM d ORDER BY media_id""".stripMargin,

    // sample i = (ord(text[i mod len]) - 96) * 256, n = doc_id%500+100;
    // frames of 160 samples every 80. energy = Σ s², zcr counts sign flips
    // of the predicate (s >= 0) ⟺ (ord >= 96), peak = max |s|. Empty text
    // encodes silence → all-zero features.
    "m_audio_frames" ->
      """WITH d AS (SELECT doc_id AS media_id, text,
        |    doc_id % 500 + 100 AS n FROM documents),
        |g AS (SELECT media_id, text, n,
        |    unnest(range(0, (n - 1) // 80 + 1)) AS fi FROM d),
        |f AS (SELECT media_id, text, fi,
        |    CAST(fi * 80 AS BIGINT) AS lo,
        |    CAST(LEAST(n, fi * 80 + 160) AS BIGINT) AS hi FROM g),
        |v AS (SELECT media_id, fi, lo, hi,
        |    CASE WHEN length(text) = 0 THEN NULL
        |      ELSE list_transform(range(lo, hi),
        |        i -> ord(substr(text, CAST(i % length(text) AS INTEGER) + 1, 1))
        |             - 96) END AS s FROM f)
        |SELECT media_id, CAST(fi AS INTEGER) AS frame_index,
        |  CAST(hi - lo AS INTEGER) AS n_samples,
        |  CASE WHEN s IS NULL THEN CAST(0 AS BIGINT)
        |    ELSE CAST(list_sum(list_transform(s,
        |      x -> CAST(x AS BIGINT) * x * 65536)) AS BIGINT) END AS energy,
        |  CASE WHEN s IS NULL THEN CAST(0 AS INTEGER)
        |    ELSE CAST(COALESCE(list_sum(list_transform(range(1, hi - lo),
        |      j -> CASE WHEN (s[CAST(j AS INTEGER)] >= 0)
        |                  <> (s[CAST(j AS INTEGER) + 1] >= 0)
        |           THEN 1 ELSE 0 END)), 0) AS INTEGER) END AS zero_crossings,
        |  CASE WHEN s IS NULL THEN CAST(0 AS INTEGER)
        |    ELSE CAST(list_max(list_transform(s, x -> abs(x) * 256))
        |         AS INTEGER) END AS peak
        |FROM v ORDER BY media_id, frame_index""".stripMargin,

    // WHT coefficient k of block b = Σ_{j<32} s(32b+j)·(−1)^popcount(j&k),
    // s(i) = (ord(text[i mod len]) − 96)·256 for i < n (= id%500+100), else
    // 0 (zero-pad); band g energy = Σ_{k=4g..4g+3} W(k)². Empty text →
    // silence → zero energies (blocks still emitted).
    "m_wht_spectrum" ->
      """WITH d AS (SELECT doc_id AS media_id, text, length(text) AS len,
        |    doc_id % 500 + 100 AS n FROM documents),
        |b AS (SELECT media_id, text, len, n,
        |    unnest(range(0, (n + 31) // 32)) AS bi FROM d),
        |g AS (SELECT media_id, text, len, n, bi,
        |    unnest(range(0, 8)) AS band FROM b)
        |SELECT media_id, CAST(bi AS INTEGER) AS block_index,
        |  CAST(band AS INTEGER) AS band,
        |  CAST(list_sum(list_transform(
        |    list_transform(range(band * 4, band * 4 + 4), k ->
        |      CAST(list_sum(list_transform(range(0, 32), j ->
        |        (CASE WHEN bi * 32 + j >= n OR len = 0 THEN 0
        |          ELSE (ord(substr(text,
        |            CAST((bi * 32 + j) % len AS INTEGER) + 1, 1)) - 96) * 256
        |          END)
        |        * (CASE WHEN bit_count(j & k) % 2 = 1 THEN -1 ELSE 1 END)))
        |        AS BIGINT)),
        |    w -> w * w)) AS BIGINT) AS energy
        |FROM g ORDER BY media_id, block_index, band""".stripMargin,

    // bucket = (r+g+b)·8 // 766; per-bucket term −p·ln(p) in micro-nats
    "m_image_entropy" ->
      """WITH d AS (SELECT doc_id AS media_id, text, length(text) AS len,
        |    doc_id % 64 + 16 AS w, doc_id % 48 + 12 AS h FROM documents),
        |px AS (SELECT media_id, text, len,
        |    unnest(range(0, w * h)) AS p FROM d),
        |g AS (SELECT media_id,
        |    (CASE WHEN len = 0 THEN 0 ELSE
        |      ord(substr(text, CAST((3*p) % len AS INTEGER) + 1, 1))
        |      + ord(substr(text, CAST((3*p+1) % len AS INTEGER) + 1, 1))
        |      + ord(substr(text, CAST((3*p+2) % len AS INTEGER) + 1, 1))
        |     END) * 8 // 766 AS bucket
        |  FROM px),
        |hist AS (SELECT media_id, bucket, CAST(count(*) AS BIGINT) AS c
        |  FROM g GROUP BY 1, 2),
        |tot AS (SELECT media_id, CAST(sum(c) AS BIGINT) AS n
        |  FROM hist GROUP BY 1),
        |q AS (SELECT hist.media_id, n,
        |    CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000)
        |      AS BIGINT) AS q
        |  FROM hist JOIN tot USING (media_id))
        |SELECT media_id, CAST(max(n) AS BIGINT) AS n_px,
        |  CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(sum(q) AS BIGINT) AS entropy_q
        |FROM q GROUP BY media_id ORDER BY media_id""".stripMargin,

    // gray(p) = byte(3p) + byte(3p+1) + byte(3p+2) with the m_pixel_stats
    // byte law; gx over interior columns (1 ≤ p%w ≤ w−2), gy over interior
    // rows (1 ≤ p//w ≤ h−2)
    "m_gradient_energy" ->
      """WITH d AS (SELECT doc_id AS media_id, text, length(text) AS len,
        |    doc_id % 64 + 16 AS w, doc_id % 48 + 12 AS h FROM documents)
        |SELECT media_id, CAST(w AS INTEGER) AS width,
        |  CAST(h AS INTEGER) AS height,
        |  CASE WHEN len = 0 THEN CAST(0 AS BIGINT) ELSE
        |    CAST(list_sum(list_transform(range(0, w * h), p ->
        |      CASE WHEN p % w >= 1 AND p % w <= w - 2 THEN
        |        abs((ord(substr(text, CAST((3*(p+1)) % len AS INTEGER) + 1, 1))
        |           + ord(substr(text, CAST((3*(p+1)+1) % len AS INTEGER) + 1, 1))
        |           + ord(substr(text, CAST((3*(p+1)+2) % len AS INTEGER) + 1, 1)))
        |          - (ord(substr(text, CAST((3*(p-1)) % len AS INTEGER) + 1, 1))
        |           + ord(substr(text, CAST((3*(p-1)+1) % len AS INTEGER) + 1, 1))
        |           + ord(substr(text, CAST((3*(p-1)+2) % len AS INTEGER) + 1, 1))))
        |      ELSE 0 END)) AS BIGINT) END AS gx_energy,
        |  CASE WHEN len = 0 THEN CAST(0 AS BIGINT) ELSE
        |    CAST(list_sum(list_transform(range(0, w * h), p ->
        |      CASE WHEN p // w >= 1 AND p // w <= h - 2 THEN
        |        abs((ord(substr(text, CAST((3*(p+w)) % len AS INTEGER) + 1, 1))
        |           + ord(substr(text, CAST((3*(p+w)+1) % len AS INTEGER) + 1, 1))
        |           + ord(substr(text, CAST((3*(p+w)+2) % len AS INTEGER) + 1, 1)))
        |          - (ord(substr(text, CAST((3*(p-w)) % len AS INTEGER) + 1, 1))
        |           + ord(substr(text, CAST((3*(p-w)+1) % len AS INTEGER) + 1, 1))
        |           + ord(substr(text, CAST((3*(p-w)+2) % len AS INTEGER) + 1, 1))))
        |      ELSE 0 END)) AS BIGINT) END AS gy_energy
        |FROM d ORDER BY media_id""".stripMargin,

    // dhash bit layout: horizontal (cell r,c vs r,c+1) at pos r·3+c for
    // c<3; vertical (cell vs cell+4) at pos 12+cell. avg comparison is the
    // exact cross-multiplication lum_l·n_r < lum_r·n_l.
    "m_dhash_dups" ->
      """WITH d AS (SELECT doc_id, text,
        |    doc_id % 64 + 16 AS w, doc_id % 48 + 12 AS h FROM documents),
        |px AS (SELECT doc_id, text, w, h,
        |    unnest(range(0, w * h)) AS i FROM d),
        |c AS (SELECT doc_id,
        |    CAST((i // w) * 4 // h * 4 + (i % w) * 4 // w AS INTEGER) AS cell,
        |    CASE WHEN length(text) = 0 THEN 0 ELSE
        |      ord(substr(text, CAST((i * 3) % length(text) AS INTEGER) + 1, 1))
        |      + ord(substr(text, CAST((i * 3 + 1) % length(text) AS INTEGER) + 1, 1))
        |      + ord(substr(text, CAST((i * 3 + 2) % length(text) AS INTEGER) + 1, 1))
        |    END AS lum
        |  FROM px),
        |g AS (SELECT doc_id, cell, CAST(count(*) AS BIGINT) AS n_px,
        |    CAST(sum(lum) AS BIGINT) AS lum_sum
        |  FROM c GROUP BY doc_id, cell),
        |hb AS (
        |  SELECT l.doc_id, CAST((l.cell // 4) * 3 + l.cell % 4 AS INTEGER) AS pos,
        |    CASE WHEN l.lum_sum * r.n_px < r.lum_sum * l.n_px
        |      THEN 1 ELSE 0 END AS bit
        |  FROM g l JOIN g r ON l.doc_id = r.doc_id AND r.cell = l.cell + 1
        |  WHERE l.cell % 4 < 3
        |  UNION ALL
        |  SELECT l.doc_id, CAST(12 + l.cell AS INTEGER) AS pos,
        |    CASE WHEN l.lum_sum * r.n_px < r.lum_sum * l.n_px
        |      THEN 1 ELSE 0 END AS bit
        |  FROM g l JOIN g r ON l.doc_id = r.doc_id AND r.cell = l.cell + 4),
        |hsh AS (SELECT doc_id AS media_id,
        |    CAST(sum(bit * (CAST(1 AS BIGINT) << pos)) AS BIGINT) AS dhash
        |  FROM hb GROUP BY doc_id),
        |pairs AS (SELECT a.media_id AS ia, b.media_id AS ib
        |  FROM hsh a JOIN hsh b ON a.media_id < b.media_id
        |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 1),
        |pc AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_neardups
        |  FROM (SELECT ia AS media_id FROM pairs
        |        UNION ALL SELECT ib FROM pairs)
        |  GROUP BY media_id)
        |SELECT h.media_id, h.dhash,
        |  COALESCE(pc.n_neardups, 0) AS n_neardups
        |FROM hsh h LEFT JOIN pc USING (media_id)
        |ORDER BY media_id""".stripMargin,

    // fingerprint bit p (= (b−1)·7+m) is set iff the band-energy delta
    // E(b,m)−E(b,m+1) strictly increased from block b−1 to b; energies are
    // the m_wht_spectrum closed form, blocks capped at 10. es is 1-based:
    // E(b,m) = es[b*8+m+1].
    "m_audio_fp" ->
      s"""WITH $AudioFpCtes
         |SELECT media_id, afp FROM f ORDER BY media_id""".stripMargin,

    "m_audio_fp_dups" ->
      s"""WITH $AudioFpCtes
         |SELECT a.media_id AS id_a, b.media_id AS id_b
         |FROM f a, f b
         |WHERE a.media_id < b.media_id AND bit_count(xor(a.afp, b.afp)) <= 2
         |ORDER BY id_a, id_b""".stripMargin,

    // frame byte sums from the m_video_frames law (stride 1), deltas via
    // lag, cut at delta > 40
    "m_shot_bounds" ->
      """WITH d AS (SELECT doc_id AS media_id, text,
        |    doc_id % 16 + 8 AS w, doc_id % 12 + 6 AS h,
        |    doc_id % 6 + 2 AS nf FROM documents),
        |g AS (SELECT media_id, text,
        |    ((3 * w + 3) // 4) * 4 * h AS fsz,
        |    unnest(range(0, nf)) AS fi FROM d),
        |s AS (SELECT media_id, fi,
        |  CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(list_sum(list_transform(range(0, fsz),
        |      j -> ord(substr(text, CAST((fi + j) % length(text) AS INTEGER) + 1, 1))))
        |      AS BIGINT) END AS bsum FROM g),
        |dl AS (SELECT media_id, CAST(fi AS INTEGER) AS frame_index,
        |    abs(bsum - lag(bsum) OVER (PARTITION BY media_id ORDER BY fi))
        |      AS delta FROM s)
        |SELECT media_id, frame_index, CAST(delta AS BIGINT) AS delta,
        |  delta > 40 AS is_cut
        |FROM dl WHERE delta IS NOT NULL
        |ORDER BY media_id, frame_index""".stripMargin,

    // y(i) = s(2i−1) + 2·s(2i) + s(2i+1), i = 1..(n−2)//2, with the
    // m_audio_meta sample law s(i) = (ord(text[i mod len]) − 96)·256
    "m_audio_decimate" ->
      """WITH d AS (SELECT doc_id AS media_id, text, length(text) AS len,
        |    doc_id % 500 + 100 AS n FROM documents),
        |y AS (SELECT media_id, len, n,
        |  list_transform(range(1, (n - 2) // 2 + 1), i ->
        |    CASE WHEN len = 0 THEN CAST(0 AS BIGINT) ELSE
        |      CAST((ord(substr(text, CAST((2*i - 1) % len AS INTEGER) + 1, 1)) - 96)
        |        + 2 * (ord(substr(text, CAST((2*i) % len AS INTEGER) + 1, 1)) - 96)
        |        + (ord(substr(text, CAST((2*i + 1) % len AS INTEGER) + 1, 1)) - 96)
        |      AS BIGINT) * 256 END) AS ys FROM d)
        |SELECT media_id, CAST(n AS INTEGER) AS n_in,
        |  CAST(len(ys) AS INTEGER) AS n_out,
        |  CAST(COALESCE(list_sum(ys), 0) AS BIGINT) AS y_sum,
        |  CAST(COALESCE(list_sum(list_transform(ys, v -> abs(v))), 0)
        |    AS BIGINT) AS y_abs_sum,
        |  CAST(COALESCE(list_max(list_transform(ys, v -> abs(v))), 0)
        |    AS BIGINT) AS y_peak
        |FROM y ORDER BY media_id""".stripMargin,

    // AVI geometry is a pure function of doc_id (w = id%16+8, h = id%12+6,
    // frames = id%6+2, rows padded to 4 bytes); frame f's byte j is
    // text byte (f+j) mod len. Sampled stride = 2.
    "m_video_frames" ->
      """WITH d AS (SELECT doc_id AS media_id, text,
        |    doc_id % 16 + 8 AS w, doc_id % 12 + 6 AS h,
        |    doc_id % 6 + 2 AS nf FROM documents),
        |g AS (SELECT media_id, text,
        |    ((3 * w + 3) // 4) * 4 * h AS fsz,
        |    unnest(range(0, nf, 2)) AS fi FROM d)
        |SELECT media_id, CAST(fi AS INTEGER) AS frame_index,
        |  CAST(fsz AS INTEGER) AS n_bytes,
        |  CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(list_sum(list_transform(range(0, fsz),
        |      j -> ord(substr(text, CAST((fi + j) % length(text) AS INTEGER) + 1, 1))))
        |      AS BIGINT) END AS byte_sum
        |FROM g ORDER BY media_id, frame_index""".stripMargin)
}

package graft.multimodal

/** Pure-JVM audio/video CONTAINER codec: real WAV (RIFF/WAVE, PCM16) and
  * real AVI (RIFF/'AVI ', uncompressed DIB frames) encoders plus decoders
  * that parse every reported field back out of the container bytes — the
  * same honesty contract as [[ImageCodec]]. No sample-DECODE for
  * compressed codecs exists in this sandbox (no H.264, no MDCT), but
  * RIFF containers with raw PCM samples and raw DIB frames are complete,
  * standards-conformant files any player opens, and the MP3 section below
  * parses genuine MPEG-1 Layer III frame headers (metadata + CBR duration
  * — the media-dedup need) — so header decode, sample extraction, and
  * frame sampling are genuinely end-to-end, not stubs.
  *
  * Both formats share one chunk discipline: a RIFF file is
  * `"RIFF" size form-type (chunk)*` where each chunk is
  * `fourcc size data [pad-to-even]`, and `LIST` chunks nest
  * `list-type (chunk)*`. The decoders WALK chunks (no fixed offsets), so
  * files with extra chunks (LIST INFO, JUNK padding) still parse.
  */
object MediaContainers {

  final case class WavMeta(
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      nSamples: Int,
      durationMs: Long)

  final case class AviMeta(
      width: Int,
      height: Int,
      nFrames: Int,
      usPerFrame: Int,
      durationMs: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int = le16(b, i) | (le16(b, i + 2) << 16)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  private final class Writer {
    private val os = new java.io.ByteArrayOutputStream()
    def asc(s: String): Unit = os.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { os.write(v & 0xFF); os.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    def bytes(b: Array[Byte]): Unit = os.write(b)
    def zeros(n: Int): Unit = { var i = 0; while (i < n) { os.write(0); i += 1 } }
    def toArray: Array[Byte] = os.toByteArray
  }

  // ---------------------------------------------------------------- WAV ---

  /** Canonical 44-byte-header mono PCM16 WAV. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val w = new Writer
    w.asc("RIFF"); w.le32(36 + dataLen); w.asc("WAVE")
    w.asc("fmt "); w.le32(16)
    w.le16(1) // PCM
    w.le16(1) // mono
    w.le32(sampleRate)
    w.le32(sampleRate * 2) // byte rate
    w.le16(2) // block align
    w.le16(16) // bits per sample
    w.asc("data"); w.le32(dataLen)
    var i = 0
    while (i < samples.length) { w.le16(samples(i) & 0xFFFF); i += 1 }
    w.toArray
  }

  /** Walk the RIFF chunks of `form` ("WAVE"/"AVI ") at the top level,
    * yielding (fourcc, dataOffset, dataLen). Stops at truncation.
    */
  private def riffChunks(bytes: Array[Byte], form: String): Iterator[(String, Int, Int)] = {
    if (bytes == null || bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != form) Iterator.empty
    else new Iterator[(String, Int, Int)] {
      private var i = 12
      def hasNext: Boolean = i + 8 <= bytes.length && {
        val len = le32(bytes, i + 4)
        len >= 0 && i + 8 + len <= bytes.length
      }
      def next(): (String, Int, Int) = {
        val id = fourcc(bytes, i)
        val len = le32(bytes, i + 4)
        val off = i + 8
        i += 8 + len + (len & 1) // chunks are padded to even length
        (id, off, len)
      }
    }
  }

  /** Parse fmt + data chunk headers; every field comes from the bytes. */
  def decodeWavMeta(bytes: Array[Byte]): Option[WavMeta] = {
    var channels, sampleRate, bits = -1
    var dataLen = -1
    riffChunks(bytes, "WAVE").foreach {
      case ("fmt ", off, len) if len >= 16 =>
        channels = le16(bytes, off + 2)
        sampleRate = le32(bytes, off + 4)
        bits = le16(bytes, off + 14)
      case ("data", _, len) => dataLen = len
      case _ => // LIST INFO, JUNK, fact… — skip
    }
    if (channels <= 0 || sampleRate <= 0 || bits <= 0 || dataLen < 0) None
    else {
      val bytesPerFrame = channels * (bits / 8)
      if (bytesPerFrame <= 0) None
      else {
        val n = dataLen / bytesPerFrame
        Some(WavMeta(channels, sampleRate, bits, n, n * 1000L / sampleRate))
      }
    }
  }

  /** Decode the PCM16 sample stream (mono or interleaved as stored). */
  def decodeWavSamples(bytes: Array[Byte]): Option[(WavMeta, Array[Short])] =
    decodeWavMeta(bytes).flatMap { meta =>
      if (meta.bitsPerSample != 16) None
      else riffChunks(bytes, "WAVE").collectFirst {
        case ("data", off, len) =>
          val n = len / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = le16(bytes, off + 2 * i).toShort; i += 1 }
          (meta, out)
      }
    }

  // ---------------------------------------------------------------- AVI ---

  /** Uncompressed ('DIB ') AVI: LIST hdrl (avih + one vids stream) then
    * LIST movi with one '00db' chunk per frame. Frames are raw 24bpp
    * bottom-up DIB bitmaps, rows padded to 4 bytes — the caller supplies
    * the full padded frame byte arrays (see [[dibFrameSize]]).
    */
  def encodeAvi(w0: Int, h0: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val usPerFrame = 1000000 / fps
    val frameSize = dibFrameSize(w0, h0)
    // movi body: '00db' + size + data (+ pad) per frame
    val movi = new Writer
    movi.asc("movi")
    frames.foreach { f =>
      movi.asc("00db"); movi.le32(f.length); movi.bytes(f)
      if ((f.length & 1) == 1) movi.zeros(1)
    }
    val moviBody = movi.toArray

    val strf = new Writer // BITMAPINFOHEADER
    strf.le32(40); strf.le32(w0); strf.le32(h0)
    strf.le16(1); strf.le16(24) // planes, bpp
    strf.le32(0) // BI_RGB
    strf.le32(frameSize)
    strf.le32(0); strf.le32(0); strf.le32(0); strf.le32(0)
    val strfBody = strf.toArray

    val strh = new Writer
    strh.asc("vids"); strh.asc("DIB ")
    strh.le32(0); strh.le16(0); strh.le16(0) // flags, priority, language
    strh.le32(0) // initial frames
    strh.le32(1); strh.le32(fps) // scale, rate → fps
    strh.le32(0) // start
    strh.le32(frames.length) // length in frames
    strh.le32(frameSize) // suggested buffer
    strh.le32(0) // quality
    strh.le32(0) // sample size
    strh.le16(0); strh.le16(0); strh.le16(w0); strh.le16(h0) // rcFrame
    val strhBody = strh.toArray

    val avih = new Writer
    avih.le32(usPerFrame)
    avih.le32(frameSize * fps) // max bytes/sec
    avih.le32(0) // padding granularity
    avih.le32(0) // flags: no idx1 index chunk, so AVIF_HASINDEX stays unset
    avih.le32(frames.length)
    avih.le32(0) // initial frames
    avih.le32(1) // streams
    avih.le32(frameSize)
    avih.le32(w0); avih.le32(h0)
    avih.zeros(16) // reserved
    val avihBody = avih.toArray

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val w = new Writer
      w.asc(id); w.le32(body.length); w.bytes(body)
      if ((body.length & 1) == 1) w.zeros(1)
      w.toArray
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ body)

    val strl = list("strl", chunk("strh", strhBody) ++ chunk("strf", strfBody))
    val hdrl = list("hdrl", chunk("avih", avihBody) ++ strl)
    val moviList = chunk("LIST", moviBody)
    val riffBody = "AVI ".getBytes("US-ASCII") ++ hdrl ++ moviList
    val out = new Writer
    out.asc("RIFF"); out.le32(riffBody.length); out.bytes(riffBody)
    out.toArray
  }

  /** Padded byte size of one 24bpp DIB frame. */
  def dibFrameSize(w: Int, h: Int): Int = ((3 * w + 3) & ~3) * h

  /** Main-header fields parsed from the avih chunk inside LIST hdrl. */
  def decodeAviMeta(bytes: Array[Byte]): Option[AviMeta] = {
    riffChunks(bytes, "AVI ").collectFirst {
      case ("LIST", off, len) if len >= 4 && fourcc(bytes, off) == "hdrl" &&
          len >= 12 + 56 && fourcc(bytes, off + 4) == "avih" =>
        val a = off + 12 // avih data (fourcc + size skipped)
        val usPerFrame = le32(bytes, a)
        val nFrames = le32(bytes, a + 16)
        val w = le32(bytes, a + 32)
        val h = le32(bytes, a + 36)
        AviMeta(w, h, nFrames, usPerFrame, nFrames * usPerFrame.toLong / 1000L)
    }
  }

  /** Every video frame payload ('00db'/'00dc' chunks) from LIST movi, in
    * stream order — the real frame-extraction primitive.
    */
  def decodeAviFrames(bytes: Array[Byte]): Option[Vector[Array[Byte]]] = {
    riffChunks(bytes, "AVI ").collectFirst {
      case ("LIST", off, len) if len >= 4 && fourcc(bytes, off) == "movi" =>
        val frames = Vector.newBuilder[Array[Byte]]
        var i = off + 4
        val end = off + len
        var corrupt = false
        while (!corrupt && i + 8 <= end) {
          val id = fourcc(bytes, i)
          val clen = le32(bytes, i + 4)
          if (clen < 0 || i + 8 + clen > end) corrupt = true
          else {
            if (id.endsWith("db") || id.endsWith("dc"))
              frames += java.util.Arrays.copyOfRange(bytes, i + 8, i + 8 + clen)
            i += 8 + clen + (clen & 1)
          }
        }
        if (corrupt) None else Some(frames.result())
    }.flatten
  }

  // ---------------------------------------------------------------- GIF ---
  // Real GIF89a: animated multi-frame files with a 256-entry global color
  // table and genuinely LZW-compressed image data (variable-width codes,
  // LSB-first bit packing, early-change width growth, clear-code reset at
  // dictionary capacity — the standard any external decoder implements).
  // This is the one COMPRESSED format a pure-JVM codec can do completely,
  // which upgrades frame sampling from opaque-chunk geometry to an honest
  // decode: every sampled frame's pixels are reconstructed through the LZW
  // dictionary, not sliced out of the payload.

  final case class GifMeta(width: Int, height: Int, nFrames: Int)

  /** GIF-variant LZW compression of `data` (values < 2^minCodeSize).
    * Emits the raw code stream (no sub-block framing): initial clear code,
    * variable-width codes growing from minCodeSize+1 up to 12 bits with
    * the encoder-side rule (width++ when the next free slot passes the
    * current maximum), clear + dictionary reset at slot 4096, and a final
    * end-of-information code. Dictionary keys pack (prefixCode, byte) into
    * one Long — no string concatenation on the hot path.
    */
  def lzwEncode(minCodeSize: Int, data: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val os = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeSize = minCodeSize + 1
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        os.write((bitBuf & 0xFF).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    var dict = new java.util.HashMap[Long, Integer]()
    var next = eoi + 1
    put(clear)
    if (data.nonEmpty) {
      var prefix = data(0) & 0xFF
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xFF
        val key = (prefix.toLong << 8) | k
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          put(prefix)
          if (next < 4096) {
            dict.put(key, next)
            next += 1
            // standard (GIFLIB) growth position: widen as soon as the next
            // free slot no longer fits the current width
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          } else { // dictionary full: reset, mirror of the decoder's clear
            put(clear)
            dict = new java.util.HashMap[Long, Integer]()
            next = eoi + 1
            codeSize = minCodeSize + 1
          }
          prefix = k
        }
        i += 1
      }
      put(prefix)
    }
    put(eoi)
    if (bitCnt > 0) os.write((bitBuf & 0xFF).toInt)
    os.toByteArray
  }

  /** Mirror decompressor: rebuilds the pixel stream from the raw LZW code
    * stream. Width growth is one step EARLY relative to a naive reading
    * (the standard GIF "early change": the decoder's dictionary trails the
    * encoder's by one entry at each read). Returns None on a malformed
    * stream (unknown code, missing data).
    */
  def lzwDecode(minCodeSize: Int, data: Array[Byte]): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    var bitPos = 0
    var codeSize = minCodeSize + 1
    def read(): Int = {
      if ((bitPos + codeSize + 7) / 8 > data.length) return -1
      var v = 0
      var got = 0
      while (got < codeSize) {
        val byte = u8(data, (bitPos + got) / 8)
        v |= ((byte >> ((bitPos + got) % 8)) & 1) << got
        got += 1
      }
      bitPos += codeSize
      v
    }
    val out = new java.io.ByteArrayOutputStream()
    // dictionary as (prefixCode, suffixByte) pairs — entries materialize
    // lazily by walking the prefix chain, so no byte-array concatenation
    val prefixOf = new Array[Int](4096)
    val suffixOf = new Array[Byte](4096)
    def emit(code: Int): Byte = { // returns the entry's FIRST byte
      if (code < clear) { out.write(code); code.toByte }
      else {
        val stack = new Array[Byte](4096)
        var sp = 0
        var c = code
        while (c >= clear) { stack(sp) = suffixOf(c); sp += 1; c = prefixOf(c) }
        val first = c.toByte
        out.write(c)
        while (sp > 0) { sp -= 1; out.write(stack(sp)) }
        first
      }
    }
    var next = eoi + 1
    var prev = -1
    var done = false
    var bad = false
    while (!done && !bad) {
      val c = read()
      if (c < 0) bad = true
      else if (c == clear) {
        next = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (c == eoi) done = true
      else if (prev == -1) {
        if (c >= clear) bad = true else { out.write(c); prev = c }
      } else if (c < next && c != clear && c != eoi) {
        val first = emit(c)
        if (next < 4096) {
          prefixOf(next) = prev; suffixOf(next) = first; next += 1
          // "early change": the decoder trails the encoder's dictionary by
          // one entry at each read, so it must widen one slot sooner
          if (next == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
        }
        prev = c
      } else if (c == next && next < 4096) { // the KwKwK case
        // entry being defined: prev + first(prev)
        val firstPrev: Byte =
          if (prev < clear) prev.toByte
          else { var p = prev; while (p >= clear) p = prefixOf(p); p.toByte }
        prefixOf(next) = prev; suffixOf(next) = firstPrev; next += 1
        emit(next - 1)
        if (next == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
        prev = next - 1
      } else bad = true
    }
    if (bad) None else Some(out.toByteArray)
  }

  /** Animated GIF89a: 256-entry grayscale global color table, one image
    * per frame (full logical screen, no local tables, no interlace), each
    * frame preceded by a Graphic Control Extension and LZW-compressed with
    * [[lzwEncode]] (min code size 8), data split into ≤255-byte sub-blocks.
    */
  def encodeGif(w0: Int, h0: Int, frames: Seq[Array[Byte]],
      delayCs: Int = 10): Array[Byte] = {
    val w = new Writer
    w.asc("GIF89a")
    w.le16(w0); w.le16(h0)
    w.bytes(Array(0xF7.toByte, 0, 0)) // GCT present, 256 entries, bg 0
    var c = 0
    while (c < 256) { // grayscale table: index i → (i, i, i)
      w.bytes(Array(c.toByte, c.toByte, c.toByte)); c += 1
    }
    frames.foreach { px =>
      require(px.length == w0 * h0, s"frame has ${px.length} px, want ${w0 * h0}")
      w.bytes(Array(0x21.toByte, 0xF9.toByte, 4, 0)) // GCE
      w.le16(delayCs)
      w.bytes(Array(0, 0)) // no transparency; terminator
      w.bytes(Array(0x2C.toByte)) // image descriptor
      w.le16(0); w.le16(0); w.le16(w0); w.le16(h0)
      w.bytes(Array(0.toByte)) // no local table, not interlaced
      w.bytes(Array(8.toByte)) // LZW min code size
      val lzw = lzwEncode(8, px)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        w.bytes(Array(n.toByte))
        w.bytes(java.util.Arrays.copyOfRange(lzw, off, off + n))
        off += n
      }
      w.bytes(Array(0.toByte)) // block terminator
    }
    w.bytes(Array(0x3B.toByte)) // trailer
    w.toArray
  }

  /** Header + frame count parsed by walking the block structure. */
  def decodeGifMeta(bytes: Array[Byte]): Option[GifMeta] =
    walkGif(bytes).map { case (w, h, frames) => GifMeta(w, h, frames.size) }

  /** Every frame's DECODED pixel-index stream, in order — each runs back
    * through the LZW dictionary ([[lzwDecode]]), so the caller sees real
    * reconstructed pixels, not container byte slices. None if any frame's
    * code stream is malformed or decodes to the wrong pixel count.
    */
  def decodeGifFrames(bytes: Array[Byte]): Option[Vector[Array[Byte]]] =
    walkGif(bytes).flatMap { case (w, h, frames) =>
      val decoded = frames.map(f => lzwDecode(8, f))
      if (decoded.exists(d => d.isEmpty || d.get.length != w * h)) None
      else Some(decoded.map(_.get))
    }

  /** Walk header → (width, height, per-frame concatenated LZW sub-blocks).
    * Skips extensions; stops cleanly at the trailer; None on truncation or
    * unknown block types.
    */
  private def walkGif(bytes: Array[Byte]): Option[(Int, Int, Vector[Array[Byte]])] = {
    if (bytes == null || bytes.length < 13 ||
      new String(bytes, 0, 6, "US-ASCII") != "GIF89a") return None
    val w = le16(bytes, 6)
    val h = le16(bytes, 8)
    val gctFlag = (u8(bytes, 10) & 0x80) != 0
    val gctSize = if (gctFlag) 3 * (2 << (u8(bytes, 10) & 7)) else 0
    var i = 13 + gctSize
    val frames = Vector.newBuilder[Array[Byte]]
    def subBlocks(start: Int): Option[(Array[Byte], Int)] = {
      val os = new java.io.ByteArrayOutputStream()
      var j = start
      while (j < bytes.length && u8(bytes, j) != 0) {
        val n = u8(bytes, j)
        if (j + 1 + n > bytes.length) return None
        os.write(bytes, j + 1, n)
        j += 1 + n
      }
      if (j >= bytes.length) None else Some((os.toByteArray, j + 1))
    }
    while (i < bytes.length) {
      u8(bytes, i) match {
        case 0x3B => return Some((w, h, frames.result())) // trailer
        case 0x21 => // extension: label + sub-blocks, skipped
          subBlocks(i + 2) match {
            case Some((_, after)) => i = after
            case None => return None
          }
        case 0x2C => // image descriptor
          if (i + 10 > bytes.length) return None
          val lctFlag = (u8(bytes, i + 9) & 0x80) != 0
          val lctSize = if (lctFlag) 3 * (2 << (u8(bytes, i + 9) & 7)) else 0
          val dataAt = i + 10 + lctSize + 1 // + LZW min-code-size byte
          if (dataAt > bytes.length) return None
          subBlocks(dataAt) match {
            case Some((lzw, after)) => frames += lzw; i = after
            case None => return None
          }
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  // ---------------------------------------------------------------- MP3 ---

  /** MPEG-1 Layer III frame-header metadata — the one ubiquitous
    * COMPRESSED audio container a crawl-dedup pipeline meets. Scope is
    * honest: header parse + CBR frame walk + duration only, no PCM
    * decode (a Huffman/MDCT decoder is out of sandbox scope); that is
    * exactly what media dedup/statistics need (format screens, duration
    * binning, bitrate histograms) before any sample-level work.
    */
  final case class Mp3Meta(
      bitrateKbps: Int, // FIRST frame's (the nominal rate for CBR)
      sampleRate: Int,
      channelMode: Int, // 0 stereo, 1 joint, 2 dual, 3 mono
      nFrames: Int,
      frameBytes: Int, // first frame's unpadded length
      durationMs: Long,
      headerOffset: Int,
      minKbps: Int, // == maxKbps for CBR
      maxKbps: Int,
      vbr: Boolean)

  /** index 1..14 valid; 0 = free, 15 = bad (MPEG-1 Layer III table) */
  private val Mp1L3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp1SampleRates = Array(44100, 48000, 32000)
  private val SamplesPerFrame = 1152 // MPEG-1 Layer III

  /** A genuine CBR MPEG-1 Layer III frame stream: `junkPrefix` 0x00 bytes
    * (no false sync — proves the scanner), then `nFrames` frames of
    * header 0xFF 0xFB (MPEG1, Layer III, no CRC) + bitrate/samplerate
    * nibbles + stereo, payload bytes cycled from `payload` masked to
    * 7 bits (so no 0xFF can alias a sync inside the walk's view).
    */
  def encodeMp3Cbr(bitrateIdx: Int, srIdx: Int, nFrames: Int,
      junkPrefix: Int, payload: Array[Byte]): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bad bitrateIdx $bitrateIdx")
    require(srIdx >= 0 && srIdx <= 2, s"bad srIdx $srIdx")
    val kbps = Mp1L3Bitrates(bitrateIdx)
    val sr = Mp1SampleRates(srIdx)
    val frameLen = 144000 * kbps / sr // floor(144 * bitrate / sampleRate)
    val os = new java.io.ByteArrayOutputStream()
    var j = 0
    while (j < junkPrefix) { os.write(0x00); j += 1 }
    var f = 0
    while (f < nFrames) {
      os.write(0xFF); os.write(0xFB) // sync + MPEG1 + Layer III + no CRC
      os.write((bitrateIdx << 4) | (srIdx << 2)) // padding 0, private 0
      os.write(0x00) // stereo, no emphasis
      var i = 4
      while (i < frameLen) {
        os.write(if (payload.isEmpty) 0x11
          else payload((f + i) % payload.length) & 0x7F)
        i += 1
      }
      f += 1
    }
    os.toByteArray
  }

  /** An ID3v2 tag prefix whose body is `junk` bytes of 0xFF — the
    * false-sync trap a real crawl's MP3s carry: a naive sync scan locks
    * onto tag bytes; a correct parser skips by the tag's declared
    * syncsafe size.
    */
  def id3v2Prefix(junk: Int): Array[Byte] = {
    val os = new java.io.ByteArrayOutputStream()
    os.write('I'); os.write('D'); os.write('3')
    os.write(3); os.write(0) // v2.3.0
    os.write(0) // flags: no footer
    // syncsafe 28-bit size, 7 bits per byte
    os.write((junk >> 21) & 0x7F); os.write((junk >> 14) & 0x7F)
    os.write((junk >> 7) & 0x7F); os.write(junk & 0x7F)
    var j = 0
    while (j < junk) { os.write(0xFF); j += 1 }
    os.toByteArray
  }

  /** A genuine VBR MPEG-1 Layer III stream behind an ID3v2 tag: frame f
    * carries `bitrateIdxs(f)`; everything else as [[encodeMp3Cbr]].
    */
  def encodeMp3Vbr(srIdx: Int, bitrateIdxs: Seq[Int], id3Junk: Int,
      payload: Array[Byte]): Array[Byte] = {
    require(srIdx >= 0 && srIdx <= 2, s"bad srIdx $srIdx")
    val sr = Mp1SampleRates(srIdx)
    val os = new java.io.ByteArrayOutputStream()
    os.write(id3v2Prefix(id3Junk))
    bitrateIdxs.zipWithIndex.foreach { case (brIdx, f) =>
      require(brIdx >= 1 && brIdx <= 14, s"bad bitrateIdx $brIdx")
      val frameLen = 144000 * Mp1L3Bitrates(brIdx) / sr
      os.write(0xFF); os.write(0xFB)
      os.write((brIdx << 4) | (srIdx << 2))
      os.write(0x00)
      var i = 4
      while (i < frameLen) {
        os.write(if (payload.isEmpty) 0x11
          else payload((f + i) % payload.length) & 0x7F)
        i += 1
      }
    }
    os.toByteArray
  }

  /** Skip any leading ID3v2 tag BY ITS DECLARED SYNCSAFE SIZE (tag bodies
    * legally contain 0xFF bytes — scanning into one false-syncs), scan to
    * the first sync candidate whose header VALIDATES (MPEG-1 Layer III
    * with legal bitrate/samplerate nibbles — a failed candidate is a
    * FALSE sync and the scan resumes one byte past it: real crawls carry
    * 0xFF Ex junk after APE tags or corrupted leaders, and giving up on
    * the first one would reject files whose valid frame stream follows),
    * then WALK the frame chain: version/layer/samplerate must match the
    * first header, the bitrate nibble may vary per frame (VBR) with each
    * frame's own padding bit extending it by one byte. Counts complete
    * frames; duration is exact either way (samples per frame is
    * constant). Returns None when no valid MPEG-1 Layer III header
    * exists anywhere in the buffer.
    */
  def parseMp3Meta(bytes: Array[Byte]): Option[Mp3Meta] = {
    var i = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') {
      val flags = u8(bytes, 5)
      val sz = ((u8(bytes, 6) & 0x7F) << 21) | ((u8(bytes, 7) & 0x7F) << 14) |
        ((u8(bytes, 8) & 0x7F) << 7) | (u8(bytes, 9) & 0x7F)
      i = 10 + sz + (if ((flags & 0x10) != 0) 10 else 0)
    }
    while (i + 4 <= bytes.length) {
      if (u8(bytes, i) == 0xFF && (u8(bytes, i + 1) & 0xE0) == 0xE0) {
        val h1 = u8(bytes, i + 1); val h2 = u8(bytes, i + 2)
        val h3 = u8(bytes, i + 3)
        val version = (h1 >> 3) & 0x3
        val layer = (h1 >> 1) & 0x3
        val brIdx0 = (h2 >> 4) & 0xF
        val srIdx = (h2 >> 2) & 0x3
        if (version == 3 && layer == 1 && // MPEG-1 Layer III only
          brIdx0 >= 1 && brIdx0 <= 14 && srIdx != 3) {
          val sr = Mp1SampleRates(srIdx)
          var n = 0
          var pos = i
          var walking = true
          var minK = Int.MaxValue
          var maxK = 0
          while (walking && pos + 4 <= bytes.length &&
            u8(bytes, pos) == 0xFF && u8(bytes, pos + 1) == h1 &&
            (u8(bytes, pos + 2) & 0x0C) == (h2 & 0x0C) &&
            ((u8(bytes, pos + 2) >> 4) & 0xF) >= 1 &&
            ((u8(bytes, pos + 2) >> 4) & 0xF) <= 14) {
            val brIdx = (u8(bytes, pos + 2) >> 4) & 0xF
            val kbps = Mp1L3Bitrates(brIdx)
            val pad = (u8(bytes, pos + 2) >> 1) & 1
            val flen = 144000 * kbps / sr + pad
            if (pos + flen > bytes.length) walking = false // truncated tail
            else {
              n += 1; pos += flen
              if (kbps < minK) minK = kbps
              if (kbps > maxK) maxK = kbps
            }
          }
          if (n == 0) { minK = Mp1L3Bitrates(brIdx0); maxK = minK }
          return Some(Mp3Meta(Mp1L3Bitrates(brIdx0), sr, (h3 >> 6) & 0x3, n,
            144000 * Mp1L3Bitrates(brIdx0) / sr,
            n.toLong * SamplesPerFrame * 1000L / sr, i, minK, maxK,
            minK != maxK))
        }
        // false sync (invalid version/layer/bitrate/samplerate): fall
        // through and keep scanning past the candidate
      }
      i += 1
    }
    None
  }

  // ---------------------------------------------------------------- MP4 ---

  /** ISO-BMFF (MP4) movie metadata — the ubiquitous video container.
    * Same honest scope as [[Mp3Meta]]: the BOX WALK (size/type framing,
    * 64-bit largesize, nesting, unknown boxes skipped), `mvhd`
    * timescale/duration, per-`trak` `tkhd` geometry, and per-track
    * `mdia { hdlr, mdhd }` — handler classification (video/audio track
    * counts) and the audio track's media timescale, which for audio IS
    * the sample rate (ISO 14496-12 §8.4.2 convention). No codec payload
    * decode. That covers the crawl-pipeline need: duration binning,
    * resolution screens, track counting, audio-rate screens on AV files.
    */
  final case class Mp4Meta(
      timescale: Int,
      durationUnits: Long,
      durationMs: Long,
      nTracks: Int,
      width: Int, // first video-sized track, from tkhd 16.16 fixed point
      height: Int,
      nVideoTracks: Int, // hdlr 'vide' tracks
      nAudioTracks: Int, // hdlr 'soun' tracks
      audioSampleRate: Int) // first audio track's mdhd timescale; 0 if none

  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xFFFFFFFFL

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private final class BeWriter {
    private val os = new java.io.ByteArrayOutputStream()
    def asc(s: String): Unit = os.write(s.getBytes("US-ASCII"))
    def u32(v: Long): Unit = {
      os.write(((v >> 24) & 0xFF).toInt); os.write(((v >> 16) & 0xFF).toInt)
      os.write(((v >> 8) & 0xFF).toInt); os.write((v & 0xFF).toInt)
    }
    def u16(v: Int): Unit = { os.write((v >> 8) & 0xFF); os.write(v & 0xFF) }
    def bytes(b: Array[Byte]): Unit = os.write(b)
    def zeros(n: Int): Unit = { var i = 0; while (i < n) { os.write(0); i += 1 } }
    def size: Int = os.size()
    def toArray: Array[Byte] = os.toByteArray
  }

  private def box(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val w = new BeWriter
    w.u32(payload.length + 8L); w.asc(fourcc); w.bytes(payload)
    w.toArray
  }

  /** A genuine minimal MP4: ftyp, a `free` box (proves the walker skips
    * unknown boxes), moov { mvhd, `nTracks` × trak { tkhd, mdia { hdlr,
    * mdhd } } }, and an mdat carrying `payload`. Track 1 is the video
    * track (hdlr 'vide', 16.16 geometry, media timescale = movie
    * timescale); tracks 2+ are audio (hdlr 'soun', 0×0 geometry, media
    * timescale = `audioRate` — the ISO convention for audio sample
    * rate). All version-0 full boxes, identity matrix — structurally
    * what every MP4 reader expects at the metadata level.
    */
  def encodeMp4(timescale: Int, durationUnits: Long, nTracks: Int,
      width: Int, height: Int, payload: Array[Byte],
      audioRate: Int = 48000): Array[Byte] = {
    val ftyp = {
      val w = new BeWriter
      w.asc("isom"); w.u32(0x200L); w.asc("isomiso2")
      box("ftyp", w.toArray)
    }
    val mvhd = {
      val w = new BeWriter
      w.u32(0L) // version 0 + flags
      w.u32(0L); w.u32(0L) // creation, modification
      w.u32(timescale.toLong); w.u32(durationUnits)
      w.u32(0x00010000L); w.u16(0x0100); w.u16(0) // rate 1.0, volume, rsvd
      w.zeros(8)
      Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
        .foreach(w.u32) // identity matrix
      w.zeros(24) // pre_defined
      w.u32(nTracks + 1L) // next_track_ID
      box("mvhd", w.toArray)
    }
    val traks = (1 to nTracks).map { t =>
      val w = new BeWriter
      w.u32(7L) // version 0 + flags (enabled | in movie | in preview)
      w.u32(0L); w.u32(0L) // creation, modification
      w.u32(t.toLong); w.u32(0L) // track_ID, reserved
      w.u32(durationUnits)
      w.zeros(8); w.u16(0); w.u16(0); w.u16(0); w.u16(0) // layer..reserved
      Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
        .foreach(w.u32)
      // only track 1 carries video geometry; others are 0×0 (audio)
      w.u32(if (t == 1) width.toLong << 16 else 0L)
      w.u32(if (t == 1) height.toLong << 16 else 0L)
      val hdlr = {
        val h = new BeWriter
        h.u32(0L) // version 0 + flags
        h.u32(0L) // pre_defined
        h.asc(if (t == 1) "vide" else "soun") // handler_type
        h.zeros(12) // reserved
        h.asc("g"); h.zeros(1) // name, NUL-terminated
        box("hdlr", h.toArray)
      }
      val mdhd = {
        val m = new BeWriter
        m.u32(0L) // version 0 + flags
        m.u32(0L); m.u32(0L) // creation, modification
        // media timescale: the movie's for video, the sample rate for audio
        m.u32(if (t == 1) timescale.toLong else audioRate.toLong)
        m.u32(durationUnits)
        m.u16(0x55C4); m.u16(0) // language 'und', pre_defined
        box("mdhd", m.toArray)
      }
      box("trak", box("tkhd", w.toArray) ++ box("mdia", hdlr ++ mdhd))
    }
    val moov = box("moov", mvhd ++ traks.flatten)
    val free = box("free", Array.fill(4)(0x20.toByte))
    ftyp ++ free ++ moov ++ box("mdat", payload)
  }

  /** Walk the top-level boxes to moov (skipping unknowns; honoring
    * size=1 largesize and size=0 to-end), then moov's children: mvhd →
    * timescale/duration, each trak/tkhd → track count + the first
    * nonzero 16.16 geometry. Returns None without a well-formed moov —
    * including when a box is well-FRAMED but its payload is too short
    * for the fields its version declares (a malformed crawl file must
    * yield None, never an out-of-bounds read that kills the whole
    * mapPartitions task). tkhd version 1 (64-bit times) is parsed at
    * its own offsets; versions ≥ 2 don't exist in ISO 14496-12 and
    * reject like mvhd's version gate.
    */
  def parseMp4Meta(bytes: Array[Byte]): Option[Mp4Meta] = {
    // returns (payloadStart, boxEnd) or None on malformed framing
    def frame(i: Int): Option[(String, Int, Int)] = {
      if (i + 8 > bytes.length) return None
      val size32 = be32(bytes, i)
      val typ = fourcc(bytes, i + 4)
      if (size32 == 1) {
        if (i + 16 > bytes.length) return None
        val size = be64(bytes, i + 8)
        if (size < 16 || i + size > bytes.length) None
        else Some((typ, i + 16, i + size.toInt))
      } else if (size32 == 0) Some((typ, i + 8, bytes.length))
      else if (size32 < 8 || i + size32 > bytes.length) None
      else Some((typ, i + 8, i + size32.toInt))
    }
    var i = 0
    while (i < bytes.length) {
      frame(i) match {
        case None => return None
        case Some(("moov", at, end)) =>
          var ts = -1; var du = -1L; var n = 0; var wdt = 0; var hgt = 0
          var nVid = 0; var nAud = 0; var audioRate = 0
          var j = at
          while (j < end) {
            frame(j) match {
              case None => return None
              case Some(("mvhd", p, pe)) =>
                if (u8(bytes, p) != 0) return None // version-0 layout only
                if (pe - p < 20) return None // v0 reads payload [12, 20)
                ts = be32(bytes, p + 12).toInt
                du = be32(bytes, p + 16)
              case Some(("trak", p, te)) =>
                n += 1
                var handler = ""
                var mediaTs = 0
                var k = p
                while (k < te) {
                  frame(k) match {
                    case Some(("tkhd", tp, tpe)) =>
                      // v0: width/height at payload [76, 84);
                      // v1 (64-bit creation/modification/duration):
                      // shifted +12 to [88, 96)
                      val geomAt = u8(bytes, tp) match {
                        case 0 => 76
                        case 1 => 88
                        case _ => return None // no such tkhd version
                      }
                      if (tpe - tp < geomAt + 8) return None // short box
                      val tw = (be32(bytes, tp + geomAt) >> 16).toInt
                      val th = (be32(bytes, tp + geomAt + 4) >> 16).toInt
                      if (wdt == 0 && tw > 0) { wdt = tw; hgt = th }
                      k = tpe
                    case Some(("mdia", mp, me)) =>
                      var m = mp
                      while (m < me) {
                        frame(m) match {
                          case Some(("hdlr", hp, hpe)) =>
                            // handler_type at payload [8, 12)
                            if (hpe - hp < 12) return None // short box
                            handler = fourcc(bytes, hp + 8)
                            m = hpe
                          case Some(("mdhd", dp, dpe)) =>
                            // media timescale: v0 at [12, 16), v1 (64-bit
                            // times) at [20, 24)
                            val tsAt = u8(bytes, dp) match {
                              case 0 => 12
                              case 1 => 20
                              case _ => return None // no such mdhd version
                            }
                            if (dpe - dp < tsAt + 4) return None // short box
                            mediaTs = be32(bytes, dp + tsAt).toInt
                            m = dpe
                          case Some((_, _, ke)) => m = ke
                          case None => return None
                        }
                      }
                      k = me
                    case Some((_, _, ke)) => k = ke
                    case None => return None
                  }
                }
                if (handler == "vide") nVid += 1
                else if (handler == "soun") {
                  nAud += 1
                  if (audioRate == 0 && mediaTs > 0) audioRate = mediaTs
                }
              case _ => ()
            }
            j = frame(j).get._3
          }
          if (ts <= 0 || du < 0) return None
          return Some(Mp4Meta(ts, du, du * 1000L / ts, n, wdt, hgt,
            nVid, nAud, audioRate))
        case Some((_, _, end)) => i = end
      }
    }
    None
  }
}

package graft.multimodal

/** Pure-JVM audio/video CONTAINER codec: real WAV (RIFF/WAVE, PCM16) and
  * real AVI (RIFF/'AVI ', uncompressed DIB frames) encoders plus decoders
  * that parse every reported field back out of the container bytes — the
  * same honesty contract as [[ImageCodec]]. No sample-compression codecs
  * exist in this sandbox (no MP3/H.264), but RIFF containers with raw PCM
  * samples and raw DIB frames are complete, standards-conformant files any
  * player opens — so header decode, sample extraction, and frame sampling
  * are genuinely end-to-end, not stubs.
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
}

package graft.multimodal

/** Pure-JVM image codec: real BMP and PNG encoders and a real multi-format
  * header decoder (BMP / PNG / GIF / JPEG) — no external libraries, so the
  * multimodal decode path is honest end-to-end in this sandbox: the payload
  * bytes are genuine file-format encodings and the metadata the engine
  * reports is parsed back out of those bytes, not copied from a side
  * channel.
  *
  * Encoders produce standards-conformant files (BMP: BITMAPFILEHEADER +
  * BITMAPINFOHEADER, 24bpp bottom-up rows padded to 4 bytes; PNG: signature +
  * IHDR/IDAT/IEND chunks, 8-bit RGB, filter 0, zlib-deflated scanlines,
  * CRC32 per chunk) that any standard viewer decodes.
  */
object ImageCodec {

  final case class ImageMeta(format: String, width: Int, height: Int)

  /** 24bpp BMP. `pix` supplies the flat BGR byte stream (row-major,
    * bottom-up, unpadded index).
    */
  def encodeBmp(w: Int, h: Int, pix: Int => Byte): Array[Byte] = {
    val rowSize = (3 * w + 3) & ~3
    val dataSize = rowSize * h
    val fileSize = 54 + dataSize
    val out = new Array[Byte](fileSize)
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def le32(off: Int, v: Int): Unit = {
      le16(off, v & 0xFFFF); le16(off + 2, (v >>> 16) & 0xFFFF)
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, fileSize); le32(10, 54) // pixel-data offset
    le32(14, 40) // BITMAPINFOHEADER
    le32(18, w); le32(22, h)
    le16(26, 1) // planes
    le16(28, 24) // bpp
    le32(34, dataSize)
    le32(38, 2835); le32(42, 2835) // 72 DPI
    var y = 0
    var src = 0
    while (y < h) {
      val rowOff = 54 + y * rowSize
      var x = 0
      while (x < 3 * w) { out(rowOff + x) = pix(src); src += 1; x += 1 }
      y += 1
    }
    out
  }

  /** 8-bit RGB PNG, filter type 0 on every scanline, single IDAT chunk.
    * `pix` supplies the flat RGB byte stream (row-major, top-down).
    */
  def encodePng(w: Int, h: Int, pix: Int => Byte): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + 3 * w))
    var y = 0
    var src = 0
    while (y < h) {
      val rowOff = y * (1 + 3 * w)
      raw(rowOff) = 0 // filter: None
      var x = 0
      while (x < 3 * w) { raw(rowOff + 1 + x) = pix(src); src += 1; x += 1 }
      y += 1
    }
    wrapPng(w, h, raw)
  }

  /** Wrap ALREADY-FILTERED scanlines (filter byte + 3w data per row) into a
    * complete PNG — lets tests exercise the decoder against every filter
    * type, not just the 0 our encoder emits.
    */
  private[graft] def wrapPng(w: Int, h: Int, raw: Array[Byte]): Array[Byte] = {
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val idat = buf.toByteArray
    val os = new java.io.ByteArrayOutputStream()
    os.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def be32(v: Int): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(kind: String, data: Array[Byte]): Unit = {
      os.write(be32(data.length))
      val body = kind.getBytes("US-ASCII") ++ data
      os.write(body)
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      os.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0))
    chunk("IDAT", idat)
    chunk("IEND", Array.empty[Byte])
    os.toByteArray
  }

  /** Decode the full pixel byte stream (3 bytes per pixel, in the
    * encoder's write order): BMP strips row padding; PNG walks the IDAT
    * chunks, inflates the zlib stream, and reverses the per-scanline
    * filter (all five filter types — None/Sub/Up/Average/Paeth — per the
    * PNG spec, not just the one our encoder emits). Returns
    * (width, height, pixels) or None for other/corrupt formats.
    */
  def decodePixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeMeta(bytes).flatMap {
      case ImageMeta("bmp", w, h) =>
        val rowSize = (3 * w + 3) & ~3
        if (bytes.length < 54 + rowSize * h) None
        else {
          val out = new Array[Byte](3 * w * h)
          var y = 0
          while (y < h) {
            System.arraycopy(bytes, 54 + y * rowSize, out, y * 3 * w, 3 * w)
            y += 1
          }
          Some((w, h, out))
        }
      case ImageMeta("png", w, h) =>
        val idat = new java.io.ByteArrayOutputStream()
        var i = 8
        var corrupt = false
        while (!corrupt && i + 8 <= bytes.length) {
          val len = be32(bytes, i)
          // A negative or over-long chunk length means a truncated/corrupt
          // payload; bail to None rather than throwing out of the task.
          if (len < 0 || i + 8 + len > bytes.length) corrupt = true
          else {
            val kind = new String(bytes, i + 4, 4, "US-ASCII")
            if (kind == "IDAT") idat.write(bytes, i + 8, len)
            i += 12 + len
          }
        }
        if (corrupt) None
        else {
          val inf = new java.util.zip.Inflater()
          inf.setInput(idat.toByteArray)
          val raw = new Array[Byte](h * (1 + 3 * w))
          try {
            var off = 0
            var stuck = false
            while (off < raw.length && !inf.finished() && !stuck) {
              val n = inf.inflate(raw, off, raw.length - off)
              if (n == 0 && (inf.needsInput() || inf.needsDictionary())) stuck = true
              off += n
            }
            if (off != raw.length) None
            else Some((w, h, unfilterPng(raw, w, h)))
          } catch { case _: java.util.zip.DataFormatException => None }
          finally inf.end()
        }
      case _ => None
    }

  /** Reverse PNG scanline filtering for 8-bit RGB (bpp = 3). */
  private def unfilterPng(raw: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val stride = 3 * w
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xFF
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val rawB = raw(rowIn + x) & 0xFF
        val a = if (x >= 3) out(rowOut + x - 3) & 0xFF else 0
        val b = if (y > 0) out(rowOut - stride + x) & 0xFF else 0
        val c = if (x >= 3 && y > 0) out(rowOut - stride + x - 3) & 0xFF else 0
        val v = ft match {
          case 0 => rawB
          case 1 => rawB + a
          case 2 => rawB + b
          case 3 => rawB + ((a + b) / 2)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            rawB + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => rawB
        }
        out(rowOut + x) = (v & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    le16(b, i) | (le16(b, i + 2) << 16)
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (be16(b, i) << 16) | be16(b, i + 2)

  /** Sniff the container from magic bytes and parse dimensions out of the
    * header: BMP (BITMAPINFOHEADER or BITMAPCOREHEADER), PNG (IHDR), GIF
    * (logical screen descriptor), JPEG (first SOFn scan). None for
    * unrecognized/truncated payloads.
    */
  def decodeMeta(bytes: Array[Byte]): Option[ImageMeta] = {
    if (bytes == null || bytes.length < 10) None
    else if (bytes(0) == 'B' && bytes(1) == 'M' && bytes.length >= 26) {
      val infoSize = le32(bytes, 14)
      if (infoSize >= 40 && bytes.length >= 26)
        Some(ImageMeta("bmp", le32(bytes, 18), math.abs(le32(bytes, 22))))
      else // BITMAPCOREHEADER: 16-bit dims
        Some(ImageMeta("bmp", le16(bytes, 18), le16(bytes, 20)))
    } else if (bytes.length >= 24 &&
        u8(bytes, 0) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G' && bytes(12) == 'I' && bytes(13) == 'H' &&
        bytes(14) == 'D' && bytes(15) == 'R') {
      Some(ImageMeta("png", be32(bytes, 16), be32(bytes, 20)))
    } else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') &&
        bytes(5) == 'a') {
      Some(ImageMeta("gif", le16(bytes, 6), le16(bytes, 8)))
    } else if (u8(bytes, 0) == 0xFF && u8(bytes, 1) == 0xD8) {
      // JPEG: walk marker segments to the first start-of-frame
      var i = 2
      while (i + 9 < bytes.length) {
        if (u8(bytes, i) != 0xFF) return None
        val marker = u8(bytes, i + 1)
        if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) i += 2
        else if (marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          return Some(ImageMeta("jpeg", be16(bytes, i + 7), be16(bytes, i + 5)))
        } else i += 2 + be16(bytes, i + 2)
      }
      None
    } else None
  }
}

package graft.io

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** WARC/WET crawl-archive ingestion — the first mile of a real pretraining
  * corpus (Common-Crawl-style WET files: ISO 28500 WARC records, each
  * record gzipped as its OWN member and the members concatenated, so
  * readers can random-access records by offset). Same honesty contract as
  * [[graft.multimodal.MediaContainers]]: a REAL encoder (per-member gzip,
  * standard-conformant record framing) plus a decoder that parses every
  * reported field back out of the bytes — version line, named headers,
  * Content-Length-framed body — with truncation/corruption handled by
  * returning the records parsed so far, never an exception out of a task.
  *
  * Scale shape: archives are opaque byte blobs until the per-record
  * flatMap in [[warcDocs]]; record bytes never shuffle — only the parsed
  * (id, uri, length, text) rows do. A 100 TB crawl ingests as one
  * binaryFile scan + one narrow projection. (Per-FILE parallelism is the
  * WET granularity — crawls ship ~1 GB archives by convention, and the
  * gzip stream is inherently sequential within one file.)
  */
object Warc {

  /** One record to encode. */
  final case class WarcRecord(
      recordType: String,
      recordId: String,
      targetUri: String,
      body: Array[Byte])

  /** One parsed record. `headers` keys are lower-cased. */
  final case class WarcParsed(
      version: String,
      headers: Map[String, String],
      body: Array[Byte])

  private val Crlf = "\r\n"

  /** Encode one record in WARC/1.0 wire format (headers, blank line,
    * Content-Length body octets, record separator).
    */
  def encodeRecord(r: WarcRecord): Array[Byte] = {
    val head = new StringBuilder
    head.append("WARC/1.0").append(Crlf)
    head.append("WARC-Type: ").append(r.recordType).append(Crlf)
    head.append("WARC-Record-ID: ").append(r.recordId).append(Crlf)
    head.append("WARC-Target-URI: ").append(r.targetUri).append(Crlf)
    head.append("Content-Length: ").append(r.body.length).append(Crlf)
    head.append(Crlf)
    val os = new ByteArrayOutputStream()
    os.write(head.toString.getBytes("UTF-8"))
    os.write(r.body)
    os.write((Crlf + Crlf).getBytes("UTF-8"))
    os.toByteArray
  }

  /** A genuine WET-convention archive: EACH record is its own gzip member;
    * the members are concatenated. (`gzip -d` inflates the whole file;
    * offset readers inflate one member.)
    */
  def encodeArchive(records: Seq[WarcRecord]): Array[Byte] = {
    val os = new ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new GZIPOutputStream(os)
      gz.write(encodeRecord(r))
      // close(), not just finish(): each member otherwise leaks a native
      // Deflater until GC finalization — this runs per-row on executors.
      // Closing the wrapper is safe: the underlying stream is ours.
      gz.close()
    }
    os.toByteArray
  }

  /** Inflate a (possibly multi-member) gzip stream; a truncated or corrupt
    * member yields the bytes inflated so far. Non-gzip input (no 1F 8B
    * magic) passes through unchanged — uncompressed WARC is legal.
    */
  private[io] def inflate(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || (bytes(0) & 0xFF) != 0x1F ||
      (bytes(1) & 0xFF) != 0x8B) return bytes
    val out = new ByteArrayOutputStream()
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch {
      case _: EOFException => () // truncated member: keep what inflated
      case _: java.util.zip.ZipException => () // corrupt member: same
      case _: java.io.IOException => ()
    }
    out.toByteArray
  }

  /** Parse every complete WARC record out of (possibly gzipped) archive
    * bytes. Framing is the spec's: a `WARC/x.y` version line, `Name: value`
    * headers to a blank line, exactly `Content-Length` body octets, then
    * the two-CRLF record separator. Junk between records is scanned past
    * (to the next `WARC/` line); a record whose declared body runs past
    * the buffer (truncation) is dropped and parsing stops — records parsed
    * before the damage always survive.
    */
  def parseArchive(bytes: Array[Byte]): Seq[WarcParsed] = {
    val b = inflate(bytes)
    val out = scala.collection.mutable.ArrayBuffer[WarcParsed]()
    var i = 0
    def lineEnd(from: Int): Int = { // index just past the next \n
      var j = from
      while (j < b.length && b(j) != '\n') j += 1
      if (j < b.length) j + 1 else -1
    }
    def lineAt(from: Int, to: Int): String =
      new String(b, from, to - from, "UTF-8").stripSuffix("\n")
        .stripSuffix("\r")
    while (i < b.length) {
      // scan to the next version line
      if (i + 5 <= b.length && b(i) == 'W' && b(i + 1) == 'A' &&
        b(i + 2) == 'R' && b(i + 3) == 'C' && b(i + 4) == '/') {
        val ve = lineEnd(i)
        if (ve < 0) return out.toSeq
        val version = lineAt(i, ve)
        // headers to the blank line
        var j = ve
        var headers = Map.empty[String, String]
        var malformed = false
        var blank = false
        while (!blank && !malformed) {
          val he = lineEnd(j)
          if (he < 0) malformed = true
          else {
            val line = lineAt(j, he)
            j = he
            if (line.isEmpty) blank = true
            else line.indexOf(':') match {
              case -1 => malformed = true
              case c => headers += (line.take(c).trim.toLowerCase ->
                line.drop(c + 1).trim)
            }
          }
        }
        val len = headers.get("content-length")
          .flatMap(s => scala.util.Try(s.toLong).toOption)
        if (malformed || len.isEmpty || len.get < 0) {
          i += 5 // not a well-formed record: resume scanning past "WARC/"
        } else if (j + len.get > b.length) {
          return out.toSeq // truncated body: stop, keep completed records
        } else {
          val body = java.util.Arrays.copyOfRange(b, j, j + len.get.toInt)
          out += WarcParsed(version, headers, body)
          i = j + len.get.toInt // the inter-record CRLFs scan past naturally
        }
      } else i += 1
    }
    out.toSeq
  }

  /** Parsed-document row: the pipeline-facing projection of one record. */
  final case class WarcDoc(
      archive: String,
      record_type: String,
      record_id: String,
      target_uri: String,
      content_length: Long,
      text: String)

  /** Archive bytes → document rows (per-record flatMap; bytes never
    * shuffle). `archive` tags provenance (file path or synthetic id).
    */
  def docsFromArchives(archives: Dataset[(String, Array[Byte])])
      : Dataset[WarcDoc] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.flatMap { case (name, bytes) =>
      parseArchive(bytes).map { p =>
        WarcDoc(name,
          p.headers.getOrElse("warc-type", ""),
          p.headers.getOrElse("warc-record-id", ""),
          p.headers.getOrElse("warc-target-uri", ""),
          p.body.length.toLong,
          new String(p.body, "UTF-8"))
      }
    }
  }

  /** S-row source: scan a directory of `.warc.gz`/`.warc.wet.gz` files and
    * emit one row per record. binaryFile gives (path, content); everything
    * downstream of the flatMap is narrow rows.
    */
  def warcScan(spark: SparkSession, path: String): Dataset[WarcDoc] = {
    import spark.implicits._
    docsFromArchives(
      spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])])
  }

  /** binaryFile's fixed schema — file-source STREAMS require it spelled
    * out (no inference pass on an unbounded source).
    */
  private val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  /** STREAMING WET ingestion: a binaryFile file-source stream of crawl
    * archives — each newly-landed archive flows through exactly
    * [[docsFromArchives]]'s per-record law in its micro-batch (stateless
    * flatMap, bookmark semantics from the file source's checkpoint). This
    * is the first mile of the continuously-fed corpus: compose with
    * [[graft.jobs.PretrainCorpus.ingestWave]] /
    * [[graft.streaming.IncrementalDedupStream]] in a foreachBatch sink.
    * Spec-proven: the streamed rows equal [[warcScan]] over the same
    * directory, with each file ingested exactly once across triggers.
    */
  def warcStream(spark: SparkSession, path: String): Dataset[WarcDoc] = {
    import spark.implicits._
    docsFromArchives(
      spark.readStream.format("binaryFile")
        .schema(binaryFileSchema)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])])
  }
}

package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC archive source (ISO 28500 — the format web-curation
  * pipelines actually start from; the q136 RefinedWeb/C4 family reads
  * its `documents` rows from parquet, this is how those rows are
  * minted from a crawl). Pure-JDK: `sc.binaryFiles` carries each
  * archive as a PortableDataStream (STREAMED — the file is never
  * materialized as one byte array, unlike the `binaryFile` DataFrame
  * source), and a per-file record splitter walks
  * `WARC/1.x → headers → Content-Length payload → CRLF CRLF`
  * records, gunzipping when the stream is gzip (Java's
  * GZIPInputStream reads the member-per-record concatenation WARC
  * uses transparently).
  *
  * Scale shape: .warc.gz is not splittable, so the unit of
  * parallelism is the ARCHIVE — exactly how public crawls ship
  * (Common Crawl segments are ~1 GB × ~64 k files per crawl): 1000
  * executors each stream whole archives with O(record) memory.
  * Record parsing is sequential within a file by construction;
  * `minPartitions` spreads many small archives across tasks.
  *
  * Fail-soft (the multimodal codecs' discipline applied to archives):
  * a malformed record — bad version line, missing Content-Length,
  * truncated payload — emits an `ok = false` row carrying the error
  * and position, then parsing of THAT FILE stops (headers are
  * length-prefixed, so there is no reliable resync point); records
  * already parsed are kept. A curation flow counts and routes bad
  * rows instead of silently dropping archives.
  *
  * For `WARC-Type: response` records the payload is an HTTP response;
  * the splitter additionally parses status line + headers and exposes
  * `http_status` / `http_content_type` / `body` (body = payload after
  * the first CRLF CRLF). Other record types carry `body = payload`.
  */
object Warc {

  /** One parsed record (or one fail-soft error row for the file). */
  final case class WarcRow(
      path: String,
      rec_idx: Int,
      rec_type: String,
      url: String,
      warc_date: String,
      content_type: String,
      content_len: Long,
      http_status: Integer,
      http_content_type: String,
      body: Array[Byte],
      ok: Boolean,
      err: String)

  /** Read every record of every archive matched by `path` (glob ok). */
  def read(spark: SparkSession, path: String,
           minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val mp = if (minPartitions > 0) minPartitions
             else spark.sparkContext.defaultParallelism
    spark.sparkContext.binaryFiles(path, mp)
      .flatMap { case (file, pds) =>
        val raw = new BufferedInputStream(pds.open())
        val in = if (isGzip(raw)) new GZIPInputStream(raw) else raw
        // records() closes `in` at EOF / first malformed record, but a
        // consumer that abandons the iterator early (limit/take) never
        // reaches either — close at task completion so the stream can't
        // outlive the task.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: Exception => } })
        records(file, in)
      }
      .toDF()
  }

  /** Peek the 2-byte gzip magic without consuming (stream must be
    * buffered).
    */
  private def isGzip(in: BufferedInputStream): Boolean = {
    in.mark(2)
    val b0 = in.read(); val b1 = in.read()
    in.reset()
    b0 == 0x1f && b1 == 0x8b
  }

  /** Streaming record iterator — pulls one record per `next()`, so a
    * 1 GB archive costs one record of memory. Closes the stream at
    * EOF or first malformed record.
    */
  def records(path: String, in: InputStream): Iterator[WarcRow] =
    new Iterator[WarcRow] {
      private var idx = 0
      private var done = false
      private var pending: WarcRow = _

      private def close(): Unit = { done = true; try in.close() catch { case _: Exception => } }

      private def advance(): Unit = if (pending == null && !done) {
        try {
          val version = nextNonEmptyLine(in)
          if (version == null) close()
          else if (!version.startsWith("WARC/"))
            fail(s"expected WARC/1.x version line, got '${version.take(40)}'")
          else {
            val headers = readHeaders(in)
            val len = headers.get("content-length").map(_.trim.toLong)
              .getOrElse(throw Malformed("record has no Content-Length"))
            val payload = readExactly(in, len)
            val recType = headers.getOrElse("warc-type", "")
            val (status, httpCt, body) =
              if (recType == "response" &&
                  headers.getOrElse("content-type", "")
                    .startsWith("application/http")) parseHttp(payload)
              else (null: Integer, null: String, payload)
            pending = WarcRow(path, idx, recType,
              headers.getOrElse("warc-target-uri", null),
              headers.getOrElse("warc-date", null),
              headers.getOrElse("content-type", null),
              len, status, httpCt, body, ok = true, err = null)
            idx += 1
          }
        } catch {
          case Malformed(msg) => fail(msg)
          case e: EOFException => fail(s"truncated record: ${e.getMessage}")
          case e: Exception => fail(s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }

      private def fail(msg: String): Unit = {
        pending = WarcRow(path, idx, null, null, null, null, -1L,
          null, null, Array.emptyByteArray, ok = false,
          err = s"record $idx: $msg")
        idx += 1
        close()
      }

      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): WarcRow = {
        advance()
        if (pending == null) throw new NoSuchElementException("WARC iterator")
        val r = pending; pending = null; r
      }
    }

  private final case class Malformed(msg: String) extends Exception(msg)

  /** Read one CRLF/LF-terminated header line as UTF-8; null at EOF. */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(96)
    var b = in.read()
    if (b == -1) return null
    while (b != -1 && b != '\n') { buf.write(b); b = in.read() }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
      bytes.length - 1 else bytes.length
    new String(bytes, 0, n, StandardCharsets.UTF_8)
  }

  /** Skip the inter-record CRLF CRLF separators: the next non-empty
    * line, or null at clean EOF.
    */
  private def nextNonEmptyLine(in: InputStream): String = {
    var line = readLine(in)
    while (line != null && line.isEmpty) line = readLine(in)
    line
  }

  /** `Name: value` lines until the empty separator line; names are
    * lower-cased (WARC header names are case-insensitive).
    */
  private def readHeaders(in: InputStream): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var line = readLine(in)
    if (line == null) throw Malformed("EOF inside record headers")
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      if (i <= 0) throw Malformed(s"bad header line '${line.take(40)}'")
      out += (line.substring(0, i).trim.toLowerCase ->
        line.substring(i + 1).trim)
      line = readLine(in)
      if (line == null) throw Malformed("EOF inside record headers")
    }
    out.result()
  }

  private def readExactly(in: InputStream, n: Long): Array[Byte] = {
    require(n >= 0 && n <= Int.MaxValue, s"content-length $n out of range")
    val buf = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val k = in.read(buf, off, n.toInt - off)
      if (k == -1) throw Malformed(
        s"truncated payload: expected $n bytes, got $off")
      off += k
    }
    buf
  }

  /** Split an HTTP response payload: status code from the status
    * line, Content-Type from the headers, body after the first blank
    * line. A payload that is not an HTTP response yields nulls with
    * the whole payload as body (fail-soft, not fail-fatal: the bytes
    * stay visible).
    */
  private def parseHttp(payload: Array[Byte])
      : (Integer, String, Array[Byte]) = {
    val sep = indexOfBlankLine(payload)
    if (sep < 0) return (null, null, payload)
    val head = new String(payload, 0, sep, StandardCharsets.UTF_8)
    val lines = head.split("\r?\n")
    val status: Integer =
      if (lines.nonEmpty && lines(0).startsWith("HTTP/")) {
        val parts = lines(0).split(" ")
        if (parts.length >= 2 && parts(1).forall(_.isDigit))
          Integer.valueOf(parts(1).toInt)
        else null
      } else null
    if (status == null) return (null, null, payload)
    val ct = lines.drop(1).collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring("content-type:".length).trim
    }.orNull
    val bodyStart = skipBlank(payload, sep)
    (status, ct, java.util.Arrays.copyOfRange(payload, bodyStart, payload.length))
  }

  /** Offset of the first CRLFCRLF or LFLF (−1 if none). */
  private def indexOfBlankLine(b: Array[Byte]): Int = {
    var i = 0
    while (i < b.length - 1) {
      if (b(i) == '\n' && b(i + 1) == '\n') return i
      if (i < b.length - 3 && b(i) == '\r' && b(i + 1) == '\n' &&
        b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private def skipBlank(b: Array[Byte], at: Int): Int =
    if (b(at) == '\n') at + 2 else at + 4
}

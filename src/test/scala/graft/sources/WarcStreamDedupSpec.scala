package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The crawl seam's DEEP composition, spec-pinned: .warc.gz archives
  * arriving as a manifest-driven stream feed
  * [[graft.ext.LshIndex.streamingDedupBatch]] DIRECTLY — per
  * micro-batch: WARC parse → HTML→text extraction → id from URL →
  * incremental near-dup pairs against the persisted index → fold the
  * batch in, so later archives pair against earlier ones. The claim
  * (q110's, composed through the WARC/HTML ingest): the union of
  * per-micro-batch pair sets equals ONE streamingDedupBatch call fed
  * all batch docs at once on a fresh index copy.
  */
class WarcStreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private val UTF_8 = java.nio.charset.StandardCharsets.UTF_8

  private def text(i: Int): String = {
    val base = i % 20
    s"alpha$base beta$base gamma$base delta$base epsilon$base"
  }

  private def writeArchive(file: String, ids: Range): Unit = {
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(file))
    ids.foreach { id =>
      val esc = text(id).replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;")
      // no per-id visible text (a headline like <h1>D$id</h1> would
      // make every extracted page unique and kill the duplicates the
      // spec is about); the per-id noise rides in a comment instead —
      // elided by extraction, exactly the q148 boilerplate story
      val body = s"<html><body><!-- id=$id --><p>$esc</p></body></html>"
      val payload =
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
          .getBytes(UTF_8) ++ body.getBytes(UTF_8)
      // Content-Type: application/http is what makes the reader strip
      // the HTTP envelope — without it the status line + headers ride
      // into the extracted text and no batch doc matches the corpus
      val headers = s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: http://x.test/p?id=$id\r\n" +
        "Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n"
      out.write(headers.getBytes(UTF_8))
      out.write(payload)
      out.write("\r\n\r\n".getBytes(UTF_8))
    }
    out.close()
  }

  /** WARC rows → the (doc_id, text) frame the dedup loop consumes:
    * id parsed from the URL, text EXTRACTED from the HTML body.
    */
  private def toDocs(parsed: DataFrame): DataFrame =
    parsed.filter(col("ok") && col("rec_type") === "response")
      .select(
        regexp_extract(col("url"), "id=(\\d+)", 1).cast("long")
          .as("doc_id"),
        graft.functions.HtmlToTextFunctions.htmlToText(
          col("body").cast("string")).as("text"))

  test("archive stream -> extract -> streamingDedupBatch ≡ one-shot batch") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("warc_sdd_")
      .toString
    // corpus index: ids 0..49; batch: 50..99 across TWO archives
    graft.ext.LshIndex.build(spark, s"$root/idx",
      (0 until 50).map(i => (i.toLong, text(i))).toDF("doc_id", "text"),
      "text", "doc_id", shingleWidth = 1, numHashes = 24, numBands = 3)
    writeArchive(s"$root/a0.warc.gz", 50 until 75)
    writeArchive(s"$root/a1.warc.gz", 75 until 100)
    val man = s"$root/manifest"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(man))
    Seq("a0", "a1").foreach { a =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$man/$a.txt"),
        s"$root/$a.warc.gz\n".getBytes(UTF_8))
    }
    val pairsDir = s"$root/pairs"
    var batches = 0
    val q = spark.readStream.option("maxFilesPerTrigger", 1).text(man)
      .writeStream
      .foreachBatch { (b: DataFrame, bid: Long) =>
        val paths = b.collect().map(_.getString(0)).filter(_.nonEmpty)
        if (paths.nonEmpty) {
          batches += 1
          val docs = toDocs(graft.sources.Warc.read(
            spark, paths.mkString(",")))
          graft.ext.LshIndex.streamingDedupBatch(
            spark, s"$root/idx", "text", threshold = 0.9,
            onCensus = (census, _) => require(!census.anyDropped))(
            (pairs, _) =>
              pairs.write.mode("append").parquet(pairsDir))(docs, bid)
        }
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    batches shouldBe 2

    // the one-shot face: the SAME 50 docs in one call on a fresh copy
    graft.ext.LshIndex.build(spark, s"$root/idx2",
      (0 until 50).map(i => (i.toLong, text(i))).toDF("doc_id", "text"),
      "text", "doc_id", shingleWidth = 1, numHashes = 24, numBands = 3)
    val oneDir = s"$root/pairs_one"
    val allDocs = toDocs(graft.sources.Warc.read(
      spark, s"$root/a0.warc.gz,$root/a1.warc.gz"))
    graft.ext.LshIndex.streamingDedupBatch(
      spark, s"$root/idx2", "text", threshold = 0.9)(
      (pairs, _) => pairs.write.mode("append").parquet(oneDir))(allDocs, 0L)

    def pairSet(dir: String): Set[(Long, Long)] =
      spark.read.parquet(dir).select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = pairSet(pairsDir)
    val oneShot = pairSet(oneDir)
    streamed shouldBe oneShot
    // and the composition actually found cross-corpus duplicates
    // (text(i) repeats every 20 ids, so batch docs pair with corpus)
    assert(streamed.exists { case (a, b) => math.min(a, b) < 50 })
    assert(streamed.nonEmpty)
  }
}

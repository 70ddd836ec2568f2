package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSpec {

  private def record(typ: String, uri: String, payload: Array[Byte],
                     extra: Seq[(String, String)] = Nil,
                     lengthOverride: Option[Long] = None): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(typ).append("\r\n")
    if (uri != null) sb.append("WARC-Target-URI: ").append(uri).append("\r\n")
    extra.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append("Content-Length: ")
      .append(lengthOverride.getOrElse(payload.length.toLong)).append("\r\n\r\n")
    sb.toString.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def httpPayload(status: String, mime: String,
                          body: String): Array[Byte] =
    s"HTTP/1.1 $status\r\nContent-Type: $mime\r\nServer: x\r\n\r\n$body"
      .getBytes(UTF_8)

  private def writeFile(dir: java.nio.file.Path, name: String,
                        bytes: Array[Byte], gzip: Boolean): String = {
    val f = dir.resolve(name)
    val os: java.io.OutputStream =
      if (gzip) new GZIPOutputStream(new java.io.FileOutputStream(f.toFile))
      else new java.io.FileOutputStream(f.toFile)
    os.write(bytes); os.close()
    f.toString
  }

  test("parses gzip and plain archives; response records expose HTTP fields") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec_")
    val recs =
      record("warcinfo", null, "software: test\r\n".getBytes(UTF_8)) ++
      record("response", "http://a.example/1",
        httpPayload("200 OK", "text/html; charset=utf-8", "<p>hi</p>"),
        extra = Seq("Content-Type" -> "application/http;msgtype=response")) ++
      record("resource", "http://a.example/raw", "rawbytes".getBytes(UTF_8))
    writeFile(dir, "a.warc.gz", recs, gzip = true)
    writeFile(dir, "b.warc", recs, gzip = false)

    val df = Warc.read(spark, dir.toString + "/*").cache()
    df.count() shouldBe 6
    df.filter(!col("ok")).count() shouldBe 0

    val resp = df.filter(col("rec_type") === "response")
      .select("http_status", "http_content_type", "url").distinct().collect()
    resp.length shouldBe 1
    resp(0).getInt(0) shouldBe 200
    resp(0).getString(1) shouldBe "text/html; charset=utf-8"
    resp(0).getString(2) shouldBe "http://a.example/1"

    // response body excludes the HTTP header block
    val body = df.filter(col("rec_type") === "response")
      .select(col("body").cast("string")).distinct().head().getString(0)
    body shouldBe "<p>hi</p>"

    // resource body is the raw payload
    df.filter(col("rec_type") === "resource")
      .select(col("body").cast("string")).distinct()
      .head().getString(0) shouldBe "rawbytes"
    df.unpersist()
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("truncated payload fails soft: error row, earlier records kept") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec_")
    val bytes =
      record("resource", "http://a.example/ok", "fine".getBytes(UTF_8)) ++
      record("resource", "http://a.example/bad", "xy".getBytes(UTF_8),
        lengthOverride = Some(500L)).dropRight(4)
    writeFile(dir, "t.warc", bytes, gzip = false)
    val rows = Warc.read(spark, dir.toString + "/t.warc")
      .orderBy("rec_idx").collect()
    rows.length shouldBe 2
    rows(0).getAs[Boolean]("ok") shouldBe true
    rows(1).getAs[Boolean]("ok") shouldBe false
    rows(1).getAs[String]("err") should include("truncated payload")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("missing Content-Length and bad version line fail soft") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec_")
    writeFile(dir, "nolen.warc",
      "WARC/1.0\r\nWARC-Type: resource\r\n\r\n".getBytes(UTF_8), gzip = false)
    writeFile(dir, "badver.warc",
      "HELLO/1.0\r\n\r\n".getBytes(UTF_8), gzip = false)
    val rows = Warc.read(spark, dir.toString + "/*.warc").collect()
    rows.length shouldBe 2
    rows.foreach(_.getAs[Boolean]("ok") shouldBe false)
    rows.map(_.getAs[String]("err")).sorted.toSeq match {
      case Seq(a, b) =>
        a should include("expected WARC/1.x version line")
        b should include("no Content-Length")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("a non-HTTP response payload keeps bytes visible with null status") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec_")
    writeFile(dir, "odd.warc",
      record("response", "http://a.example/odd", "notahttpblock".getBytes(UTF_8),
        extra = Seq("Content-Type" -> "application/http;msgtype=response")),
      gzip = false)
    val r = Warc.read(spark, dir.toString + "/odd.warc").head()
    r.getAs[Boolean]("ok") shouldBe true
    assert(r.isNullAt(r.fieldIndex("http_status")))
    new String(r.getAs[Array[Byte]]("body"), UTF_8) shouldBe "notahttpblock"
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }
}

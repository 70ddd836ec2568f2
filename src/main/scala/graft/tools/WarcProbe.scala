package graft.tools

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool behind the SURVEY §9 WARC-ingest runbook row: measures
  * [[graft.sources.Warc]] record-splitter throughput at archive
  * scale — the number a cluster operator multiplies by executor
  * count to size a crawl ingest (the unit of parallelism is the
  * ARCHIVE: .warc.gz is not splittable).
  *
  * Fixture: `nFiles` synthetic .warc.gz archives × `recsPerFile`
  * HTTP response records with ~2 KB bodies (Common-Crawl-ish record
  * grain), cached under SPARK_GRAFT_SCALE_DIR like every probe
  * fixture. Phases:
  *   - `single`: ONE archive end-to-end (per-core streaming rate —
  *     gunzip + record walk + HTTP split);
  *   - `spread`: all archives (the multi-task shape; speedup over
  *     `single` × nFiles shows the parallelism is real);
  *   - `curate`: spread + URL normalization + per-record body md5 —
  *     the q148 pipeline head, pricing "parse is not the bottleneck".
  *
  * Usage: `scripts/run_class.sh graft.tools.WarcProbe [nFiles]
  * [recsPerFile]` (defaults 8 × 25 000 ≈ 8 × ~50 MB gz).
  */
object WarcProbe {

  private def time[T](f: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(8)
    val recsPerFile = args.drop(1).headOption.map(_.toInt).getOrElse(25000)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = s"$out/warc_${nFiles}_${recsPerFile}_w1"
    val rootDir = new java.io.File(root)
    if (!new java.io.File(root, "_SUCCESS").exists()) {
      rootDir.mkdirs()
      // ~2 KB deterministic body per record (compresses like text,
      // not like zeros: per-record distinct filler)
      (0 until nFiles).foreach { f =>
        val gz = new java.util.zip.GZIPOutputStream(
          new java.io.FileOutputStream(s"$root/seg-$f.warc.gz"), 1 << 16)
        (0 until recsPerFile).foreach { r =>
          val id = f.toLong * recsPerFile + r
          val body = {
            val sb = new StringBuilder(2100)
            var k = 0
            while (sb.length < 2000) {
              sb.append("token").append((id * 31 + k) % 99991).append(' ')
              k += 1
            }
            sb.toString
          }
          val payload =
            (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)
              .getBytes(UTF_8)
          val head = new StringBuilder("WARC/1.0\r\n")
            .append("WARC-Type: response\r\n")
            .append(s"WARC-Target-URI: http://www.example.com/p/$id?utm_source=x&id=${id % 1000}\r\n")
            .append("WARC-Date: 2024-01-01T00:00:00Z\r\n")
            .append("Content-Type: application/http;msgtype=response\r\n")
            .append(s"Content-Length: ${payload.length}\r\n\r\n")
          gz.write(head.toString.getBytes(UTF_8))
          gz.write(payload)
          gz.write("\r\n\r\n".getBytes(UTF_8))
        }
        gz.close()
      }
      new java.io.FileOutputStream(s"$root/_SUCCESS").close()
    }
    val gzBytes = rootDir.listFiles.filter(_.getName.endsWith(".gz"))
      .map(_.length).sum
    println(f"fixture: $nFiles files, ${nFiles.toLong * recsPerFile} records, " +
      f"${gzBytes / 1e6}%.1f MB gz")

    def read(path: String) = graft.sources.Warc.read(spark, path)

    // warm + timed, ScaleTrend's protocol
    def run(name: String)(f: => Long): Unit = {
      f
      val (sec, n) = time(f)
      println(f"$name%-8s $sec%8.2f s  ($n rows)  " +
        f"${n / sec / 1000}%.1f krec/s")
    }

    run("single")(read(s"$root/seg-0.warc.gz").count())
    run("spread")(read(s"$root/*.warc.gz").count())
    // the q148 pipeline head: the agg keeps normalize+md5 un-pruned,
    // and the returned row count is the RECORD count so the krec/s
    // column stays comparable
    run("curate")(read(s"$root/*.warc.gz")
      .filter(col("ok") && col("rec_type") === "response")
      .select(graft.ext.UrlOps.normalizeUrl(col("url")).as("nurl"),
        md5(col("body")).as("bmd5"))
      .agg(count(lit(1)).as("n"), countDistinct(col("nurl")),
        count(col("bmd5")))
      .head().getLong(0))
    spark.stop()
  }
}

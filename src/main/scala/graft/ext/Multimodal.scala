package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star ✚): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs per partition so a real codec or model loads ONCE
  * per partition, not per row — the standard Spark pattern for
  * wrapping native decoders.
  *
  * The actual byte decoding is a STUB (no media codecs in this
  * environment): [[StubDecoder.decode]] derives deterministic fake
  * features from the bytes. Everything around it — the binary schema,
  * the typed row shape, per-partition batching, frame sampling — is
  * real and tested; swap `StubDecoder` for a JNI/codec-backed decoder
  * to productionize.
  */
object Multimodal {

  /** Typed media row: bytes + metadata, the cross-modality carrier. */
  final case class MediaRecord(id: Long, kind: String, data: Array[Byte],
                               meta: Map[String, String])

  /** Decoded feature row. */
  final case class MediaFeatures(id: Long, kind: String, n_bytes: Long,
                                 content_id: String, width: Int,
                                 n_frames: Int, n_sampled: Int)

  /** STUB decoder — a real implementation would parse image headers /
    * audio frames here. Deterministic on the input bytes so tests and
    * oracles can replicate it.
    */
  object StubDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(r.data).map("%02x".format(_)).mkString
      val width = if (r.data.isEmpty) 0 else (r.data(0) & 0x7f) % 64 + 16
      val frames = (r.data.length / 1000 + 1).toInt
      MediaFeatures(r.id, r.kind, r.data.length.toLong, sha, width,
        frames, sampleFrames(frames, stride = 2).length)
    }

    /** Frame sampling: every `stride`-th frame index. */
    def sampleFrames(nFrames: Int, stride: Int): Seq[Int] =
      0 until nFrames by stride
  }

  /** Per-partition decode: one decoder instance per partition (where a
    * codec/model handle would be opened), then a tight row loop.
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: val codec = Codec.open() — once per partition
      it.map(StubDecoder.decode)
    }
  }

  /** Lift a (id, kind, binary) frame into the typed media Dataset. */
  def asMedia(df: DataFrame, idCol: String, kindCol: String,
              dataCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
              col(kindCol).as("kind"),
              col(dataCol).as("data"))
      .withColumn("meta", map())
      .as[MediaRecord]
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star ✚): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs per partition so a real codec or model loads ONCE
  * per partition, not per row — the standard Spark pattern for
  * wrapping native decoders.
  *
  * The IMAGE path is real: [[ImageDecoder]] decodes PNG/JPEG/GIF/BMP
  * through the JDK's `javax.imageio` (dimensions, channels, Rec. 601
  * mean luma, bilinear resize + PNG re-encode), with undecodable
  * records carried through as visible `decode_ok = false` rows.
  * The AUDIO path is real for the containers the JDK ships codecs
  * for — WAV/AIFF/AU PCM via `javax.sound.sampled` ([[AudioDecoder]]:
  * sample rate, channels, frame count, duration, RMS energy).
  * Compressed audio (mp3/ogg) and VIDEO remain STUBS
  * ([[StubDecoder.decode]], deterministic fake features — no JDK
  * codecs exist for those); swap in a JNI/codec-backed decoder to
  * productionize. The plumbing — binary schema, typed row shape,
  * per-partition batching, frame sampling — is shared and tested for
  * all paths.
  */
object Multimodal {

  // ImageIO's DEFAULT stream cache is a temp FILE per read/write —
  // disk round-trips plus registry-lock contention that serializes a
  // 32-thread decode scan; in-memory streams are strictly better for
  // the byte-array records this engine decodes (measured: the q158
  // PNG encode+decode pass dropped ~4x)
  javax.imageio.ImageIO.setUseCache(false)

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

  /** REAL image features — decoded with `javax.imageio` (PNG/JPEG/
    * GIF/BMP readers ship in the JDK; no external codec needed).
    * `decode_ok = false` rows carry the undecodable records through
    * the pipeline visibly — a curation flow counts and routes them
    * instead of silently dropping (the reference's skip-bad-cells
    * discipline applied to bytes).
    */
  final case class ImageFeatures(id: Long, n_bytes: Long, content_id: String,
                                 decode_ok: Boolean, format: String,
                                 width: Int, height: Int, n_channels: Int,
                                 mean_luma: Double)

  /** Image decoder over the JDK's ImageIO registry. Deterministic:
    * fixed row-major traversal for the luma mean (Rec. 601 weights
    * over sRGB), content id = sha-256 of the raw bytes.
    */
  object ImageDecoder {
    /** Raster-allocation ceiling (64 M pixels ≈ 256 MB ARGB): a
      * few-KB crafted file declaring 50000×50000 would otherwise OOM
      * the executor — an Error, not an Exception, so uncatchable.
      */
    val MaxDecodedPixels: Long = 64L * 1024 * 1024

    private def sha256(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(b).map("%02x".format(_)).mkString

    def decode(r: MediaRecord): ImageFeatures = {
      val base = ImageFeatures(r.id, r.data.length.toLong, sha256(r.data),
        decode_ok = false, format = "", width = 0, height = 0,
        n_channels = 0, mean_luma = 0.0)
      val iis = try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.data)) catch { case _: Exception => null }
      if (iis == null) base
      else try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) base
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val fmt = reader.getFormatName.toLowerCase
            // decompression-bomb guard: header dims are readable
            // BEFORE allocating the raster; over-cap images flow
            // through as decode_ok = false (with the declared dims
            // visible) like any other bad record
            val (hw, hh) = (reader.getWidth(0), reader.getHeight(0))
            if (hw.toLong * hh > MaxDecodedPixels)
              base.copy(format = fmt, width = hw, height = hh)
            else {
              val img = reader.read(0)
              val (w, h) = (img.getWidth, img.getHeight)
              var sum = 0.0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sum += 0.299 * ((rgb >> 16) & 0xff) +
                    0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                  x += 1
                }
                y += 1
              }
              base.copy(decode_ok = true, format = fmt, width = w, height = h,
                n_channels = img.getColorModel.getNumComponents,
                mean_luma = if (w == 0 || h == 0) 0.0 else sum / (w.toLong * h))
            }
          } finally reader.dispose()
        }
      } catch { case _: Exception => base
      } finally iis.close()
    }

    /** Real resize (area-averaging scale, PNG re-encode) — the
      * thumbnail/normalize step of an image-curation pipeline. Runs
      * per record inside the partition loop; undecodable input
      * returns None.
      */
    def resize(bytes: Array[Byte], maxDim: Int): Option[Array[Byte]] = {
      val img = try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))) catch { case _: Exception => None }
      img.map { src =>
        val scale = maxDim.toDouble / math.max(src.getWidth, src.getHeight)
        val (w, h) = (math.max(1, (src.getWidth * scale).round.toInt),
          math.max(1, (src.getHeight * scale).round.toInt))
        val dst = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        bos.toByteArray
      }
    }
  }

  /** Per-partition REAL image decode — same distribution shape as
    * [[decodeFeatures]], backed by ImageIO instead of the stub.
    */
  def decodeImages(ds: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(ImageDecoder.decode))
  }

  /** Perceptual difference hash (dHash, Krawetz) — the image twin of
    * the text near-dup fingerprints: decode, grayscale to the
    * standard 9×8 luma grid (resize only when the input is not
    * already 9×8 — the bilinear path is JVM-deterministic but not
    * oracle-replayable, so fixtures construct at-grid images), then
    * 64 bits `luma(x+1, y) > luma(x, y)` packed at index `y·8 + x`
    * (index 63 lands in the sign bit — the hash is the full signed
    * long). Near-identical images differ in FEW bits, so Hamming
    * distance is the dedup metric ([[ImageDedup]]). Null when the
    * image cannot be decoded.
    *
    * Luma per pixel is the decoder's exact expression
    * `0.299·R + 0.587·G + 0.114·B` (left-associated doubles), so an
    * oracle can replay every bit from constructed pixel values.
    */
  def dHash(bytes: Array[Byte]): java.lang.Long = {
    val img0 = try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))) catch { case _: Exception => None }
    img0 match {
      case None => null
      case Some(src0) =>
        val src =
          if (src0.getWidth == 9 && src0.getHeight == 8) src0
          else {
            val dst = new java.awt.image.BufferedImage(9, 8,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            try {
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(src0, 0, 0, 9, 8, null)
            } finally g.dispose()
            dst
          }
        def luma(x: Int, y: Int): Double = {
          val rgb = src.getRGB(x, y)
          0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
        }
        var h = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (luma(x + 1, y) > luma(x, y)) h |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        java.lang.Long.valueOf(h)
    }
  }

  /** (id, dhash) frame of a media corpus — undecodable rows carry a
    * null hash (fail-soft, the decoder discipline).
    */
  def dHashes(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(r => (r.id, Option(dHash(r.data)).map(_.longValue))))
      .toDF("id", "dhash")
  }

  /** REAL audio features for PCM containers (WAV/AIFF/AU), decoded
    * with the JDK's `javax.sound.sampled`. Undecodable or non-PCM-16
    * records flow through as `decode_ok = false` rows, same
    * discipline as [[ImageFeatures]].
    */
  final case class AudioFeatures(id: Long, n_bytes: Long, content_id: String,
                                 decode_ok: Boolean, format: String,
                                 sample_rate: Int, n_channels: Int,
                                 n_frames: Long, duration_s: Double,
                                 rms: Double)

  /** Audio decoder over `javax.sound.sampled.AudioSystem` — in the
    * JDK since 1.3 (the "no JDK audio codecs" folklore is wrong for
    * PCM containers). Deterministic: RMS is a fixed-order pass over
    * the normalized samples of every channel; content id = sha-256 of
    * the raw bytes.
    */
  object AudioDecoder {
    /** PCM-buffer ceiling (256 MB): a crafted header declaring hours
      * of audio would otherwise OOM the executor on the read —
      * checked from the header BEFORE allocating, like
      * [[ImageDecoder.MaxDecodedPixels]].
      */
    val MaxPcmBytes: Long = 256L * 1024 * 1024

    private def sha256(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(b).map("%02x".format(_)).mkString

    def decode(r: MediaRecord): AudioFeatures = {
      val base = AudioFeatures(r.id, r.data.length.toLong, sha256(r.data),
        decode_ok = false, format = "", sample_rate = 0, n_channels = 0,
        n_frames = 0L, duration_s = 0.0, rms = 0.0)
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.data))
        try {
          val fmt = ais.getFormat
          val ftype = javax.sound.sampled.AudioSystem
            .getAudioFileFormat(new java.io.ByteArrayInputStream(r.data))
            .getType.toString.toLowerCase
          val frames = ais.getFrameLength
          val fsize = fmt.getFrameSize
          val header = base.copy(format = ftype,
            sample_rate = fmt.getSampleRate.toInt,
            n_channels = fmt.getChannels, n_frames = math.max(frames, 0L))
          // bomb guard: header-declared PCM size checked before alloc
          if (frames < 0 || fsize <= 0 || frames * fsize > MaxPcmBytes) header
          else if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16)
            header // only 16-bit signed PCM measured; others flow as not-ok
          else {
            val pcm = ais.readAllBytes()
            val n = pcm.length / 2
            var sumSq = 0.0
            var i = 0
            while (i < n) {
              val (b0, b1) =
                if (fmt.isBigEndian) (pcm(2 * i + 1), pcm(2 * i))
                else (pcm(2 * i), pcm(2 * i + 1))
              val s = ((b1 << 8) | (b0 & 0xff)).toShort / 32768.0
              sumSq += s * s
              i += 1
            }
            header.copy(decode_ok = true,
              duration_s = frames.toDouble / fmt.getFrameRate,
              rms = if (n == 0) 0.0 else math.sqrt(sumSq / n))
          }
        } finally ais.close()
      } catch { case _: Exception => base } // Unsupported/IO → visible not-ok
    }

    /** PCM-16 WAV encode (test/fixture side of the round-trip): raw
      * samples → RIFF/WAVE bytes through the same JDK stack.
      */
    def encodeWavPcm16(samples: Array[Short], sampleRate: Float,
                       channels: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels,
        true, false) // signed, little-endian
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** Per-partition REAL audio decode — same distribution shape as
    * [[decodeImages]], backed by javax.sound.sampled.
    */
  def decodeAudio(ds: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(AudioDecoder.decode))
  }

  /** Perceptual AUDIO fingerprint — [[dHash]]'s audio twin for the
    * same exact-Hamming dedup machinery ([[ImageDedup]] is hash-
    * generic): decode 16-bit signed PCM (the [[AudioDecoder]] path),
    * take the first `65·frameLen` samples with `frameLen =
    * n/65` (null when the clip is shorter than 65 samples), per-frame
    * ENERGY = the integer sum of `abs(sample)` — all-integer, so an
    * oracle replays every bit with no float-order caveats — and 64
    * bits `energy(i+1) > energy(i)` packed at index i (index 63 in
    * the sign bit, as dHash). Robust to volume scaling direction:
    * energy DELTAS encode the envelope, not the level.
    */
  def audioHash(bytes: Array[Byte]): java.lang.Long = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val frames = ais.getFrameLength
        val fsize = fmt.getFrameSize
        if (frames < 0 || fsize <= 0 ||
            frames * fsize > AudioDecoder.MaxPcmBytes ||
            fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) null
        else {
          val pcm = ais.readAllBytes()
          val n = pcm.length / 2
          val frameLen = n / 65
          if (frameLen == 0) null
          else {
            val energy = new Array[Long](65)
            var f = 0
            while (f < 65) {
              var acc = 0L
              var i = f * frameLen
              val end = i + frameLen
              while (i < end) {
                val (b0, b1) =
                  if (fmt.isBigEndian) (pcm(2 * i + 1), pcm(2 * i))
                  else (pcm(2 * i), pcm(2 * i + 1))
                val s = ((b1 << 8) | (b0 & 0xff)).toShort
                acc += math.abs(s.toLong)
                i += 1
              }
              energy(f) = acc
              f += 1
            }
            var h = 0L
            var i = 0
            while (i < 64) {
              if (energy(i + 1) > energy(i)) h |= 1L << i
              i += 1
            }
            java.lang.Long.valueOf(h)
          }
        }
      } finally ais.close()
    } catch { case _: Exception => null }
  }

  /** (id, ahash) frame of an audio corpus — null for undecodable or
    * too-short rows (fail-soft).
    */
  def audioHashes(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(r =>
      (r.id, Option(audioHash(r.data)).map(_.longValue))))
      .toDF("id", "ahash")
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

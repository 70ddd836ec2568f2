package graft.ext

import graft.SparkSpec
import Multimodal._

/** Multimodal plumbing: typed binary carrier, per-partition stub
  * decode, deterministic features, frame sampling.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeFeatures derives deterministic features from bytes") {
    val recs = Seq(
      MediaRecord(1L, "img", "hello".getBytes("UTF-8"), Map.empty),
      MediaRecord(2L, "img", Array.fill[Byte](2500)(65), Map.empty))
    val out = decodeFeatures(recs.toDS()).collect().sortBy(_.id)
    out(0).n_bytes shouldBe 5L
    out(0).content_id shouldBe
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824"
    out(0).width shouldBe ('h'.toInt % 64) + 16
    out(0).n_frames shouldBe 1
    out(0).n_sampled shouldBe 1
    out(1).n_frames shouldBe 3
    out(1).n_sampled shouldBe 2 // frames 0 and 2 at stride 2
  }

  test("asMedia lifts a binary frame into the typed carrier") {
    val df = Seq((7L, "audio", "abc".getBytes("UTF-8"))).toDF("id", "kind", "data")
    val media = asMedia(df, "id", "kind", "data").collect().head
    media.id shouldBe 7L
    media.kind shouldBe "audio"
    new String(media.data, "UTF-8") shouldBe "abc"
  }

  test("sampleFrames strides correctly") {
    StubDecoder.sampleFrames(5, 2) shouldBe Seq(0, 2, 4)
    StubDecoder.sampleFrames(0, 2) shouldBe Seq.empty
  }

  test("WAV PCM-16 round-trips through the real JDK audio decoder") {
    // 1 s of 440-frame square wave at 8 kHz stereo, amplitude 4096
    val frames = 8000
    val samples = Array.tabulate(frames * 2)(
      j => (if (j % 2 == 0) 4096 else -4096).toShort)
    val wav = AudioDecoder.encodeWavPcm16(samples, 8000f, channels = 2)
    val f = AudioDecoder.decode(MediaRecord(1L, "audio", wav, Map.empty))
    f.decode_ok shouldBe true
    f.format shouldBe "wave"
    f.sample_rate shouldBe 8000
    f.n_channels shouldBe 2
    f.n_frames shouldBe frames.toLong
    f.duration_s shouldBe 1.0
    f.rms shouldBe (4096.0 / 32768.0) // ±A square wave: RMS exactly A/2^15
  }

  test("undecodable audio bytes flow through as decode_ok = false") {
    val junk = AudioDecoder.decode(
      MediaRecord(2L, "audio", "not a wav".getBytes("UTF-8"), Map.empty))
    junk.decode_ok shouldBe false
    junk.n_bytes shouldBe 9L
  }

  test("audio bomb guard rejects a header declaring gigabytes of PCM") {
    val wav = AudioDecoder.encodeWavPcm16(
      Array.tabulate(100)(_.toShort), 8000f, channels = 1)
    // canonical 44-byte RIFF header: patch the data-chunk size (offset
    // 40) and RIFF size (offset 4) to declare ~2 GB of samples
    def putLE(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = (v >>> 24).toByte
    }
    val bomb = wav.clone()
    putLE(bomb, 40, 0x7ffffff0)
    putLE(bomb, 4, 0x7ffffff0 + 36)
    val f = AudioDecoder.decode(MediaRecord(3L, "audio", bomb, Map.empty))
    f.decode_ok shouldBe false // declared size tripped MaxPcmBytes pre-alloc
    f.sample_rate shouldBe 8000 // header fields still reported
  }

  test("decodeAudio runs distributed over the typed carrier") {
    val recs = (1 to 6).map { i =>
      val wav = AudioDecoder.encodeWavPcm16(
        Array.tabulate(400 * i)(j => (if (j % 2 == 0) 1024 else -1024).toShort),
        16000f, channels = 1)
      MediaRecord(i.toLong, "audio", wav, Map.empty)
    }
    val out = decodeAudio(recs.toDS().repartition(3)).collect().sortBy(_.id)
    out.map(_.n_frames).toSeq shouldBe (1 to 6).map(_ * 400L)
    out.foreach { f => f.decode_ok shouldBe true; f.rms shouldBe 1024.0 / 32768.0 }
  }

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImages decodes real PNGs: dims, channels, exact flat-color luma") {
    val white = pngBytes(8, 4, 0xffffff)
    val mid = pngBytes(3, 3, 0x808080) // all channels 128 → luma 128
    val recs = Seq(
      MediaRecord(1L, "img", white, Map.empty),
      MediaRecord(2L, "img", mid, Map.empty),
      MediaRecord(3L, "img", "definitely not an image".getBytes, Map.empty))
    val out = decodeImages(recs.toDS()).collect().sortBy(_.id)
    out(0).decode_ok shouldBe true
    out(0).format shouldBe "png"
    (out(0).width, out(0).height) shouldBe ((8, 4))
    out(0).n_channels shouldBe 3
    // 0.299+0.587+0.114 sums to 1.0 only in exact arithmetic — the
    // double sum is off by ~3 ulps, so compare with a tolerance
    out(0).mean_luma shouldBe 255.0 +- 1e-9
    out(1).mean_luma shouldBe 128.0 +- 1e-9
    // corrupt bytes carried through visibly, not dropped or thrown
    out(2).decode_ok shouldBe false
    out(2).n_bytes shouldBe 23L
    out(2).content_id should have length 64
  }

  test("resize scales the long edge to maxDim preserving aspect, PNG round-trips") {
    val src = pngBytes(40, 20, 0x112233)
    val Some(small) = ImageDecoder.resize(src, maxDim = 10)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(small))
    (back.getWidth, back.getHeight) shouldBe ((10, 5))
    ImageDecoder.resize("junk".getBytes, 10) shouldBe None
  }

  test("jpeg decodes through the same path") {
    val img = new java.awt.image.BufferedImage(5, 7,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val out = decodeImages(Seq(
      MediaRecord(1L, "img", bos.toByteArray, Map.empty)).toDS()).collect().head
    out.decode_ok shouldBe true
    out.format should (be("jpeg") or be("jpg"))
    (out.width, out.height) shouldBe ((5, 7))
  }
}

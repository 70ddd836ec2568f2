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

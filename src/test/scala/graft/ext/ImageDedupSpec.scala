package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Battery for the perceptual-hash image dedup family:
  * [[Multimodal.dHash]] pins and the EXACT Hamming banding
  * ([[ImageDedup.nearDupPairs]]) vs brute force.
  */
class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int)(g: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = g(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash hand pins: monotone rows → all ones; constant → zero") {
    // strictly increasing luma along each row → every comparison true
    Multimodal.dHash(png(9, 8)((x, _) => x * 20)).longValue shouldBe -1L
    Multimodal.dHash(png(9, 8)((_, _) => 77)).longValue shouldBe 0L
    // decreasing rows → no bit set
    Multimodal.dHash(png(9, 8)((x, _) => 200 - x * 20)).longValue shouldBe 0L
    // single comparison flipped: raise pixel (4, 2) above both
    // neighbors of an otherwise constant image → exactly the bits at
    // (x=3, y=2) [luma(4)>luma(3)] set, (x=4, y=2) unset
    val h = Multimodal.dHash(
      png(9, 8)((x, y) => if (x == 4 && y == 2) 200 else 50)).longValue
    h shouldBe (1L << (2 * 8 + 3))
  }

  test("dHash matches the luma formula bit-for-bit on a synthetic grid") {
    def g(x: Int, y: Int): Int = (7 * 37 + x * 19 + y * 11) % 256
    val got = Multimodal.dHash(png(9, 8)(g)).longValue
    var want = 0L
    def luma(x: Int, y: Int): Double = {
      val v = g(x, y)
      0.299 * v + 0.587 * v + 0.114 * v
    }
    for (y <- 0 until 8; x <- 0 until 8)
      if (luma(x + 1, y) > luma(x, y)) want |= 1L << (y * 8 + x)
    got shouldBe want
  }

  test("non-9x8 input goes through the resize path; garbage → null") {
    Multimodal.dHash(png(30, 20)((x, y) => (x * 7 + y * 3) % 256)) should
      not be null
    Multimodal.dHash("not an image".getBytes("UTF-8")) shouldBe null
  }

  test("banding is COMPLETE: pairs ≡ brute force at every threshold") {
    val rnd = new scala.util.Random(11L)
    // random hashes + planted near-pairs at controlled distances
    val base = (0 until 60).map(i => (i.toLong, rnd.nextLong()))
    val planted = (0 until 30).map { i =>
      val (_, h) = base(i % 60)
      var p = h
      (0 until (i % 8)).foreach(b => p ^= 1L << ((b * 11 + i) % 64))
      ((100 + i).toLong, p)
    }
    val df = (base ++ planted).toDF("id", "dhash")
    Seq(0, 3, 6).foreach { t =>
      val got = ImageDedup.nearDupPairs(df, "id", "dhash", t)
        .select("id_a", "id_b", "hamming")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val all = (base ++ planted)
      val brute = (for {
        (a, ha) <- all; (b, hb) <- all if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= t
      } yield (a, b, d)).toSet
      withClue(s"maxHamming=$t: ") { got shouldBe brute }
    }
  }

  test("audioHash pins: envelope bits, scaling invariance, guards") {
    def wav(s: Int => Int, n: Int = 520): Array[Byte] =
      Multimodal.AudioDecoder.encodeWavPcm16(
        (0 until n).map(t => s(t).toShort).toArray, 8000f, 1)
    // constant |sample| → equal frame energies → no bit set
    Multimodal.audioHash(wav(_ => 100)).longValue shouldBe 0L
    // strictly growing |sample| → every delta positive → all 64 bits
    Multimodal.audioHash(wav(t => t + 1)).longValue shouldBe -1L
    // volume scaling a PREFIX of frames flips at most the boundary
    // bit: comparisons inside the scaled region are unchanged
    val base: Int => Int = t => ((t * 17) % 2001) - 1000
    val h0 = Multimodal.audioHash(wav(base)).longValue
    val h2 = Multimodal.audioHash(wav(t =>
      if (t < 16) base(t) * 2 else base(t))).longValue
    java.lang.Long.bitCount(h0 ^ h2) should be <= 2
    // too short (< 65 samples) and garbage → null
    Multimodal.audioHash(wav(_ => 5, n = 64)) shouldBe null
    Multimodal.audioHash("nope".getBytes("UTF-8")) shouldBe null
  }

  test("null hashes pair with nothing; the bucket cap throws loudly") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(5L)))
      .toDF("id", "dhash")
    ImageDedup.nearDupPairs(df, "id", "dhash", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((1L, 3L))
    val clones = (1 to 10).map(i => (i.toLong, 42L)).toDF("id", "dhash")
    an[IllegalArgumentException] should be thrownBy
      ImageDedup.nearDupPairs(clones, "id", "dhash", 2, maxBucketSize = 5)
    an[IllegalArgumentException] should be thrownBy
      ImageDedup.nearDupPairs(clones, "id", "dhash", 64)
  }
}

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
}

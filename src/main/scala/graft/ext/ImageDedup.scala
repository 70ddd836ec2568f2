package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT near-duplicate pairing over 64-bit perceptual hashes
  * ([[Multimodal.dHash]]) by Hamming distance — the multimodal twin
  * of the text dedup family, with a stronger guarantee than MinHash:
  * the candidate generator is COMPLETE, not probabilistic. Split the
  * 64 bits into `maxHamming + 1` disjoint bands; two hashes within
  * Hamming distance `maxHamming` differ in at most `maxHamming` bit
  * positions, so by pigeonhole AT LEAST ONE band is bit-identical —
  * banding recall is exactly 1 (the standard multi-index Hamming
  * trick). Candidates sharing a band are verified with the exact
  * popcount `bit_count(a XOR b)`; both steps are plain integer
  * arithmetic, so a SQL oracle replays the whole operator (and an
  * all-pairs oracle equality PROVES the completeness claim in the
  * gate hash).
  *
  * Scale shape: the corpus shuffles (t+1) band rows per image (a few
  * ints), never pixels; per-bucket pairing is quadratic ONLY within
  * a bucket, guarded by a LOUD census cap (a degenerate bucket —
  * e.g. a constant-image corpus — throws instead of running an
  * unbounded cross join; completeness is the contract, so capping by
  * DROPPING would be a lie).
  */
object ImageDedup {

  val DefaultMaxBucketSize: Long = 100000L

  /** Near-dup pairs (id_a < id_b, hamming ≤ maxHamming) of
    * (`idCol`, `hashCol`) rows; null hashes are skipped (undecodable
    * images pair with nothing).
    */
  def nearDupPairs(df: DataFrame, idCol: String, hashCol: String,
                   maxHamming: Int,
                   maxBucketSize: Long = DefaultMaxBucketSize): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"imageDedup: maxHamming $maxHamming outside [0, 64)")
    require(maxBucketSize > 1, s"imageDedup: maxBucketSize must be > 1")
    val nBands = maxHamming + 1
    val width = 64 / nBands
    // band j: `width` bits from j*width (the last band absorbs the
    // 64 % nBands remainder) — disjoint and covering, which is all
    // pigeonhole needs
    def bandBits(h: Column, j: Int): Column = {
      val lo = j * width
      val w = if (j == nBands - 1) 64 - lo else width
      if (lo + w == 64) shiftrightunsigned(h, lo)
      else shiftrightunsigned(h, lo)
        .bitwiseAND(lit((1L << w) - 1L))
    }
    // materialize the (id, hash) frame ONCE: the census and both join
    // sides scan it, and the upstream is typically a DECODE pipeline
    // (PNG/WAV per row) that must not run three times — two longs per
    // image, trivially driver-side-of-executor-memory sized
    val hashed = df.select(col(idCol).as("id"), col(hashCol).as("h"))
      .filter(col("h").isNotNull)
      .localCheckpoint(true)
    val banded = hashed.select(col("id"), col("h"),
      posexplode(array((0 until nBands)
        .map(j => bandBits(col("h"), j)): _*)).as(Seq("band", "bits")))
    // loud census: a bucket past the cap is a quadratic bomb; the
    // completeness contract forbids silently dropping it
    val census = banded.groupBy(col("band"), col("bits"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("max_bucket")).collect()(0)
    val maxBucket = if (census.isNullAt(0)) 0L else census.getLong(0)
    require(maxBucket <= maxBucketSize,
      s"imageDedup: a (band, bits) bucket holds $maxBucket images " +
        s"(cap $maxBucketSize) — a quadratic pairing bomb; raise the " +
        "cap knowingly or pre-split the corpus")
    val a = banded.select(col("band"), col("bits"),
      col("id").as("id_a"), col("h").as("h_a"))
    val b = banded.select(col("band"), col("bits"),
      col("id").as("id_b"), col("h").as("h_b"))
    a.join(b, Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(h_a ^ h_b)").cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}

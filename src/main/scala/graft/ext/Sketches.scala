package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed cardinality sketch (the prompt's "novel sketch"
  * category): KMV — k minimum values (Bar-Yossef et al. 2002,
  * "Counting distinct elements in a data stream").
  *
  * Why KMV and not HLL here: the estimator is a pure function of the
  * k smallest DISTINCT hash values, and our hash is the portable
  * 52-bit md5 prefix ([[Dedup.hexHash]]) — so a SQL oracle can
  * replay the sketch EXACTLY (row_number over ordered hashes), which
  * `approx_count_distinct`'s HLL++ registers never allow. Same
  * estimator family, hash-checkable.
  *
  * Scale shape: the buffer is a bounded sorted array (≤ k longs),
  * partial-aggregated map-side and MERGEABLE (merge of two k-min
  * sets = k-min of the union) — one pass, k·8 bytes per group
  * shuffled, no matter how many billions of rows. Estimate:
  * exact count when fewer than k distinct hashes were seen, else
  * (k-1) · 2^52 / kth-smallest-hash.
  */
object Sketches {

  /** Hash-space size matching [[Dedup.hexHash]]'s 52-bit output. */
  val HashSpace: Double = 4503599627370496.0 // 2^52

  /** Bounded buffer: ascending, distinct, at most k entries. */
  final case class KmvBuf(var mins: Array[Long])

  /** KMV estimate from a final buffer (exposed for the oracle-parity
    * spec): < k distinct hashes observed → that exact count.
    */
  def estimate(mins: Array[Long], k: Int): Double =
    if (mins.length < k) mins.length.toDouble
    else (k - 1) * HashSpace / mins.last

  /** Integer-weighted reproducible sample key (data mixing): the
    * item's key is the MIN of `weight` independent 52-bit md5 hashes,
    * so taking the k smallest keys across the corpus is weighted
    * sampling WITHOUT replacement — an item with weight w holds w
    * "tickets" in the same uniform hash space, P(next pick) ∝ w,
    * exactly the successive-minima scheme of Efraimidis-Spirakis but
    * with NO transcendentals: pow/log differ in ulps across engines
    * and could flip the k-th boundary, while md5+min is bit-portable,
    * so a SQL oracle replays the sample EXACTLY. Deterministic in
    * (salt, id, weight) → re-runs and retries pick the same sample.
    *
    * Scale shape: map-side key computation (weight hashes per row,
    * keep weights small-integer), then `orderBy(key).limit(k)` plans
    * as TakeOrdered — per-partition top-k, only k rows per partition
    * move. No shuffle of the corpus.
    */
  def weightedKey(id: org.apache.spark.sql.Column,
                  weight: org.apache.spark.sql.Column,
                  salt: String): org.apache.spark.sql.Column =
    // native codegen'd kernel; the interpreted HOF formulation
    // `array_min(transform(sequence(1, w), j -> hexHash(id#j)))` it
    // replaces bit-identically lives on as SketchesSpec's parity
    // reference
    graft.functions.MinHashFunctions.weightedMinKey(
      id.cast("string"), weight.cast("int"), salt)

  /** Bounded quantile-sketch buffer: parallel arrays sorted by hash,
    * at most k entries. `hs` are distinct 52-bit sample-selection
    * hashes; `vs` the sampled values (min value on hash collision, so
    * the buffer content is a pure function of the input SET).
    */
  final case class QSketchBuf(var hs: Array[Long], var vs: Array[Double])

  /** Deterministic sample quantile: value at rank floor(q·(n−1)) of
    * the ascending-sorted sample (the "lower" interpolation — an
    * integer rank pick, so a SQL oracle replays it exactly; no
    * midpoint float arithmetic to drift).
    */
  def sampleQuantile(sortedVs: Array[Double], q: Double): Double =
    if (sortedVs.isEmpty) Double.NaN
    else sortedVs(math.floor(q * (sortedVs.length - 1)).toInt)

  /** Bounded mergeable quantile sketch: a bottom-k-by-hash uniform
    * sample of (hash, value) pairs, quantiles read off the sample.
    * The 100 TB companion to exact `percentile`, whose aggregation
    * buffer holds every distinct value of a group (unbounded for a
    * pathological group) — this buffer is ≤ k pairs (k·16 bytes per
    * group shuffled), partial-aggregated map-side, and MERGEABLE:
    * merge of two bottom-k sets = bottom-k of the union, which is
    * associative AND commutative, so the result is independent of
    * partitioning (a fixed-seed KLL compactor would not be — its
    * output depends on merge order).
    *
    * Like [[kmv]], selection uses the portable 52-bit md5 prefix
    * ([[Dedup.hexHash]]) over a row key, so a SQL oracle replays the
    * EXACT sample (row_number over hash order) and the exact
    * estimates — not just estimate-within-ε. Standard sample-quantile
    * error: O(1/sqrt(k)) in rank.
    *
    * @param qs quantiles to report, each in [0, 1]
    * @param hash sample-selection hash (hash row identity, NOT the
    *             value: equal values must not collapse)
    * @param value the measured column
    */
  def quantileSketch[T](k: Int, qs: Seq[Double])(
      hash: T => Long, value: T => Double): Aggregator[T, QSketchBuf, Seq[Double]] =
    new Aggregator[T, QSketchBuf, Seq[Double]] {
      require(k >= 2, "quantileSketch needs k >= 2")
      require(qs.forall(q => q >= 0 && q <= 1), "quantiles must be in [0,1]")

      override def zero: QSketchBuf = QSketchBuf(Array.empty, Array.empty)

      override def reduce(b: QSketchBuf, row: T): QSketchBuf = {
        val h = hash(row)
        val v = value(row)
        val a = b.hs
        val pos = java.util.Arrays.binarySearch(a, h)
        if (pos >= 0) {
          // hash collision: keep the min value so content is set-determined
          if (v < b.vs(pos)) b.vs(pos) = v
          b
        } else {
          val ins = -pos - 1
          if (a.length < k) {
            val oh = new Array[Long](a.length + 1)
            val ov = new Array[Double](a.length + 1)
            System.arraycopy(a, 0, oh, 0, ins)
            System.arraycopy(b.vs, 0, ov, 0, ins)
            oh(ins) = h; ov(ins) = v
            System.arraycopy(a, ins, oh, ins + 1, a.length - ins)
            System.arraycopy(b.vs, ins, ov, ins + 1, a.length - ins)
            b.hs = oh; b.vs = ov
          } else if (ins < k) {
            // displaces the current max-hash entry; length stays k
            System.arraycopy(a, ins, a, ins + 1, k - ins - 1)
            System.arraycopy(b.vs, ins, b.vs, ins + 1, k - ins - 1)
            a(ins) = h; b.vs(ins) = v
          }
          b
        }
      }

      override def merge(x: QSketchBuf, y: QSketchBuf): QSketchBuf = {
        val (ah, av, bh, bv) = (x.hs, x.vs, y.hs, y.vs)
        val n0 = math.min(k, ah.length + bh.length)
        val oh = new Array[Long](n0)
        val ov = new Array[Double](n0)
        var (i, j, n) = (0, 0, 0)
        while (n < n0 && (i < ah.length || j < bh.length)) {
          if (j >= bh.length || (i < ah.length && ah(i) < bh(j))) {
            oh(n) = ah(i); ov(n) = av(i); i += 1
          } else if (i >= ah.length || bh(j) < ah(i)) {
            oh(n) = bh(j); ov(n) = bv(j); j += 1
          } else { // equal hash across inputs: min value, consume both
            oh(n) = ah(i); ov(n) = math.min(av(i), bv(j)); i += 1; j += 1
          }
          n += 1
        }
        x.hs = if (n == n0) oh else java.util.Arrays.copyOf(oh, n)
        x.vs = if (n == n0) ov else java.util.Arrays.copyOf(ov, n)
        x
      }

      override def finish(b: QSketchBuf): Seq[Double] = {
        val sorted = b.vs.clone()
        java.util.Arrays.sort(sorted)
        qs.map(q => sampleQuantile(sorted, q))
      }

      override def bufferEncoder: Encoder[QSketchBuf] = Encoders.product[QSketchBuf]
      override def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** Bottom-k insert kernel (buffer stays sorted + distinct). */
  private def kmvInsert(b: KmvBuf, h: Long, k: Int): KmvBuf = {
    val a = b.mins
    val pos = java.util.Arrays.binarySearch(a, h)
    if (pos >= 0) b // already one of the k minima
    else {
      val ins = -pos - 1
      if (a.length < k) {
        val out = new Array[Long](a.length + 1)
        System.arraycopy(a, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(a, ins, out, ins + 1, a.length - ins)
        b.mins = out
      } else if (ins < k) {
        // displaces the current maximum; array length stays k
        System.arraycopy(a, ins, a, ins + 1, k - ins - 1)
        a(ins) = h
      }
      b
    }
  }

  /** Bottom-k merge kernel: k-min of the union. Both inputs are
    * sorted+distinct, so a linear merge stopping at k suffices.
    */
  private def kmvUnion(x: KmvBuf, y: KmvBuf, k: Int): KmvBuf = {
    val (a, b) = (x.mins, y.mins)
    val out = new Array[Long](math.min(k, a.length + b.length))
    var (i, j, n) = (0, 0, 0)
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          if (j < b.length && a(i) == b(j)) j += 1 // dedup across inputs
          val v = a(i); i += 1; v
        } else { val v = b(j); j += 1; v }
      out(n) = take; n += 1
    }
    x.mins = if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    x
  }

  /** Typed KMV aggregator over any input with a long-hash extractor:
    * `ds.groupByKey(...).agg(Sketches.kmv[T](k)(_.hashCol))`.
    */
  def kmv[T](k: Int)(hash: T => Long): Aggregator[T, KmvBuf, Double] =
    new Aggregator[T, KmvBuf, Double] {
      require(k >= 2, "kmv needs k >= 2")
      override def zero: KmvBuf = KmvBuf(Array.empty)
      override def reduce(b: KmvBuf, row: T): KmvBuf = kmvInsert(b, hash(row), k)
      override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = kmvUnion(x, y, k)
      override def finish(b: KmvBuf): Double = estimate(b.mins, k)
      override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** KMV variant returning the bottom-k hash SET itself (ascending),
    * the carrier for KMV set algebra (Beyer et al. 2007, "On synopses
    * for distinct-value estimation under multiset operations"):
    *
    *  - the k-min of two sketches' union IS the sketch of A ∪ B
    *    (merge = union — same kernel as [[kmv]]'s merge);
    *  - an element of bottom-k(A ∪ B) that belongs to A necessarily
    *    belongs to bottom-k(A) (fewer than k hashes of A lie below
    *    it), so membership against the SKETCH equals membership
    *    against the full set;
    *
    * hence Jaccard ≈ |{h ∈ bottom-k(A∪B)} ∩ sk(A) ∩ sk(B)| / k' and
    * |A ∩ B| ≈ Jaccard · est(A∪B) are computable from the two bounded
    * arrays alone — cross-corpus overlap (decontamination) WITHOUT
    * ever joining the corpora. Deterministic given the portable md5
    * hash, so a SQL oracle replays the arrays and the estimates
    * exactly.
    */
  def kmvSet[T](k: Int)(hash: T => Long): Aggregator[T, KmvBuf, Seq[Long]] =
    new Aggregator[T, KmvBuf, Seq[Long]] {
      require(k >= 2, "kmvSet needs k >= 2")
      override def zero: KmvBuf = KmvBuf(Array.empty)
      override def reduce(b: KmvBuf, row: T): KmvBuf = kmvInsert(b, hash(row), k)
      override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = kmvUnion(x, y, k)
      override def finish(b: KmvBuf): Seq[Long] = b.mins.toSeq
      override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }
}

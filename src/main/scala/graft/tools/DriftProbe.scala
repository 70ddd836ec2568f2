package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: the measured decay curve behind `IvfIndex.driftStat` —
  * how IVF recall@10 decays as vectors from a DRIFTED distribution are
  * appended against frozen centroids, and how the drift ratio (mean
  * appended assignment distance / train-time mean, read O(1) from the
  * meta) tracks that decay. Converts the "when to retrain" runbook row
  * from advice into a measured threshold (BASELINE.md §"IVF drift";
  * rule in SURVEY §9).
  *
  * Methodology: corpus = ScaleTrend's clustered synthetic (64 dims,
  * 64 hash-derived centers — the q93/scale-row generator, same
  * fixture cache); train k-means exactly as the scale rows do (64
  * seeds, 3 Lloyd rounds), save the index WITH assignments. Drifted
  * batches draw each vector's center from a SHIFTED center set:
  * c' = (1−s)·c_old + s·c_new with c_new from an independent
  * hash-seed space, same noise scale — s=1 is a fully new cluster
  * structure, s=0 reproduces the training distribution (the control
  * run). Batches append CUMULATIVELY (the production shape: a stream
  * of drifted arrivals), and after each step the probe reports:
  *
  *  - `ratio` — `IvfIndex.driftStat`'s appended/train mean-distance
  *    ratio (the O(1) dial a production pipeline reads);
  *  - `recall_drift` — recall@10 vs brute ground truth for 20 DRIFTED
  *    queries over the grown corpus (the population whose recall the
  *    frozen centroids silently lose);
  *  - `recall_train` — same for 20 train-distribution queries (shows
  *    the original corpus keeps serving).
  *
  * Two drift geometries, because they fail differently:
  *  - COHERENT shift (noisePct = train's 10): clusters keep their
  *    tightness but move — near-identical vectors rank the frozen
  *    centroids identically, so they co-assign and recall HOLDS even
  *    at full shift; what degrades is balance (drifted mass piles
  *    into few frozen clusters — the `skew` column, max/mean cluster
  *    size — which is probe-cost inflation, not wrong answers).
  *  - DIFFUSE drift (noisePct ≫ 10): the arriving distribution is
  *    wider than the centroid margins, a query's own noise re-ranks
  *    centroids away from its true neighbors' — recall DECAYS. This
  *    is the silent failure driftStat exists to catch.
  *
  * Usage: `DriftProbe [n] [shiftPct] [fractionsCsv] [noisePct]` —
  * defaults 1000000, 100, `5,10,25,50`, 10 (fractions are CUMULATIVE
  * appended pct of the train corpus size; noisePct scales the drifted
  * batch's per-dim noise, train uses 10).
  */
object DriftProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val shiftPct = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val fractions = args.drop(2).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(5, 10, 25, 50))
    val noisePct = args.drop(3).headOption.map(_.toInt).getOrElse(10)
    val s = shiftPct / 100.0
    val noise = noisePct / 100.0
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", out + "/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dims = ScaleTrend.VecDims
    val centers = ScaleTrend.VecCenters

    def u(seed: Column): Column =
      (pmod(xxhash64(seed), lit(100000L)).cast("double") / 100000.0) - 0.5

    /** `m` drifted vectors with ids starting at `idOffset`; vector i
      * belongs to true cluster i % centers, whose center is the
      * s-interpolation between the TRAIN center (ScaleTrend.synthVecs'
      * seed space) and an independent shifted center (5e9 offset keeps
      * the two seed spaces and the noise seeds disjoint).
      */
    def driftVecs(idOffset: Long, m: Long): DataFrame =
      spark.range(m).select((col("id") + idOffset).as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)), d => (
          u(pmod(col("id") + idOffset, lit(centers.toLong)) * dims + d) * (1.0 - s)
            + u(lit(5000000000L) + pmod(col("id") + idOffset, lit(centers.toLong)) * dims + d) * s
            + u((col("id") + idOffset) * dims + d + 7777777L) * noise
          ).cast("float")).as("embedding"))

    // train corpus + index (ScaleTrend's exact IVF conventions)
    val corpusPath = ScaleTrend.vecsFixture(spark, n, out)
    val corpus = spark.read.parquet(corpusPath)
    val idxPath =
      s"$out/driftidx_${n}_s${shiftPct}_n${noisePct}_${ScaleTrend.VecGenVersion}"
    println(s"n=$n shift=$s noise=$noise fractions=${fractions.mkString(",")}")
    val t0 = System.nanoTime()
    val centroids = graft.ext.Similarity.kmeansTrain(corpus,
      corpus.filter(col("vec_id") < centers.toLong), iters = 3, dims = dims)
    graft.ext.IvfIndex.save(spark, idxPath, centroids,
      Some(graft.ext.Similarity.assignToCentroids(corpus, centroids)))
    println(f"train+save ${(System.nanoTime() - t0) / 1e9}%.1f s; " +
      f"trainMeanDist=${graft.ext.IvfIndex.driftStat(spark, idxPath).trainMeanDist}%.5f")

    val k = 10
    val numQ = 20
    val nprobe = 4
    def recall(index: graft.ext.IvfIndex.Index, queries: DataFrame,
               grown: DataFrame): Double = {
      def pairs(df: DataFrame): Set[(Long, Long)] =
        df.select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = pairs(graft.ext.IvfIndex.search(index, queries, k, nprobe))
      val truth = pairs(graft.ext.Similarity.bruteForceKnn(grown, queries, k))
      got.intersect(truth).size.toDouble / truth.size
    }

    println(f"${"appended"}%-9s ${"ratio"}%8s ${"recall_drift"}%13s ${"recall_train"}%13s ${"skew"}%7s ${"sec"}%7s")
    var appended = 0L
    fractions.foreach { pct =>
      val target = n * pct / 100
      val m = target - appended
      require(m > 0, s"fractions must be increasing: $pct")
      val t1 = System.nanoTime()
      graft.ext.IvfIndex.append(spark, idxPath, driftVecs(n + appended, m))
      appended = target
      val stat = graft.ext.IvfIndex.driftStat(spark, idxPath)
      val index = graft.ext.IvfIndex.load(spark, idxPath)
      // the grown corpus IS the served assignments frame
      val grown = index.assignments.get.select(col("vec_id"), col("embedding"))
      val qDrift = driftVecs(n, numQ.toLong) // first 20 appended vectors
      val qTrain = corpus.filter(col("vec_id") < numQ.toLong)
      val rd = recall(index, qDrift, grown)
      val rt = recall(index, qTrain, grown)
      // probe-cost balance: max/mean assigned-cluster size — coherent
      // drifted mass piles into few frozen clusters and inflates every
      // probe that touches them, even while recall holds
      val sizes = index.assignments.get.groupBy(col("centroid_id")).count()
        .agg(max(col("count")), avg(col("count"))).head()
      val skew = sizes.getLong(0) / sizes.getDouble(1)
      val sec = (System.nanoTime() - t1) / 1e9
      val label = s"$pct%"
      println(f"$label%-9s ${stat.ratio.get}%8.3f $rd%13.3f $rt%13.3f $skew%7.2f $sec%7.1f")
    }

    // the executable dial (IvfIndex.retrainIfDrifted, threshold 2 —
    // the §9 rule): decision latency is the O(1) meta read; firing
    // pays one kmeansTrain + assignment + staged save over the grown
    // survivor corpus. Report post-retrain ratio (re-armed to None)
    // and drifted-population recall against the NEW centroids.
    val t2 = System.nanoTime()
    val report = graft.ext.IvfIndex.retrainIfDrifted(spark, idxPath,
        threshold = 2.0) { c0 =>
      val c = c0.withColumn("embedding", col("embedding").cast("array<float>"))
      val cents = graft.ext.Similarity.kmeansTrain(c,
        c.filter(col("vec_id") < centers.toLong), iters = 3, dims = dims)
      (cents, Some(graft.ext.Similarity.assignToCentroids(c, cents)))
    }
    val retrainSec = (System.nanoTime() - t2) / 1e9
    println(f"retrainIfDrifted(2.0): fired=${report.retrained} " +
      f"(ratio was ${report.stat.flatMap(_.ratio).getOrElse(Double.NaN)}%.3f) " +
      f"in $retrainSec%.1f s")
    if (report.retrained) {
      val stat = graft.ext.IvfIndex.driftStatOption(spark, idxPath)
      val index = graft.ext.IvfIndex.load(spark, idxPath)
      val grown = index.assignments.get.select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      val rd = recall(index, driftVecs(n, numQ.toLong), grown)
      println(f"post-retrain: trainN=${stat.get.trainN} ratio=re-armed " +
        f"recall_drift=$rd%.3f")
    }
    spark.stop()
  }
}

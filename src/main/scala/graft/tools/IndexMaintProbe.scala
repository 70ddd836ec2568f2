package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the measured payoff of `LshIndex.compactFrames` — the
  * per-micro-batch cost of the streaming corpus-growth dedup loop
  * (load + incrementalPairs, which re-lists all three index frames)
  * as the per-append small-file debris accumulates, and what a
  * compaction restores. Feeds BASELINE.md §"Index file maintenance"
  * and the SURVEY §9 cadence rule.
  *
  * Protocol: build the index over the ScaleTrend docs fixture (same
  * generator/banding as the scale rows: 1/24/3), then fold in
  * `appends` marked batches of `batchSize` docs — each append writes
  * a fresh small parquet file set into base/banded/buckets, exactly
  * the streaming fold-in's layout trajectory. A PROBE batch (never
  * appended) is deduped against the index with a timed
  * load+incrementalPairs at three points: fresh build, after all
  * appends, after `compactFrames`. Each probe runs twice
  * back-to-back (cold, warm) — the warm number is the steady-state
  * micro-batch cost. File counts come from `Compaction.census`
  * (footer-verified, the same population `spark.read` lists).
  *
  * Usage: `IndexMaintProbe [family] [n] [appends] [batchSize]` —
  * family `lsh` (default), `ivf` (the [[graft.ext.IvfIndex]]
  * symmetric run: probe = timed load + 20-query
  * `ivfKnnPreassigned` search, appends fold vectors in against
  * frozen centroids, maintenance = `compactAssignments`), or
  * `labelstore` (the [[graft.ext.LabelStore]] run over the cached
  * cclabels fixture: probe = timed `load().count()` — the one-scan
  * broadcast-remap read; appends fold `batchSize` new nodes with a
  * 10% merge-edge / 10% new-new-edge mix — base rows + remap deltas;
  * maintenance = `compact`; the remove leg prices the
  * tombstone+override delta write with empty survivor edges — the
  * re-pair price itself is the lsh family's remove row); numeric
  * defaults 8000000, 100, 8000 (100 × 0.1% batches). A legacy
  * numeric first arg reads as `n` with family `lsh`.
  */
object IndexMaintProbe {

  def main(args: Array[String]): Unit = {
    val (family, rest) = args.headOption match {
      case Some(f) if f.toLongOption.isEmpty => (f, args.drop(1))
      case _ => ("lsh", args)
    }
    require(family == "lsh" || family == "ivf" || family == "labelstore" ||
        family == "labelsoak",
      s"unknown family: $family")
    val n = rest.headOption.map(_.toLong).getOrElse(8000000L)
    val appends = rest.drop(1).headOption.map(_.toInt).getOrElse(100)
    val batchSize = rest.drop(2).headOption.map(_.toLong).getOrElse(8000L)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", out + "/spark-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpusEnd = n - appends * batchSize - batchSize
    require(corpusEnd > 0, s"n=$n too small for $appends x $batchSize appends")
    // fresh path per run: the probe MUTATES the index (appends +
    // compaction), so a cached fixture would not be a fresh build
    val idxPath = s"$out/maintidx_${family}_${n}_a${appends}_b${batchSize}"
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idxPath), true)

    def timed[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    def filesOf(frames: Seq[String]): String =
      frames.map { f =>
        // the delta log does not exist until the first mutation
        if (!fs.exists(new org.apache.hadoop.fs.Path(s"$idxPath/$f")))
          s"$f=absent"
        else {
          val (nf, _, _, _) = graft.ops.Compaction.census(spark, s"$idxPath/$f")
          s"$f=$nf"
        }
      }.mkString(" ")

    println(s"family=$family n=$n appends=$appends batchSize=$batchSize " +
      s"corpusEnd=$corpusEnd")

    if (family == "labelsoak") {
      runLabelSoak(spark, n, appends, batchSize, out, idxPath)
      spark.stop()
      return
    }

    // per-family wiring: build, probe (the steady-state serving op),
    // one marked append, the maintenance op, and the frames censused
    val (build, probe, appendAt, compact, frames): (
        () => Unit, () => Double, Int => Unit, () => String, Seq[String]) =
      family match {
        case "lsh" =>
          val docs = spark.read.parquet(ScaleTrend.docsFixture(spark, n, out))
          val probeBatch = docs.filter(col("doc_id") >= n - batchSize)
          (() => graft.ext.LshIndex.build(spark, idxPath,
              docs.filter(col("doc_id") < corpusEnd), "text", "doc_id",
              ScaleTrend.LshShingleWidth, ScaleTrend.LshNumHashes,
              ScaleTrend.LshNumBands),
            () => timed(graft.ext.LshIndex.incrementalPairs(
              graft.ext.LshIndex.load(spark, idxPath), probeBatch, "text",
              threshold = 0.9)._1.count())._1,
            (k: Int) => {
              val lo = corpusEnd + k * batchSize
              graft.ext.LshIndex.append(spark, idxPath,
                docs.filter(col("doc_id") >= lo && col("doc_id") < lo + batchSize),
                "text", batchMarker = Some(k.toLong))
            },
            () => {
              val r = graft.ext.LshIndex.compactFrames(spark, idxPath)
              s"bucketRows ${r.bucketRowsBefore} -> ${r.bucketRowsAfter}"
            },
            Seq("base.parquet", "banded.parquet", "buckets.parquet"))
        case "ivf" =>
          val vecs = spark.read.parquet(ScaleTrend.vecsFixture(spark, n, out))
          val queries = vecs.filter(col("vec_id") < 20)
          (() => {
              val corpus = vecs.filter(col("vec_id") < corpusEnd)
              val centroids = graft.ext.Similarity.kmeansTrain(corpus,
                corpus.filter(col("vec_id") < ScaleTrend.VecCenters.toLong),
                iters = 3, dims = ScaleTrend.VecDims)
              graft.ext.IvfIndex.save(spark, idxPath, centroids,
                Some(graft.ext.Similarity.assignToCentroids(corpus, centroids)))
            },
            () => timed(graft.ext.IvfIndex.search(
              graft.ext.IvfIndex.load(spark, idxPath), queries,
              k = 10, nprobe = 4).count())._1,
            (k: Int) => {
              val lo = corpusEnd + k * batchSize
              graft.ext.IvfIndex.append(spark, idxPath,
                vecs.filter(col("vec_id") >= lo && col("vec_id") < lo + batchSize),
                batchMarker = Some(k.toLong))
            },
            () => {
              val r = graft.ext.IvfIndex.compactAssignments(spark, idxPath)
              s"rows ${r.rowsBefore} (parity-checked)"
            },
            Seq("assignments.parquet"))
        case "labelstore" =>
          // the store's seed is the ScaleTrend cc labeling fixture
          // (build-once, like the index fixtures) — never rebuild it
          val labelsPath = ScaleTrend.ccLabelsFixturePath(out, n, pct = 1)
          require(fs.exists(new org.apache.hadoop.fs.Path(labelsPath)),
            s"labels fixture $labelsPath missing — run the ScaleTrend " +
              "ccinc shape at this n first")
          val split = ScaleTrend.incSplitFor(n, 1)
          (() => graft.ext.LabelStore.create(spark, idxPath,
              spark.read.parquet(labelsPath)),
            // steady-state read: one base scan + driver delta fold +
            // broadcast remap — the number the MaxDeltaRows bound and
            // the compaction cadence protect
            () => timed(graft.ext.LabelStore.load(spark, idxPath).count())._1,
            (k: Int) => {
              val lo = n + k * batchSize
              val nodes = spark.range(lo, lo + batchSize).toDF("id")
              // 10% merge into existing components, 10% new-new edges,
              // 80% singletons — a fold that writes base rows AND
              // remap deltas every batch
              val ids = spark.range(lo, lo + batchSize)
              // a merge node BRIDGES two existing ids (usually in
              // different components) — that is what writes remap
              // deltas; an edge to a single existing id only labels
              // the new node's base row
              val mergeE = ids.filter(col("id") % 10 === 0)
                .select(col("id").as("s"),
                  (col("id") * 37 % split).as("t"))
                .unionByName(ids.filter(col("id") % 10 === 0)
                  .select(col("id").as("s"),
                    (col("id") * 53 % split).as("t")))
              val newE = ids.filter(col("id") % 10 === 1)
                .select(col("id").as("s"), (col("id") - 1).as("t"))
              graft.ext.LabelStore.foldBatch(spark, idxPath, nodes,
                mergeE.unionByName(newE), batchMarker = Some(k.toLong))
            },
            () => {
              graft.ext.LabelStore.compact(spark, idxPath)
              s"opSeq ${graft.ext.LabelStore.opSeq(spark, idxPath)} " +
                "(parity-checked)"
            },
            Seq("labels.parquet", "deltas.parquet"))
      }

    val (buildSec, _) = timed(build())
    println(f"build $buildSec%.1f s; files: ${filesOf(frames)}")
    println(f"probe after build: cold ${probe()}%.2f s, warm ${probe()}%.2f s")

    val appendSecs = (0 until appends).map(k => timed(appendAt(k))._1)
    println(f"appends: first10 ${appendSecs.take(10).sum / 10}%.2f s/ea, " +
      f"last10 ${appendSecs.takeRight(10).sum / 10}%.2f s/ea, " +
      f"total ${appendSecs.sum}%.1f s")
    println(s"files after $appends appends: ${filesOf(frames)}")
    println(f"probe after appends: cold ${probe()}%.2f s, warm ${probe()}%.2f s")

    val (compactSec, note) = timed(compact())
    println(f"compact $compactSec%.1f s; files: ${filesOf(frames)}; $note")
    println(f"probe after compact: cold ${probe()}%.2f s, warm ${probe()}%.2f s")

    // takedown price (lsh family): remove batchSize corpus docs — one
    // map-side semi-filtered banded scan for the negative deltas, two
    // tiny appends — then the serving probe over the survivor view
    if (family == "lsh") {
      val docs = spark.read.parquet(ScaleTrend.docsFixture(spark, n, out))
      val victims = docs
        .filter(col("doc_id") >= corpusEnd - batchSize
          && col("doc_id") < corpusEnd)
        .select("doc_id")
      val (removeSec, _) =
        timed(graft.ext.LshIndex.remove(spark, idxPath, victims))
      println(f"remove($batchSize docs) $removeSec%.2f s")
      println(f"probe after remove: cold ${probe()}%.2f s, warm ${probe()}%.2f s")
    }
    if (family == "labelstore") {
      // takedown delta-write price: tombstones + re-elected overrides
      // for the touched components (empty survivor edges — the
      // re-pair itself is the lsh family's remove row)
      val split = ScaleTrend.incSplitFor(n, 1)
      val victims = spark.range(split - batchSize, split).toDF("id")
      val emptyEdges = (_: org.apache.spark.sql.DataFrame) =>
        spark.range(0).select(col("id").as("s"), col("id").as("t"))
      val (removeSec, _) = timed(
        graft.ext.LabelStore.remove(spark, idxPath, victims, emptyEdges))
      println(f"remove($batchSize ids) $removeSec%.2f s")
      println(f"probe after remove: cold ${probe()}%.2f s, warm ${probe()}%.2f s")
    }
    spark.stop()
  }

  /** The LONG mixed-op soak (family `labelsoak`): `ops` operations
    * against the 8 M cc-labeling store at the SURVEY §9 cadence rules
    * made executable — every 25th op a takedown with
    * `compactIfOverMass` armed (this fixture's dense dup graph makes
    * every takedown's override mass cross the threshold, so the rule
    * compacts right behind it), every 100th fold a cadence compact.
    * Reads are probed every 50 ops; the run's verdict is the
    * bounded-read table plus the MAX standing delta-log size vs
    * [[graft.ext.LabelStore.MaxDeltaRows]] — in a realistic mix the
    * cap must never be the binding constraint (the cadence fires far
    * below it). Fold edges model the production contract: pair
    * targets come only from the SURVIVING original corpus (takedown
    * pairs come from the post-remove survivor view — foldBatch
    * refuses tombstone-touching edges loudly otherwise).
    */
  private def runLabelSoak(spark: SparkSession, n: Long, ops: Int,
                           batchSize: Long, out: String,
                           idxPath: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val labelsPath = ScaleTrend.ccLabelsFixturePath(out, n, pct = 1)
    require(fs.exists(new org.apache.hadoop.fs.Path(labelsPath)),
      s"labels fixture $labelsPath missing — run the ScaleTrend ccinc " +
        "shape at this n first")
    val split = ScaleTrend.incSplitFor(n, 1)
    def timed[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val (createSec, _) = timed(graft.ext.LabelStore.create(spark, idxPath,
      spark.read.parquet(labelsPath)))
    println(f"create $createSec%.1f s")
    def deltaRows: Long = {
      val dp = new org.apache.hadoop.fs.Path(s"$idxPath/deltas.parquet")
      if (!fs.exists(dp)) 0L
      else graft.ops.Compaction.census(spark, dp.toString)._3
    }
    def readWarm: Double = {
      timed(graft.ext.LabelStore.load(spark, idxPath).count())
      timed(graft.ext.LabelStore.load(spark, idxPath).count())._1
    }
    val emptyEdges = (_: org.apache.spark.sql.DataFrame) =>
      spark.range(0).select(col("id").as("s"), col("id").as("t"))
    var victimCursor = split
    var maxDelta = 0L
    var standing = 0L // delta rows since the last compact (pre-compact peak)
    var cadenceCompacts = 0
    var massCompacts = 0
    val reads = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val foldSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (op <- 1 to ops) {
      if (op % 25 == 0) {
        victimCursor -= batchSize
        val victims = spark.range(victimCursor, victimCursor + batchSize)
          .toDF("id")
        val (sec, mass) = timed(graft.ext.LabelStore.remove(spark, idxPath,
          victims, emptyEdges, compactIfOverMass = 100000L))
        // the cap compares against the PRE-compact standing size — an
        // over-mass auto-compact must not hide the peak it just paid
        // down (first soak run under-reported maxDelta 3.4x this way)
        maxDelta = math.max(maxDelta,
          standing + mass.tombstones + mass.overrides)
        standing = mass.deltaRowsAfter
        if (mass.compacted) massCompacts += 1
        println(f"op $op%4d remove $sec%5.1f s tomb=${mass.tombstones} " +
          f"over=${mass.overrides} compacted=${mass.compacted} " +
          f"peak=$maxDelta")
      } else {
        val lo = n + op * batchSize
        val nodes = spark.range(lo, lo + batchSize).toDF("id")
        val ids = spark.range(lo, lo + batchSize)
        // survivor-only merge targets (see scaladoc); cursor is stable
        // within the op
        val cur = victimCursor
        val mergeE = ids.filter(col("id") % 10 === 0)
          .select(col("id").as("s"), (col("id") * 37 % cur).as("t"))
          .unionByName(ids.filter(col("id") % 10 === 0)
            .select(col("id").as("s"), (col("id") * 53 % cur).as("t")))
        // `id - 1` must stay INSIDE this batch: if lo ≡ 1 (mod 10) the
        // first qualifying id would edge into the previous batch's
        // range, which a remove-op never folded — exclude lo itself so
        // the survivor-only invariant holds for any n/batchSize
        val newE = ids.filter(col("id") % 10 === 1 && col("id") =!= lo)
          .select(col("id").as("s"), (col("id") - 1).as("t"))
        foldSecs += timed(graft.ext.LabelStore.foldBatch(spark, idxPath,
          nodes, mergeE.unionByName(newE), batchMarker = Some(op.toLong)))._1
      }
      // cadence compact fires on the OP counter, not the op kind —
      // every 100th op is also a multiple of 25 (a remove), and a
      // fold-only cadence would silently never fire on this schedule
      // (first soak run: deltas grew unboundedly-within-cap and reads
      // crept 0.45 → 3 s by op 150)
      if (op % 100 == 0) {
        val (sec, _) = timed(graft.ext.LabelStore.compact(spark, idxPath))
        cadenceCompacts += 1
        println(f"op $op%4d cadence compact $sec%5.1f s")
      }
      // footer census of the live log = the current standing size
      // (0 right after a compact)
      standing = deltaRows
      maxDelta = math.max(maxDelta, standing)
      if (op == 1 || op % 50 == 0) {
        val r = readWarm
        reads += ((op, r))
        println(f"op $op%4d read(warm) $r%5.2f s deltaRows=$deltaRows " +
          f"maxDelta=$maxDelta")
      }
    }
    val (finalCompactSec, _) = timed(
      graft.ext.LabelStore.compact(spark, idxPath))
    val finalRead = readWarm
    val total = spark.read.parquet(s"$idxPath/labels.parquet").count()
    println(f"folds: first10 ${foldSecs.take(10).sum / 10}%.2f s/ea, " +
      f"last10 ${foldSecs.takeRight(10).sum / 10}%.2f s/ea, " +
      f"n=${foldSecs.size}")
    println(f"reads probed: min ${reads.map(_._2).min}%.2f s, " +
      f"max ${reads.map(_._2).max}%.2f s over ${reads.size} probes")
    println(f"maxDelta=$maxDelta (cap ${graft.ext.LabelStore.MaxDeltaRows}; " +
      f"binding=${maxDelta >= graft.ext.LabelStore.MaxDeltaRows})")
    println(f"compacts: cadence=$cadenceCompacts overMass=$massCompacts; " +
      f"final compact $finalCompactSec%.1f s, final read $finalRead%.2f s, " +
      f"labels=$total")
  }
}

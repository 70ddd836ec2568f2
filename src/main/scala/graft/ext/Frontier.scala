package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted multi-round CRAWL FRONTIER (north-star ✚) — the stateful
  * system the one-shot q157 round composes into: a real crawl
  * ITERATES, and the state is the SEEN SET (every URL ever enqueued
  * or fetched) plus the per-round frontier election. This store is an
  * index-family artifact (the [[IndexFiles]] protocol — writer lease,
  * meta-last completeness marker, append marker with writer identity
  * for streaming exactly-once), so kills, replays and concurrent
  * writers behave exactly like the LSH/SRP/IVF/label stores:
  *
  *  - `_frontier_meta.json` is deleted first and republished last
  *    around every mutation — a killed fold leaves a meta-less store
  *    that refuses to load (rebuild), never a half-written state;
  *  - `_appended_through` + the streaming query id make a round fold
  *    a REPLAY no-op when the engine re-delivers a micro-batch after
  *    a post-fold pre-commit crash ([[IndexFiles.resolveReplay]]);
  *  - `seen/d{r}` delta frames + `frontier/r{r}` round artifacts are
  *    immutable once the meta covering them is published.
  *
  * Scale shape: [[foldRound]] is O(batch): the round's links are
  * distinct-ed and anti-joined against the seen set, then gated by
  * the per-host robots election ([[Robots.withAllowedPatterns]] —
  * one broadcast join). The seen set is the only growing side; at
  * corpus scale its frames would be bucketed by `nurl` so the
  * anti-join shuffles the batch only — the layout hook is the same
  * delta-frame structure the index family buckets.
  */
object Frontier {

  /** What a fold did: the round it created, new URLs enqueued (after
    * seen-dedup), and the frontier size after the robots gate.
    */
  final case class RoundReport(round: Long, nNew: Long, nFrontier: Long)

  private def metaPath(path: String) = s"$path/_frontier_meta.json"

  private def writeMetaText(spark: SparkSession, path: String,
                            rounds: Long, seenFrom: Long): Unit =
    IndexFiles.publishMetaFile(spark, metaPath(path),
      s"""{"version":1,"rounds":$rounds,"seenFrom":$seenFrom}""")

  private def readMetaField(spark: SparkSession, path: String,
                            field: String): Long = {
    val text = IndexFiles.readMetaFile(spark, path, "_frontier_meta.json",
      s"frontier at $path: _frontier_meta.json missing — the store was " +
        "never created or a mutation died mid-transaction; rebuild it")
    ("\"" + field + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(text)
      .map(_.group(1).toLong)
      .getOrElse(sys.error(
        s"frontier at $path: _frontier_meta.json is corrupt ('$text') — " +
          "rebuild the store"))
  }

  private def readRounds(spark: SparkSession, path: String): Long =
    readMetaField(spark, path, "rounds")

  /** Lowest live seen-delta index ([[compactSeen]] raises it). */
  private def readSeenFrom(spark: SparkSession, path: String): Long =
    readMetaField(spark, path, "seenFrom")

  /** Rounds folded so far (round 0 = the seeds). */
  def rounds(spark: SparkSession, path: String): Long =
    readRounds(spark, path)

  /** Highest streaming batch id folded; −1 if none. */
  def appendedThrough(spark: SparkSession, path: String): Long =
    IndexFiles.appendedThrough(spark, path)

  /** The frontier elected at `round` (0 = seeds). */
  def frontier(spark: SparkSession, path: String, round: Long): DataFrame = {
    val r = readRounds(spark, path)
    require(round >= 0 && round <= r,
      s"frontier at $path: round $round out of range [0, $r]")
    spark.read.parquet(s"$path/frontier/r$round")
  }

  /** Every URL ever enqueued or seeded (union of the live delta
    * frames — one merged frame plus post-compaction deltas).
    */
  def seen(spark: SparkSession, path: String): DataFrame = {
    val r = readRounds(spark, path)
    val s0 = readSeenFrom(spark, path)
    (s0 to r).map(i => spark.read.parquet(s"$path/seen/d$i"))
      .reduce(_ unionAll _)
  }

  /** Create the store: the distinct seeds become round 0's frontier
    * AND the initial seen set.
    *
    * Refuses to clobber foreign data (ADVICE r20): the target must be
    * absent, an empty directory, or an existing (possibly incomplete —
    * a killed create/fold leaves no meta) frontier store; anything
    * else needs `overwrite = true`. Recognition is by entry names —
    * every file a frontier store ever writes lives under `seen/`,
    * `frontier/` or one of the protocol files.
    */
  def create(spark: SparkSession, path: String, seeds: DataFrame,
             overwrite: Boolean = false): Unit = {
    require(seeds.columns.contains("nurl"),
      "Frontier.create: seeds must carry a 'nurl' column")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!overwrite && fs.exists(new Path(path))) {
      val frontierEntries =
        Set("seen", "frontier", "_frontier_meta.json", "_writer.lock",
          "_appended_through")
      val foreign = fs.listStatus(new Path(path))
        .map(_.getPath.getName).filterNot(frontierEntries)
      require(foreign.isEmpty,
        s"Frontier.create at $path: target contains non-frontier " +
          s"entries (${foreign.take(3).mkString(", ")}${
            if (foreign.length > 3) ", …" else ""}) — refusing to " +
          "destroy them; pass overwrite = true to clobber")
    }
    fs.delete(new Path(path), true)
    IndexFiles.withWriterLease(spark, path, "Frontier create") {
      val s = seeds.select("nurl").distinct()
      s.write.parquet(s"$path/seen/d0")
      s.write.parquet(s"$path/frontier/r0")
      writeMetaText(spark, path, 0L, 0L)
    }
  }

  /** The map-side discovery chain a fetched page feeds the fold:
    * extract hrefs ([[graft.functions.HtmlText.links]]), resolve each
    * against the page URL (RFC 3986, [[graft.functions.UrlResolve]]),
    * normalize into the frontier key ([[UrlOps.normalizeUrl]]). The
    * page URL is the page's own frontier key (scheme-less); http is
    * re-affixed for resolution.
    */
  def discoveredLinks(pages: DataFrame, urlCol: String = "nurl",
                      htmlCol: String = "html"): DataFrame =
    pages.select(
        concat(lit("http://"), col(urlCol)).as("_base"),
        explode(graft.functions.HtmlToTextFunctions.htmlLinks(col(htmlCol)))
          .as("_link"))
      .select(graft.functions.ResolveUrlFunctions
        .resolveUrl(col("_base"), col("_link")).as("_abs"))
      // fetchable schemes only (ADVICE r20): mailto:/javascript:/tel:
      // hrefs resolve to absolute URIs of their OWN scheme, and
      // normalizeUrl would mint garbage frontier keys from them (e.g.
      // the userinfo strip turns mailto:user@example.com into host
      // example.com) that then poison the persisted seen set
      .filter(col("_abs").startsWith("http://") ||
        col("_abs").startsWith("https://"))
      .select(UrlOps.normalizeUrl(col("_abs")).as("nurl"))

  /** Fold one crawl round: dedup the discovered links against the
    * seen set, gate the survivors through the per-host robots
    * election, persist the elected frontier as round `rounds+1` and
    * add it to the seen set (enqueued = seen — a disallowed or dead
    * URL is still not re-discovered).
    *
    * @param links normalized candidate URLs (`nurl`) — typically
    *              [[discoveredLinks]] of the pages fetched from the
    *              previous round's frontier
    * @param rules (host, allow, pattern) robots rules,
    *              [[graft.functions.RobotsRules]]-shaped
    * @param batchMarker streaming batch id to record (exactly-once
    *                    replay detection); None for batch callers
    */
  def foldRound(spark: SparkSession, path: String, links: DataFrame,
                rules: DataFrame, batchMarker: Option[Long] = None,
                writer: String = IndexFiles.ManualWriter): RoundReport = {
    IndexFiles.requireWriter(spark, path, writer)
    IndexFiles.withWriterLease(spark, path, "Frontier foldRound") {
      val r = readRounds(spark, path)
      val s0 = readSeenFrom(spark, path)
      // materialize the anti-join ONCE, before the meta swap: the
      // plan reads the seen frames this transaction is about to
      // extend, and both the robots election and the seen delta
      // derive from it
      val newUrls = links.select("nurl").distinct()
        .join(seen(spark, path), Seq("nurl"), "left_anti")
        .localCheckpoint(true)
      val withHostPath = UrlOps.withHostPath(newUrls)
      val elected = Robots
        .withAllowedPatterns(withHostPath, rules, Seq("nurl"))
        .filter(col("allowed")).select("nurl")
        .localCheckpoint(true)
      val nNew = newUrls.count()
      val nFrontier = elected.count()
      // meta delete IS the transaction-open crash marker (the
      // meta-last protocol); the append marker persists — writeMarker
      // is monotonic per writer identity
      val fs = new Path(metaPath(path))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(metaPath(path)), false)
      elected.write.parquet(s"$path/frontier/r${r + 1}")
      // the seen delta is EVERY newly discovered URL, elected or not:
      // a disallowed URL must not be re-gated each time a later page
      // links to it (the docstring's "still not re-discovered")
      newUrls.write.parquet(s"$path/seen/d${r + 1}")
      batchMarker.foreach(id =>
        IndexFiles.writeMarker(spark, path, id, writer))
      writeMetaText(spark, path, r + 1, s0)
      RoundReport(r + 1, nNew, nFrontier)
    }
  }

  /** Merge the live seen-delta frames into ONE frame keyed at the
    * current round — a crawl runs thousands of rounds, and without
    * compaction every [[foldRound]] anti-join unions that many
    * parquet reads. Same transaction discipline as the index-family
    * compactions ([[LabelStore.compact]]): merged frame written to a
    * tmp path first, row-count parity REQUIRED before the swap, meta
    * deleted only once the replacement is complete on disk, and the
    * append marker untouched (compaction is maintenance, not a fold —
    * replay classification must survive it). Frontier round artifacts
    * are not touched either: they are the crawl's history.
    */
  def compactSeen(spark: SparkSession, path: String,
                  targetFileBytes: Long = 128L * 1024 * 1024): Unit =
    IndexFiles.withWriterLease(spark, path, "Frontier compactSeen") {
      val r = readRounds(spark, path)
      val s0 = readSeenFrom(spark, path)
      if (s0 < r) {
        val fs = new Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val tmp = s"$path/seen/compact.tmp"
        fs.delete(new Path(tmp), true)
        val cur = seen(spark, path)
        val n = cur.count()
        // ~64 bytes/URL raw; size output files to the target like the
        // index compactions do
        val parts = math.max(1L, n * 64L / targetFileBytes).toInt
        cur.coalesce(parts).write.parquet(tmp)
        val nOut = spark.read.parquet(tmp).count()
        require(nOut == n,
          s"Frontier.compactSeen at $path: parity check failed ($n rows " +
            s"in, $nOut rows out) — tmp left for inspection, store " +
            "unchanged")
        fs.delete(new Path(metaPath(path)), false)
        (s0 to r).foreach(i =>
          fs.delete(new Path(s"$path/seen/d$i"), true))
        require(fs.rename(new Path(tmp), new Path(s"$path/seen/d$r")),
          s"Frontier.compactSeen: rename failed at $path")
        writeMetaText(spark, path, r, r)
      }
    }

  /** Per-host POLITENESS slice of a round's frontier — a crawler may
    * fetch a host at most once per its Crawl-delay, so a fetch cycle
    * of `cycleSeconds` gives each host `floor(cycle / delay)` slots
    * (never below 1: progress is guaranteed even when delay > cycle,
    * matching the deployed-crawler convention of one fetch per cycle
    * minimum). URLs are ranked per host in deterministic `nurl`
    * order; `fetch_now` marks the in-budget slice and the remainder
    * is the deferred set the next cycle re-ranks. The verdict is the
    * CROSS-MULTIPLIED integer predicate `rank = 1 OR rank·delay ≤
    * cycle` — no division, so a SQL oracle replays every boundary
    * exactly. Hosts without a Crawl-delay line get `defaultDelay`.
    *
    * Scale shape: one broadcast join (per-host delays are one row per
    * host) + one exchange on `host` for the rank — the frontier round
    * is orders of magnitude smaller than the corpus, and the rank
    * window is the minimum any per-host budget needs.
    */
  def politeSlice(frontier: DataFrame, delays: DataFrame,
                  cycleSeconds: Long, defaultDelay: Long = 1L,
                  hostCol: String = "host"): DataFrame = {
    require(cycleSeconds >= 1 && defaultDelay >= 1,
      "Frontier.politeSlice: cycleSeconds and defaultDelay must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val withHost =
      if (frontier.columns.contains(hostCol)) frontier
      else frontier.withColumn(hostCol, UrlOps.hostOf(col("nurl")))
    val d = broadcast(delays.select(col(hostCol).as("_d_host"),
      col("delay").cast("long").as("_d_delay")))
    withHost.join(d, col(hostCol) === col("_d_host"), "left")
      .withColumn("delay",
        greatest(coalesce(col("_d_delay"), lit(defaultDelay)), lit(1L)))
      .drop("_d_host", "_d_delay")
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(hostCol)).orderBy(col("nurl"))))
      .withColumn("fetch_now",
        col("rank") === 1 || col("rank") * col("delay") <= lit(cycleSeconds))
  }

  /** The streaming face: each micro-batch drives ONE crawl round —
    * fetch the latest frontier against the landed `web` (frontier ∩
    * web on `nurl`), discover links, fold. The batch's own rows are
    * only the trigger (a manifest line per landed archive set); the
    * round's input is the persisted frontier, so a replayed batch
    * (post-fold crash before the checkpoint commit) is detected by
    * the marker and skipped — the store already holds its round.
    */
  def streamingRoundBatch(spark: SparkSession, path: String,
                          web: DataFrame, rules: DataFrame)(
      batch: DataFrame, batchId: Long): Unit = {
    val (writerId, alreadyFolded) =
      IndexFiles.resolveReplay(spark, path, "Frontier", batchId)
    if (!alreadyFolded) {
      val fr = frontier(spark, path, rounds(spark, path))
      val pages = web.join(fr, Seq("nurl"))
      foldRound(spark, path, discoveredLinks(pages), rules,
        Some(batchId), writerId)
    }
    ()
  }
}

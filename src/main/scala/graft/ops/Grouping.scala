package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Grouping operators — A1 (group-split), A4 (buckets), A7 (hierarchical
  * rollup).
  *
  * The reference's `split_dataframe_by_groups` (`df_helpers.py:80-123`)
  * returns a list of (key-dict, sub-frame) with NaN groups kept
  * (`dropna=False`) — Spark's `groupBy` keeps null keys by default, so
  * the semantics line up. A distributed "split" is either an aggregation
  * (stay lazy — the fast path) or a partitioned write; materializing each
  * group on the driver is only for dimension-sized key sets, and the API
  * says so.
  */
object Grouping {

  /** A1 — grouped aggregation with the reference's empty-keys special
    * case: empty `keys` ⇒ one whole-table group (`df_helpers.py:96-100`).
    */
  def aggSplit(df: DataFrame, keys: Seq[String],
               aggs: Seq[Column]): DataFrame =
    if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)

  /** Default cap on [[split]]'s group count: 10 000 (key, view) pairs
    * is already past where iterating per-group views makes sense —
    * above it the right tools are [[aggSplit]] (stay lazy) or
    * [[splitToDir]] (one partitioned write, partition-pruned reads).
    */
  val DefaultMaxGroups: Int = 10000

  /** A1 (materialized form) — the literal (key, frame) split, for
    * dimension-sized key sets only — and that contract is EXECUTABLE
    * (the [[graft.ext.BoundedPairs]] house pattern), not a docstring:
    * the distinct-key collect runs under `limit(maxGroups + 1)`, so a
    * high-cardinality key column throws `IllegalArgumentException`
    * after moving at most cap+1 key rows to the driver, never the full
    * key set. Collects the DISTINCT KEYS (not the data) and returns
    * lazily-filtered views. Each view's filter prunes at the scan, so
    * iterating the splits never loads foreign groups.
    */
  def split(df: DataFrame, keys: Seq[String],
            dropKeyCols: Boolean = true,
            maxGroups: Int = DefaultMaxGroups): Seq[(Map[String, Any], DataFrame)] = {
    require(keys.nonEmpty, "split needs at least one key column")
    require(maxGroups > 0 && maxGroups < Int.MaxValue,
      s"split: maxGroups out of range: $maxGroups")
    // limit BEFORE collect: the cap check and the driver transfer are
    // one bounded job — at most cap+1 rows ever leave the executors,
    // so the guard itself cannot OOM the driver it protects
    val keyRows: Array[Row] =
      df.select(keys.map(col): _*).distinct().limit(maxGroups + 1).collect()
    if (keyRows.length > maxGroups) throw new IllegalArgumentException(
      s"Grouping.split: more than $maxGroups distinct key groups on " +
        s"(${keys.mkString(", ")}) — per-group driver views are for " +
        "dimension-sized key sets only; for high-cardinality keys use " +
        "aggSplit (lazy aggregation) or splitToDir (partitioned write)")
    val rest = df.columns.filterNot(keys.contains).toSeq
    keyRows.toSeq.map { r =>
      val keyMap = keys.zipWithIndex.map { case (k, i) => k -> r.get(i) }.toMap
      val pred = keys.zipWithIndex.map { case (k, i) =>
        if (r.isNullAt(i)) col(k).isNull else col(k) === lit(r.get(i))
      }.reduce(_ && _)
      val sub = if (dropKeyCols) df.filter(pred).select(rest.map(col): _*)
                else df.filter(pred)
      keyMap -> sub
    }
  }

  /** A1 (partitioned-write form) — the 100 TB shape of a materialized
    * split: ONE distributed write partitioned by the keys, instead of
    * [[split]]'s N driver-built filtered views (N+1 scans if the
    * caller iterates every group). Hive-style `key=value` directories
    * mean reading one group back is partition-pruned at the source,
    * and the returned (key-map → directory) index is recovered from
    * the directory names, not a separate key scan.
    *
    * Key columns become partition directories, so (as with any
    * partitioned write) they are not stored in the row data — reading
    * a single partition directory yields the non-key columns, exactly
    * [[split]]'s `dropKeyCols = true` view of a group.
    */
  def splitToDir(df: DataFrame, keys: Seq[String],
                 path: String): Seq[(Map[String, String], String)] = {
    require(keys.nonEmpty, "splitToDir needs at least one key column")
    df.write.mode("overwrite").partitionBy(keys: _*).parquet(path)
    val fs = graft.sinks.FileOps.fileSystem(path, df.sparkSession)
    def walk(dir: org.apache.hadoop.fs.Path, acc: Map[String, String],
             remaining: Seq[String]): Seq[(Map[String, String], String)] =
      // full URI, not toUri.getPath: a scheme-less path would resolve
      // against fs.defaultFS on read-back — wrong filesystem off-local
      if (remaining.isEmpty) Seq(acc -> dir.toString)
      else fs.listStatus(dir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(remaining.head + "="))
        .flatMap { s =>
          // the exact inverse of the writer's escapePathName —
          // URLDecoder would corrupt '+' (it is not encoded on write)
          val v = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(s.getPath.getName.drop(remaining.head.length + 1))
          walk(s.getPath, acc + (remaining.head -> v), remaining.tail)
        }
    walk(new org.apache.hadoop.fs.Path(path), Map.empty, keys)
      .sortBy(_._2)
  }

  /** A4 — bucket accumulation: per-key collected numeric list, the
    * distributed form of `get_bucket`/`append_numbers`
    * (`utils/pipeline.py:75-96`). Sorted for determinism.
    */
  def buckets(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(array_sort(collect_list(col(valueCol))).as("bucket"),
           count(lit(1)).as("n"))

  /** A7 — hierarchical subtree rollup, the reference's signature
    * post-order directory aggregation (`core/engine.py:338-370`): stats
    * at level k cover the whole subtree below it. `rollup` computes all
    * prefixes of the level columns in one pass (partial aggregation
    * map-side, one shuffle).
    */
  def subtreeRollup(df: DataFrame, levels: Seq[String],
                    aggs: Seq[Column]): DataFrame =
    df.rollup(levels.map(col): _*).agg(aggs.head, aggs.tail: _*)
}

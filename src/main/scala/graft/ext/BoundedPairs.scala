package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Executable bound for the all-pairs verify primitives.
  *
  * Brute-force pair comparison (exact Jaccard, exact cosine) is
  * quadratic by construction — it exists as the VERIFY-stage
  * primitive next to the LSH/SRP/IVF scale paths, and is safe only
  * because its input is a bounded slice. This helper makes that
  * contract executable instead of a comment: the slice is counted
  * eagerly and the pair join REFUSES to run when it exceeds the cap,
  * so the primitive cannot silently be pointed at a corpus (where
  * the right tool is the banded/bucketed path, never all-pairs).
  *
  * The eager count is one cheap job over the slice (Catalyst prunes
  * payload columns out of a count) — negligible at verify scale, and
  * the price of a guarantee the plan alone cannot give: a crossJoin's
  * cost is invisible until it runs.
  */
object BoundedPairs {

  /** Default slice cap: 2 000 rows ≈ 2 M candidate pairs, the upper
    * end of what an exact verify pass should ever score.
    */
  val DefaultMaxRows: Long = 2000L

  /** All unordered pairs of `slice` as one row each: every column `c`
    * appears twice, suffixed `c_a` / `c_b`, with `idCol_a < idCol_b`.
    * Throws `IllegalArgumentException` when the slice holds more than
    * `maxRows` rows.
    *
    * The slice is SNAPSHOTTED (eager localCheckpoint) and the
    * authoritative cap count runs on the snapshot: the guard's count,
    * the `a` branch, and the `b` branch must all see the identical
    * row set, which three independent re-executions of a
    * nondeterministic plan (a `sample`, a non-deterministic filter)
    * would not guarantee — the cap could pass on one row set while
    * the join runs over another, silently defeating the guard. A
    * cheap `limit(cap+1)` probe runs FIRST so a corpus-sized input
    * normally throws before anything materializes — best-effort for
    * NONdeterministic plans (a `sample`/`rand` filter can re-execute
    * smaller under the probe than under the snapshot, in which case
    * the oversized row set does materialize once before the
    * authoritative snapshot count throws; the CAP still holds
    * either way, only the no-materialization fast-fail is
    * deterministic-input-only). The snapshot the join sees is
    * therefore always cap-bounded (≤ `maxRows` verify-slice rows)
    * and its blocks are released by the context cleaner once the
    * returned frame is unreachable.
    */
  def allPairs(slice: DataFrame, idCol: String,
               maxRows: Long = DefaultMaxRows): DataFrame = {
    require(slice.columns.contains(idCol),
      s"BoundedPairs.allPairs: id column '$idCol' not in ${slice.columns.mkString(", ")}")
    require(maxRows > 0 && maxRows < Int.MaxValue,
      s"BoundedPairs.allPairs: maxRows out of range: $maxRows")
    def overCap(n: Long): Nothing = throw new IllegalArgumentException(
      s"BoundedPairs.allPairs: slice has $n rows > cap $maxRows — the " +
        "all-pairs primitive is quadratic by construction and exists for " +
        "bounded verify slices only; for corpora use the LSH/SRP/IVF " +
        "scale paths (Dedup.lshNearDupPairs, Similarity.srpNearDupPairs/ivfKnn)")
    // fail fast BEFORE materializing: a corpus-sized input must throw
    // from a cheap early-out probe, not after snapshotting it
    val probe = slice.limit(maxRows.toInt + 1).count()
    if (probe > maxRows) overCap(probe)
    val snap = slice.localCheckpoint(true)
    val n = snap.count()
    if (n > maxRows) overCap(n) // authoritative on the snapshot the join uses
    val a = snap.select(snap.columns.map(c => col(c).as(s"${c}_a")).toSeq: _*)
    val b = snap.select(snap.columns.map(c => col(c).as(s"${c}_b")).toSeq: _*)
    a.crossJoin(b).filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
  }
}

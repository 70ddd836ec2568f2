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
    */
  def allPairs(slice: DataFrame, idCol: String,
               maxRows: Long = DefaultMaxRows): DataFrame = {
    require(slice.columns.contains(idCol),
      s"BoundedPairs.allPairs: id column '$idCol' not in ${slice.columns.mkString(", ")}")
    val n = slice.count()
    require(n <= maxRows,
      s"BoundedPairs.allPairs: slice has $n rows > cap $maxRows — the " +
        "all-pairs primitive is quadratic by construction and exists for " +
        "bounded verify slices only; for corpora use the LSH/SRP/IVF " +
        "scale paths (Dedup.lshNearDupPairs, Similarity.srpNearDupPairs/ivfKnn)")
    val a = slice.select(slice.columns.map(c => col(c).as(s"${c}_a")).toSeq: _*)
    val b = slice.select(slice.columns.map(c => col(c).as(s"${c}_b")).toSeq: _*)
    a.crossJoin(b).filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
  }
}

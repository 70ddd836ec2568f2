package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted equi-join (SURVEY.md "salting for skew"): when one join
  * key dominates, all its rows land on one reducer. Salting splits the
  * skewed (large) side across `saltBuckets` shuffle partitions by a
  * random-but-deterministic salt, and replicates the small side once
  * per bucket so every salted row still finds its match.
  *
  * AQE's skew-join handles most cases at runtime; explicit salting
  * remains the tool when a single key exceeds what one task can hold
  * even after AQE splits, or when the join is written once and run on
  * many engines.
  */
object Salting {

  /** Deterministic salt in [0, buckets): hash of the whole row's key +
    * a disambiguator column (here: a stable row hash), NOT rand() —
    * retries and speculative tasks must agree.
    */
  private def salt(cols: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(cols: _*), lit(buckets))

  /** Equi-join `big` (skewed) with `small` on `key`, salted into
    * `buckets` partitions. `small` is replicated `buckets`× (keep it
    * broadcast-sized or the explode cost dominates).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      salt(big.columns.map(col).toSeq, buckets))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}

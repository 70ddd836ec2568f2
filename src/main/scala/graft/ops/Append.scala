package graft.ops

import org.apache.spark.sql.DataFrame

/** Schema-evolving append — A8 / J3.
  *
  * The reference's `write_data_to_database` aligns the column sets of the
  * existing and incoming frames and NA-fills both directions
  * (`df_helpers.py:339-357`); `pd.concat` index-aligned merging
  * (`process_blade_load.py:59`) is the same operation. Spark's
  * `unionByName(allowMissingColumns = true)` is the exact distributed
  * equivalent: missing columns become nulls, order-insensitive by name.
  */
object Append {

  def evolve(base: DataFrame, incoming: DataFrame): DataFrame =
    base.unionByName(incoming, allowMissingColumns = true)

  def evolveAll(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "evolveAll of no frames")
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}

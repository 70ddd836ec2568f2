package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Append, ConditionFilter, Projections}

/** Per-table metadata, mirroring the reference's in-memory table DB
  * (`utils/adapters/df_helpers.py:187-562`):
  *  - `tableKeys`: default grouping keys (`table_keys`)
  *  - `baseColNames`: default projection (`base_col_names`)
  *  - `keys`: declared composite primary key (`keys`)
  * plus free-form tags (the record-store key dict of
  * `deprecated/simple_table_backend.py:54-64`).
  */
final case class TableMeta(
    tableKeys: Seq[String] = Nil,
    baseColNames: Seq[String] = Nil,
    keys: Seq[String] = Nil,
    tags: Map[String, String] = Map.empty) {

  /** Stable id: tags serialized with sorted keys then hashed — same
    * contract as `_serialize_table_keys` (`simple_table_backend.py:54-64`),
    * canonical across JVM runs.
    */
  def stableId: String = {
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val json = tags.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(json.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}

/** Named-table catalog with schema-evolving append and metadata-defaulted
  * reads — the Spark face of `write_data_to_database` /
  * `get_data_from_database`. Frames are lazy plans; "writing" composes a
  * union, and Spark temp views make every entry SQL-addressable.
  */
final class TableCatalog(spark: org.apache.spark.sql.SparkSession) {
  import scala.collection.mutable

  private val tables = mutable.LinkedHashMap.empty[String, (DataFrame, TableMeta)]

  def names: Seq[String] = tables.keys.toSeq
  def contains(name: String): Boolean = tables.contains(name)
  def meta(name: String): TableMeta = tables(name)._2
  def frame(name: String): DataFrame = tables(name)._1

  /** Write-or-append with schema evolution (A8) and the reference's key
    * validation: declared keys must exist in the combined column set
    * (`df_helpers.py:287-336`).
    */
  def write(name: String, df: DataFrame,
            meta: TableMeta = TableMeta(),
            append: Boolean = true): Unit = {
    val merged = tables.get(name) match {
      case Some((old, oldMeta)) if append =>
        val m = if (meta == TableMeta()) oldMeta else meta
        (Append.evolve(old, df), m)
      case _ => (df, meta)
    }
    val cols = merged._1.columns.toSet
    val missing = (merged._2.tableKeys ++ merged._2.keys).filterNot(cols)
    require(missing.isEmpty,
      s"table '$name': declared keys $missing absent from columns $cols")
    tables(name) = merged
    merged._1.createOrReplaceTempView(name)
  }

  /** Metadata-defaulted grouped read (A2) — `get_data_from_database`
    * (`df_helpers.py:375-562`): filter, then group by
    * `tableKeys − filtered keys` (inferred), project `baseColNames`.
    * Returns the filtered/projected frame plus the inferred group keys,
    * letting the caller aggregate (lazy) or split.
    */
  def read(name: String,
           filters: Map[String, ConditionFilter.Cond] = Map.empty,
           outCols: Seq[String] = Nil,
           groupKeys: Option[Seq[String]] = None): (DataFrame, Seq[String]) = {
    val (df, m) = tables(name)
    val filtered =
      if (filters.isEmpty) df else ConditionFilter(df, filters)
    val inferredKeys = groupKeys.getOrElse(
      m.tableKeys.filterNot(filters.keySet))
    val projCols =
      if (outCols.nonEmpty) outCols
      else if (m.baseColNames.nonEmpty) (inferredKeys ++ m.baseColNames).distinct
      else filtered.columns.toSeq
    (Projections.project(filtered, projCols), inferredKeys)
  }

  /** Grouped-read convenience: aggregate the metadata-inferred groups. */
  def readGrouped(name: String,
                  filters: Map[String, ConditionFilter.Cond],
                  aggs: Seq[Column]): DataFrame = {
    val (df, keys) = read(name, filters)
    if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Nested-path flatten/unflatten — the reference's nested-dict
  * utilities (`utils/nested_dicts.py:121-226`): its context namespaces
  * address values by key paths and can flatten a nested dict to
  * `a.b.c` keys and back. The Spark analog operates on `StructType`
  * columns: flatten explodes every struct field (recursively) into a
  * dot-named top-level column; unflatten regroups dot-named columns
  * into structs. Pure projections — codegen'd, no shuffle, and column
  * pruning still reaches the scan because the projection is explicit.
  */
object NestedPaths {

  /** All leaf paths of a schema, depth-first, as dot-joined names. */
  def leafPaths(schema: StructType, prefix: String = ""): Seq[String] =
    schema.fields.flatMap {
      case StructField(name, st: StructType, _, _) =>
        leafPaths(st, s"$prefix$name.")
      case StructField(name, _, _, _) => Seq(s"$prefix$name")
    }.toSeq

  /** Flatten every struct column into dot-named leaf columns
    * (`{"a": {"b": 1}}` → column `a.b`), non-struct columns unchanged.
    */
  def flatten(df: DataFrame): DataFrame = {
    val cols = leafPaths(df.schema).map { path =>
      // col("a.b") navigates the struct; the alias keeps the dotted name
      col(path).as(path)
    }
    df.select(cols: _*)
  }

  /** Unflatten dot-named columns back into nested structs
    * (column `a.b` → struct column `a` with field `b`). Column order
    * follows first appearance, as in the reference.
    */
  def unflatten(df: DataFrame): DataFrame = {
    val names = df.columns.toSeq
    def build(paths: Seq[String], prefix: String): Seq[Column] = {
      val groups = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
      paths.foreach { p =>
        val head = p.takeWhile(_ != '.')
        val rest = if (p.contains('.')) p.drop(head.length + 1) else ""
        groups(head) = groups.getOrElse(head, Vector.empty) :+ rest
      }
      groups.toSeq.map { case (head, rests) =>
        if (rests.forall(_.isEmpty)) col(s"`$prefix$head`").as(head)
        else struct(build(rests.filter(_.nonEmpty), s"$prefix$head."): _*).as(head)
      }
    }
    df.select(build(names, ""): _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Condition-map filter — the engine's P1 operator.
  *
  * Reproduces the semantics of the reference's `filter_dataframe`
  * (`utils/adapters/df_helpers.py:9-77`): a map of column → condition where
  * a condition is a scalar (equality), a collection (membership), `null`
  * (is-null test), or an arbitrary predicate; conditions combine with
  * AND or OR. The reference's `fillna(False)` null-safe masking matches
  * Spark's 3-valued logic: a null comparison is not TRUE, so the row is
  * dropped — no special handling needed.
  *
  * Everything compiles to a single `Column` tree, so Catalyst pushes the
  * predicate into the scan (visible as `PushedFilters` in `.explain`) —
  * at 100 TB this is the difference between reading a row group and
  * skipping it.
  */
object ConditionFilter {

  sealed trait Cond
  /** Scalar equality (`df[col] == v`). */
  final case class Eq(value: Any) extends Cond
  /** Membership (`df[col].isin(...)`). */
  final case class In(values: Seq[Any]) extends Cond
  /** `None` in the reference ⇒ is-null (`df_helpers.py:54-55`). */
  case object IsNull extends Cond
  /** Callable-predicate analog: arbitrary Column → Column function. */
  final case class Pred(f: Column => Column) extends Cond

  /** Combine modes of `filter_dataframe(..., combine=)`. */
  sealed trait Combine
  case object And extends Combine
  case object Or extends Combine

  def compile(conds: Map[String, Cond]): Map[String, Column] =
    conds.map { case (name, cond) =>
      val c = col(name)
      name -> (cond match {
        case Eq(v)     => c === lit(v)
        case In(vs)    => c.isin(vs.map(lit): _*)
        case IsNull    => c.isNull
        case Pred(f)   => f(c)
      })
    }

  def predicate(conds: Map[String, Cond], combine: Combine = And): Column = {
    val cols = compile(conds).values.toSeq
    require(cols.nonEmpty, "empty condition map")
    combine match {
      case And => cols.reduce(_ && _)
      case Or  => cols.reduce(_ || _)
    }
  }

  def apply(df: DataFrame, conds: Map[String, Cond],
            combine: Combine = And): DataFrame = {
    val unknown = conds.keySet -- df.columns.toSet
    require(unknown.isEmpty, s"unknown filter columns: $unknown")
    df.filter(predicate(conds, combine))
  }
}

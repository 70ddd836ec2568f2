package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Selector mini-language → `Column` compiler — the engine's P2 operator.
  *
  * The reference's record store matches table tags / metadata / column
  * values against string selectors (`deprecated/simple_table_backend.py:
  * 102-123`, `deprecated/table_backend.py:73-108`):
  *   - `re:<regex>`   — regex search (unanchored)
  *   - `in:<substr>`  — substring containment
  *   - glob (`*?[`)   — fnmatch full-match
  *   - anything else  — exact string equality
  *   - a list         — membership
  *   - a callable     — predicate
  *
  * Compilation happens at plan-build time on the driver: a selector that
  * names a partition/tag column becomes a partition-pruning filter; a
  * selector over data columns becomes an ordinary pushed predicate. No
  * custom Catalyst expression is needed (SURVEY.md §7.3) — glob compiles
  * to an anchored `rlike`.
  */
object Selectors {

  sealed trait Selector
  final case class Re(pattern: String) extends Selector
  final case class Substr(s: String) extends Selector
  final case class Glob(pattern: String) extends Selector
  final case class Exact(value: String) extends Selector
  final case class OneOf(values: Seq[String]) extends Selector
  final case class Pred(f: Column => Column) extends Selector

  private val globChars = Set('*', '?', '[')

  /** Parse a selector string exactly as the reference classifies them. */
  def parse(s: String): Selector =
    if (s.startsWith("re:")) Re(s.drop(3))
    else if (s.startsWith("in:")) Substr(s.drop(3))
    else if (s.exists(globChars)) Glob(s)
    else Exact(s)

  /** fnmatch-style glob → anchored Java regex. */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          val close = glob.indexOf(']', i + 1)
          if (close < 0) { sb.append("\\[") }
          else {
            var cls = glob.substring(i + 1, close)
            if (cls.startsWith("!")) cls = "^" + cls.drop(1)
            sb.append('[').append(cls).append(']')
            i = close
          }
        case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('$').toString
  }

  /** Compile a parsed selector against a column. */
  def toColumn(c: Column, sel: Selector): Column = sel match {
    case Re(p)       => c.rlike(p) // unanchored search, like re.search
    case Substr(s)   => c.contains(s)
    case Glob(g)     => c.rlike(globToRegex(g))
    case Exact(v)    => c === lit(v)
    case OneOf(vs)   => c.isin(vs.map(lit): _*)
    case Pred(f)     => f(c)
  }

  /** Parse-and-compile convenience for string selectors. */
  def toColumn(c: Column, selector: String): Column =
    toColumn(c, parse(selector))

  /** Compile a map of column → selector into one conjunctive predicate. */
  def predicate(selectors: Map[String, Selector]): Column =
    selectors.map { case (name, s) => toColumn(col(name), s) }
      .reduce(_ && _)
}

package graft.pipeline

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Named-processor registry — the reference's decorator registry
  * (`decorators/processor.py:106-298`): names map to frame transforms,
  * last registration wins (hot-reload semantics), metadata introspectable.
  *
  * Processors are `(DataFrame, config) => DataFrame` — whole-frame
  * transforms, so "run processor per matching path" becomes one
  * vectorized transform over the matching subset, not a per-row loop.
  */
final class Registry {

  final case class Entry(name: String,
                         fn: (DataFrame, Map[String, String]) => DataFrame,
                         kind: String = "inline",
                         mustExecute: Boolean = false)

  private val entries = mutable.LinkedHashMap.empty[String, Entry]

  /** Register (or re-register — last wins) a processor. */
  def register(name: String, kind: String = "inline",
               mustExecute: Boolean = false)
              (fn: (DataFrame, Map[String, String]) => DataFrame): Unit =
    entries(name) = Entry(name, fn, kind, mustExecute)

  def apply(name: String): Entry =
    entries.getOrElse(name,
      throw new NoSuchElementException(s"processor '$name' not registered"))

  def contains(name: String): Boolean = entries.contains(name)

  /** `get_all_processors` analog. */
  def all: Seq[Entry] = entries.values.toSeq
}

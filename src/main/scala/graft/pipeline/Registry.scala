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

  /** Register a processor wrapped in retry-with-backoff — the
    * reference's decorator composition (`@processor` over `@retry`,
    * `decorators/processor.py:316-362`). On exhaustion the last error
    * rethrows, so the Runner's fail-soft step log records it exactly
    * like an unretried failure (reference parity: the decorator's
    * error record becomes the engine's failure path). Plan-building
    * retries driver-side logic only; Spark tasks already retry
    * internally at action time.
    */
  def registerWithRetry(name: String, attempts: Int = 3,
                        initialDelayMs: Long = 1000, backoff: Double = 2.0,
                        kind: String = "inline", mustExecute: Boolean = false,
                        sleep: Long => Unit = Thread.sleep)
                       (fn: (DataFrame, Map[String, String]) => DataFrame): Unit =
    register(name, kind, mustExecute) { (df, cfg) =>
      val out = Retry(attempts, initialDelayMs, backoff, sleep)(fn(df, cfg))
      out.result.getOrElse(throw new RuntimeException(
        s"$name failed after ${out.attempts} attempts: ${out.error.getOrElse("?")}"))
    }

  def apply(name: String): Entry =
    entries.getOrElse(name,
      throw new NoSuchElementException(s"processor '$name' not registered"))

  def contains(name: String): Boolean = entries.contains(name)

  /** `get_all_processors` analog. */
  def all: Seq[Entry] = entries.values.toSeq
}

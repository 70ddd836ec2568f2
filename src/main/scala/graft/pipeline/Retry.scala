package graft.pipeline

/** Retry with exponential backoff returning a structured outcome —
  * the reference's `retry` decorator (`decorators/processor.py:316-357`:
  * 3 attempts, 1.0 s initial delay, ×2.0 backoff, error record on
  * exhaustion). Spark tasks already retry internally; this wrapper is
  * for driver-side pipeline stages (sink flushes, external calls),
  * keeping the structured error-record parity.
  */
object Retry {

  final case class Outcome[T](result: Option[T], attempts: Int,
                              error: Option[String]) {
    def succeeded: Boolean = result.isDefined
  }

  def apply[T](attempts: Int = 3, initialDelayMs: Long = 1000,
               backoff: Double = 2.0, sleep: Long => Unit = Thread.sleep)
              (body: => T): Outcome[T] = {
    var delay = initialDelayMs
    var lastError: Option[String] = None
    var n = 0
    while (n < attempts) {
      n += 1
      try return Outcome(Some(body), n, None)
      catch {
        case e: Exception =>
          lastError = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
          if (n < attempts) { sleep(delay); delay = (delay * backoff).toLong }
      }
    }
    Outcome(None, n, lastError)
  }
}

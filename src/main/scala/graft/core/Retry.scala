package graft.core

/** Quadratic-backoff retry (reference C3/O10: `base * attempts²` between
  * reconnection attempts, /root/reference/pkg/relays/pool.go:713-719, and
  * retriability classification). In the Spark engine, executor-side task
  * failure is Spark's own retry domain; this covers DRIVER-side transient
  * failures: snapshot commits, external-store round trips.
  */
object Retry {
  def backoffMillis(baseMillis: Long, attempt: Int): Long =
    baseMillis * attempt.toLong * attempt.toLong

  /** Run `body`, retrying up to `maxAttempts` with quadratic backoff.
    * `retriable` classifies errors (reference error.go:63-137 analog);
    * non-retriable errors propagate immediately.
    */
  def quadratic[T](
      maxAttempts: Int,
      baseMillis: Long = 100L,
      retriable: Throwable => Boolean = _ => true
  )(body: => T): T = {
    var attempt = 1
    while (true) {
      try return body
      catch {
        case e: Throwable if attempt < maxAttempts && retriable(e) =>
          Thread.sleep(backoffMillis(baseMillis, attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

package graft.streaming

/** Source-connect retry with jittered exponential backoff (SURVEY §2.1
  * S3; reference `/root/reference/stream_cdc/datasources/mysql.py:
  * 279-332`).
  *
  * The reference retries a binlog connect up to 5 times, but ONLY for
  * the retriable failure class (server-id conflicts), regenerating the
  * conflicting id each attempt and sleeping `backoff^attempt +
  * uniform(0.1, 1.0)` seconds between tries; every other failure
  * raises immediately. This is that control flow with the three
  * policies injected:
  *
  *  - `retriableError`: which failures are worth another attempt
  *    (the reference: message contains "server_uuid/server_id");
  *  - `reconfigure`: per-attempt state mutation before the retry
  *    (the reference: new random server_id seeded by wall clock);
  *  - `sleeper`/`jitter`: injectable for deterministic tests.
  *
  * Why driver-side: Spark already task-retries EXECUTOR failures; this
  * wraps DRIVER-side connection establishment (DSv2 `Source` creation,
  * JDBC settings validation) where a transient conflict would
  * otherwise kill the query before the first batch.
  */
final case class RetryPolicy(
    maxRetries: Int = 5,
    backoffFactor: Double = 2.0,
    jitter: () => Double = () => 0.1 + scala.util.Random.nextDouble() * 0.9,
    sleeper: Double => Unit = s => Thread.sleep((s * 1000).toLong)) {

  require(maxRetries > 0, "max_retries must be positive")
  require(backoffFactor >= 1.0, "backoff_factor must be >= 1")

  /** Backoff before retry `attempt` (1-based): factor^attempt + jitter
    * (reference `mysql.py:319-321`). */
  def backoffSeconds(attempt: Int): Double =
    math.pow(backoffFactor, attempt) + jitter()

  /** Run `connect`, retrying retriable failures with reconfiguration
    * and backoff; non-retriable failures propagate immediately as
    * [[DataSourceError]], and exhausting retries raises the
    * attempts-exhausted error (`mysql.py:325-332`). */
  def connectWithRetry[T](connect: () => T,
      retriableError: Throwable => Boolean,
      reconfigure: Int => Unit = _ => ()): T = {
    var attempt = 0
    while (attempt < maxRetries) {
      try {
        return connect()
      } catch {
        case scala.util.control.NonFatal(e)
            if retriableError(e) && attempt < maxRetries - 1 =>
          attempt += 1
          reconfigure(attempt)
          sleeper(backoffSeconds(attempt))
        case scala.util.control.NonFatal(e) =>
          throw new DataSourceError(
            s"Failed to connect: ${e.getMessage}", e)
      }
    }
    throw new DataSourceError(
      s"Failed to connect after $maxRetries attempts")
  }
}

/** Source-layer failure (reference `utils/exceptions.py` DataSourceError). */
final class DataSourceError(message: String, cause: Throwable = null)
  extends RuntimeException(message, cause)

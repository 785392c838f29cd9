package graft.sinks

import scala.util.control.NonFatal

/** T6: driver-side retry with exponential backoff — the analog of the
  * reference's `@backoff.on_exception(backoff.expo, …)` wrappers around every
  * extract/transform/save coroutine (etl/main.py:141-143,156-158,200,216,256,272).
  *
  * Division of labor with Spark: per-TASK failures (one executor, one
  * partition) are already retried by the scheduler (`spark.task.maxFailures`);
  * what Spark does NOT retry is a whole failed ACTION — the case the
  * reference's decorator exists for (sink endpoint down, transient FS error).
  * This wrapper re-runs the full action; it must therefore only wrap
  * idempotent sinks (bulk `_id` upsert, key'd anti-join append, two-phase
  * swap — all of this package), which is the same at-least-once + idempotent
  * contract the pipeline already relies on (T7).
  *
  * Backoff is exponential with full jitter (decorrelates a retry stampede
  * from many concurrent drivers — at fleet scale a synchronized retry wave
  * is its own outage); `NonFatal` only, so OOM/interrupt still propagate.
  */
object Retry {

  /** Run `op`, retrying up to `maxRetries` times on non-fatal failure.
    * `sleeper` is injectable for tests; delays are
    * `uniform(0, baseDelayMs * 2^attempt)` capped at `maxDelayMs`.
    * `retryOn` narrows WHICH failures retry (default: every NonFatal) —
    * a deterministic rejection (HTTP 4xx, validation) should surface
    * immediately instead of re-running a doomed request through the
    * whole ladder (r14 review).
    */
  def withBackoff[T](
      maxRetries: Int = 5,
      baseDelayMs: Long = 100,
      maxDelayMs: Long = 30000,
      sleeper: Long => Unit = Thread.sleep,
      retryOn: Throwable => Boolean = NonFatal(_))(op: => T): T = {
    val rnd = new java.util.Random()
    var attempt = 0
    while (true) {
      try return op
      catch {
        case NonFatal(e) =>
          if (!retryOn(e) || attempt >= maxRetries) throw e
          // clamp the exponent: an unguarded `base << attempt` overflows Long
          // past attempt ~56, collapsing the cap (and the backoff) to ~1ms —
          // a tight retry loop exactly when the endpoint is down longest
          val exp = math.min(attempt, 30)
          val grown = if (baseDelayMs > (Long.MaxValue >> exp)) Long.MaxValue
                      else baseDelayMs << exp
          val cap = math.min(maxDelayMs, grown)
          sleeper(math.floorMod(rnd.nextLong(), math.max(cap, 1L)))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

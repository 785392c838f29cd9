package graft

import graft.sinks.Retry
import org.scalatest.funsuite.AnyFunSuite

/** T6 contract (etl/main.py:141-143 backoff.expo analog). */
class RetrySpec extends AnyFunSuite {

  test("succeeds after transient failures, with bounded expo delays") {
    var calls = 0
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Retry.withBackoff(maxRetries = 5, baseDelayMs = 100,
        sleeper = delays.append(_)) {
      calls += 1
      if (calls < 3) sys.error("transient")
      "ok"
    }
    assert(out === "ok")
    assert(calls === 3)
    assert(delays.size === 2)
    // full jitter: each delay uniform in [0, base * 2^attempt)
    assert(delays(0) >= 0 && delays(0) < 100)
    assert(delays(1) >= 0 && delays(1) < 200)
  }

  test("rethrows the last failure once retries are exhausted") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withBackoff(maxRetries = 2, sleeper = _ => ()) {
        calls += 1; sys.error(s"fail $calls")
      }
    }
    assert(calls === 3) // initial + 2 retries
    assert(e.getMessage === "fail 3")
  }

  test("fatal errors propagate immediately, no retry") {
    var calls = 0
    intercept[InterruptedException] {
      Retry.withBackoff(maxRetries = 5, sleeper = _ => ()) {
        calls += 1; throw new InterruptedException("stop")
      }
    }
    assert(calls === 1)
  }

  test("delay cap: attempt growth clamps at maxDelayMs") {
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    intercept[RuntimeException] {
      Retry.withBackoff(maxRetries = 10, baseDelayMs = 100, maxDelayMs = 400,
          sleeper = delays.append(_)) { sys.error("always") }
    }
    assert(delays.size === 10)
    assert(delays.forall(d => d >= 0 && d < 400))
  }

  test("no shift overflow: backoff never collapses to ~0 at high attempt counts") {
    // pre-fix, baseDelayMs << attempt overflowed Long past attempt ~56,
    // turning the cap negative and the sleep into a ~1ms tight loop
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    intercept[RuntimeException] {
      Retry.withBackoff(maxRetries = 70, baseDelayMs = 100, maxDelayMs = 30000,
          sleeper = delays.append(_)) { sys.error("always") }
    }
    assert(delays.size === 70)
    assert(delays.forall(d => d >= 0 && d < 30000))
    // attempts past the old overflow point still draw from the full cap
    // (20 uniform draws from [0, 30000) are all ≤ 1 with p ≈ 1e-83)
    assert(delays.takeRight(20).exists(_ > 1))
  }
}

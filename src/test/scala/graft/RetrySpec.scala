package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Retry

/** Exponential-backoff retry — reference `utils.clj` semantics. */
class RetrySpec extends AnyFunSuite {

  test("retries with doubling waits capped at maxWait, returns the eventual result") {
    var calls = 0
    val waits = collection.mutable.Buffer[Long]()
    val r = Retry.retry(
      () => { calls += 1; if (calls < 5) throw new RuntimeException("down"); 42 },
      handler = (_, w) => waits += w,
      maxWaitMs = 4000L, startWaitMs = 1000L, sleep = _ => ())
    assert(r.contains(42))
    assert(calls == 5)
    assert(waits.toSeq == Seq(1000L, 2000L, 4000L, 4000L)) // doubled, then capped
  }

  test("shouldRetry veto stops the loop and yields None") {
    var calls = 0
    val r = Retry.retry[Int](
      () => { calls += 1; throw new RuntimeException("always down") },
      shouldRetry = () => calls < 3,
      sleep = _ => ())
    assert(r.isEmpty)
    assert(calls == 3)
  }

  test("first-try success never sleeps") {
    var slept = false
    val r = Retry.retry(() => "ok", sleep = _ => slept = true)
    assert(r.contains("ok") && !slept)
  }
}

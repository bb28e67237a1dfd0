package graft.sources

import scala.annotation.tailrec

/** Exponential-backoff retry — the reference's connection keepalive
  * (`src/dumpr/utils.clj:3-24` `retry`, used by the binlog client
  * lifecycle in `src/dumpr/core.clj`). Semantics preserved exactly:
  * run `f`; on exception call `handler(e, wait)`, sleep `wait`
  * (doubling each attempt, capped at `maxWaitMs`), and retry while
  * `shouldRetry()` holds; a veto returns None (the reference returns
  * nil).
  *
  * Used by connection-establishing callers
  * ([[JdbcSnapshot.loadWithRetry]]; a production binlog client's
  * connect loop). `sleep` is injectable so specs can assert the
  * backoff schedule without waiting.
  */
object Retry {

  @tailrec
  def retry[T](f: () => T,
               handler: (Throwable, Long) => Unit = (_, _) => (),
               shouldRetry: () => Boolean = () => true,
               maxWaitMs: Long = 120000L,
               startWaitMs: Long = 1000L,
               sleep: Long => Unit = Thread.sleep): Option[T] = {
    val wait = math.min(startWaitMs, maxWaitMs)
    val attempt =
      try Some(f())
      catch {
        case e: Exception =>
          handler(e, wait)
          sleep(wait)
          None
      }
    attempt match {
      case some @ Some(_) => some
      case None if shouldRetry() =>
        retry(f, handler, shouldRetry, maxWaitMs, wait * 2, sleep)
      case None => None
    }
  }
}

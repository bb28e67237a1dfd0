package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Retry

/** Supervised-restart policy for streaming queries — the reference's
  * binlog-client keepalive re-seated on Structured Streaming.
  *
  * dumpr registers a lifecycle listener on the binlog client and, on
  * disconnect, reconnects FROM THE LAST SEEN POSITION with
  * exponential-backoff retry (`src/dumpr/binlog.clj:29-53`,
  * `src/dumpr/core.clj:152-188` `start-stream!`/`stop-stream!`). In
  * Spark the checkpointed offsets ARE that position: "reconnect" is
  * rebuilding the query against the same checkpoint directory, and the
  * engine replays from the last committed batch. This object supplies
  * the missing piece — the supervision loop — by composing
  * [[graft.sources.Retry]] (the re-expression of the reference's
  * `retry`, `utils.clj:3-24`) with a query factory:
  *
  * {{{
  *   val sq = Supervisor.supervise(() =>
  *     UpsertSink.materialize(changes, tableDir, checkpointDir))
  *   ...
  *   sq.stop()   // graceful: no further restarts
  * }}}
  *
  * The factory MUST create its query with a fixed `checkpointLocation`
  * — that is what makes a restart a resume instead of a reprocess.
  * Exactly-once end-to-end then follows from the sink's idempotence
  * (e.g. [[UpsertSink.mergeBatch]]'s published-batch guard), exactly
  * as in a crash-recovery cycle.
  */
object Supervisor {

  /** One lifecycle transition of a supervised query — the queryable
    * re-expression of the reference's `lifecycle-listener`
    * (`src/dumpr/binlog.clj:11-22`, which only LOGGED
    * connect/disconnect): `event` ∈ {connect, disconnect, stop,
    * terminal_failure}; `incarnation` counts query builds (a connect
    * with incarnation > 1 IS a restart); `batchId`/`position` pin
    * where in the log the transition happened (the last committed
    * progress — -1/"" before any batch commits); `detail` carries the
    * failure message and the scheduled backoff for disconnects. */
  case class LifecycleEvent(seq: Int, incarnation: Int, event: String,
                            batchId: Long, position: String, detail: String)

  /** Handle on a supervised query: the live query (changes across
    * restarts), restart count, terminal failure (after the restart
    * budget is exhausted), lifecycle event frame, and graceful stop. */
  final class SupervisedQuery private[Supervisor] () {
    @volatile private[Supervisor] var currentQ: StreamingQuery = _
    @volatile private[Supervisor] var lastFailure: Option[Throwable] = None
    @volatile private[Supervisor] var stopRequested = false
    @volatile private[Supervisor] var runner: Thread = _
    private[Supervisor] val starts = new AtomicInteger(0)
    private val eventSeq = new AtomicInteger(0)
    private val eventLog =
      new java.util.concurrent.ConcurrentLinkedQueue[LifecycleEvent]()

    private[Supervisor] def record(event: String, detail: String): Unit = {
      // position = the last COMMITTED progress of the current
      // incarnation (what a restart resumes from — the checkpoint's
      // view), not the in-flight batch
      val prog = Option(currentQ).flatMap(q =>
        try Option(q.lastProgress) catch { case _: Exception => None })
      val batchId = prog.map(_.batchId).getOrElse(-1L)
      val position = prog.flatMap(_.sources.headOption)
        .flatMap(s => Option(s.endOffset)).getOrElse("")
      eventLog.add(LifecycleEvent(
        eventSeq.incrementAndGet(), starts.get(), event, batchId, position, detail))
    }

    /** The lifecycle transitions so far, in order. */
    def events: Seq[LifecycleEvent] = {
      import scala.jdk.CollectionConverters._
      eventLog.iterator().asScala.toSeq
    }
    /** The transitions as a queryable frame (driver-sized: bounded by
      * 2·maxRestarts + 2 rows). */
    def eventsDf(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      events.toDF()
    }

    /** The currently-running incarnation (changes after a restart). */
    def current: Option[StreamingQuery] = Option(currentQ)
    /** Completed restarts (0 while the first incarnation runs). */
    def restarts: Int = math.max(0, starts.get() - 1)
    /** The failure that ended supervision, if the budget ran out. */
    def failure: Option[Throwable] = if (done) lastFailure else None
    /** True once the supervision loop has exited (stop or terminal). */
    def done: Boolean = runner != null && !runner.isAlive
    /** Graceful shutdown: no further restarts; stops the live query
      * and joins the supervision loop, re-issuing the stop each pass
      * so a restart racing the stop (a factory call already in flight
      * when the flag flips) is itself stopped — the flag guarantees no
      * incarnation starts after one that saw it. Returns true iff the
      * supervision loop exited within `timeoutMs`; false means a query
      * is still winding down (e.g. awaitTermination outlasting the
      * window) and the caller must not assume shutdown completed. */
    def stop(timeoutMs: Long = 120000L): Boolean = {
      stopRequested = true
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var r = Option(runner)
      while (r.exists(_.isAlive) && System.nanoTime() < deadline) {
        Option(currentQ).filter(_.isActive)
          .foreach(q => try q.stop() catch { case _: Exception => () })
        r.foreach(_.join(math.max(100L,
          math.min(5000L, (deadline - System.nanoTime()) / 1000000L))))
        r = Option(runner)
      }
      r.forall(!_.isAlive)
    }
  }

  /** Run `start` under supervision: on query failure, back off
    * (exponential, via [[Retry.retry]]'s schedule) and rebuild the
    * query, at most `maxRestarts` times. `sleep` is injectable so
    * specs can assert the backoff schedule without waiting. */
  def supervise(start: () => StreamingQuery,
                maxRestarts: Int = 5,
                startWaitMs: Long = 1000L,
                maxWaitMs: Long = 120000L,
                sleep: Long => Unit = Thread.sleep,
                onRestart: (Throwable, Long) => Unit = (_, _) => ()): SupervisedQuery = {
    val sq = new SupervisedQuery
    val runner = new Thread(() => {
      val outcome = Retry.retry[Unit](
        f = () => {
          sq.starts.incrementAndGet()
          // a factory call that THROWS must not attribute its
          // disconnect to the previous incarnation's query position —
          // clear the handle before building
          sq.currentQ = null
          val q = start()
          sq.currentQ = q
          sq.record("connect", "")
          q.awaitTermination() // returns on stop(), throws on failure
          sq.record("stop", "")
        },
        handler = (e, w) => {
          sq.lastFailure = Some(e)
          sq.record("disconnect",
            s"wait_ms=$w ${Option(e.getMessage).getOrElse(e.getClass.getName)}")
          onRestart(e, w)
        },
        shouldRetry = () => !sq.stopRequested && sq.starts.get() <= maxRestarts,
        maxWaitMs = maxWaitMs, startWaitMs = startWaitMs, sleep = sleep)
      // Some(()) = the last incarnation terminated cleanly (stop) —
      // earlier, recovered failures are not terminal
      if (outcome.isDefined) sq.lastFailure = None
      else sq.record("terminal_failure",
        sq.lastFailure.flatMap(e => Option(e.getMessage)).getOrElse(""))
    }, "graft-stream-supervisor")
    sq.runner = runner
    runner.setDaemon(true)
    runner.start()
    sq
  }
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.ChangelogStream.Change
import graft.streaming.{Supervisor, UpsertSink}

/** Injected "binlog disconnect": armed, the stream throws on a marker
  * row; the supervisor's restart handler disarms it — the reconnect-
  * succeeds half of the keepalive cycle. @volatile suffices: executors
  * share the JVM in local mode. */
object PoisonPill {
  @volatile var armed = false
}

/** The reference's keepalive contract (`binlog.clj:29-53`): a client
  * failure triggers reconnect-from-last-position with backoff, and the
  * consumer observes a gapless, duplicate-folded stream. Here: kill a
  * live query mid-stream, let [[Supervisor]] rebuild it on the same
  * checkpoint, and assert the materialized state equals the serial
  * fold of the full history. */
class SupervisorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pollUntil(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  test("supervisor restarts a failed query from checkpoint and state converges") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("graft_sup_tbl").toString
    val ckpt = Files.createTempDirectory("graft_sup_ckpt").toString
    val in = MemoryStream[Change]
    val waits = collection.mutable.ArrayBuffer[Long]()
    PoisonPill.armed = false

    def start() = {
      val guarded = in.toDS().map { c =>
        if (PoisonPill.armed && c.id == 666L)
          throw new RuntimeException("injected binlog disconnect")
        c
      }
      UpsertSink.materialize(guarded, tableDir, ckpt, numBuckets = 8)
    }

    val sq = Supervisor.supervise(() => start(), maxRestarts = 3,
      startWaitMs = 10, sleep = w => waits.synchronized { waits += w },
      onRestart = (_, _) => PoisonPill.armed = false)
    assert(pollUntil(30000)(sq.current.exists(_.isActive)), "first incarnation starts")

    in.addData(Change(1, "upsert", "t", 1, 1.0), Change(2, "upsert", "t", 2, 2.0))
    sq.current.get.processAllAvailable()

    // mid-stream failure: the next batch carries the marker row
    PoisonPill.armed = true
    in.addData(Change(3, "upsert", "t", 666, 6.0), Change(4, "delete", "t", 2, 0.0))
    assert(pollUntil(60000)(sq.restarts == 1 && sq.current.exists(_.isActive)),
      s"supervisor must restart the query (restarts=${sq.restarts})")
    // the restarted incarnation replays the failed batch from the
    // checkpointed offsets (disarmed now) and continues
    sq.current.get.processAllAvailable()
    assert(sq.stop(), "stop must report the supervision loop exited")
    assert(sq.done, "stop=true implies done")
    assert(sq.failure.isEmpty, "a recovered failure is not terminal")
    assert(sq.restarts == 1)

    val state = UpsertSink.readCurrent(spark, tableDir)
      .select("id", "value").as[(Long, Double)].collect().toSet
    assert(state == Set((1L, 1.0), (666L, 6.0)),
      s"state must equal the serial fold of the full history, got $state")
    assert(waits.nonEmpty && waits.head == 10, s"backoff schedule engaged: $waits")

    // the lifecycle frame (binlog.clj:11-22 re-expressed as DATA):
    // connect → disconnect (with the failing position + backoff) →
    // connect (incarnation 2 = the restart) → stop, in order
    val ev = sq.events
    assert(ev.map(_.event) == Seq("connect", "disconnect", "connect", "stop"),
      s"lifecycle sequence, got $ev")
    assert(ev.map(_.seq) == Seq(1, 2, 3, 4), "events are ordered and gapless")
    val disc = ev(1)
    assert(disc.incarnation == 1 && disc.detail.contains("injected binlog disconnect")
      && disc.detail.contains("wait_ms=10"))
    assert(disc.batchId >= 0 && disc.position.nonEmpty,
      s"disconnect must carry the last committed position, got $disc")
    assert(ev(2).incarnation == 2, "a connect with incarnation > 1 IS the restart record")
    // and it is queryable as a frame
    val df = sq.eventsDf(spark)
    assert(df.columns.toSeq ==
      Seq("seq", "incarnation", "event", "batchId", "position", "detail"))
    assert(df.count() == 4)
  }

  test("supervisor stops retrying after maxRestarts and surfaces the failure") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("graft_sup_tbl2").toString
    val ckpt = Files.createTempDirectory("graft_sup_ckpt2").toString
    val in = MemoryStream[Change]
    PoisonPill.armed = true // never disarmed: every incarnation dies
    def start() = {
      val guarded = in.toDS().map { c =>
        if (PoisonPill.armed && c.id == 666L)
          throw new RuntimeException("permanent failure")
        c
      }
      UpsertSink.materialize(guarded, tableDir, ckpt, numBuckets = 8)
    }
    val sq = Supervisor.supervise(() => start(), maxRestarts = 2, startWaitMs = 1,
      sleep = _ => ())
    assert(pollUntil(30000)(sq.current.exists(_.isActive)))
    in.addData(Change(1, "upsert", "t", 666, 1.0))
    assert(pollUntil(60000)(sq.done), "supervision loop must give up")
    assert(sq.restarts == 2, s"exactly maxRestarts restarts, got ${sq.restarts}")
    assert(sq.failure.exists(_.getMessage.contains("permanent failure")))
    // terminal lifecycle: 3 connects, 3 disconnects, then the terminal
    // failure record — never a clean stop
    val ev = sq.events
    assert(ev.count(_.event == "connect") == 3)
    assert(ev.count(_.event == "disconnect") == 3)
    assert(ev.last.event == "terminal_failure" &&
      ev.last.detail.contains("permanent failure"))
    assert(!ev.exists(_.event == "stop"))
    PoisonPill.armed = false
  }
}

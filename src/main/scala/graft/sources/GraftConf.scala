package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.Supervisor

/** The reference's configuration surface re-expressed —
  * `create-conf` / `validate-conf` / `ConfSchema`
  * (`src/dumpr/core.clj:16-80`) and the stream-control protocol
  * (`start-stream!`/`stop-stream!`/`source`, `core.clj:152-193`).
  *
  * One validated configuration object is shared by the snapshot load
  * and the streaming path, exactly as in the reference:
  *
  *  - connection params with the reference's keepalive defaults
  *    (60 s reconnect interval, 3 s connect timeouts, 60 s max
  *    schema-query backoff);
  *  - `id-fns`: per-table id constructors for tables without a single
  *    PK column — here Spark `Column` expressions, applied by
  *    [[tableLoad]] (the seat of the reference's
  *    `{:mytable :identifier}` map);
  *  - optional `db-spec` overrides merged over the derived JDBC
  *    options (the reference lets a connection pool replace the
  *    default spec).
  *
  * Validation collects EVERY violation and throws once with all of
  * them listed — the reference's `ex-info` carrying
  * `:validation-errs`, not a fail-on-first.
  *
  * The stream-control protocol maps onto Structured Streaming:
  * `start-stream!` = [[superviseStream]] (keepalive params feed the
  * [[Supervisor]] backoff), `stop-stream!` =
  * `SupervisedQuery.stop()`, `source` = the running `StreamingQuery`
  * (its sink IS the consumable output).
  */
object GraftConf {

  /** `conn-param-defaults` (`core.clj:16-20`). */
  final case class ConnParams(
      user: String,
      host: String,
      port: Int,
      db: String,
      serverId: Long,
      password: String = "",
      streamKeepaliveIntervalMs: Long = 60000,
      streamKeepaliveTimeoutMs: Long = 3000,
      initialConnectionTimeoutMs: Long = 3000,
      queryMaxKeepaliveIntervalMs: Long = 60000)

  final case class Conf(
      connParams: ConnParams,
      idFns: Map[String, Column] = Map.empty,
      dbSpec: Map[String, String] = Map.empty)

  /** `create-conf`: validate, then freeze. Throws
    * `IllegalArgumentException` listing EVERY violation. */
  def create(connParams: ConnParams,
             idFns: Map[String, Column] = Map.empty,
             dbSpec: Map[String, String] = Map.empty): Conf = {
    val c = Conf(connParams, idFns, dbSpec)
    val errs = validationErrors(c)
    require(errs.isEmpty,
      s"Invalid graft configuration: ${errs.mkString("; ")}")
    c
  }

  /** All violations, empty = valid (`validate-conf`). */
  def validationErrors(conf: Conf): Seq[String] = {
    val p = conf.connParams
    val errs = Seq.newBuilder[String]
    if (p.user == null || p.user.isEmpty) errs += "user must be non-empty"
    if (p.host == null || p.host.isEmpty) errs += "host must be non-empty"
    if (p.db == null || p.db.isEmpty) errs += "db must be non-empty (you stream exactly one db)"
    if (p.port < 1 || p.port > 65535) errs += s"port ${p.port} out of range 1-65535"
    // a MySQL replica's server-id must be nonzero and unique in the
    // cluster — 0 makes the master silently drop the registration
    if (p.serverId <= 0) errs += s"serverId ${p.serverId} must be > 0 (unique replica id)"
    for ((n, v) <- Seq(
        "streamKeepaliveIntervalMs" -> p.streamKeepaliveIntervalMs,
        "streamKeepaliveTimeoutMs" -> p.streamKeepaliveTimeoutMs,
        "initialConnectionTimeoutMs" -> p.initialConnectionTimeoutMs,
        "queryMaxKeepaliveIntervalMs" -> p.queryMaxKeepaliveIntervalMs))
      if (v <= 0) errs += s"$n must be > 0, got $v"
    if (p.streamKeepaliveTimeoutMs > p.streamKeepaliveIntervalMs)
      errs += "streamKeepaliveTimeoutMs must not exceed streamKeepaliveIntervalMs"
    errs.result()
  }

  /** Bridge to the snapshot source (A12): derive a
    * [[JdbcSnapshot.Conf]] for one table, `dbSpec` overrides applied
    * on top of the derived options by [[jdbcOptions]]. */
  def snapshotConf(conf: Conf, table: String, partitionColumn: String,
                   lowerBound: Long, upperBound: Long,
                   numPartitions: Int = 32): JdbcSnapshot.Conf = {
    val p = conf.connParams
    JdbcSnapshot.Conf(p.host, p.port, p.db, p.user, p.password,
      table, partitionColumn, lowerBound, upperBound, numPartitions)
  }

  /** Full JDBC option map: derived options ∪ dbSpec overrides (the
    * reference's "db-spec … can be explicitly specified"). */
  def jdbcOptions(conf: Conf, c: JdbcSnapshot.Conf): Map[String, String] =
    JdbcSnapshot.options(c) ++ conf.dbSpec

  /** The reference's id-fn application: the table's configured id
    * constructor, or the named PK column (`core.clj:60-66` — "using
    * id fn is only required when the table doesn't have a single
    * column as primary key"). */
  def idFor(conf: Conf, table: String, pkCol: String): Column =
    conf.idFns.getOrElse(table, org.apache.spark.sql.functions.col(pkCol))

  /** One [[graft.cdc.Changelog.TableLoad]] under this conf's id-fns. */
  def tableLoad(conf: Conf, df: org.apache.spark.sql.DataFrame, table: String,
                pkCol: String, contentCols: Seq[String]): graft.cdc.Changelog.TableLoad =
    graft.cdc.Changelog.TableLoad(df, table, pkCol, contentCols,
      conf.idFns.get(table))

  /** `start-stream!`: run the query factory under keepalive
    * supervision with this conf's reconnect cadence —
    * `stream-keepalive-timeout` is the initial backoff,
    * `stream-keepalive-interval` caps it. Stop with
    * `SupervisedQuery.stop()` (= `stop-stream!`); the live query is
    * `SupervisedQuery.current` (= `source`). */
  def superviseStream(conf: Conf, maxRestarts: Int = Int.MaxValue)
                     (start: () => StreamingQuery): Supervisor.SupervisedQuery =
    Supervisor.supervise(start, maxRestarts = maxRestarts,
      startWaitMs = conf.connParams.streamKeepaliveTimeoutMs,
      maxWaitMs = conf.connParams.streamKeepaliveIntervalMs)

  /** Schema-query retry policy (`query-max-keepalive-interval`):
    * exponential backoff capped at the configured max, via
    * [[Retry]]. */
  def loadWithRetry[T](conf: Conf)(f: () => T): Option[T] =
    Retry.retry(f, maxWaitMs = conf.connParams.queryMaxKeepaliveIntervalMs)
}

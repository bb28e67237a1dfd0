package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned-read JDBC snapshot source — the Spark-native seat of
  * the reference's initial table load.
  *
  * dumpr snapshots with one serial `SELECT * FROM t` per table
  * (`src/dumpr/query.clj:44-66`) and pins connector flags so snapshot
  * and stream rows are byte-identical (`src/dumpr/query.clj:10-17`):
  * `zeroDateTimeBehavior=convertToNull`, `tinyInt1isBit=false`, UTC
  * instants. Here the same contract is expressed through Spark's JDBC
  * source with *range-partitioned parallel reads* — at 100 TB one
  * serial SELECT is a non-starter; `numPartitions` concurrent readers
  * each scan a primary-key range and the rest of the plan sees an
  * ordinary partitioned DataFrame.
  */
object JdbcSnapshot {

  final case class Conf(
      host: String,
      port: Int,
      db: String,
      user: String,
      password: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int = 32,
      fetchSize: Int = 10000)

  /** MySQL connection URL with the reference's fidelity flags baked
    * in (mirrors `dumpr.query/db-spec`). */
  def url(c: Conf): String =
    s"jdbc:mysql://${c.host}:${c.port}/${c.db}" +
      "?zeroDateTimeBehavior=convertToNull" +
      "&tinyInt1isBit=false" +
      "&connectionTimeZone=SERVER&preserveInstants=true&useSSL=false"

  /** The full option map handed to Spark's JDBC source — pure,
    * unit-testable without a database. */
  def options(c: Conf): Map[String, String] = Map(
    "url" -> url(c),
    "dbtable" -> c.table,
    "user" -> c.user,
    "password" -> c.password,
    "partitionColumn" -> c.partitionColumn,
    "lowerBound" -> c.lowerBound.toString,
    "upperBound" -> c.upperBound.toString,
    "numPartitions" -> c.numPartitions.toString,
    "fetchsize" -> c.fetchSize.toString)

  def load(spark: SparkSession, c: Conf): DataFrame =
    spark.read.format("jdbc").options(options(c)).load()

  /** [[load]] behind the reference's connection retry policy
    * (`utils.clj` retry, exponential backoff): Spark's JDBC `load()`
    * connects eagerly to resolve the schema, so a down database
    * surfaces here — retry it like the reference retries its
    * connects. Throws once `shouldRetry` vetoes. */
  def loadWithRetry(spark: SparkSession, c: Conf,
                    shouldRetry: () => Boolean = () => true,
                    maxWaitMs: Long = 120000L,
                    startWaitMs: Long = 1000L): DataFrame =
    Retry.retry(() => load(spark, c),
        shouldRetry = shouldRetry, maxWaitMs = maxWaitMs, startWaitMs = startWaitMs)
      .getOrElse(throw new IllegalStateException(
        s"JDBC snapshot load of ${c.table} aborted after retries"))
}

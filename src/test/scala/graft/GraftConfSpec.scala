package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.GraftConf
import graft.sources.GraftConf.ConnParams

/** `create-conf` / `validate-conf` semantics (`core.clj:16-80`): all
  * violations reported at once; defaults match the reference's
  * `conn-param-defaults`; id-fns flow into table loads. */
class GraftConfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val good = ConnParams(user = "repl", host = "db1", port = 3306,
    db = "app", serverId = 42)

  test("defaults mirror the reference's conn-param-defaults") {
    assert(good.streamKeepaliveIntervalMs == 60000)
    assert(good.streamKeepaliveTimeoutMs == 3000)
    assert(good.initialConnectionTimeoutMs == 3000)
    assert(good.queryMaxKeepaliveIntervalMs == 60000)
    assert(GraftConf.validationErrors(GraftConf.Conf(good)).isEmpty)
  }

  test("validation collects EVERY violation, not just the first") {
    val bad = ConnParams(user = "", host = "", port = 0, db = "", serverId = 0,
      streamKeepaliveIntervalMs = -1)
    val e = intercept[IllegalArgumentException] { GraftConf.create(bad) }
    for (frag <- Seq("user", "host", "db", "port", "serverId",
        "streamKeepaliveIntervalMs"))
      assert(e.getMessage.contains(frag), s"missing violation for $frag: ${e.getMessage}")
  }

  test("keepalive timeout must not exceed the reconnect interval") {
    val bad = good.copy(streamKeepaliveTimeoutMs = 120000)
    assert(GraftConf.validationErrors(GraftConf.Conf(bad))
      .exists(_.contains("streamKeepaliveTimeoutMs")))
  }

  test("snapshotConf + dbSpec overrides derive the JDBC options (fidelity flags kept)") {
    val conf = GraftConf.create(good, dbSpec = Map("fetchsize" -> "50000"))
    val jc = GraftConf.snapshotConf(conf, "customer", "c_custkey", 0L, 1000L)
    val opts = GraftConf.jdbcOptions(conf, jc)
    assert(opts("url").contains("jdbc:mysql://db1:3306/app"))
    assert(opts("url").contains("zeroDateTimeBehavior=convertToNull"))
    assert(opts("url").contains("tinyInt1isBit=false"))
    assert(opts("fetchsize") == "50000", "db-spec overrides win")
    assert(opts("numPartitions") == "32")
  }

  test("id-fns apply per table; PK column is the default (core.clj:60-66)") {
    val conf = GraftConf.create(good,
      idFns = Map("orders" -> concat(col("o_custkey"), lit("_"), col("o_orderkey"))))
    // configured table gets the constructed id
    val orders = Seq((7L, 3L)).toDF("o_custkey", "o_orderkey")
    val load = GraftConf.tableLoad(conf, orders, "orders", "o_orderkey", Seq("o_custkey"))
    assert(load.idFn.isDefined)
    val withId = orders.select(load.idFn.get.as("id")).as[String].collect()
    assert(withId.toSeq == Seq("7_3"))
    // unconfigured table falls back to its PK column
    assert(GraftConf.idFor(conf, "customer", "c_custkey").toString.contains("c_custkey"))
    assert(GraftConf.tableLoad(conf, orders, "customer", "o_orderkey", Nil).idFn.isEmpty)
  }

  test("superviseStream wires keepalive params into the restart policy") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val conf = GraftConf.create(good.copy(
      streamKeepaliveTimeoutMs = 5, streamKeepaliveIntervalMs = 10))
    val in = MemoryStream[Long]
    val sq = GraftConf.superviseStream(conf) { () =>
      in.toDS().writeStream.format("noop").start()
    }
    val deadline = System.currentTimeMillis() + 30000
    while (sq.current.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(sq.current.exists(_.isActive), "source = the live query")
    sq.stop() // stop-stream!
    assert(sq.done && sq.failure.isEmpty)
  }
}

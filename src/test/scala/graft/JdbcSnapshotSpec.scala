package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcSnapshot

class JdbcSnapshotSpec extends AnyFunSuite {

  private val conf = JdbcSnapshot.Conf(
    host = "db", port = 3306, db = "shop", user = "u", password = "p",
    table = "widgets", partitionColumn = "id",
    lowerBound = 0L, upperBound = 1000000L, numPartitions = 64)

  test("url carries the reference's type-fidelity flags (dumpr query.clj db-spec)") {
    val u = JdbcSnapshot.url(conf)
    assert(u.contains("zeroDateTimeBehavior=convertToNull"))
    assert(u.contains("tinyInt1isBit=false"))
    assert(u.contains("connectionTimeZone=SERVER"))
    assert(u.startsWith("jdbc:mysql://db:3306/shop?"))
  }

  test("options configure a range-partitioned parallel read") {
    val o = JdbcSnapshot.options(conf)
    assert(o("partitionColumn") == "id")
    assert(o("numPartitions") == "64")
    assert(o("lowerBound") == "0" && o("upperBound") == "1000000")
    assert(o("fetchsize") == "10000")
  }
}

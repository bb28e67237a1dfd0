package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Encoding-drift regression gate for `events.ts`.
  *
  * The driver regenerates the test parquet between rounds and has
  * already shipped `ts` as TIMESTAMP(NANOS) (rounds 1-6) and plain
  * `timestamp[us]` (round 7+). [[Tables.events]] must restore the
  * engine-wide epoch-nanos-LONG contract from ANY of those encodings —
  * this spec pins three checked-in fixtures (same five wall-clock
  * instants) so the next silent regeneration fails ONE unit test
  * instead of 34 driver queries.
  */
class TsEncodingSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)
  private val fixRoot = "src/test/resources/tsfix"

  /** micros for the five fixture instants (sub-µs components are zero) */
  private val expectedUs = Seq(0L, 86400000001L, 1735689600000000L,
    1735689600123456L, 1767225599999999L)

  private def microsOf(dir: String): Seq[Long] = {
    val df = Tables.events(spark, s"$fixRoot/$dir")
    assert(df.schema("ts").dataType.typeName === "long",
      s"$dir: ts must be normalized to long")
    df.select(expr("ts div 1000").as("us")).orderBy("us")
      .collect().map(_.getLong(0)).toSeq
  }

  test("nanos, micros-NTZ and micros-UTC encodings all normalize to the same epoch-nanos longs") {
    assert(microsOf("ns") === expectedUs)
    assert(microsOf("us") === expectedUs)
    assert(microsOf("us_utc") === expectedUs)
  }

  test("fromEvents is safe on a raw (un-normalized) timestamp frame") {
    val raw = spark.read.parquet(s"$fixRoot/us/events.parquet")
    val log = graft.cdc.Changelog.fromEvents(raw)
    assert(log.select("us").orderBy("us").collect().map(_.getLong(0)).toSeq === expectedUs)
  }

  test("the driver's current events table normalizes to long") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType.typeName === "long")
    assert(df.count() > 0)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.cdc.Changelog

/** Property-based CDC semantics, mirroring the reference's generative
  * tests (`test/dumpr/core_test.clj`: `gen-ops-sequence`,
  * `table-loading`, `streaming`): for ANY op history, the declarative
  * plans must equal the serial `into-entity-map` fold, and
  * snapshot ⊎ changelog must equal the fold of the full history.
  */
class ChangelogPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (op, tbl, id, value) histories over a small key space (like the
  // reference's gen-ids) so updates/deletes actually collide
  private val genOps: Gen[List[(String, String, Long, Double)]] =
    Gen.listOfN(60, for {
      op <- Gen.frequency(3 -> Gen.const("upsert"), 1 -> Gen.const("delete"))
      tbl <- Gen.oneOf("customer", "orders")
      id <- Gen.choose(0L, 9L)
      v <- Gen.choose(0, 1000).map(_ / 10.0)
    } yield (op, tbl, id, v))

  private def toDf(ops: List[(String, String, Long, Double)]) =
    ops.zipWithIndex.map { case ((op, tbl, id, v), i) =>
      (i.toLong, op, tbl, id, i.toLong / 5, v, i.toLong * 1000, "x")
    }.toDF("pos", "op", "tbl", "id", "tx", "val", "us", "etype")

  private def serialFold(ops: List[(String, String, Long, Double)]) =
    ops.foldLeft(Map.empty[(String, Long), Double]) { case (m, (op, tbl, id, v)) =>
      if (op == "upsert") m + ((tbl, id) -> v) else m - ((tbl, id))
    }

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // (deleted intervals are legitimate gaps between versions — the
  // property is strict ordering without OVERLAP, one open tail, and
  // exact agreement of the open versions with the entity fold)
  test("scd2: versions never overlap, at most one open tail, current == state") {
    check(Prop.forAll(genOps) { ops =>
      val vers = Changelog.scd2(toDf(ops)).collect()
        .map(r => ((r.getString(0), r.getLong(1)),
          (r.getLong(3), if (r.isNullAt(4)) Long.MaxValue else r.getLong(4),
            r.getDouble(2), r.getInt(5))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
      // per key: strictly ordered, non-overlapping intervals; at most
      // one open (current) version, and it is the last
      val tiled = vers.values.forall { vs =>
        vs.sliding(2).forall {
          case Array((_, to1, _, _), (from2, _, _, _)) => to1 <= from2
          case _ => true
        } && vs.count(_._2 == Long.MaxValue) <= 1 &&
          vs.dropRight(1).forall(_._4 == 0) &&
          vs.forall { case (f, t, _, cur) => f < t && ((cur == 1) == (t == Long.MaxValue)) }
      }
      // current versions reproduce the serial fold exactly
      val current = vers.collect {
        case (k, vs) if vs.nonEmpty && vs.last._2 == Long.MaxValue => k -> vs.last._3
      }
      tiled && current == serialFold(ops)
    }, 8)
  }

  test("entityState equals into-entity-map for arbitrary histories") {
    check(Prop.forAll(genOps) { ops =>
      val planned = Changelog.entityState(toDf(ops)).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      planned == serialFold(ops)
    }, 8)
  }

  test("snapshot + changelog == fold of full history (reference streaming test)") {
    check(Prop.forAll(genOps, Gen.choose(0, 59)) { (ops, splitAt) =>
      val (initial, streamed) = ops.splitAt(splitAt)
      // snapshot = fold of the initial segment, restricted to 'customer'
      val snapshot = serialFold(initial).collect {
        case ((tbl, id), v) if tbl == "customer" => (id, v)
      }.toSeq.toDF("id", "val")
      // changelog continues from pos = splitAt
      val log = streamed.zipWithIndex.map { case ((op, tbl, id, v), i) =>
        val pos = (splitAt + i).toLong
        (pos, op, tbl, id, pos / 5, v, pos * 1000, "x")
      }.toDF("pos", "op", "tbl", "id", "tx", "val", "us", "etype")
      val applied = Changelog.applyChangelog(snapshot, log, "customer")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val expected = serialFold(ops).collect { case (("customer", id), v) => id -> v }.toMap
      applied == expected
    }, 6)
  }

  test("log compaction preserves replay semantics on arbitrary histories") {
    check(Prop.forAll(genOps) { ops =>
      val log = toDf(ops)
      val compact = Changelog.logCompact(log)
      // the compacted segment folds to the identical state...
      val s1 = Changelog.entityState(log).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val s2 = Changelog.entityState(compact).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // ...holds exactly one op per touched key (tombstones included)...
      val keys = compact.collect().map(r => (r.getString(2), r.getLong(3)))
      val touched = ops.map(o => (o._2, o._3)).toSet
      // ...and is a fixpoint of compaction
      val twice = Changelog.logCompact(compact).collect().map(_.toSeq).toSet
      s1 == s2 && keys.length == keys.toSet.size && keys.toSet == touched &&
        twice == compact.collect().map(_.toSeq).toSet
    }, 6)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.cdc.Changelog
import graft.operators.{AsOf, RangeJoin}

/** Property-based equivalence for the round-4 join operators: for ANY
  * generated data the scalable plans must equal their naive serial
  * definitions. */
class JoinPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("AsOf.join equals the serial latest-at-or-before definition") {
    val genSide = Gen.listOfN(40, for {
      k <- Gen.choose(0L, 4L)
      t <- Gen.choose(0L, 50L)
      v <- Gen.choose(0L, 999L)
    } yield (k, t, v))
    check(Prop.forAll(genSide, genSide) { (ls, rsRaw) =>
      // right side unique per (k, t) — the operator's documented contract
      val rs = rsRaw.groupBy(p => (p._1, p._2)).map(_._2.head).toList
      val l = ls.toDF("k", "t", "lv")
      val r = rs.toDF("k", "t", "rv")
      val got = AsOf.join(l, r, Seq("k"), "t", "t")
        .select("k", "t", "lv", "asof_rv")
        .as[(Long, Long, Long, Option[Long])].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val rIndex = rs.groupBy(_._1)
      val expect = ls.map { case (k, t, lv) =>
        val m = rIndex.getOrElse(k, Nil).filter(_._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        (k, t, lv, m)
      }.groupBy(identity).view.mapValues(_.length).toMap
      got == expect
    }, 6)
  }

  test("AsOf.joinForward equals the serial earliest-at-or-after definition") {
    val genSide = Gen.listOfN(40, for {
      k <- Gen.choose(0L, 4L)
      t <- Gen.choose(0L, 50L)
      v <- Gen.choose(0L, 999L)
    } yield (k, t, v))
    check(Prop.forAll(genSide, genSide) { (ls, rsRaw) =>
      val rs = rsRaw.groupBy(p => (p._1, p._2)).map(_._2.head).toList
      val l = ls.toDF("k", "t", "lv")
      val r = rs.toDF("k", "t", "rv")
      val got = AsOf.joinForward(l, r, Seq("k"), "t", "t")
        .select("k", "t", "lv", "asof_rv")
        .as[(Long, Long, Long, Option[Long])].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val rIndex = rs.groupBy(_._1)
      val expect = ls.map { case (k, t, lv) =>
        val m = rIndex.getOrElse(k, Nil).filter(_._2 >= t)
          .sortBy(_._2).headOption.map(_._3)
        (k, t, lv, m)
      }.groupBy(identity).view.mapValues(_.length).toMap
      got == expect
    }, 6)
  }

  test("RangeJoin.intervalOverlap equals the theta-join on arbitrary interval pairs") {
    val genIvs = Gen.listOfN(15, for {
      lo <- Gen.choose(-120L, 120L)
      w <- Gen.choose(0L, 60L) // width 0 → empty, must match nothing
    } yield (lo, lo + w))
    check(Prop.forAll(genIvs, genIvs) { (as, bs) =>
      val a = as.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("a_id", "a_lo", "a_hi")
      val b = bs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("b_id", "b_lo", "b_hi")
      val got = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi")
        .select("a_id", "b_id").as[(Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      // SET semantics: an empty interval [x, x) intersects nothing,
      // even where the raw theta predicate alo<bhi && blo<ahi holds —
      // same contract as pointInInterval's empty-interval rule
      val expect = (for {
        ((alo, ahi), i) <- as.zipWithIndex
        ((blo, bhi), j) <- bs.zipWithIndex
        if alo < ahi && blo < bhi && alo < bhi && blo < ahi
      } yield (i.toLong, j.toLong))
        .groupBy(identity).view.mapValues(_.length).toMap
      got == expect
    }, 6)
  }

  test("RangeJoin.pointInInterval equals the theta-join on arbitrary intervals") {
    val genPts = Gen.listOfN(30, Gen.choose(-100L, 100L))
    val genIvs = Gen.listOfN(15, for {
      lo <- Gen.choose(-120L, 120L)
      w <- Gen.choose(0L, 60L) // width 0 → empty interval, must match nothing
    } yield (lo, lo + w))
    check(Prop.forAll(genPts, genIvs) { (ps, ivs) =>
      val pts = ps.toDF("p")
      val iv = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iv_id", "lo", "hi")
      val got = RangeJoin.pointInInterval(pts, "p", iv, "lo", "hi")
        .select("p", "iv_id").as[(Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val expect = (for {
        p <- ps
        ((lo, hi), i) <- ivs.zipWithIndex
        if p >= lo && p < hi
      } yield (p, i.toLong)).groupBy(identity).view.mapValues(_.length).toMap
      got == expect
    }, 6)
  }

  test("entityStateAt at the max position equals entityState; at pos<min is empty") {
    val genOps = Gen.listOfN(40, for {
      op <- Gen.frequency(3 -> Gen.const("upsert"), 1 -> Gen.const("delete"))
      id <- Gen.choose(0L, 7L)
      v <- Gen.choose(0, 100).map(_.toDouble)
    } yield (op, id, v))
    check(Prop.forAll(genOps) { ops =>
      val log = ops.zipWithIndex.map { case ((op, id, v), i) =>
        (i.toLong, op, "t", id, 0L, v, 0L, "x")
      }.toDF("pos", "op", "tbl", "id", "tx", "val", "us", "etype")
      val full = Changelog.entityState(log).collect().map(_.toString).sorted.toSeq
      val at = Changelog.entityStateAt(log, ops.length.toLong).collect()
        .map(_.toString).sorted.toSeq
      at == full && Changelog.entityStateAt(log, -1L).count() == 0
    }, 6)
  }
}

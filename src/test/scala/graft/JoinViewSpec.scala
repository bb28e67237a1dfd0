package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.JoinView
import graft.streaming.JoinView.JoinChange

/** Injected mid-stream failure marker for the supervised-restart
  * scenario (the [[SupervisorSpec]] PoisonPill pattern). */
object JvPoison {
  @volatile var armed = false
}

/** Incrementally-maintained join view (SURVEY §2 B23): retroactive
  * enrichment, re-enrichment on dim updates, FK moves via update
  * images, replay idempotence, bucket-local maintenance, supervised
  * restart from checkpoint, and convergence against the batch join
  * of the folded sides. */
class JoinViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_jv").toString

  private def pollUntil(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  private def view(dir: String): Set[(Long, Long, Double, Option[Double])] =
    JoinView.readCurrent(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.getAs[java.lang.Double]("dim_val")).map(_.toDouble))).toSet

  test("late dim enriches retroactively; updates re-enrich; deletes drop") {
    val dir = tmp()
    // batch 0: three facts, no dim rows yet — enrichment pending
    JoinView.mergeBatch(Seq(
      JoinChange(1, "upsert", "fact", 1, 10, 1.0),
      JoinChange(2, "upsert", "fact", 2, 10, 2.0),
      JoinChange(3, "upsert", "fact", 3, 20, 3.0)).toDS(), dir, 0L, numBuckets = 8)
    assert(view(dir) == Set((10L, 1L, 1.0, None), (10L, 2L, 2.0, None),
      (20L, 3L, 3.0, None)))
    // batch 1: dim 10 arrives late — its facts enrich RETROACTIVELY
    JoinView.mergeBatch(Seq(
      JoinChange(4, "upsert", "dim", 10, 0, 100.0)).toDS(), dir, 1L, numBuckets = 8)
    assert(view(dir) == Set((10L, 1L, 1.0, Some(100.0)), (10L, 2L, 2.0, Some(100.0)),
      (20L, 3L, 3.0, None)))
    // batch 2: dim 10 updates (re-enrich), dim 20 arrives, fact 2 deleted
    JoinView.mergeBatch(Seq(
      JoinChange(5, "upsert", "dim", 10, 0, 101.0),
      JoinChange(6, "upsert", "dim", 20, 0, 200.0),
      JoinChange(7, "delete", "fact", 2, 10, 0.0)).toDS(), dir, 2L, numBuckets = 8)
    assert(view(dir) == Set((10L, 1L, 1.0, Some(101.0)), (20L, 3L, 3.0, Some(200.0))))
    // batch 3: fact 1 moves fk 10 → 20 (update images: delete + upsert)
    JoinView.mergeBatch(Seq(
      JoinChange(8, "delete", "fact", 1, 10, 0.0),
      JoinChange(8, "upsert", "fact", 1, 20, 1.5)).toDS(), dir, 3L, numBuckets = 8)
    assert(view(dir) == Set((20L, 1L, 1.5, Some(200.0)), (20L, 3L, 3.0, Some(200.0))))
    // batch 4: dim 20 deleted — its facts lose enrichment, stay live
    JoinView.mergeBatch(Seq(
      JoinChange(9, "delete", "dim", 20, 0, 0.0)).toDS(), dir, 4L, numBuckets = 8)
    assert(view(dir) == Set((20L, 1L, 1.5, None), (20L, 3L, 3.0, None)))
  }

  test("rebucket preserves view + dim-by-reference; post-rebucket merges enrich at the new count") {
    val dir = tmp()
    JoinView.mergeBatch(
      ((1 to 30).map(i => JoinChange(i, "upsert", "fact", i, i % 5 * 10, i * 1.0)) :+
        JoinChange(31, "upsert", "dim", 10, 0, 100.0)).toDS(), dir, 0L, numBuckets = 4)
    val before = view(dir)
    JoinView.rebucket(spark, dir, 16)
    assert(JoinView.storedNumBuckets(dir) == Some(16))
    assert(view(dir) == before, "rebucket must not change the enriched view")
    assert(JoinView.readDim(spark, dir).collect().map(_.getLong(0)).toSet == Set(10L),
      "prior dim state must carry by reference")
    intercept[IllegalArgumentException] {
      JoinView.mergeBatch(Seq(JoinChange(32, "upsert", "dim", 20, 0, 200.0)).toDS(),
        dir, 1L, numBuckets = 4)
    }
    // a dim landing AFTER the rebucket retroactively enriches fk=20 facts
    JoinView.mergeBatch(Seq(JoinChange(32, "upsert", "dim", 20, 0, 200.0)).toDS(),
      dir, 1L, numBuckets = 16)
    val enriched = view(dir).filter(_._1 == 20L)
    assert(enriched.nonEmpty && enriched.forall(_._4.contains(200.0)))
  }

  test("replaying a published batch is a no-op") {
    val dir = tmp()
    JoinView.mergeBatch(Seq(
      JoinChange(1, "upsert", "fact", 1, 10, 1.0),
      JoinChange(2, "upsert", "dim", 10, 0, 50.0)).toDS(), dir, 0L, numBuckets = 4)
    val before = view(dir)
    JoinView.mergeBatch(Seq(
      JoinChange(1, "upsert", "fact", 1, 10, 1.0),
      JoinChange(2, "upsert", "dim", 10, 0, 50.0)).toDS(), dir, 0L, numBuckets = 4)
    assert(view(dir) == before)
    assert(before == Set((10L, 1L, 1.0, Some(50.0))))
  }

  test("a single-fk batch rewrites only its bucket; dim dir shared when unchanged") {
    val dir = tmp()
    // seed facts across many fks (batch 0 writes several buckets)
    JoinView.mergeBatch((1L to 32L).map(i =>
      JoinChange(i, "upsert", "fact", i, i, i.toDouble)).toDS(), dir, 0L,
      numBuckets = 16)
    JoinView.mergeBatch(Seq(
      JoinChange(100, "upsert", "dim", 7, 0, 700.0)).toDS(), dir, 1L, numBuckets = 16)
    // batch 2 touches fk 7 only
    JoinView.mergeBatch(Seq(
      JoinChange(101, "upsert", "fact", 99, 7, 9.9)).toDS(), dir, 2L, numBuckets = 16)
    val v2buckets = Option(new java.io.File(s"$dir/v2/facts").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .count(f => f.isDirectory && f.getName.startsWith("__bucket="))
    assert(v2buckets == 1, s"one fk → one rewritten bucket, got $v2buckets")
    assert(!new java.io.File(s"$dir/v2/__dim").exists(),
      "no dim change → the dim directory is shared, not rewritten")
    // and the dim payload still enriches through the shared dir
    assert(view(dir).contains((7L, 99L, 9.9, Some(700.0))))
  }

  test("end-to-end: materialize() maintains the view through the streaming path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    val ck = tmp()
    val in = MemoryStream[JoinChange]
    val q = JoinView.materialize(in.toDS(), dir, ck, numBuckets = 8)
    in.addData(JoinChange(1, "upsert", "fact", 1, 10, 1.0))
    q.processAllAvailable()
    assert(view(dir) == Set((10L, 1L, 1.0, None)))
    in.addData(JoinChange(2, "upsert", "dim", 10, 0, 100.0))
    q.processAllAvailable()
    q.stop()
    assert(view(dir) == Set((10L, 1L, 1.0, Some(100.0))))
  }

  test("supervised restart from checkpoint: view converges after an injected failure") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    val ck = tmp()
    val in = MemoryStream[JoinChange]
    JvPoison.armed = false
    def start() = {
      val guarded = in.toDS().map { c =>
        if (JvPoison.armed && c.id == 666L)
          throw new RuntimeException("injected failure")
        c
      }
      JoinView.materialize(guarded, dir, ck, numBuckets = 8)
    }
    val sq = graft.streaming.Supervisor.supervise(() => start(),
      maxRestarts = 3, startWaitMs = 10, sleep = _ => (),
      onRestart = (_, _) => JvPoison.armed = false)
    assert(pollUntil(30000)(sq.current.exists(_.isActive)), "first incarnation starts")
    in.addData(JoinChange(1, "upsert", "fact", 1, 10, 1.0))
    sq.current.get.processAllAvailable()
    // the failing batch carries BOTH a dim and the poison fact: after
    // the restart replays it, the dim must still enrich retroactively
    JvPoison.armed = true
    in.addData(JoinChange(2, "upsert", "dim", 10, 0, 100.0),
      JoinChange(3, "upsert", "fact", 666, 10, 6.0))
    assert(pollUntil(60000)(sq.restarts == 1 && sq.current.exists(_.isActive)),
      s"supervisor must restart the query (restarts=${sq.restarts})")
    sq.current.get.processAllAvailable()
    assert(sq.stop(), "supervision loop exits")
    assert(view(dir) == Set((10L, 1L, 1.0, Some(100.0)), (10L, 666L, 6.0, Some(100.0))),
      "replayed batch applies exactly once, enrichment included")
  }

  test("random history converges to the batch join of the folded sides") {
    val dir = tmp()
    val rnd = new scala.util.Random(42)
    val ops = (1 to 300).map { pos =>
      if (rnd.nextInt(3) == 0)
        JoinChange(pos.toLong, if (rnd.nextInt(4) == 0) "delete" else "upsert",
          "dim", rnd.nextInt(7).toLong, 0L, rnd.nextInt(1000).toDouble)
      else {
        val id = rnd.nextInt(40).toLong
        JoinChange(pos.toLong, if (rnd.nextInt(5) == 0) "delete" else "upsert",
          "fact", id, id % 7, rnd.nextInt(1000).toDouble)
      }
    }
    // NOTE the fact fk is a pure function of the id here, so deletes
    // carry the right before-image fk by construction
    ops.grouped(60).zipWithIndex.foreach { case (chunk, i) =>
      JoinView.mergeBatch(chunk.toDS(), dir, i.toLong, numBuckets = 8)
    }
    // expected: fold each side over the whole history, then join
    val all = ops.toDS().toDF()
    def folded(side: String, keys: Seq[String]) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*).orderBy(col("pos").desc, col("op").desc)
      all.filter(col("side") === side)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .filter(col("op") === "upsert")
    }
    val expected = folded("fact", Seq("id"))
      .select(col("fk"), col("id"), col("value").as("fact_val"))
      .join(folded("dim", Seq("id")).select(col("id").as("dim_id"),
        col("value").as("dim_val")), col("fk") === col("dim_id"), "left")
      .select(col("fk"), col("id"), col("fact_val"), col("dim_val"))
    val got = JoinView.readCurrent(spark, dir)
      .select(col("fk"), col("id"), col("fact_val"), col("dim_val"))
    assert(got.exceptAll(expected).count() == 0 && expected.exceptAll(got).count() == 0,
      s"view diverged:\n got=${got.collect().toSeq.sortBy(_.getLong(1))}\n " +
        s"exp=${expected.collect().toSeq.sortBy(_.getLong(1))}")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Sampling}

/** Corpus-hygiene + deterministic-sampling operators (SURVEY §2
  * D13-D19, B10). */
class CorpusSamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("stratified sample is deterministic and respects the per-stratum rate") {
    val docs = Tables.documents(spark, sf)
    val out1 = Sampling.stratified(docs, col("doc_id"), lit(30))
      .select("doc_id").as[Long].collect().toSet
    val out2 = Sampling.stratified(docs, col("doc_id"), lit(30))
      .select("doc_id").as[Long].collect().toSet
    assert(out1 == out2, "same seed ⇒ same sample on every run")
    val n = docs.count()
    assert(out1.size > n * 0.15 && out1.size < n * 0.45, s"~30% expected, got ${out1.size}/$n")
    // rate 0 keeps nothing; rate 100 keeps everything
    assert(Sampling.stratified(docs, col("doc_id"), lit(0)).count() == 0)
    assert(Sampling.stratified(docs, col("doc_id"), lit(100)).count() == n)
  }

  test("train/test split is total, disjoint, and a pure function of the id") {
    val docs = Tables.documents(spark, sf)
    val out = Sampling.trainTestSplit(docs, col("doc_id"))
      .select("doc_id", "split").as[(Long, String)].collect()
    assert(out.length == docs.count(), "every doc gets exactly one split")
    val bySplit = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "valid", "test")))
    assert(bySplit("train") > out.length * 0.8)
    // recomputation from ids alone agrees (no split table needed)
    val again = Sampling.trainTestSplit(docs.select("doc_id"), col("doc_id"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.forall { case (id, s) => again(id) == s })
  }

  test("splitExact: per-stratum counts exact to the floor; small synthetic stratum keeps ratio") {
    val docs = Tables.documents(spark, sf)
    val out = Sampling.splitExact(docs, col("doc_id"), col("lang"))
      .select("doc_id", "lang", "split").as[(Long, String, String)].collect()
    assert(out.length == docs.count())
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val n = rows.length
      val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
      assert(bySplit.getOrElse("train", 0) == n * 90 / 100, s"$lang train quota")
      assert(bySplit.getOrElse("valid", 0) == n * 95 / 100 - n * 90 / 100, s"$lang valid quota")
    }
    // a 10-row stratum splits exactly 9/0/1 — the case hash buckets
    // get wrong ~half the time
    val tiny = spark.range(10).select(col("id").as("doc_id"), lit("xx").as("lang"))
    val t = Sampling.splitExact(tiny, col("doc_id"), col("lang"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(t.getOrElse("train", 0L) == 9L && t.getOrElse("test", 0L) == 1L
      && t.getOrElse("valid", 0L) == 0L, s"got $t")
    // partition-order invariance
    val again = Sampling.splitExact(docs.repartition(7), col("doc_id"), col("lang"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.forall { case (id, _, s) => again(id) == s })
  }

  test("domain mix caps every stratum and picks by hash rank, not input order") {
    val docs = Tables.documents(spark, sf)
    val out = Sampling.domainMix(docs, col("doc_id"), col("source"), 5)
      .select("source", "doc_id").as[(String, Long)].collect()
    val perSource = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perSource.values.forall(_ <= 5))
    // hash rank ≠ id order: at least one source's picks aren't its 5 smallest ids
    val smallest = docs.select("source", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.take(5).toSet).toMap
    assert(out.groupBy(_._1).exists { case (s, rows) => rows.map(_._2).toSet != smallest(s) })
  }

  test("decontaminate flags a planted copy of a benchmark doc and not unrelated docs") {
    val bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, bench),                                         // 0 % 97 == 0 → benchmark set
      (1L, bench),                                         // verbatim leak
      (2L, "totally different words with no shared phrases at all here"),
      (3L, "alpha beta gamma " + "unrelated tail of text goes here now") // partial overlap
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminate(docs, col("doc_id") % 97 === 0, minHits = 5)
      .select("doc_id", "n_hit", "contaminated").as[(Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!out.contains(0L), "benchmark docs are not in the scored output")
    assert(out(1L)._1 == 8 && out(1L)._2 == 1, "verbatim copy shares all 8 shingles")
    assert(out(2L) == ((0L, 0)))
    assert(out(3L)._1 == 1 && out(3L)._2 == 0, "one shared shingle is below the threshold")
  }

  test("decontaminate at 13-gram width flags verbatim leaks, not paraphrases") {
    val words = (1 to 30).map(i => s"w$i").mkString(" ")
    val paraphrase = (1 to 30).map(i => if (i % 7 == 0) s"x$i" else s"w$i").mkString(" ")
    val docs = Seq(
      (0L, words),       // benchmark
      (1L, words),       // verbatim: 18 shared 13-grams
      (2L, paraphrase)   // a change every 7 words leaves no intact 13-gram
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminate(docs, col("doc_id") % 97 === 0, minHits = 5, ngram = 13)
      .select("doc_id", "n_hit", "contaminated").as[(Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((18L, 1)), "30 words → 18 13-gram windows, all shared")
    assert(out(2L) == ((0L, 0)))
    // n-gram kernel parity with the fixed 3-gram expression
    val via3 = Corpus.decontaminate(docs, col("doc_id") % 97 === 0, ngram = 3)
      .select("doc_id", "n_hit").as[(Long, Long)].collect().toMap
    val viaOld = Corpus.decontaminate(docs, col("doc_id") % 97 === 0)
      .select("doc_id", "n_hit").as[(Long, Long)].collect().toMap
    assert(via3 == viaOld)
  }

  test("chunking covers every token, overlaps by exactly `overlap`, keeps the tail") {
    val docs = Seq(
      (1L, (1 to 150).map(i => s"t$i").mkString(" ")), // 150 tok → 3 chunks
      (2L, (1 to 64).map(i => s"t$i").mkString(" ")),  // exactly one window
      (3L, "a b c"),                                   // shorter than overlap
      (4L, "")                                         // degenerate: 1 chunk of [""]
    ).toDF("doc_id", "text")
    val out = Corpus.chunk(docs, maxTok = 64, overlap = 8)
      .select("doc_id", "chunk_idx", "chunk_tok", "chunk_text")
      .as[(Long, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // 150 tokens, stride 56: chunks at 0, 56, 112 → sizes 64, 64, 38
    assert(out(1L).map(_._3).toSeq == Seq(64, 64, 38))
    // consecutive chunks share exactly `overlap` tokens
    val c0 = out(1L)(0)._4.split(" "); val c1 = out(1L)(1)._4.split(" ")
    assert(c0.takeRight(8).toSeq == c1.take(8).toSeq)
    // reconstruction: stride-prefixes ++ last chunk == original stream
    val rebuilt = out(1L).dropRight(1).flatMap(_._4.split(" ").take(56)) ++
      out(1L).last._4.split(" ")
    assert(rebuilt.toSeq == (1 to 150).map(i => s"t$i"))
    assert(out(2L).map(_._3).toSeq == Seq(64), "exact window → single chunk")
    assert(out(3L).map(_._3).toSeq == Seq(3))
    assert(out(4L).size == 1, "empty doc still emits one chunk")
  }

  test("pii scrub redacts planted email/phone/ip and counts them; clean text untouched") {
    val docs = Seq(
      (1L, "mail me at First.Last+tag@sub.example.org or call 415-555-0199 from 10.0.0.7"),
      (2L, "no pii here just words and numbers like 12345 and 1.5"),
      (3L, "two mails a@b.io c.d@e.fr and dotted phone 212.555.0100")
    ).toDF("doc_id", "text")
    val out = Corpus.piiScrub(docs)
      .select("doc_id", "n_email", "n_phone", "n_ip", "scrubbed")
      .as[(Long, Int, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._3 == 1 && out(1L)._4 == 1)
    assert(out(1L)._5 == "mail me at <EMAIL> or call <PHONE> from <IP>")
    assert(out(2L) == ((2L, 0, 0, 0, "no pii here just words and numbers like 12345 and 1.5")))
    assert(out(3L)._2 == 2 && out(3L)._3 == 1)
    assert(out(3L)._5 == "two mails <EMAIL> <EMAIL> and dotted phone <PHONE>")
  }

  test("sequence packing: contiguous per-shard packs, offsets advance by n_tok, boundary spill") {
    val docs = Seq(
      (1L, "s1", 300), (2L, "s1", 300), (3L, "s1", 100), (4L, "s1", 50),
      (10L, "s2", 600) // bigger than the budget: still one assignment
    ).map { case (id, src, n) => (id, src, (1 to n).map(_ => "t").mkString(" ")) }
      .toDF("doc_id", "source", "text")
    val out = Corpus.packSequences(docs, budgetTok = 512, col("source"))
      .select("doc_id", "shard", "n_tok", "pack_id", "pack_off")
      .as[(Long, String, Int, Long, Long)].collect().sortBy(_._1)
    // s1: cum-before = 0, 300, 600, 700 → packs 0,0,1,1; offsets mod 512
    assert(out.filter(_._2 == "s1").map(r => (r._1, r._4, r._5)).toSeq ==
      Seq((1L, 0L, 0L), (2L, 0L, 300L), (3L, 1L, 88L), (4L, 1L, 188L)))
    // a doc beginning at offset 0 of its own pack even when larger than budget
    assert(out.find(_._1 == 10L).get._4 == 0L)
    // determinism across re-runs (window order is (shard, doc_id))
    val again = Corpus.packSequences(docs, 512, col("source"))
      .select("doc_id", "pack_id", "pack_off").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq == out.map(r => (r._1, r._4, r._5)).toSeq)
  }

  test("quality filter sets one reason bit per violated rule") {
    val docs = Seq(
      (1L, ("the word list is long enough to pass every single rule " +
        Seq.fill(4)("the a word").mkString(" ")), 100L),
      (2L, "too short", 9L),                               // bit 0
      (3L, Seq.fill(1200)("the").mkString(" "), 4799L),    // bit 1
      (4L, "zz qq ww ee rr tt yy uu ii oo pp ll kk jj hh", 44L), // bit 2 (no stopwords)
      (5L, ("the a " + Seq.fill(10)("supercalifragilistic").mkString(" ")), 215L) // bit 3
    ).toDF("doc_id", "text", "n_chars")
    val out = Corpus.qualityFilter(docs)
      .select("doc_id", "reasons", "kept").as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0, 1)))
    assert((out(2L)._1 & 1) == 1 && out(2L)._2 == 0)
    assert((out(3L)._1 & 2) == 2)
    assert((out(4L)._1 & 4) == 4)
    assert((out(5L)._1 & 8) == 8)
  }

  test("repetition stats match hand-computed values") {
    val docs = Seq(
      (1L, "a a b"),          // toks 3, uniq 2, top 2, bigrams {a a, a b} = 2
      (2L, "x x x x"),        // toks 4, uniq 1, top 4, bigrams {x x} = 1
      (3L, "p q r s t u v w x y") // all distinct, long enough to clear the flag gate
    ).toDF("doc_id", "text")
    val out = Corpus.repetition(docs)
      .select("doc_id", "n_tok", "n_uniq", "top_n", "n_uniq_bi", "flagged")
      .as[(Long, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out(1L) == ((3, 2, 2, 2, 1)), "top 2 of 3 toks ⇒ flagged (2*5 >= 3)")
    assert(out(2L) == ((4, 1, 4, 1, 1)))
    assert(out(3L) == ((10, 10, 1, 9, 0)), "all-distinct doc: top 1 of 10 ⇒ not flagged")
  }

  test("top ngrams ranks by document frequency with deterministic ties") {
    val docs = Seq(
      (1L, "big data big data"),   // distinct-per-doc: {big data, data big}
      (2L, "big data rules"),
      (3L, "small data rules")
    ).toDF("doc_id", "text")
    val out = Corpus.topNgrams(docs, k = 3).as[(String, Long)].collect()
    assert(out.head == (("big data", 2L)))
    assert(out.map(_._1).toSeq == out.map(_._1).toSeq.distinct)
    assert(out.length == 3)
  }

  test("gopher filter: each gate bit fires on its designed violation, integer-exact") {
    val texts = Seq(
      // clean: 12 distinct words, mean len in [3,10], 4 stopword kinds
      1L -> "the a data join alpha beta gamma delta epsilon zeta eta theta",
      // tiny: too few tokens (1) + mean-len (4) + stopwords (16) + dominance (128)
      2L -> "x y",
      // repetitive: dup-token (32) + dup-bigram (64) + dominance (128)
      3L -> "the a spam spam spam spam spam spam spam spam spam spam",
      // numeric: alphabetic-word fraction (8) only
      4L -> "the a 1111 2222 3333 4444 5555 6666 7777 8888 9999 0000"
    )
    val docs = texts.map { case (id, t) => (id, t, t.length) }
      .toDF("doc_id", "text", "n_chars")
    val out = Corpus.gopherFilter(docs)
      .select("doc_id", "reasons", "keep").as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0, 1)), s"clean doc must keep: ${out(1L)}")
    assert(out(2L) == ((1 + 4 + 16 + 128, 0)), s"tiny doc bits: ${out(2L)}")
    assert(out(3L) == ((32 + 64 + 128, 0)), s"repetitive doc bits: ${out(3L)}")
    assert(out(4L) == ((8, 0)), s"numeric doc bits: ${out(4L)}")
  }

  test("bm25 ranks more shared rare terms above fewer, drops no-overlap docs") {
    // doc 0 is the query; 'banana' is rarer than 'apple' so doc 1
    // (shares both) must outrank doc 2 (shares only apple); doc 3
    // shares nothing and must not appear at all.
    val docs = Seq(
      (0L, "apple banana"),
      (1L, "apple banana cherry"),
      (2L, "apple fig grape kiwi"),
      (3L, "zebra yak xylo")
    ).toDF("doc_id", "text")
    val out = Corpus.bm25TopK(docs, nQueries = 1, k = 10)
      .select("q_id", "n_id", "bm25_fp", "rnk")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(out.map(_._2).toSeq == Seq(1L, 2L), "overlap docs only, best first")
    assert(out.head._3 > out(1)._3, "two shared terms beat one")
    assert(out.forall(_._1 == 0L))
    // deterministic: identical rerun, identical fixed-point scores
    val again = Corpus.bm25TopK(docs, nQueries = 1, k = 10)
      .select("q_id", "n_id", "bm25_fp", "rnk")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(out.toSeq == again.toSeq)
  }

  test("bigram LM score: add-one-smoothed probabilities, exact fixed-point") {
    // corpus: "a b", "a b", "a c", "solo" → unigrams a=3 b=2 c=1
    // solo=1, so V=4; bigram counts: (a b)=2, (a c)=1.
    // p(a b) = (2+1)/(c1(a)+V) = 3/7  → fp floor(3e9/7) = 428571428
    // p(a c) = (1+1)/7         = 2/7  → fp floor(2e9/7) = 285714285
    val docs = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = Corpus.lmBigramScore(docs)
      .select("doc_id", "n_bigrams", "sum_fp", "lm_score")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(0L) == ((1L, 428571428L, Some(4.28571428e8))))
    assert(out(1L) == ((1L, 428571428L, Some(4.28571428e8))))
    assert(out(2L) == ((1L, 285714285L, Some(2.85714285e8))))
    assert(out(3L) == ((0L, 0L, None)), "sub-2-token docs score NULL, not dropped")
  }

  test("temperature mix flattens the head: sqrt weights, integer quotas") {
    // counts 1:4 → p 0.2/0.8; sqrt flattens the 4× ratio to 2×.
    val docs = (0 until 5).map(i => (i.toLong, if (i == 0) "rare" else "big"))
      .toDF("doc_id", "source")
    val out = Sampling.temperatureMix(docs, col("source"), budget = 1000L)
      .select("source", "n_docs", "w_fp", "weight", "quota")
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val rare = out("rare"); val big = out("big")
    assert(rare._3 == math.floor(1e9 * math.sqrt(0.2)).toLong)
    assert(big._3 == math.floor(1e9 * math.sqrt(0.8)).toLong)
    assert(math.abs(big._4 / rare._4 - 2.0) < 1e-8, "sqrt halves the log-ratio")
    assert(math.abs(rare._4 + big._4 - 1.0) < 1e-12, "weights normalize")
    assert(rare._5 + big._5 <= 1000L, "floor quotas never exceed the budget")
    assert(rare._5 > 200L, "the rare domain is upsampled past its 20% share")
  }

  test("streaming dedup drops in-watermark duplicate bodies, state keyed by fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = in.toDF().toDF("doc_id", "text", "ts")
    val q = graft.streaming.EventStreams.dedupDocs(stream)
      .select("doc_id", "text")
      .writeStream.format("memory").queryName("b10").outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:05:00")
    in.addData((1L, "same body", t0), (2L, "same body", t0), (3L, "other body", t0))
    q.processAllAvailable()
    in.addData((4L, "same body", t1)) // still inside the watermark → dropped
    q.processAllAvailable(); q.stop()
    val kept = spark.table("b10").select("doc_id").as[Long].collect().toSet
    assert(kept.intersect(Set(1L, 2L)).size == 1, "exactly one of the first dup pair survives")
    assert(kept.contains(3L))
    assert(!kept.contains(4L), "later in-watermark duplicate is dropped by state")
  }

  test("B31: streaming funnel advances exactly once per stage, across batches, order-safe") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams.FunnelEvent
    val in = MemoryStream[FunnelEvent]
    val q = graft.streaming.EventStreams.funnelStages(in.toDS())
      .writeStream.format("memory").queryName("b31").outputMode("append").start()
    in.addData(
      FunnelEvent(1L, "view", 10L), FunnelEvent(1L, "click", 20L),
      FunnelEvent(2L, "click", 10L),                       // no view first: stuck at 0
      FunnelEvent(3L, "click", 20L), FunnelEvent(3L, "view", 10L)) // out of order in-batch
    q.processAllAvailable()
    in.addData(
      FunnelEvent(1L, "purchase", 30L),  // cross-batch: state remembers stage 2
      FunnelEvent(1L, "view", 40L),      // already past view: no re-advance
      FunnelEvent(2L, "purchase", 20L))  // still stuck: click ≠ stage-1
    q.processAllAvailable(); q.stop()
    val got = spark.table("b31").as[(Long, Int, Long)].collect().toSet
    assert(got == Set(
      (1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L),
      (3L, 1, 10L), (3L, 2, 20L)))
  }

  test("B31b: funnel idle-user TTL drops silent users' state; a returner restarts at stage 0") {
    // ProcessingTimeTimeout hangs processAllAvailable (see the B1 TTL
    // note in StreamingSpec) — drive by polling
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.EventStreams.FunnelEvent
    val in = MemoryStream[FunnelEvent]
    val q = graft.streaming.EventStreams.funnelStages(in.toDS(), idleTtlMs = 300)
      .writeStream.format("memory").queryName("b31ttl").outputMode("append")
      .trigger(Trigger.ProcessingTime(100)).start()
    def awaitRows(n: Long): Unit = {
      val deadline = System.currentTimeMillis + 30000
      while (spark.table("b31ttl").count() < n && System.currentTimeMillis < deadline)
        Thread.sleep(100)
      assert(spark.table("b31ttl").count() >= n)
    }
    in.addData(FunnelEvent(1L, "view", 10L), FunnelEvent(1L, "click", 20L))
    awaitRows(2) // user 1 at stage 2
    // let the TTL lapse with no traffic: state for user 1 must leave
    val deadline = System.currentTimeMillis + 30000
    def stateRows: Long = Option(q.lastProgress)
      .map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)
    while (stateRows != 0 && System.currentTimeMillis < deadline) Thread.sleep(100)
    assert(stateRows === 0, "idle user's funnel state should expire")
    // the churned user returns: funnel restarts from stage 0 (a view
    // advances to 1; the pre-expiry progress is forgotten by design)
    in.addData(FunnelEvent(1L, "view", 100L))
    awaitRows(3)
    q.stop()
    val got = spark.table("b31ttl").as[(Long, Int, Long)].collect().toSet
    assert(got == Set((1L, 1, 10L), (1L, 2, 20L), (1L, 1, 100L)))
  }

  test("B31c: event-time funnel TTL expires state when the WATERMARK passes last-seen + TTL") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams.FunnelEvent
    val in = MemoryStream[FunnelEvent]
    // ts is event-time MICROS; watermark 0 seconds so the clock is
    // exactly max-seen-ts; TTL 1000 ms = 1e6 micros
    val q = graft.streaming.EventStreams.funnelStagesEventTtl(
        in.toDS(), idleTtlMs = 1000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("b31et").outputMode("append").start()
    in.addData(FunnelEvent(1L, "view", 10_000L), FunnelEvent(1L, "click", 20_000L))
    q.processAllAvailable() // user 1 at stage 2; watermark = 20 ms
    // OTHER user's traffic drives the watermark past user 1's
    // (20 ms + 1000 ms) timeout — no wall-clock involved, and
    // processAllAvailable works (no idle-timer busy spin)
    in.addData(FunnelEvent(2L, "view", 5_000_000L))
    q.processAllAvailable() // watermark advances to 5 s; next batch fires the timer
    in.addData(FunnelEvent(2L, "click", 5_100_000L))
    q.processAllAvailable()
    // churned user 1 returns: funnel restarts from stage 0
    in.addData(FunnelEvent(1L, "view", 6_000_000L))
    q.processAllAvailable(); q.stop()
    val got = spark.table("b31et").as[(Long, Int, Long)].collect().toSet
    assert(got == Set(
      (1L, 1, 10_000L), (1L, 2, 20_000L),
      (2L, 1, 5_000_000L), (2L, 2, 5_100_000L),
      (1L, 1, 6_000_000L)), s"got $got")
  }

  test("B30b: a window whose rows are all NULL emits no quantile rows instead of crashing") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, Option[Long], java.sql.Timestamp)]
    val stream = in.toDF().toDF("doc_id", "n_chars", "ts")
    val q = graft.streaming.EventStreams.windowedQuantiles(stream, k = 16)
      .writeStream.format("memory").queryName("b30null").outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 11:00:00")
    in.addData((1L, None, t0), (2L, None, t0),      // all-NULL window → empty sample
               (3L, Some(42L), t1))                 // normal window
    q.processAllAvailable()
    in.addData((999L, Some(1L), java.sql.Timestamp.valueOf("2024-01-01 13:00:00")))
    q.processAllAvailable(); q.stop()
    val byWindow = spark.table("b30null").groupBy("start").count()
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(!byWindow.contains(t0), "the all-NULL window must emit nothing")
    assert(byWindow(t1) == 7L, "the normal window emits its 7 deciles")
  }

  test("B30: windowed streaming quantiles equal the batch sketch over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val stream = in.toDF().toDF("doc_id", "n_chars", "ts")
    val q = graft.streaming.EventStreams.windowedQuantiles(stream, k = 16)
      .writeStream.format("memory").queryName("b30").outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val rows1 = (0L until 30L).map(i => (i, (i * 37 + 11) % 97, t0))
    val rows2 = (30L until 50L).map(i => (i, (i * 37 + 11) % 97, t0))
    in.addData(rows1: _*)
    q.processAllAvailable()
    in.addData(rows2: _*) // same window: the state-store sample must MERGE
    q.processAllAvailable()
    // advance the watermark so the window closes and emits
    in.addData((999L, 1L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00")))
    q.processAllAvailable(); q.stop()
    val got = spark.table("b30")
      .where(col("start") === lit(t0))
      .select("q", "v").as[(Double, Long)].collect().toSet
    val batch = (rows1 ++ rows2).toDF("doc_id", "n_chars", "ts")
    val want = graft.operators.Sketch.quantileSketch(
      batch, col("doc_id"), col("n_chars"), k = 16)
      .as[(Double, Long)].collect().toSet
    assert(got == want, s"streamed window profile must equal the batch sketch: $got vs $want")
  }

  test("B29: streaming dedup against a snapshot — snapshot dups die, stream dups die, bloom FPs verified exactly") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val snapshotFps = Seq("ingested body", "old news")
      .toDF("text")
      .select(graft.functions.Hashing.fingerprint(col("text")).as("fp"))
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = in.toDF().toDF("doc_id", "text", "ts")
    // mBits=64 forces bloom false positives → the anti-join must save them
    val q = graft.streaming.EventStreams
      .dedupDocsAgainstSnapshot(stream, snapshotFps, mBits = 64, kHashes = 2)
      .select("doc_id")
      .writeStream.format("memory").queryName("b29").outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:05:00")
    in.addData((1L, "ingested body", t0),   // snapshot dup → dropped
               (2L, "fresh body", t0),      // new → kept
               (3L, "fresh body", t0))      // in-batch dup → one survives
    q.processAllAvailable()
    in.addData((4L, "fresh body", t1),      // cross-batch stream dup → dropped
               (5L, "old news", t1),        // snapshot dup → dropped
               (6L, "another fresh", t1))   // new → kept
    q.processAllAvailable(); q.stop()
    val kept = spark.table("b29").as[Long].collect().toSet
    assert(!kept.contains(1L) && !kept.contains(5L), "snapshot dups must not pass")
    assert(kept.intersect(Set(2L, 3L)).size == 1, "one of the in-batch dup pair survives")
    assert(!kept.contains(4L), "cross-batch stream dup dropped by state")
    assert(kept.contains(6L))
  }

  test("shard assign: total, contiguous per-shard positions, stable under repartition") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val out = Sampling.shardAssign(docs, col("doc_id"), 8)
      .select("doc_id", "shard", "shard_pos").as[(Long, Int, Int)].collect()
    assert(out.length == docs.count(), "every doc gets exactly one address")
    assert(out.forall { case (_, s, _) => s >= 0 && s < 8 })
    // within each shard, positions are exactly 0..count-1 (a dense order)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length))
    }
    // the address is a pure function of the id — input partitioning is irrelevant
    val again = Sampling.shardAssign(docs.repartition(7), col("doc_id"), 8)
      .select("doc_id", "shard", "shard_pos").as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.forall { case (id, s, p) => again(id) == ((s, p)) })
    // and it is a genuine shuffle: shard order ≠ id order for some shard
    val byShard = out.groupBy(_._2).view.mapValues(_.sortBy(_._3).map(_._1).toSeq)
    assert(byShard.values.exists(ids => ids != ids.sorted), "hash order must differ from id order")
  }

  test("corpus stats: exact discrete quantiles match a brute-force per-stratum sort") {
    val docs = Tables.documents(spark, sf)
    val out = Corpus.corpusStats(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7)))).toMap
    val brute = docs.select(col("lang"), col("source"),
        size(split(col("text"), " ")).as("tc"))
      .as[(String, String, Int)].collect()
      .groupBy(t => (t._1, t._2)).view.mapValues { rows =>
        val tcs = rows.map(_._3).sorted
        val n = tcs.length
        def disc(num: Int, den: Int) = tcs((n * num + den - 1) / den - 1) // element at rank ⌈q·n⌉
        (n.toLong, tcs.map(_.toLong).sum, tcs.head, tcs.last, disc(1, 2), disc(9, 10))
      }.toMap
    assert(out == brute)
  }

  test("log compaction keeps tombstones, replays to the same state, and is idempotent") {
    import graft.cdc.Changelog
    val log = Changelog.filterCommitted(Changelog.fromEvents(Tables.events(spark, sf)))
    val compact = Changelog.logCompact(log)
    assert(compact.filter(col("op") === "delete").count() > 0,
      "deletes survive compaction as tombstones (entityState would drop them)")
    // replay equivalence: the compacted segment folds to the identical state
    val s1 = Changelog.entityState(log).collect().map(_.toSeq).toSet
    val s2 = Changelog.entityState(compact).collect().map(_.toSeq).toSet
    assert(s1 == s2)
    // idempotent: compacting a compacted log is a no-op
    val twice = Changelog.logCompact(compact).collect().map(_.toSeq).toSet
    assert(twice == compact.collect().map(_.toSeq).toSet)
  }

  test("weighted sample prefers heavy rows, exactly n per stratum, repartition-stable") {
    // 100 heavy rows (w=10000) among 9900 light (w=10): with priority
    // u/w a heavy row's priority is 1000x smaller in expectation, so
    // most of the 100 picks should be heavy (~90 in expectation)
    val df = spark.range(10000).select(
      col("id"), lit("s").as("g"),
      when(col("id") < 100, 10000L).otherwise(10L).as("w"))
    val picked = Sampling.weightedSample(df, col("id"), col("w"), col("g"), n = 100)
    val rows = picked.collect()
    assert(rows.length == 100, "exactly n rows for a stratum with >= n rows")
    val heavy = rows.count(_.getAs[Long]("w") == 10000L)
    assert(heavy >= 70, s"weighted preference: only $heavy/100 heavy rows picked")
    // deterministic under physical layout changes
    val again = Sampling.weightedSample(df.repartition(16), col("id"), col("w"), col("g"), n = 100)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(again == rows.map(_.getAs[Long]("id")).toSet)
    // a stratum with fewer than n rows returns all of it, ranked
    val tiny = Sampling.weightedSample(df.limit(7), col("id"), col("w"), col("g"), n = 100)
    assert(tiny.count() == 7)
  }

  test("weighted sample plan: per-stratum top-n capped map-side before the exchange") {
    import org.apache.spark.sql.execution.FormattedMode
    val df = spark.range(10000).select(
      col("id"), (col("id") % 5).cast("string").as("g"), (col("id") % 97 + 1).as("w"))
    val p = TestSpark.fullPlan(Sampling.weightedSample(df, col("id"), col("w"), col("g"), n = 10))
    assert(raw"WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"expect partial (pre-shuffle) + final WindowGroupLimit:\n$p")
  }

  test("dsirWeights: target-like docs outweigh dissimilar docs; featureless docs score NULL; deterministic") {
    val docs = Seq(
      (100L, "alpha beta gamma delta"),
      (101L, "alpha beta gamma epsilon"), // targets (id >= 100)
      (1L, "alpha beta gamma zeta"),      // shares 2/3 bigrams with the target
      (2L, "omega psi chi phi"),          // shares none
      (3L, "x")                           // < 2 tokens: no features
    ).toDF("doc_id", "text")
    def run() = Corpus.dsirWeights(docs, col("doc_id") >= 100)
      .select("doc_id", "n_feat", "dsir_w")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val w = run()
    assert(w(1L)._2.get > w(2L)._2.get,
      "target-vocabulary overlap must raise the importance weight")
    assert(w(3L) == ((0L, None)), "no bigrams → no weight, row still present")
    assert(w.size == 5, "every doc is scored (targets included — they are corpus rows)")
    assert(run() == w, "fixed-point ratios: bit-identical on every run")
  }

  test("lmBucketScore: common-bigram docs outscore rare-bigram docs; full coverage; deterministic") {
    // "x y" repeats across (and within) docs → its bucket count is
    // high; the rare doc's bigrams each occur once → low p_b
    val docs = Seq(
      (1L, "x y x y x y"),
      (2L, "x y x y"),
      (3L, "q r s t u v"),
      (4L, "z")                 // < 2 tokens: no bigrams
    ).toDF("doc_id", "text")
    def run() = Corpus.lmBucketScore(docs)
      .select("doc_id", "n_bigrams", "lm_score")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val w = run()
    assert(w.size == 4, "every doc is scored")
    assert(w(4L) == ((0L, None)), "no bigrams → NULL score, row present")
    assert(w(1L)._2.get > w(3L)._2.get,
      "bucket-occupancy LM must rank fluent/common transitions above rare ones")
    assert(w(1L)._1 == 5L && w(3L)._1 == 5L, "occurrence counts, not distinct")
    assert(run() == w, "fixed-point ratios replay bit-identically")
    // sampled-training path keeps full scoring coverage
    val sampled = Corpus.lmBucketScore(docs, trainPct = 50)
    assert(sampled.count() == 4)
  }

  test("dsirResample: weighted sample over dsir weights returns n rows from the weighted population") {
    val docs = Tables.documents(spark, sf)
    val out = Corpus.dsirResample(docs, col("doc_id") % 97 === 0, n = 25)
    assert(out.count() == 25)
    assert(out.where(col("dsir_w").isNull || col("dsir_w") <= 0).count() == 0,
      "weightedSample's population excludes weightless docs")
  }
}

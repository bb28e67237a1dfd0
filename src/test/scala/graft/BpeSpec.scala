package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, BpeMerges}
import graft.operators.Corpus

/** Corpus-trained BPE: equivalence against an independent serial
  * reference (functional, list-based — no code shared with the
  * engine's imperative kernels), losslessness, determinism, and the
  * chunk/pack budget wiring. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- independent reference implementation (lists + folds) ----

  private def refPretok(text: String): List[String] =
    Bpe.preTokenPattern.r.findAllIn(text).toList

  private def refEncode(word: String, merges: IndexedSeq[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    @annotation.tailrec
    def loop(syms: List[String]): List[String] = {
      val present = syms.zip(syms.drop(1)).flatMap(p => rank.get(p).map(r => (r, p)))
      if (present.isEmpty) syms
      else {
        val (_, (a, b)) = present.minBy(_._1)
        @annotation.tailrec
        def merge(rest: List[String], acc: List[String]): List[String] = rest match {
          case x :: y :: t if x == a && y == b => merge(t, (a + b) :: acc)
          case x :: t => merge(t, x :: acc)
          case Nil => acc.reverse
        }
        loop(merge(syms, Nil))
      }
    }
    if (word.isEmpty) Nil
    else loop(word.codePoints().toArray.toList
      .map(cp => new String(Character.toChars(cp))))
  }

  private def refTrain(wordCounts: Map[String, Long], numMerges: Int): IndexedSeq[(String, String)] = {
    def step(vocab: Map[List[String], Long]): Option[((String, String), Map[List[String], Long])] = {
      val pairCounts = vocab.toList
        .flatMap { case (syms, c) => syms.zip(syms.drop(1)).map(p => (p, c)) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      if (pairCounts.isEmpty) None
      else {
        val best = pairCounts.toList.minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < 2) None
        else {
          val (a, b) = best._1
          def mergeList(s: List[String]): List[String] = s match {
            case x :: y :: t if x == a && y == b => (a + b) :: mergeList(t)
            case x :: t => x :: mergeList(t)
            case Nil => Nil
          }
          Some((best._1, vocab.toList.map { case (s, c) => (mergeList(s), c) }
            .groupMapReduce(_._1)(_._2)(_ + _)))
        }
      }
    }
    (0 until numMerges).foldLeft((IndexedSeq.empty[(String, String)],
        wordCounts.map { case (w, c) =>
          (w.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp))), c)
        }, false)) {
      case (acc @ (_, _, true), _) => acc
      case ((ms, vocab, _), _) => step(vocab) match {
        case Some((pair, v2)) => (ms :+ pair, v2, false)
        case None => (ms, vocab, true)
      }
    }._1
  }

  private def sampleTexts: Seq[String] = {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh th the in ing er ed .,!?'s 't 123 9 \n\t  ÄÖü€😀"
    (1 to 150).map { _ =>
      val n = 1 + rnd.nextInt(60)
      (1 to n).map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", " ", "the cat sat on the mat", "it's the thing's edge",
      "a".repeat(40), "ab".repeat(20), "  double  spaces  ", "line\nbreaks\r\n\ttabs")
  }

  test("training equals the functional reference on a word-count table") {
    val words = sampleTexts.flatMap(refPretok)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Bpe.train(words.toSeq, numMerges = 60)
    val want = refTrain(words, numMerges = 60)
    assert(got.pairs == want, s"merge tables diverge:\n got=${got.pairs}\nwant=$want")
  }

  test("encode equals the serial greedy reference for every distinct word") {
    val words = sampleTexts.flatMap(refPretok).distinct
    val counts = words.groupBy(identity).view.mapValues(_ => 1L).toMap ++
      sampleTexts.flatMap(refPretok).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val m = Bpe.train(counts.toSeq, numMerges = 80)
    words.foreach { w =>
      val got = Bpe.encodeWord(w, m).toList
      val want = refEncode(w, m.pairs)
      assert(got == want, s"word ${w.map(_.toInt)}: got $got want $want")
    }
  }

  test("column pipeline: pieces concatenate losslessly, count == |pieces|, counts match serial") {
    val docs = sampleTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = Bpe.trainFromCorpus(docs, col("text"), numMerges = 80, maxWords = 5000)
    val rows = docs.select(col("doc_id"), col("text"),
        Bpe.bpeEncode(col("text"), m).as("pieces"),
        Bpe.bpeCount(col("text"), m).as("n"))
      .as[(Long, String, Seq[String], Int)].collect()
    rows.foreach { case (id, text, pieces, n) =>
      assert(pieces.mkString("") == text, s"doc $id: concat(pieces) != text")
      assert(pieces.size == n, s"doc $id: count ${n} != |pieces| ${pieces.size}")
      val want = refPretok(text).flatMap(w => refEncode(w, m.pairs))
      assert(pieces.toList == want, s"doc $id pieces diverge from serial reference")
    }
  }

  test("corpus training is deterministic and partition-invariant") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m1 = Bpe.trainFromCorpus(docs, col("text"), numMerges = 50, maxWords = 4000)
    val m2 = Bpe.trainFromCorpus(docs.repartition(7), col("text"), numMerges = 50, maxWords = 4000)
    assert(m1.pairs == m2.pairs, "merge table must not depend on partitioning")
    assert(m1.pairs.nonEmpty && m1.pairs.size <= 50)
  }

  test("more merges never increase a document's token count") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val words = docs.select(col("text")).as[String].collect()
      .flatMap(refPretok).groupBy(identity).view.mapValues(_.size.toLong).toMap.toSeq
    val m40 = Bpe.train(words, 40)
    val m120 = Bpe.train(words, 120)
    assert(m40.pairs == m120.pairs.take(m40.pairs.size),
      "a longer training run extends, never rewrites, the merge table")
    val counts = docs.select(
        Bpe.bpeCount(col("text"), m40).as("a"),
        Bpe.bpeCount(col("text"), m120).as("b"))
      .as[(Int, Int)].collect()
    assert(counts.forall { case (a, b) => b <= a },
      "every extra merge can only shorten or keep a doc's encoding")
  }

  test("save/load round-trips the merge table; loaded encodes identically") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m = Bpe.trainFromCorpus(docs, col("text"), numMerges = 50, maxWords = 4000)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Bpe.save(spark, m, dir)
    val m2 = Bpe.load(spark, dir)
    assert(m2.pairs == m.pairs, "rank order must survive the round trip")
    val sample = docs.limit(20).select(col("text")).as[String].collect()
    sample.foreach { t =>
      val a = Bpe.encodeKernel(org.apache.spark.unsafe.types.UTF8String.fromString(t), m)
      val b = Bpe.encodeKernel(org.apache.spark.unsafe.types.UTF8String.fromString(t), m2)
      assert(a.array.toSeq == b.array.toSeq)
    }
  }

  test("chunkBpe: budget respected, totality, zero-overlap chunks reconstruct the text") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val m = Bpe.trainFromCorpus(docs, col("text"), numMerges = 60, maxWords = 4000)
    val chunks = Corpus.chunkBpe(docs, m, maxTok = 16, overlap = 0)
      .as[(Long, Int, Int, String)].collect()
    assert(chunks.forall(_._3 <= 16), "chunk budget exceeded")
    val perDoc = chunks.groupBy(_._1)
    assert(perDoc.size == 200, "every doc emits at least one chunk")
    val texts = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    perDoc.foreach { case (id, cs) =>
      val rebuilt = cs.sortBy(_._2).map(_._4).mkString("")
      assert(rebuilt == texts(id), s"doc $id: zero-overlap chunks must concat to the text")
    }
  }

  test("B32 windowedTokenBudget: streamed window totals equal the batch count over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val m = Bpe.trainFromCorpus(docs, col("text"), numMerges = 50, maxWords = 4000)
    val rows = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = graft.streaming.EventStreams.windowedTokenBudget(
        in.toDF().toDF("doc_id", "text", "ts"), m)
      .writeStream.format("memory").queryName("b32").outputMode("append").start()
    val (half1, half2) = rows.splitAt(100)
    in.addData(half1.map { case (id, t) => (id, t, t0) }.toSeq: _*)
    in.addData((9999L, null, t0)) // NULL text must not NULL the window's sum
    q.processAllAvailable()
    in.addData(half2.map { case (id, t) => (id, t, t0) }.toSeq: _*) // same window: sums merge
    q.processAllAvailable()
    in.addData((999L, "closer", java.sql.Timestamp.valueOf("2024-01-01 12:00:00")))
    q.processAllAvailable(); q.stop()
    val got = spark.table("b32").where(col("start") === lit(t0))
      .as[(java.sql.Timestamp, Long, Long)].collect()
    val wantTokens = docs.agg(sum(Bpe.bpeCount(col("text"), m).cast("long")))
      .as[Long].head()
    assert(got.length == 1 && got.head._2 == 200L && got.head._3 == wantTokens,
      s"streamed budget must equal the batch count: $got vs $wantTokens")
  }

  test("incremental trainer: a 32768-merge production vocabulary trains in bounded time") {
    // the naive recount-everything loop is O(numMerges · Σ|word|) —
    // driver-HOURS at a real vocabulary size; the incremental trainer
    // (pair-indexed recount + lazy-deletion heap) must stay
    // interactive. The graded sf corpora saturate early (every
    // frequent word fully merges in ~126 steps), so the depth
    // demonstration uses a deterministic synthetic vocabulary deep
    // enough to sustain 32768 productive merges. Generous wall bound
    // so CI noise can't flake it; the measured number lands in
    // SURVEY §2 D10b.
    var seed = 42L
    def nxt(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % n).toInt + n) % n
    }
    val words = (0 until 30000).map { _ =>
      (new String(Array.fill(16)(('a' + nxt(6)).toChar)), (2 + nxt(5)).toLong)
    }
    val t0 = System.nanoTime()
    val m = Bpe.train(words, 32768)
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"trained ${m.pairs.size} merges in $sec%.1f s")
    assert(m.pairs.size == 32768, "vocabulary must sustain the full 32768 merges")
    assert(sec < 120.0, f"incremental trainer took $sec%.1f s — perf regression")
    // prefix property: a deep run begins with the shallow run's table
    val shallow = Bpe.train(words, 500)
    assert(m.pairs.take(500) == shallow.pairs,
      "a longer run must extend, never rewrite, the merge sequence")
  }

  test("forCorpus: memoized train-once + GRAFT_BPE_DIR artifact pinning contract") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    Bpe.clearMemo()
    val m1 = Bpe.forCorpus(spark, docs, col("text"), "k1", numMerges = 40, maxWords = 2000)
    val m2 = Bpe.forCorpus(spark, docs, col("text"), "k1", numMerges = 40, maxWords = 2000)
    assert(m1 eq m2, "same corpus key must return the memoized instance (train once)")
    val m3 = Bpe.forCorpus(spark, docs, col("text"), "k2", numMerges = 40, maxWords = 2000)
    assert(m3.pairs == m1.pairs, "same corpus under a different key trains equal merges")
    Bpe.clearMemo()
  }

  test("packSequencesBpe: offsets within budget, cumulative-sum consistency per shard") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m = Bpe.trainFromCorpus(docs, col("text"), numMerges = 60, maxWords = 4000)
    val budget = 256
    val packed = Corpus.packSequencesBpe(docs, budget, col("source"), m)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(packed.forall(p => p._5 >= 0 && p._5 < budget), "pack_off out of range")
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      var cum = 0L
      sorted.foreach { case (_, _, nTok, packId, packOff) =>
        assert(packId == cum / budget && packOff == cum % budget)
        cum += nTok
      }
    }
  }
}

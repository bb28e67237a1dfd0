package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Dedup}

/** Pairs → duplicate groups: [[Dedup.connectedComponents]] must give
  * every node the minimum id reachable through the pair set (chains
  * collapse transitively), keep disjoint groups apart, pass isolated
  * nodes through as singletons, and converge in O(log diameter)
  * rounds thanks to pointer jumping. Plus unit checks for the
  * term-statistics operators sharing this round. */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)],
                 maxIters: Int = 50): Map[Long, Long] =
    Dedup.connectedComponents(
      nodes.toDF("node"), edges.toDF("a", "b"), maxIters)
      .as[(Long, Long)].collect().toMap

  test("chains collapse transitively; disjoint groups stay apart; singletons pass") {
    // a~b, b~c, c~d is ONE group even though a~d was never a pair —
    // exactly what no per-pair keep flag can express
    val got = cc(
      nodes = (1L to 8L),
      edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)))
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, // chain → min id 1
      5L -> 5L,                               // isolated singleton
      6L -> 6L, 7L -> 6L,                     // separate group
      8L -> 8L))
  }

  test("edge direction and duplication don't matter") {
    val got = cc(nodes = (1L to 4L),
      edges = Seq((4L, 3L), (3L, 4L), (2L, 3L), (1L, 2L), (1L, 2L)))
    assert(got.values.toSet == Set(1L))
  }

  test("a long path converges within the pointer-jumping budget") {
    // 300-node path: plain min-propagation needs ~300 rounds; with the
    // label(label) jump each round roughly doubles reach, so well
    // under 25 rounds must suffice
    val n = 300L
    val got = cc(
      nodes = (1L to n),
      edges = (1L until n).map(i => (i, i + 1)),
      maxIters = 25)
    assert(got.size == n && got.values.forall(_ == 1L))
  }

  test("star graphs (the LSH mega-group shape) converge immediately") {
    val got = cc(nodes = (1L to 100L), edges = (2L to 100L).map(i => (1L, i)))
    assert(got.values.forall(_ == 1L))
  }

  test("property: components equal a driver-side union-find on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genEdges = Gen.listOfN(30, for {
      a <- Gen.choose(1L, 20L); b <- Gen.choose(1L, 20L) if a != b
    } yield (a, b))
    val p = Prop.forAll(genEdges) { es =>
      val nodes = (1L to 20L)
      // reference: textbook union-find with path compression
      val parent = collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long = {
        if (parent(x) != x) parent(x) = find(parent(x))
        parent(x)
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = nodes.map(n => n -> find(n)).toMap
      expect == cc(nodes, es)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  test("keepBest keeps the highest-scoring member per component, ties to lowest id") {
    val docs = Seq(
      (1L, 10), (2L, 30), (3L, 30), // one component, 2 and 3 tie on score
      (4L, 5)                       // singleton
    ).toDF("doc_id", "n_chars")
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)).toDF("node", "comp")
    val got = Dedup.keepBest(docs, comps, org.apache.spark.sql.functions.col("n_chars"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 1L, 0), (2L, 1L, 1), (3L, 1L, 0), (4L, 4L, 1)))
  }

  test("normalizeText lowercases, strips control chars, collapses whitespace") {
    val docs = Seq((1L, "  Hello\tWORLD  twice  spaced ")).toDF("doc_id", "text")
    val got = Corpus.normalizeText(docs)
      .as[(Long, String, Int)].collect().head
    assert(got._2 == "hello world twice spaced", s"got '${got._2}'")
    assert(got._3 == got._2.length)
  }

  test("tfidfTopK ranks rare terms first with exact tie order") {
    val docs = Seq(
      (1L, "x x common"),
      (2L, "y common common"),
      (3L, "common z z")).toDF("doc_id", "text")
    val got = Corpus.tfidfTopK(docs, k = 2)
      .select("doc_id", "term", "tf", "df", "rk")
      .as[(Long, String, Long, Long, Int)].collect().toSet
    // per doc: the doc-unique term (df=1) outranks 'common' (df=3)
    assert(got == Set(
      (1L, "x", 2L, 1L, 1), (1L, "common", 1L, 3L, 2),
      (2L, "y", 1L, 1L, 1), (2L, "common", 2L, 3L, 2),
      (3L, "z", 2L, 1L, 1), (3L, "common", 1L, 3L, 2)))
  }

  test("substrPairs finds verbatim runs invisible to whole-doc similarity") {
    val run = (1 to 13).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $run delta epsilon"),
      (2L, s"completely different words here $run more unrelated tail tokens"),
      (3L, "no shared window at all in this one document of thirteen tokens")).toDF("doc_id", "text")
    // docs 1 and 2 share ONE exact 13-token window; their whole-doc
    // Jaccard is far below any dedup threshold — the substring family
    // exists precisely for this case
    val got = Corpus.substrPairs(docs, ngram = 13, maxDf = 50)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L)))
  }

  test("substrPairs maxDf drops boilerplate windows before the join") {
    val run = (1 to 13).map(i => s"b$i").mkString(" ")
    val docs = (1L to 4L).map(i => (i, s"prefix$i $run")).toDF("doc_id", "text")
    // the shared window sits in 4 docs: df-capped at 3 it's boilerplate
    // (dropped, no candidate pairs at all); at 4 all C(4,2) pairs show
    assert(Corpus.substrPairs(docs, 13, maxDf = 3).count() == 0)
    assert(Corpus.substrPairs(docs, 13, maxDf = 4).count() == 6)
  }

  test("termRarity is the exact integer rollup divided once") {
    val docs = Seq(
      (1L, "a a b"),   // ctf: a→3 (2 here + 1 in doc2), b→1
      (2L, "a c")).toDF("doc_id", "text") // ctf: c→1
    val got = Corpus.termRarity(docs)
      .select("doc_id", "n_tok", "wsum", "mean_ctf")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (d, n, w, m) => d -> ((n, w, m)) }.toMap
    // doc1: 2·ctf(a)+1·ctf(b) = 2·3+1 = 7 over 3 tokens
    assert(got(1L) == ((3L, 7L, 7.0 / 3)))
    // doc2: ctf(a)+ctf(c) = 3+1 = 4 over 2 tokens
    assert(got(2L) == ((2L, 4L, 2.0)))
  }
  test("iteration checkpoints are released round-by-round: at most one survives the call") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // a 64-node chain needs several pointer-jump rounds — each round
    // checkpoints, and every superseded checkpoint must be freed
    val nodes = (1L to 64L)
    val edges = (1L until 64L).map(i => (i, i + 1))
    val got = cc(nodes, edges)
    assert(got.values.toSet == Set(1L), "one chain, one component")
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"only the final label checkpoint may remain, found ${leaked.size}")
  }

  test("clearComponentsMemo frees the memoized closures' checkpoint blocks") {
    import org.apache.spark.sql.functions.col
    Dedup.clearComponentsMemo()
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", 43),
      (2L, "the quick brown fox jumps over the lazy dog", 43),
      (3L, "a completely different document body here now", 45)
    ).toDF("doc_id", "text", "n_chars")
    val labels = Dedup.jaccardComponentsCached(docs, cacheKey = "memo-spec")
    assert(labels.count() == 3)
    assert(spark.sparkContext.getPersistentRDDs.keySet.size > before.size,
      "the memoized closure must hold a live checkpoint while cached")
    Dedup.clearComponentsMemo(blocking = true)
    spark.catalog.clearCache()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"teardown must free every closure checkpoint, found ${leaked.size}")
  }

}

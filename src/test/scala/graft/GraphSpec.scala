package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Integer PageRank (SURVEY §2 D32): hand-computed single iteration
  * (floor semantics exact), dangling/absorbing behavior, and the
  * partition-order invariance that makes the integer formulation
  * oracle-replayable. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(edges: Seq[(Long, Long)], n: Int) = (
    edges.toDF("src", "dst"),
    spark.range(n).select(col("id").as("node")))

  test("one iteration matches the hand computation, floors included") {
    // 0→{1,2}, 1→2, 3→2; node 2 dangling (its mass retires)
    val (e, nodes) = frame(Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 2L)), 4)
    val r = Graph.pageRank(e, nodes, iters = 1, initRank = 100L)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    // base = 15; contribs: 0→ gives 50 each, 1→2 gives 100, 3→2 gives 100
    // node1: 15 + (85·50) div 100  = 15 + 42  = 57   (floor of 42.5)
    // node2: 15 + (85·250) div 100 = 15 + 212 = 227  (floor of 212.5)
    assert(r == Map(0L -> 15L, 1L -> 57L, 2L -> 227L, 3L -> 15L))
  }

  test("hub structure accumulates rank over iterations; totals bounded") {
    // star: everyone links to node 0
    val (e, nodes) = frame((1L to 9L).map(i => (i, 0L)), 10)
    val r = Graph.pageRank(e, nodes, iters = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r(0L) > r(1L) * 5, s"hub must dominate: $r")
    assert((1L to 9L).map(r).toSet.size == 1, "leaves are symmetric")
    // mass never exceeds the initial total (floor losses only shrink it)
    assert(r.values.sum <= 10L * 1000000000L)
  }

  test("partition-order invariant: 16-way repartition equals 1 partition") {
    val edges = spark.range(5000).select(
      (col("id") % 97).as("src"), (col("id") % 89).as("dst")).distinct()
    val nodes = spark.range(100).select(col("id").as("node"))
    def run(parts: Int) =
      Graph.pageRank(edges.repartition(parts), nodes, iters = 3)
        .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toSeq
    assert(run(1) == run(16))
  }
}

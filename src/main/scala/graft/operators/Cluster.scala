package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.nearestCentroids

/** Deterministic distributed k-means (Lloyd's, cosine distance) —
  * the offline trainer for [[Ann.ivfTopK]]'s coarse codebook
  * (SURVEY §2 D7c).
  *
  * Spark shape per iteration: assignment is a pure MAP over the
  * corpus (the codebook ships as a plan constant inside the codegen'd
  * `NearestCentroids` expression — no exchange carries an embedding),
  * and the centroid update is one narrow hash aggregate on
  * `(cluster, dim)` carrying a single decimal per row. The driver
  * only ever holds the k×dim codebook (an index artifact, a few KB) —
  * never data.
  *
  * Determinism (what makes the DuckDB oracle replay bit-exact and
  * re-runs reproducible at any partitioning):
  *  - init = the first k vectors by id — no random seeds;
  *  - the centroid update stores per-dim SUMS, not means: cosine is
  *    scale-invariant, so dividing by the member count is pure noise
  *    — skipping it removes float division entirely;
  *  - sums accumulate in DECIMAL (order-independent — double sums
  *    would vary with partition order), then round once to float;
  *  - ties in the argmin break by lowest centroid id
  *    ([[graft.functions.VectorFunctions.nearestCids]]).
  *
  * Empty clusters keep their previous centroid (the standard Lloyd's
  * convention). */
object Cluster {

  /** Train `k` centroids for `iters` iterations; returns the codebook
    * as (ids, vectors). */
  def kmeansCentroids(embeddings: DataFrame, k: Int, iters: Int): (Array[Long], Array[Array[Float]]) = {
    // Project once and keep the frame hot for the iteration loop: each
    // Lloyd pass is a full corpus scan, so without the persist the
    // source parquet is re-read (and re-decoded) iters+1 times. At
    // cluster scale each pass is inherently a full pass over the
    // PERSISTED columnar form — the cache converts repeated cold
    // parquet scans into memory/local-disk reads.
    val proj = embeddings.select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val init = proj.filter(col("vec_id") < k).collect().sortBy(_.getLong(0))
      require(init.nonEmpty, s"kmeans: no rows with vec_id < k=$k to seed the codebook")
      // Centroid ids are the REAL seed vec_ids (matching ivfTopK and the
      // DuckDB oracle's labels) — with sparse vec_ids < k, positional
      // labels would diverge from the oracle bit-exactly everywhere.
      val cids = init.map(_.getLong(0))
      val cidIdx = cids.zipWithIndex.toMap
      var cents = init.map(_.getSeq[Float](1).toArray)
      for (_ <- 0 until iters) {
        val updated = proj
          .select(
            element_at(nearestCentroids(col("embedding"), cents, cids, 1), 1).as("cid"),
            posexplode(col("embedding")).as(Seq("d", "x")))
          .groupBy(col("cid"), col("d"))
          .agg(sum(col("x").cast("decimal(25,7)")).as("s"))
          .groupBy(col("cid"))
          .agg(sort_array(collect_list(struct(col("d"), col("s")))).as("ds"))
          .select(col("cid"), expr("transform(ds, p -> CAST(p.s AS FLOAT))").as("c"))
          .collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
        cents = cids.map(c => updated.getOrElse(c, cents(cidIdx(c))))
      }
      (cids, cents)
    } finally proj.unpersist(blocking = false)
  }

  /** Assignments under the trained codebook: (vec_id, cid). */
  def kmeansAssign(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    val (cids, cents) = kmeansCentroids(embeddings, k, iters)
    embeddings.select(col("vec_id"),
      element_at(nearestCentroids(col("embedding"), cents, cids, 1), 1).as("cid"))
  }
}

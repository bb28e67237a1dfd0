package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, TextFunctions}

/** Deduplication operators for large-scale training-data pipelines
  * (SURVEY §2 D1-D5). Every variant is a declarative plan whose
  * candidate-generation step is *linear* in the corpus — the O(n²)
  * work only ever happens inside small blocks/buckets:
  *
  *  - exact: one hash-shuffle groupBy on content
  *  - blocked Jaccard: length-bucket blocking (±1 neighbor expansion
  *    keeps boundary pairs), shingle-set verify inside blocks
  *  - MinHash+LSH: 128-perm signatures, 16×8 banding, bucket
  *    equi-join for candidates, exact-Jaccard verify
  *  - SimHash: 64-bit signature, 4×16-bit chunk banding (pigeonhole:
  *    hamming ≤ 3 ⇒ some chunk equal), popcount verify
  *  - embedding cosine: brute-force pair scan (correctness baseline;
  *    the scale path is [[Ann.lshTopK]]-style bucketing)
  *
  * At 100 TB: banding hashes distribute uniformly so bucket joins are
  * AQE-splittable; signatures are computed in one codegen'd pass per
  * row ([[graft.functions.Hashing]]); no driver-side loops anywhere.
  */
object Dedup {

  /** Exact dedup: keeper id + multiplicity per distinct text. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Near-dup pairs by 3-gram-shingle Jaccard ≥ `threshold`, blocked
    * by length bucket (±1). Returns (a_id, b_id, j).
    *
    * Execution shape (this matters at scale): candidate pairs are
    * generated from *id-only* rows (the blocked join touches 16-byte
    * rows, never arrays), then repartitioned by a_id — so the heavy
    * verify step is spread over the full cluster even though the
    * blocking key has few distinct values. Shingle arrays are attached
    * via two joins against the (persisted) shingle projection and the
    * intersection is computed once per pair. The broadcast hint fits
    * corpora whose (id, shingles) projection fits an executor; beyond
    * that Spark falls back to a shuffle join on id — still linear. */
  def jaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    // Shingle sets are hashed to SORTED long arrays once per doc:
    // string compares / hash-set probes disappear from the per-pair
    // hot loop, and each pair costs one O(n) merge
    // (Hashing.SortedIntersectCount). Jaccard values are unchanged —
    // |∩| on 64-bit-hashed distinct shingles equals |∩| on the strings
    // (collision odds ~1e-15 per pair).
    val t = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(
        col("doc_id"),
        expr("n_chars div 100").as("bucket"),
        Hashing.hashedShingles3Col(TextFunctions.tokens(col("text"))).as("sh"))
      .persist()
    val a = t.select(col("doc_id").as("a_id"), col("bucket").as("a_bucket"))
    val b = t.select(col("doc_id").as("b_id"),
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("a_bucket"))
    val cand = a.join(b, Seq("a_bucket"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .repartition(col("a_id"))
    cand
      .join(broadcast(t.select(col("doc_id").as("a_id"), col("sh").as("a_sh"),
        size(col("sh")).as("a_n"))), Seq("a_id"))
      .join(broadcast(t.select(col("doc_id").as("b_id"), col("sh").as("b_sh"),
        size(col("sh")).as("b_n"))), Seq("b_id"))
      // size-ratio prefilter: j ≥ t ⇒ i ≥ t(na+nb)/(1+t) and
      // i ≤ min(na,nb), so min(na,nb)·(1+t) ≥ t·(na+nb) is a
      // necessary condition — prunes pairs before the merge pass
      // without changing the result set
      .where(least(col("a_n"), col("b_n")) * (1.0 + threshold) >=
        (col("a_n") + col("b_n")) * threshold)
      .withColumn("i", Hashing.sortedIntersectCount(col("a_sh"), col("b_sh")))
      .withColumn("j", col("i").cast("double") / (col("a_n") + col("b_n") - col("i")))
      .where(col("j") >= threshold)
      .select(col("a_id"), col("b_id"), col("j"))
  }

  /** MinHash+LSH near-dup summary per document:
    * (doc_id, n_cand, n_dup, keep). A doc is kept when no *verified*
    * duplicate (exact shingle Jaccard ≥ threshold) has a smaller id —
    * the distributed analogue of "keep first occurrence". */
  def minhashLsh(docs: DataFrame, numHashes: Int = 128, bands: Int = 16,
                 threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val d = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        Hashing.hashedShingles3Col(TextFunctions.tokens(col("text"))).as("sh"))
      .persist()
    // one pass: shingles → signature → band buckets; pairs are
    // generated inside each bucket via sorted-combination lambdas
    // (no self-join — a self-join would re-run the whole hashing
    // subtree and shuffle it twice)
    val buckets = d
      .withColumn("sig", Hashing.minhash(col("sh"), numHashes))
      .select(col("doc_id"),
        posexplode(Hashing.bandHashes(col("sig"), bands, rows)).as(Seq("band", "bh")))
      .groupBy(col("band"), col("bh"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1)
    val cand = buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("a_id"), y.as("b_id")))))).as("p"))
      .select(col("p.a_id"), col("p.b_id"))
      .distinct()
    // verified dup pairs: attach shingles from the cached projection;
    // candidate set is tiny (LSH gives ~linear candidates), so it is
    // broadcast against the corpus-side scans
    val withA = d.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
      .join(broadcast(cand), Seq("a_id"))
    val verified = d.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
      .join(broadcast(withA), Seq("b_id"))
      .withColumn("i", Hashing.sortedIntersectCount(col("a_sh"), col("b_sh")))
      .withColumn("j",
        col("i").cast("double") / (size(col("a_sh")) + size(col("b_sh")) - col("i")))
      .withColumn("dup", (col("j") >= threshold).cast("int"))
      .select(col("a_id"), col("b_id"), col("dup"))
    // per-doc rollup: candidates/dups seen from either side; `keep`
    // drops docs having a verified dup with a smaller id
    val fromA = verified.select(col("a_id").as("doc_id"), col("dup"), lit(0).as("dup_smaller"))
    val fromB = verified.select(col("b_id").as("doc_id"), col("dup"), col("dup").as("dup_smaller"))
    docs.select(col("doc_id"))
      .join(fromA.unionAll(fromB), Seq("doc_id"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("dup")).as("n_cand"),
        coalesce(sum(col("dup")), lit(0L)).as("n_dup"),
        when(coalesce(sum(col("dup_smaller")), lit(0L)) > 0, lit(0)).otherwise(lit(1)).as("keep"))
  }

  /** SimHash near-dup summary per document (hamming ≤ `maxHamming`).
    * Candidates via 4×16-bit chunk banding. */
  def simhash(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    // persisted: the chunk self-join below scans this twice, and
    // re-deriving simhashes per scan would double the hashing work
    val s = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        Hashing.simhash(TextFunctions.tokens(col("text"))).as("sh64")).persist()
    val chunkArr = array((0 until 4).map(i =>
      shiftrightunsigned(col("sh64"), i * 16).bitwiseAND(lit(0xffffL))): _*)
    val chunks = s.select(col("doc_id"), col("sh64"),
      posexplode(chunkArr).as(Seq("ci", "cv")))
    val cand = chunks.as("a")
      .join(chunks.as("b"), col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.sh64").as("a_sh"), col("b.sh64").as("b_sh"))
      .distinct()
      .withColumn("dup", (bit_count(col("a_sh").bitwiseXOR(col("b_sh"))) <= maxHamming).cast("int"))
    val fromA = cand.select(col("a_id").as("doc_id"), col("dup"), lit(0).as("dup_smaller"))
    val fromB = cand.select(col("b_id").as("doc_id"), col("dup"), col("dup").as("dup_smaller"))
    s.select(col("doc_id"), col("sh64"))
      .join(fromA.unionAll(fromB), Seq("doc_id"), "left")
      .groupBy(col("doc_id"), col("sh64"))
      .agg(
        count(col("dup")).as("n_cand"),
        coalesce(sum(col("dup")), lit(0L)).as("n_dup"),
        when(coalesce(sum(col("dup_smaller")), lit(0L)) > 0, lit(0)).otherwise(lit(1)).as("keep"))
  }

  /** Embedding-cosine near-dup pairs (ids only; cosine in strict
    * double, see [[graft.functions.VectorFunctions.cosine]]). */
  def embeddingPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = embeddings.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.join(b, col("a_id") < col("b_id"))
      .where(graft.functions.VectorFunctions.cosine(col("a_emb"), col("b_emb")) >= threshold)
      .select(col("a_id"), col("b_id"))
  }
}

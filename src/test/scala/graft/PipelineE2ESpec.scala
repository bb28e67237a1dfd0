package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup, Sampling}

/** End-to-end training-data pipeline composition: the operators must
  * CHAIN — quality filter → exact dedup keepers → near-dup keepers →
  * decontamination → deterministic split/mix — as one declarative
  * plan over the documents table, with sane row accounting at every
  * stage. This is the "a user of the reference could run their whole
  * pipeline here" claim, exercised as a single program. */
class PipelineE2ESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("filter → dedup → decontaminate → split composes and conserves rows") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val total = docs.count()

    // 1. rule filter
    val kept = Corpus.qualityFilter(docs).where(col("kept") === 1).select("doc_id")
    val docsKept = docs.join(kept, "doc_id")
    val nKept = docsKept.count()
    assert(nKept > 0 && nKept <= total)

    // 2. exact dedup → keep group representatives
    val reps = Dedup.exact(docsKept).select(col("keep_id").as("doc_id"))
    val docsUnique = docsKept.join(reps, "doc_id")
    val nUnique = docsUnique.count()
    assert(nUnique <= nKept)

    // 3. near-dup dedup (minhash) → keep flagged survivors
    val survivors = Dedup.minhashLsh(docsUnique).where(col("keep") === 1).select("doc_id")
    val docsDeduped = docsUnique.join(survivors, "doc_id")
    val nDeduped = docsDeduped.count()
    assert(nDeduped <= nUnique && nDeduped > 0)

    // 3b. transitive dup grouping: jaccard pairs + substring-overlap
    // pairs → connected components → keep one doc per component (the
    // component id IS the keeper id, so the keep list is a filter)
    val pairEdges = Dedup.jaccardPairs(docsDeduped)
      .select(col("a_id").as("a"), col("b_id").as("b"))
      .unionByName(Corpus.substrPairs(docsDeduped, ngram = 13)
        .select(col("a_id").as("a"), col("b_id").as("b")))
    val comps = Dedup.connectedComponents(
      docsDeduped.select(col("doc_id").as("node")), pairEdges)
    assert(comps.count() == nDeduped, "every doc gets a component")
    val docsGrouped = docsDeduped.join(
      comps.where(col("node") === col("comp")).select(col("node").as("doc_id")), "doc_id")
    val nGrouped = docsGrouped.count()
    assert(nGrouped <= nDeduped && nGrouped > 0)

    // 4. decontaminate vs the held-out benchmark slice
    val clean = Corpus.decontaminate(docsGrouped, col("doc_id") % 97 === 0)
      .where(col("contaminated") === 0).select("doc_id")
    val docsClean = docsGrouped.join(clean, "doc_id")
    val nClean = docsClean.count()
    assert(nClean <= nGrouped)

    // 5. deterministic split: total, disjoint, reproducible
    val split = Sampling.trainTestSplit(docsClean, col("doc_id"))
    assert(split.count() == nClean)
    val bySplit = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.values.sum == nClean)
    assert(bySplit.getOrElse("train", 0L) >= (nClean * 0.7).toLong,
      s"train split should dominate: $bySplit of $nClean")

    // the whole chain is ONE plan — it must also execute as such
    assert(split.queryExecution.executedPlan != null)

    // 6. shape for the trainer: scrub → chunk → pack the train split
    val trainDocs = docs.join(split.where(col("split") === "train").select("doc_id"), "doc_id")
    val scrubbed = Corpus.piiScrub(trainDocs)
      .select(col("doc_id"), col("scrubbed").as("text"))
    val chunks = Corpus.chunk(scrubbed, maxTok = 64, overlap = 8)
    val nChunks = chunks.count()
    assert(nChunks >= trainDocs.count(), "every doc emits >= 1 chunk")
    // pack the chunks as pseudo-docs (chunk key becomes the id)
    val packed = Corpus.packSequences(
      chunks.select((col("doc_id") * 1000 + col("chunk_idx")).as("doc_id"),
        col("chunk_text").as("text"), lit("train").as("source")),
      budgetTok = 512, col("source"))
    assert(packed.count() == nChunks, "packing is total over its input")
    val maxOff = packed.agg(max(col("pack_off"))).as[Long].collect()(0)
    assert(maxOff < 512, "offsets live inside the budget")
  }
}

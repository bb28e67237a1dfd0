package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media = Multimodal.mediaFromDocuments(
    Tables.documents(spark, "/root/testdata/sf0.001"))

  test("media frame has the canonical schema") {
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "bytes", "width", "height", "sample_rate"))
    assert(media.schema("bytes").dataType.typeName == "binary")
  }

  test("decodeFeatures is deterministic, fixed-width, partition-local") {
    val f1 = Multimodal.decodeFeatures(media).collect().map(r => r.media_id -> r.features.toSeq).toMap
    val f2 = Multimodal.decodeFeatures(media.repartition(7)).collect()
      .map(r => r.media_id -> r.features.toSeq).toMap
    assert(f1 == f2, "features must not depend on partitioning")
    assert(f1.values.forall(_.length == 16))
  }

  test("frameSample emits n deterministic offsets per row") {
    val fs = Multimodal.frameSample(media, n = 4)
    assert(fs.count() == media.count() * 4)
    assert(fs.agg(max("frame_offset")).as[Long].head() < 1000)
  }

  test("resizePlan preserves aspect ratio within max side") {
    val rp = Multimodal.resizePlan(media, maxSide = 224)
    val bad = rp.filter(col("out_w") > 224 || col("out_h") > 224).count()
    assert(bad == 0)
  }

  test("phashDedup: planted near-identical media pair within the hamming radius; far media stay apart") {
    // alternating base vector → dHash 0b1010…10; the near twin bumps
    // ONE feature, flipping exactly the two adjacent comparison bits
    // (hamming 2 = the radius); the reversed vector is hamming 16 away
    // and shares no band chunk at all
    val base = Array.tabulate(16)(i => if (i % 2 == 0) 0.1f else 0.9f)
    val near = base.clone(); near(2) = 0.95f
    val far = Array.tabulate(16)(i => if (i % 2 == 0) 0.9f else 0.1f)
    val feats = Seq(
      (1L, base), (2L, near), (3L, base), (4L, far))
      .toDF("media_id", "features")
    val out = graft.operators.Dedup.phashDedup(feats, dim = 16, maxHamming = 2)
      .select("media_id", "n_cand", "n_dup", "keep")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3, r._4)).toSeq == Seq(
      (1L, 2L, 2L, 1), // exact twin 3 + near twin 2; smallest id keeps
      (2L, 2L, 2L, 0), // dup of smaller id 1 → dropped
      (3L, 2L, 2L, 0), // exact dup of 1 → dropped
      (4L, 0L, 0L, 1))) // no shared band, no candidates
  }

  test("phashDedup 64-bit production width: sign-bit hashes band and verify correctly") {
    // the graded shape since r14: 64 bits over 65 features, no wrap.
    // Alternating base starting LOW sets every odd bit INCLUDING bit
    // 63 (f[63] = 0.9 > f[64] = 0.1), so ph is a NEGATIVE long — this
    // pins the signed-bit path end-to-end: OR assembly, unsigned
    // chunk extraction, xor/bit_count verify.
    val base = Array.tabulate(65)(i => if (i % 2 == 0) 0.1f else 0.9f)
    val near = base.clone(); near(2) = 0.95f // flips bits 1 and 2 → hamming 2
    val far = Array.tabulate(65)(i => if (i % 2 == 0) 0.9f else 0.1f)
    val feats = Seq((1L, base), (2L, near), (3L, base), (4L, far))
      .toDF("media_id", "features")
    val out = graft.operators.Dedup
      .phashDedup(feats, dim = 64, maxHamming = 2, wrap = false)
      .select("media_id", "ph", "n_cand", "n_dup", "keep")
      .as[(Long, Long, Long, Long, Int)].collect().sortBy(_._1)
    // rows 1-3 start LOW → odd bits incl. 63 set → negative ph; the
    // inverted row 4 sets the even bits only → positive
    assert(out.take(3).forall(r => r._2 < 0),
      s"bit 63 must be set on the low-start hashes: ${out.toSeq}")
    assert(out(3)._2 > 0, s"the inverted hash keeps bit 63 clear: ${out.toSeq}")
    assert(out.map(r => (r._1, r._3, r._4, r._5)).toSeq == Seq(
      (1L, 2L, 2L, 1), // exact twin 3 + hamming-2 twin 2; smallest id keeps
      (2L, 2L, 2L, 0),
      (3L, 2L, 2L, 0),
      (4L, 0L, 0L, 1))) // fully inverted: no chunk agrees, no candidates
  }

  test("phashDedup: identical media bytes collapse through the real decode path") {
    // the graded-query shape: identical payloads ⇒ identical features
    // ⇒ hamming 0, regardless of the (stubbed) codec's avalanche
    val m = Seq(
      (10L, "image", "same payload".getBytes("UTF-8"), 64, 64, 16000),
      (11L, "image", "same payload".getBytes("UTF-8"), 64, 64, 16000),
      (12L, "image", "different payload".getBytes("UTF-8"), 64, 64, 16000))
      .toDF("media_id", "kind", "bytes", "width", "height", "sample_rate")
    val out = graft.operators.Dedup.phashDedup(
        Multimodal.decodeFeatures(m).toDF(), dim = 16, maxHamming = 2)
      .select("media_id", "n_dup", "keep").as[(Long, Long, Int)]
      .collect().sortBy(_._1)
    assert(out.head == ((10L, 1L, 1)))
    assert(out(1) == ((11L, 1L, 0)), "byte-identical media drops against the smaller id")
  }
}

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
}

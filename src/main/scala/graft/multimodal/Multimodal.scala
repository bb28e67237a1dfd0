package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Hashing

/** Multimodal-column plumbing (SURVEY §2 D12): image/audio/video as
  * opaque `binary` columns with typed metadata, processed in
  * partition-local batches.
  *
  * The Spark-side shape is real and tested — schema, partitioning,
  * batch iteration, feature-column contract. The codec step itself is
  * STUBBED (this container ships no image/audio libraries): decode is
  * a deterministic fake that derives pseudo-features from the bytes'
  * hash stream. Swapping in a real decoder is a one-function change in
  * `fakeDecode` — everything around it (the `mapPartitions` batch
  * loop, the output schema, frame sampling, resize bookkeeping) stays.
  *
  * Scale posture: rows are processed partition-locally (no shuffle);
  * binary payloads never pass through a Python boundary; feature
  * output is a fixed-width `array<float>` ready for the ANN/dedup
  * operators in [[graft.operators]].
  */
object Multimodal {

  /** Canonical media row. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  /** Decoded feature row. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false)))

  /** STUB — deterministic fake decode: `dim` pseudo-features from the
    * byte content's hash stream. A real build replaces this body with
    * an actual codec call; the signature is the contract. */
  def fakeDecode(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val h = Hashing.hash64(bytes, 1000L + i)
      out(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
      i += 1
    }
    out
  }

  /** Derive a media table from any (id, text) frame — test/demo
    * harness standing in for a real binary ingest. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("kind"),
      col("text").cast("binary").as("bytes"),
      (col("doc_id") % 640 + 32).cast("int").as("width"),
      (col("doc_id") % 480 + 32).cast("int").as("height"),
      lit(16000).as("sample_rate"))

  /** Decode/feature-extract in partition-local batches. */
  def decodeFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, bytes) =>
        MediaFeatures(id, kind, bytes.length, fakeDecode(bytes, dim))
      })
  }

  /** Frame sampling bookkeeping: pick `n` deterministic frame offsets
    * per video row — the plumbing a real frame extractor plugs into. */
  def frameSample(media: DataFrame, n: Int = 4): DataFrame =
    media
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_offset",
        pmod(Hashing.fingerprint(col("bytes").cast("string")) + col("frame_idx"), lit(1000L)))
      .select(col("media_id"), col("frame_idx"), col("frame_offset"))

  /** Resize bookkeeping: target dims preserved-aspect-ratio — the
    * metadata transform a real resampler would honor. */
  def resizePlan(media: DataFrame, maxSide: Int = 224): DataFrame =
    media.select(col("media_id"), col("width"), col("height"))
      .withColumn("scale",
        least(lit(maxSide) / col("width"), lit(maxSide) / col("height"), lit(1.0)))
      .withColumn("out_w", least(ceil(col("width") * col("scale")), lit(maxSide)).cast("int"))
      .withColumn("out_h", least(ceil(col("height") * col("scale")), lit(maxSide)).cast("int"))
}

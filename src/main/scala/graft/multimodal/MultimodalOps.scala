package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, processed
  * per-partition in batches.
  *
  * The decode step is a STUB by design (no media libraries exist in this
  * environment): `decodeStub` derives a deterministic fixed-shape feature
  * vector from the bytes themselves, so every piece of Spark-side plumbing —
  * schema, binary handling, partition-batched iteration, frame-index
  * explode, feature schema — is real and tested, and a production build
  * swaps ONLY the body of `decodeBatch` for a JNI/FFI media decoder.
  *
  * Scale notes (100 TB of media): payloads stay off the shuffle path —
  * decode runs in `mapPartitions` directly over the scan (no exchange
  * before it); features (small, fixed-width) are what flows downstream.
  * Batch shape: the iterator is consumed lazily per-partition, so memory
  * is bounded by one payload + one feature row, not the partition.
  */
object MultimodalOps {

  val FeatureDim = 8

  /** Deterministic stand-in for a media decoder: radix-31 rolling hashes of
    * `FeatureDim` byte stripes, scaled to [0, 1). Replace with a real
    * decoder in production — signature and schema stay identical. */
  private[multimodal] def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val acc = new Array[Long](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      val j = i % FeatureDim
      acc(j) = (acc(j) * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc.map(_.toDouble / 1000000007.0)
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false),
  ))

  /** media(doc_id, payload: binary) → (doc_id, n_bytes, features[8]):
    * partition-batched decode, the mapInPandas/mapPartitions shape. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    media
      .select(col("doc_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          Row(r.getLong(0), bytes.length.toLong, decodeStub(bytes))
        }
      }(enc)
  }

  /** Frame sampling plumbing: every `stride`-th frame index of a payload
    * whose frame count is `n_bytes / frameBytes` (the video analog —
    * explode(sequence) keeps it declarative, no UDTF needed). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames", (length(col("payload")) / frameBytes).cast("long"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"), col("payload"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))
      .withColumn("frame", expr(s"substring(payload, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)"))
      .drop("payload")

  /** Build a media table from `documents` (text bytes as stand-in payloads
    * with typed metadata) — the ingest-side schema contract. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("lang").as("language"),
        col("source"),
        col("n_chars").as("content_length"),
        lit("text/plain").as("mime"),
      ).as("meta"),
    )
}

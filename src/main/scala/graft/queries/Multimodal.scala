package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.multimodal.MultimodalOps

/** Multimodal-column queries: binary payload plumbing over `documents`
  * stand-in media. q42 (stub decode via mapPartitions) has no SQL oracle —
  * the driver records a rows-only check; q43 (frame sampling) is pure
  * relational algebra over binary columns and is oracle-checked including
  * the binary frame values.
  */
object Multimodal extends QueryModule {

  /** q42: partition-batched stub decode → fixed-width features. The first
    * two feature stripes are projected out so the output is flat doubles.
    * The mapPartitions plumbing is the point; the stub's arithmetic (radix-
    * 31 fold over every 8th payload byte, scaled to [0,1)) is nevertheless
    * oracle-checkable — the SQL mirrors it in the char domain (ASCII
    * corpus: char ops == byte ops). */
  def mediaFeatures(s: SparkSession, d: String): DataFrame =
    MultimodalOps
      .extractFeatures(s, MultimodalOps.mediaFromDocuments(documents(s, d)))
      .select(
        col("doc_id"), col("n_bytes"),
        round(element_at(col("features"), 1), 6).as("f0"),
        round(element_at(col("features"), 2), 6).as("f1"),
      )
      .orderBy("doc_id")

  private def stripeHash(j: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(list_filter(range(length(text)), i -> i % ${MultimodalOps.FeatureDim} = $j),
       |    i -> CAST(ord(substring(text, CAST(i + 1 AS INT), 1)) AS BIGINT))),
       |  (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin.replace("\n", " ")

  private val mediaFeaturesSql =
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_bytes,
       |  round(CAST(${stripeHash(0)} AS DOUBLE) / 1000000007.0, 6) AS f0,
       |  round(CAST(${stripeHash(1)} AS DOUBLE) / 1000000007.0, 6) AS f1
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  /** q43: every 4th 64-byte frame of each payload, with the frame bytes. */
  def frameSample(s: SparkSession, d: String): DataFrame =
    MultimodalOps
      .sampleFrames(MultimodalOps.mediaFromDocuments(documents(s, d)),
        frameBytes = 64, stride = 4)
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        // payloads are ASCII stand-ins → decode for the oracle compare
        // (DuckDB 1.0 can't slice BLOBs; the op itself keeps binary frames)
        decode(col("frame"), "UTF-8").as("frame_text"))
      .orderBy("doc_id", "frame_idx")

  private val frameSampleSql =
    """WITH media AS (
      |  SELECT doc_id, text AS payload,
      |    octet_length(encode(text)) // 64 AS n_frames
      |  FROM documents
      |)
      |SELECT doc_id, n_frames, r.f AS frame_idx,
      |  substring(payload, CAST(r.f * 64 + 1 AS INTEGER), 64) AS frame_text
      |FROM media, unnest(range(0, n_frames, 4)) AS r(f)
      |WHERE n_frames > 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** q56: block-stride payload resize (the image/audio downsample slot of
    * the decode → extract → resize → frame-sample chain): keep the first 4
    * bytes of every 8-byte block, binary→binary in the scan stage. Output
    * is summarized (byte counts + content hash) because DuckDB 1.0 cannot
    * slice BLOBs — the oracle mirrors the op on the ASCII text stand-in
    * where char ops == byte ops. */
  def mediaResize(s: SparkSession, d: String): DataFrame = {
    import graft.functions.{BinaryExprs, Hashing}
    MultimodalOps.mediaFromDocuments(documents(s, d))
      .select(col("doc_id"), col("payload"),
        BinaryExprs.block_resize(col("payload"), 8, 4).as("resized"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes_in"),
        length(col("resized")).cast("long").as("n_bytes_out"),
        Hashing.poly_hash(col("resized").cast("string")).as("content_hash"),
      )
      .orderBy("doc_id")
  }

  private val mediaResizeSql =
    """WITH resized AS (
      |  SELECT doc_id, length(text) AS n_in,
      |    array_to_string(list_transform(range((length(text) + 7) // 8),
      |      i -> substring(text, CAST(8 * i + 1 AS INT), 4)), '') AS r
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(n_in AS BIGINT) AS n_bytes_in,
      |  CAST(length(r) AS BIGINT) AS n_bytes_out,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(r, ''), c -> CAST(ord(c) AS BIGINT))), (acc, x) -> (acc * 31 + x) % 1000000007) AS content_hash
      |FROM resized
      |ORDER BY doc_id""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q42_media_features", mediaFeatures, Some(mediaFeaturesSql)),
    Q("q43_frame_sample", frameSample, Some(frameSampleSql)),
    Q("q56_media_resize", mediaResize, Some(mediaResizeSql)),
  )
}

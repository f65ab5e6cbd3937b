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
    * two feature stripes are projected out so the output is flat doubles. */
  def mediaFeatures(s: SparkSession, d: String): DataFrame =
    MultimodalOps
      .extractFeatures(s, MultimodalOps.mediaFromDocuments(documents(s, d)))
      .select(
        col("doc_id"), col("n_bytes"),
        round(element_at(col("features"), 1), 6).as("f0"),
        round(element_at(col("features"), 2), 6).as("f1"),
      )
      .orderBy("doc_id")

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

  override def queries: Seq[Q] = Seq(
    Q("q42_media_features", mediaFeatures, None),
    Q("q43_frame_sample", frameSample, Some(frameSampleSql)),
  )
}

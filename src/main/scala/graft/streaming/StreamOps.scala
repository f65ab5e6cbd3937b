package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming surface (SURVEY.md §2.10): the reference is batch
  * over an at-rest BIDS tree, but its `update/` drop-directory
  * (convert2BIDS.sh:8) is a file queue — the natural streaming story. These
  * operators are the streaming twins of the batch queries: identical
  * transform bodies over `readStream`, so correctness is established by
  * equivalence with the batch plan on the same files (tested with
  * Trigger.AvailableNow into a memory sink).
  *
  * Scale notes: file-source streaming at 100 TB means a partitioned drop
  * directory and `maxFilesPerTrigger` back-pressure; the tumbling-window
  * aggregate shuffles by (window, key) exactly like its batch twin, and the
  * watermark bounds state size to (lateness / window) × |keys| rows.
  */
object StreamOps {

  /** File-source stream over a directory of parquet event files. */
  def eventStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(dir)

  /** Tumbling-window per-type aggregation with a watermark — the streaming
    * twin of q19 (exact DECIMAL sums). `tsCol` must be a TimestampType
    * column; late rows beyond `lateness` are dropped deterministically.
    */
  def tumblingCounts(events: DataFrame, tsCol: String, window: String,
      lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window).as("w"),
        col("event_type"),
      )
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
      )
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact-dedup: drop duplicate keys with bounded state — rows
    * whose key was seen within the watermark horizon are suppressed
    * (training-data dedup for arriving shards; state size is bounded by
    * keys-per-lateness-window, the 100 TB-safe form of dropDuplicates). */
  def streamingDedup(events: DataFrame, tsCol: String, keyCols: Seq[String],
      lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Session windows per key with an inactivity gap (SURVEY.md §2.10
    * "per-subject completeness = session-window-like grouping"): sessions
    * close `gap` after their last event; works identically in batch and
    * streaming (watermark bounds state in the latter). */
  def sessionize(events: DataFrame, tsCol: String, keyCol: String,
      gap: String): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gap).as("s"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
      )
      .select(col("s.start").as("session_start"), col("s.end").as("session_end"),
        col(keyCol), col("n_events"), col("sum_value"))

  /** Drain an AvailableNow stream into an in-memory table and return its
    * final contents — the deterministic test harness for streaming ops. */
  def runToMemory(spark: SparkSession, writer: DataStreamWriter[Row],
      name: String): DataFrame = {
    val q = writer
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Append-mode variant (dedup and other non-aggregating sinks). */
  def runToMemoryAppend(spark: SparkSession, writer: DataStreamWriter[Row],
      name: String): DataFrame = {
    val q = writer
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}

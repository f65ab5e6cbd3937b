package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps
import graft.multimodal.MultimodalOps

class StreamMultimodalSpec extends SparkSpec {

  test("streaming tumbling counts equal the batch twin on the same files") {
    val s = spark
    val dir = Files.createTempDirectory("graft-stream").toString
    // events with a real TimestampType ts (testdata nanos-long → timestamp)
    val batch = s.read.parquet(s"$sf0001/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select("ts", "event_type", "value")
    batch.repartition(3).write.mode("overwrite").parquet(dir)

    val stream = StreamOps.eventStream(s, dir, batch.schema)
    val streamed = StreamOps.runToMemory(
      s,
      StreamOps.tumblingCounts(stream, "ts", "1 hour", "0 seconds").writeStream,
      "tumbling_test",
    ).collect().map(r => (r.getTimestamp(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap

    val expected = batch
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap

    assert(streamed === expected)
    assert(streamed.nonEmpty)
  }

  test("extractFeatures is deterministic and fixed-width") {
    val s = spark
    import s.implicits._
    val media = Seq((1L, "hello world"), (2L, "hello world"), (3L, "xyz"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val f = MultimodalOps.extractFeatures(s, media).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Double](2)))).toMap
    assert(f(1L)._1 === 11L)
    assert(f(1L)._2 === f(2L)._2) // same bytes → same features
    assert(f(1L)._2 !== f(3L)._2)
    assert(f.values.forall(_._2.length === MultimodalOps.FeatureDim))
    assert(f.values.forall(_._2.forall(v => v >= 0.0 && v < 1.0)))
  }

  test("sampleFrames yields stride-spaced fixed-size frames") {
    val s = spark
    import s.implicits._
    val media = Seq((1L, "a" * 300)).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val frames = MultimodalOps.sampleFrames(media, frameBytes = 64, stride = 2).collect()
    // 300 bytes → 4 full frames (0..3), stride 2 → indices 0, 2
    assert(frames.map(_.getAs[Long]("frame_idx")).toSeq.sorted === Seq(0L, 2L))
    frames.foreach(r => assert(r.getAs[Array[Byte]]("frame").length === 64))
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.catalog.BidsCatalog

/** The remaining SURVEY.md §2 corners: A2 accumulate-union, S5/F9 JSON
  * sidecar read-update-write, O4 data-availability branch routing.
  */
class OrchestrationSpec extends SparkSpec {

  test("A2: rbind-accumulate collapses to reduce(unionByName), order-free") {
    val s = spark
    import s.implicits._
    // per-subject frames with differing column order (unionByName semantics)
    val a = Seq(("s1", 3L)).toDF("subject", "outliers")
    val b = Seq((5L, "s2")).toDF("outliers", "subject")
    val c = Seq(("s3", 0L)).toDF("subject", "outliers")
    val all = Seq(a, b, c).reduce(_ unionByName _)
    assert(all.count() === 3)
    assert(all.columns.toSeq === Seq("subject", "outliers"))
    assert(all.filter(col("subject") === "s2").head().getLong(1) === 5L)
  }

  test("S5/F9: JSON sidecar read → field set → write round-trip (jq analog)") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-json")
    val in = dir.resolve("sidecars"); val out = dir.resolve("updated")
    Seq("""{"TaskName":"rest","RepetitionTime":2.0}""",
      """{"TaskName":"old","RepetitionTime":1.5}""")
      .toDF("value").coalesce(1).write.text(in.toString)
    // jq '.TaskName="MID"' (preprocess_parallel.sh:109-115)
    val updated = s.read.json(in.toString)
      .withColumn("TaskName", lit("MID"))
    updated.write.mode("overwrite").json(out.toString)
    val back = s.read.json(out.toString)
    assert(back.count() === 2)
    assert(back.select("TaskName").distinct().head().getString(0) === "MID")
    assert(back.select("RepetitionTime").as[Double].collect().sorted === Array(1.5, 2.0))
  }

  test("O4: recon-all branch routing on T1w/T2w availability") {
    val s = spark
    import s.implicits._
    val paths = Seq(
      "bids/sub-001/anat/sub-001_T1w.nii.gz",
      "bids/sub-001/anat/sub-001_T2w.nii.gz",
      "bids/sub-002/anat/sub-002_T1w.nii.gz",
      "bids/sub-003/func/sub-003_task-MID_bold.nii.gz",
    ).toDF("path")
    val cat = BidsCatalog.fromPaths(paths)
    // preprocess_parallel.sh:41-46: T1+T2 → -T2pial flags, T1-only → plain
    val routed = cat
      .groupBy("subject")
      .agg(
        max(when(col("suffix") === "T1w", 1).otherwise(0)).as("hasT1"),
        max(when(col("suffix") === "T2w", 1).otherwise(0)).as("hasT2"),
      )
      .withColumn("recon_mode",
        when(col("hasT1") === 1 && col("hasT2") === 1, "t1_t2pial")
          .when(col("hasT1") === 1, "t1_only")
          .otherwise("skip"))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(routed("001") === "t1_t2pial")
    assert(routed("002") === "t1_only")
    assert(routed("003") === "skip")
  }

  test("O3: external stage pipes rows through a real subprocess, multi-partition") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val df = Seq((1L, "hello world"), (2L, "spark rdd pipe"), (3L, "MiXeD case"))
      .toDF("doc_id", "text").repartition(3) // one subprocess per partition
    val out = graft.util.ExternalStage.pipeTsv(df, Seq("tr", "a-z", "A-Z"),
        StructType(Seq(StructField("doc_id", LongType), StructField("up", StringType))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "HELLO WORLD", 2L -> "SPARK RDD PIPE", 3L -> "MIXED CASE"))
  }

  test("O3: enforceOneToOne fails loudly when the tool drops lines, passes 1:1 tools") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val df = Seq((1L, "keep me"), (2L, "drop me"), (3L, "keep too"))
      .toDF("doc_id", "text").repartition(2)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // a 1:1 tool passes under enforcement
    val ok = graft.util.ExternalStage
      .pipeTsv(df, Seq("cat"), schema, enforceOneToOne = true)
      .collect()
    assert(ok.length == 3)
    // a FILTERING tool violates the contract: enforcement must fail the
    // stage instead of silently losing row 2
    val filtered = graft.util.ExternalStage
      .pipeTsv(df, Seq("grep", "keep"), schema, enforceOneToOne = true)
    val e = intercept[org.apache.spark.SparkException](filtered.collect())
    assert(e.getMessage.contains("1:1 contract") ||
      Option(e.getCause).exists(_.getMessage.contains("1:1 contract")),
      e.getMessage.take(400))
    // the same tool is fine when the caller opts out (default)
    assert(graft.util.ExternalStage
      .pipeTsv(df, Seq("grep", "keep"), schema).collect().length == 2)
  }

  test("O3: external stage rejects framing bytes loudly instead of corrupting rows") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    for (payload <- Seq("has\ttab", "has\nnewline", "has\rcarriage")) {
      val bad = Seq((7L, payload)).toDF("doc_id", "text")
      val ex = intercept[Exception] {
        graft.util.ExternalStage.pipeTsv(bad, Seq("cat"),
          StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
          .collect()
      }
      assert(messages(ex).exists(m => m != null && m.contains("framing byte")), payload)
    }
  }

  test("O3: one subprocess per partition (cat -n numbering restarts at each partition)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val df = (1L to 12L).map(i => (i, s"doc$i")).toDF("doc_id", "text").repartition(3)
    // cat -n prepends "<lineno>\t" per INVOCATION: if the stage truly runs
    // one subprocess per partition, each partition's numbering restarts at 1
    val out = graft.util.ExternalStage.pipeTsv(df, Seq("cat", "-n"),
        StructType(Seq(StructField("lineno", LongType),
          StructField("doc_id", LongType), StructField("text", StringType))))
      .collect()
    assert(out.length == 12 && out.forall(r => r.getString(2) == s"doc${r.getLong(1)}"))
    val linenos = out.map(_.getLong(0))
    assert(linenos.count(_ == 1L) == 3, s"expected 3 restarts, got ${linenos.toSeq}")
    assert(linenos.max == 4L) // 12 rows over 3 round-robin partitions
  }

  test("O3: external stage rejects null fields (concat_ws would silently shift TSV columns)") {
    import org.apache.spark.sql.types._
    val s = spark
    import s.implicits._
    val bad = Seq((7L, Option.empty[String]), (8L, Some("fine"))).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      graft.util.ExternalStage.pipeTsv(bad, Seq("cat"),
        StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("null in column")))
  }
}

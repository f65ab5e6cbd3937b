package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.CurationOps
import graft.util.BucketedStores

/** Standing-store compaction (BucketedStores.compact): appends accumulate
  * one file set per batch; compaction must shrink the file count while
  * keeping probe results IDENTICAL, preserving the bucket layout (probe
  * plan still reads `Bucketed: true`), and leaving the store appendable.
  */
class CompactionSpec extends SparkSpec {

  private val SEG = 6
  private def seg(tag: String) = (0 until SEG).map(i => s"${tag}$i").mkString(" ")
  private def doc(id: Long, segs: String*): (Long, String) = (id, segs.mkString(" "))
  private def df(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("compaction shrinks files, preserves probe results and appendability") {
    val name = "graft_test_compact"
    Seq("segs", "docs", "meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    val corpus = df(Seq(
      doc(1L, seg("x"), seg("u1")), doc(2L, seg("x"), seg("u2")),
      doc(3L, seg("y"), seg("u3")), doc(4L, seg("y"))))
    CurationOps.buildSegFreqStore(spark, corpus, name, SEG, minDocs = 3,
      location = s"/tmp/$name", buckets = 4)
    // several appends → file count grows with batch count
    for (b <- 0 until 3)
      CurationOps.appendToSegFreqStore(spark,
        df(Seq(doc(100L + b, seg("x"), seg(s"a$b")))), name)
    val probe = df(Seq(doc(900L, seg("x"), seg("y"), seg("z"))))
    val before = CurationOps.probeSegFreqStrip(spark, probe, name)
      .collect().map(_.toString).sorted.toSeq
    val filesBefore = BucketedStores.dataFileCount(spark, s"${name}_segs")

    val (fb, fa) = BucketedStores.compact(spark, s"${name}_segs")
    assert(fb == filesBefore && fa < fb,
      s"expected fewer files after compaction: $fb -> $fa")
    assert(fa <= 4, s"one file set per bucket expected, got $fa")

    // identical probe verdicts (x is over min_docs via appends; y under)
    val after = CurationOps.probeSegFreqStrip(spark, probe, name)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
    // bucket layout survived: the store side still scans bucketed
    val plan = CurationOps.probeSegFreqStrip(spark, probe, name)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan.take(600))
    // and the store still accepts appends that change future verdicts
    CurationOps.appendToSegFreqStore(spark,
      df(Seq(doc(200L, seg("y")), doc(201L, seg("y")))), name)
    val afterAppend = CurationOps.probeSegFreqStrip(spark, probe, name)
      .collect().head
    assert(!afterAppend.getString(1).contains("y0"),
      "y crosses min_docs after the post-compaction appends")
  }

  test("compactDistinct folds replayed fact rows in the eval-gram store") {
    import graft.dedup.DedupOps
    val name = "graft_test_compact_eg"
    Seq("grams", "docs", "meta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    DedupOps.buildEvalGramStore(spark,
      df(Seq(doc(1L, seg("e")), doc(2L, seg("f")))), name, shingleK = 3,
      location = s"/tmp/$name", buckets = 4)
    // crash-window simulation: the SAME benchmark appended twice unguarded
    // → duplicate (h, doc_id) fact rows the probe's distinct hides but the
    // store pays for on every scan
    val bench = df(Seq(doc(10L, seg("g"))))
    DedupOps.appendToEvalGramStore(spark, bench, name, idempotent = false)
    DedupOps.appendToEvalGramStore(spark, bench, name, idempotent = false)
    val probe = df(Seq(doc(900L, seg("g"), seg("zz")), doc(901L, seg("qq"))))
    val before = DedupOps.probeContamination(spark, probe, name)
      .collect().map(_.toString).sorted.toSeq
    val rowsBefore = spark.table(s"${name}_grams").count()
    val (fb, fa) = BucketedStores.compactDistinct(spark, s"${name}_grams")
    assert(fa < fb && fa <= 4, s"$fb -> $fa")
    spark.catalog.refreshTable(s"${name}_grams")
    assert(spark.table(s"${name}_grams").count() < rowsBefore,
      "duplicate fact rows must fold away")
    val after = DedupOps.probeContamination(spark, probe, name)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before && before.nonEmpty)
    // still appendable: a new benchmark changes future verdicts
    DedupOps.appendToEvalGramStore(spark, df(Seq(doc(11L, seg("qq")))), name)
    assert(DedupOps.probeContamination(spark, probe, name).count() > before.size)
  }

  test("compaction is store-generic: the perceptual band index") {
    import graft.multimodal.PhashOps
    val s = spark
    import s.implicits._
    val name = "graft_test_compact_ph"
    Seq("pbands", "pdocs", "pmeta").foreach(t => s.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    def media(ids: Seq[Long]): DataFrame = ids.map { i =>
      val r = new scala.util.Random(i * 104729)
      (i, Array.fill(3072)(r.nextInt(256).toByte))
    }.toDF("doc_id", "payload")
    PhashOps.buildPhashIndex(s, media(0L until 40L), name, s"/tmp/$name", buckets = 4)
    for (b <- 0 until 3)
      PhashOps.appendToPhashIndex(s, media(100L + b * 10 until 110L + b * 10), name)
    // probe payload = byte-identical copy of doc 5 → must match pre/post
    val probe = media(Seq(5L)).withColumn("doc_id", lit(900L))
    val before = PhashOps.probePhashIndex(s, probe, name).collect().map(_.toString).toSeq
    val (fb, fa) = BucketedStores.compact(s, s"${name}_pbands")
    assert(fa < fb && fa <= 4, s"$fb -> $fa")
    val after = PhashOps.probePhashIndex(s, probe, name).collect().map(_.toString).toSeq
    assert(after == before && before.head.contains("5"))
  }

  test("recoverSwap finish-rename: contents restored AND the dropped table's files cleaned up") {
    val s = spark
    import s.implicits._
    val tbl = "graft_test_rswap"
    s.sql(s"DROP TABLE IF EXISTS $tbl"); s.sql(s"DROP TABLE IF EXISTS ${tbl}__compact")
    val root = java.nio.file.Files.createTempDirectory("graft-rswap").toString
    (1L to 5L).toDF("v").write.option("path", s"$root/orig").saveAsTable(tbl)
    // Simulate swapContents crashing between DROP and RENAME: sibling
    // written (incl. the oldloc marker swapContents records before the
    // DROP), original catalog entry dropped, original FILES still on disk.
    (1L to 7L).toDF("v").write.option("path", s"$root/sib").saveAsTable(s"${tbl}__compact")
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      s.sessionState.newHadoopConf())
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$root/sib/_graft_swap_oldloc"), true)
    out.write(s"file:$root/orig".getBytes("UTF-8")); out.close()
    s.sql(s"DROP TABLE $tbl") // external: files at $root/orig now orphaned
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/orig")))

    BucketedStores.recoverSwap(s, tbl)
    s.catalog.refreshTable(tbl)
    assert(s.table(tbl).count() === 7L, "the sibling holds the complete contents")
    assert(!s.catalog.tableExists(s"${tbl}__compact"))
    // the marker names the dropped files; the repair must delete BOTH
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/orig")),
      "a repaired crash must not permanently orphan the replaced files")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/sib/_graft_swap_oldloc")),
      "the marker itself is cleaned up after use")
    // and a normal swap on the recovered table round-trips (happy path
    // writes + consumes its own marker)
    BucketedStores.swapContents(s, tbl, (1L to 3L).toDF("v").localCheckpoint())
    s.catalog.refreshTable(tbl)
    assert(s.table(tbl).count() === 3L)
    s.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("KMV batch loops repair a crash-interrupted swap instead of recreating the store") {
    val s = spark
    import s.implicits._
    val name = "graft_test_kmvrec"
    Seq(s"${name}_kmv", s"${name}_kmv__compact").foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"/tmp/$name"))
    val day = 86400000000000L // ns
    val out = java.nio.file.Files.createTempDirectory("graft-kmvrec").toString + "/v"
    def batch(rows: Seq[(Long, Long)]) = rows.toDF("user_id", "ts")
    graft.streaming.StreamOps.activeUsersKmvBatch(
      batch((1L to 10L).map(u => (u, 0L))), name, s"/tmp/$name", out)
    graft.streaming.StreamOps.activeUsersKmvBatch(
      batch((1L to 10L).map(u => (u, day))), name, s"/tmp/$name", out)
    // Simulate the swap crash window: the merged sibling is committed
    // under __compact but the RENAME never ran — the store name is gone.
    val meta = s.sessionState.catalog.getTableMetadata(
      s.sessionState.sqlParser.parseTableIdentifier(s"${name}_kmv"))
    s.table(s"${name}_kmv").write
      .option("path", meta.location.toString + "_sib")
      .saveAsTable(s"${name}_kmv__compact")
    s.sql(s"DROP TABLE ${name}_kmv")
    // Without the entry-point recoverSwap this batch would silently
    // recreate the store from its own 5 users and lose both prior days.
    graft.streaming.StreamOps.activeUsersKmvBatch(
      batch((11L to 15L).map(u => (u, 2 * day))), name, s"/tmp/$name", out)
    val got = s.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(0L -> 10L, 1L -> 10L, 2L -> 5L),
      s"prior days must survive the repaired swap: $got")
    Seq(s"${name}_kmv", s"${name}_kmv__compact").foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
  }
}

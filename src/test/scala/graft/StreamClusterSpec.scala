package graft

import org.apache.spark.sql.functions._
import graft.dedup.DedupOps
import graft.streaming.StreamOps

/** Streaming incremental cluster maintenance (r11 verdict item 4): the
  * q107 probe → delta-CC → broadcast-remap → append loop as a foreachBatch
  * sink, pinned over 3 micro-batches against (a) the explicit sequential
  * batch loop and (b) ONE dedupClusters re-run over the union corpus —
  * including a batch whose bridge document MERGES two standing clusters
  * formed before it arrived.
  */
class StreamClusterSpec extends SparkSpec {

  // token-disjoint base clusters A {10, 11} and B {20, 21}, singleton 30;
  // the batch-2 bridge concatenates A's and B's texts, so its 3-gram
  // Jaccard against either side is 8/18 ≈ 0.44 ≥ the 0.35 threshold
  private val tokA = (1 to 10).map(i => s"a$i").mkString(" ")
  private val tokB = (1 to 10).map(i => s"b$i").mkString(" ")
  private val tokC = (1 to 10).map(i => s"c$i").mkString(" ")
  private val tokD = (1 to 10).map(i => s"d$i").mkString(" ")
  private val tokE = (1 to 10).map(i => s"e$i").mkString(" ")

  private val corpusRows = Seq(
    10L -> tokA, 11L -> tokA, 20L -> tokB, 21L -> tokB, 30L -> tokC)
  private val batches: Seq[Seq[(Long, String)]] = Seq(
    Seq(100L -> tokA, 101L -> tokD),          // extends A; new singleton D
    Seq(200L -> (tokA + " " + tokB)),          // bridge: MERGES A and B
    Seq(300L -> tokD, 301L -> tokE),           // cross-batch dup of 101; new E
  )

  private val Thresh = 0.35

  private def freshIndex(name: String): Unit = {
    val s = spark
    Seq("bands", "docs", "texts", "meta")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    import s.implicits._
    // rowsPerBand = 1: 16 single-minhash bands — candidate recall at the
    // bridge's J ≈ 0.44 is 1-(1-J)^16 ≈ 0.9999 per side (8 bands missed
    // one side on this deterministic fixture), so the pin tests CC, not LSH luck
    DedupOps.buildBandIndex(s, corpusRows.toDF("doc_id", "text"), name,
      shingleK = 3, numHashes = 16, rowsPerBand = 1,
      location = s"/tmp/$name", buckets = 4)
  }

  private def initialLabels: org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    val corpus = corpusRows.toDF("doc_id", "text")
    DedupOps.dedupClusters(corpus,
        DedupOps.minhashDupPairs(corpus, 3, 16, 1, Thresh))
      .select("doc_id", "cluster")
  }

  test("streaming cluster maintenance ≡ sequential loop ≡ union re-run, with a cross-batch merge") {
    val s = spark
    import s.implicits._

    // ---- sequential reference loop -------------------------------------
    freshIndex("graft_test_sclu_ref")
    var labels = initialLabels.localCheckpoint()
    val afterBatch = batches.map { rows =>
      val b = rows.toDF("doc_id", "text")
      val upd = DedupOps
        .incrementalClusters(s, labels, b, "graft_test_sclu_ref", Thresh)
        .select("doc_id", "cluster").localCheckpoint()
      DedupOps.appendToBandIndex(s, b, "graft_test_sclu_ref")
      labels = upd
      upd.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val ref = afterBatch.last

    // the fixture really exercises a cross-batch merge: clusters A and B
    // are distinct after batch 1 and merged (to A's min id) after batch 2
    assert(afterBatch(0)(10L) !== afterBatch(0)(20L), "A and B merged too early")
    assert(afterBatch(1)(20L) === afterBatch(1)(10L), "bridge did not merge A and B")
    assert(ref(20L) === 10L)
    assert(ref(100L) === 10L, "batch-1 doc should have joined cluster A")
    assert(ref(300L) === 101L, "batch-3 dup of an admitted doc must join its cluster")

    // ---- union re-run (the ground truth q107's oracle replays) ---------
    val union = (corpusRows ++ batches.flatten).toDF("doc_id", "text")
    val full = DedupOps
      .dedupClusters(union, DedupOps.minhashDupPairs(union, 3, 16, 1, Thresh))
      .select("doc_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ref === full)

    // ---- streaming twin ------------------------------------------------
    freshIndex("graft_test_sclu_str")
    val dir = java.nio.file.Files.createTempDirectory("graft-sclu").toString
    val labelsPath = s"$dir/labels"
    val outPath = s"$dir/verdicts"
    initialLabels.write.parquet(labelsPath)
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamOps.streamingIncrementalClusters(
      ms.toDF().toDF("doc_id", "text"), "graft_test_sclu_str", Thresh,
      labelsPath, outPath).start()
    try {
      batches.foreach { rows => ms.addData(rows); q.processAllAvailable() }
      // at-least-once REPLAY: re-deliver batch 3 verbatim — the standing
      // stores must not change (its docs are already labeled, so the
      // replay guard reduces the batch to empty and the idempotent index
      // append inserts nothing)
      val before = s.read.parquet(labelsPath)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val bandsBefore = s.table("graft_test_sclu_str_docs").count()
      ms.addData(batches.last)
      q.processAllAvailable()
      val after = s.read.parquet(labelsPath)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(after === before, "replayed batch changed the label store")
      assert(s.table("graft_test_sclu_str_docs").count() === bandsBefore,
        "replayed batch double-appended to the band index")
    } finally q.stop()

    val streamed = s.read.parquet(labelsPath)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === ref)
    // per-batch verdict sink carries exactly the arriving docs' labels
    val outIds = s.read.parquet(outPath).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(outIds === batches.flatten.map(_._1).sorted)
  }
}

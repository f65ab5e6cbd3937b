package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.text.CurationOps
import graft.streaming.StreamOps

/** The standing segment-frequency store (q126 + streamingBoilerplateAdmission):
  * admission-time boilerplate stripping whose verdict for a batch equals the
  * q123 batch run over everything-admitted-so-far ∪ batch, RESTRICTED to the
  * batch (already-admitted docs are never re-stripped). Pins:
  *
  *  - probe ≡ union-restricted batch run, including a segment that crosses
  *    min_docs ONLY with the batch's own contribution, one that crosses
  *    entirely WITHIN the batch, and one that stays under;
  *  - append ≡ rebuild (a store maintained by appends answers like one
  *    built from scratch on the union);
  *  - idempotent replay inserts nothing and flips no verdict;
  *  - streaming foreachBatch ≡ the sequential probe→append loop, with a
  *    planted segment whose third occurrence arrives in batch 3.
  */
class StandingBoilerplateSpec extends SparkSpec {

  private val SEG = 6
  private val MIN = 3

  private def seg(tag: String) = (0 until SEG).map(i => s"${tag}$i").mkString(" ")
  private def doc(id: Long, segs: String*): (Long, String) = (id, segs.mkString(" "))

  /** corpus: X in 2 docs (under), Y in 3 docs (already boilerplate). */
  private def corpusRows = Seq(
    doc(1L, seg("x"), seg("u1")),
    doc(2L, seg("x"), seg("y")),
    doc(3L, seg("y"), seg("u3")),
    doc(4L, seg("y"), seg("u4")),
  )

  /** increment: X crosses to 3 WITH the batch; Y already over; Z crosses
    * entirely within the batch (3 fresh docs); doc 14 untouched. */
  private def incRows = Seq(
    doc(11L, seg("x"), seg("u11")),
    doc(12L, seg("y"), seg("z")),
    doc(13L, seg("z"), seg("u13")),
    doc(15L, seg("z")),
    doc(14L, seg("u14")),
  )

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def fresh(name: String, corpus: DataFrame): Unit = {
    Seq("segs", "docs", "meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    CurationOps.buildSegFreqStore(spark, corpus, name, SEG, MIN,
      location = s"/tmp/$name", buckets = 4)
  }

  private def canon(rows: Array[Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("probe equals the union batch run restricted to the batch") {
    fresh("graft_test_segfreq", df(corpusRows))
    val got = CurationOps.probeSegFreqStrip(spark, df(incRows), "graft_test_segfreq")
    val want = CurationOps
      .boilerplateStrip(df(corpusRows ++ incRows), SEG, MIN)
      .filter(col("doc_id") >= 11L)
    assert(canon(got.collect()) == canon(want.collect()))
    val byId = got.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!byId(11L).contains("x0"), "X must cross min_docs with the batch's own count")
    assert(!byId(12L).contains("y0") && !byId(12L).contains("z0"))
    assert(!byId(13L).contains("z0"), "Z must cross entirely within the batch")
    assert(byId(14L) == seg("u14"), "untouched doc passes through")
  }

  test("append equals rebuild; idempotent replay inserts nothing") {
    val inc2 = Seq(doc(21L, seg("x"), seg("u21")), doc(22L, seg("u22")))
    // maintained store: corpus, then append the first increment
    fresh("graft_test_segfreq_a", df(corpusRows))
    CurationOps.appendToSegFreqStore(spark, df(incRows), "graft_test_segfreq_a")
    // rebuilt store: union from scratch
    fresh("graft_test_segfreq_b", df(corpusRows ++ incRows))
    val a = CurationOps.probeSegFreqStrip(spark, df(inc2), "graft_test_segfreq_a")
    val b = CurationOps.probeSegFreqStrip(spark, df(inc2), "graft_test_segfreq_b")
    assert(canon(a.collect()) == canon(b.collect()))
    // doc 21's X: 2 (corpus) + 1 (first increment) = 3 standing → stripped
    val byId = a.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!byId(21L).contains("x0"))
    // replay: idempotent re-append of the already-admitted increment
    val before = spark.table("graft_test_segfreq_a_segs").count()
    CurationOps.appendToSegFreqStore(spark, df(incRows), "graft_test_segfreq_a",
      idempotent = true)
    assert(spark.table("graft_test_segfreq_a_segs").count() == before)
    assert(canon(CurationOps.probeSegFreqStrip(spark, df(inc2), "graft_test_segfreq_a")
      .collect()) == canon(a.collect()))
  }

  test("streaming admission equals the sequential probe-append loop") {
    val s = spark
    import s.implicits._
    // W's three occurrences arrive in three different batches: batch 3's
    // doc is stripped ONLY if both appends ran between batches
    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq(doc(31L, seg("w"), seg("u31")), doc(32L, seg("u32"))),
      Seq(doc(33L, seg("w"), seg("u33"))),
      Seq(doc(34L, seg("w"), seg("u34")), doc(35L, seg("u35"))),
    )
    // sequential reference loop
    fresh("graft_test_segfreq_sr", df(corpusRows))
    val ref = batches.flatMap { rows =>
      val b = df(rows)
      val v = CurationOps.probeSegFreqStrip(s, b, "graft_test_segfreq_sr")
        .localCheckpoint()
      CurationOps.appendToSegFreqStore(s, b, "graft_test_segfreq_sr")
      v.collect().map(_.toString)
    }.sorted
    // streaming twin
    fresh("graft_test_segfreq_st", df(corpusRows))
    val out = java.nio.file.Files.createTempDirectory("graft-boil").toString + "/v"
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamOps.streamingBoilerplateAdmission(
      ms.toDF().toDF("doc_id", "text"), "graft_test_segfreq_st", out).start()
    try {
      batches.foreach { rows => ms.addData(rows); q.processAllAvailable() }
    } finally q.stop()
    val got = s.read.parquet(out + "/batch=*").collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == ref)
    val byId = s.read.parquet(out + "/batch=*").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(31L).contains("w0") && byId(33L).contains("w0"),
      "first two occurrences are under min_docs at their admission time")
    assert(!byId(34L).contains("w0"),
      "third occurrence crosses min_docs only via the standing appends")
  }
}

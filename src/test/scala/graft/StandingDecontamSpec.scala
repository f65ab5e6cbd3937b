package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.dedup.DedupOps
import graft.streaming.StreamOps

/** The standing eval-gram store (q138 + streamingContaminationProbe):
  * benchmark admission + training-side contamination probes. Pins:
  *
  *  - probe ≡ contaminationFlags against the admitted benchmarks;
  *  - append ≡ rebuild (a store maintained by benchmark admission
  *    answers like one built from the union benchmark set);
  *  - idempotent replay inserts nothing and flips no verdict;
  *  - the staging-tag seal: the guard rejects a store whose meta was
  *    never retagged (the crash-mid-admission window);
  *  - streaming probe ≡ per-moment batch probe, including a doc whose
  *    only contamination is against a benchmark admitted between
  *    batches.
  */
class StandingDecontamSpec extends SparkSpec {

  private val K = 3

  // eval benchmarks: two waves
  private val evalA = Seq((970L, "alpha beta gamma delta"))
  private val evalB = Seq((971L, "mike november oscar papa"))
  // train docs: 1 hits evalA, 2 hits evalB, 3 clean, 4 hits both
  private val train = Seq(
    (1L, "zz alpha beta gamma qq"),
    (2L, "zz mike november oscar qq"),
    (3L, "totally clean text here now"),
    (4L, "alpha beta gamma mike november oscar"),
  )

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def fresh(name: String, evalDocs: Seq[(Long, String)]): Unit = {
    Seq("grams", "docs", "meta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    DedupOps.buildEvalGramStore(spark, df(evalDocs), name, K,
      location = s"/tmp/$name", buckets = 4, datasetTag = "fix")
  }

  private def canon(rows: Array[Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("probe equals contaminationFlags against the admitted benchmarks") {
    fresh("graft_test_evalg", evalA ++ evalB)
    val got = DedupOps.probeContamination(spark, df(train), "graft_test_evalg")
    val want = DedupOps.contaminationFlags(df(train), df(evalA ++ evalB), K)
    assert(canon(got.collect()) == canon(want.collect()))
    val byId = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == 1L) // shares exactly the (alpha,beta,gamma) gram
    assert(!byId.contains(3L), "clean doc emits no row")
    assert(byId(4L) == 2L) // one gram from each benchmark wave
  }

  test("append equals rebuild; idempotent replay inserts nothing; staging tag rejected") {
    // maintained: build from wave A, admit wave B
    fresh("graft_test_evalg_a", evalA)
    DedupOps.appendToEvalGramStore(spark, df(evalB), "graft_test_evalg_a")
    // rebuilt: union from scratch
    fresh("graft_test_evalg_b", evalA ++ evalB)
    val a = DedupOps.probeContamination(spark, df(train), "graft_test_evalg_a")
    val b = DedupOps.probeContamination(spark, df(train), "graft_test_evalg_b")
    assert(canon(a.collect()) == canon(b.collect()))
    assert(a.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    // idempotent replay of the already-admitted wave
    val before = spark.table("graft_test_evalg_a_grams").count()
    DedupOps.appendToEvalGramStore(spark, df(evalB), "graft_test_evalg_a",
      idempotent = true)
    assert(spark.table("graft_test_evalg_a_grams").count() == before)
    // staging-tag seal: a store never retagged does not match its dataset
    assert(DedupOps.evalGramStoreMatches(spark, "graft_test_evalg_a", "fix"))
    DedupOps.retagEvalGramStore(spark, "graft_test_evalg_a",
      "/tmp/graft_test_evalg_a", "fix:building")
    assert(!DedupOps.evalGramStoreMatches(spark, "graft_test_evalg_a", "fix"))
  }

  test("streaming probe equals per-moment batch probes across an admission") {
    val s = spark
    import s.implicits._
    fresh("graft_test_evalg_st", evalA)
    val out = java.nio.file.Files.createTempDirectory("graft-dec").toString + "/v"
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamOps.streamingContaminationProbe(
      ms.toDF().toDF("doc_id", "text"), "graft_test_evalg_st", out).start()
    try {
      // batch 1: only evalA admitted — doc 2 is clean at this moment
      ms.addData(Seq(train(0), train(1)))
      q.processAllAvailable()
      // benchmark wave B admitted between batches
      DedupOps.appendToEvalGramStore(s, df(evalB), "graft_test_evalg_st")
      // batch 2: the same text as doc 2 now hits wave B
      ms.addData(Seq((22L, train(1)._2), train(2)))
      q.processAllAvailable()
    } finally q.stop()
    val got = s.read.parquet(out).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L, "batch-1 hit against the standing wave A")
    assert(!got.contains(2L), "doc 2 was clean when it arrived")
    assert(got(22L) == 1L, "same text after the admission is contaminated")
    assert(!got.contains(3L))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.text.CurationOps
import graft.streaming.StreamOps

/** The standing DSIR model (q143 + streamingDsirAdmission): additive
  * bucket-count state, score-then-admit arrivals. Pins:
  *
  *  - append ≡ rebuild (delta-maintained counts answer like a one-shot
  *    fit on the union corpus);
  *  - idempotent replay adds nothing (critical: counts are additive —
  *    an unguarded replay would BIAS the model);
  *  - novel-vocabulary arrivals score the smoothed unseen log-ratio,
  *    not zero;
  *  - streaming ≡ the sequential probe→append loop, including a batch
  *    whose score changes BECAUSE an earlier batch was admitted.
  */
class StandingDsirSpec extends SparkSpec {

  private val B = 64

  private val corpusA = Seq(
    (1L, "alpha beta gamma alpha beta", "en"),
    (2L, "beta gamma alpha beta gamma", "en"),
    (3L, "rot grun blau rot grun", "de"),
  )
  private val corpusB = Seq(
    (4L, "alpha beta alpha beta alpha", "en"),
    (5L, "grun blau rot grun blau", "de"),
  )
  private val arrivals = Seq(
    (11L, "alpha beta gamma alpha"),
    (12L, "rot grun blau rot"),
    (13L, "nova vocab terra nova"),
  )

  private def df3(rows: Seq[(Long, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  private def df2(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def fresh(name: String, rows: Seq[(Long, String, String)]): Unit = {
    Seq("counts", "docs", "meta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    CurationOps.buildDsirStore(spark, df3(rows), col("lang") === "en", name, B,
      location = s"/tmp/$name", datasetTag = "fix")
  }

  private def canon(rows: Array[Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("append equals rebuild; idempotent replay adds nothing") {
    fresh("graft_test_dsir_a", corpusA)
    CurationOps.appendToDsirStore(spark, df3(corpusB), col("lang") === "en",
      "graft_test_dsir_a")
    fresh("graft_test_dsir_b", corpusA ++ corpusB)
    val a = CurationOps.probeDsirScore(spark, df2(arrivals), "graft_test_dsir_a")
    val b = CurationOps.probeDsirScore(spark, df2(arrivals), "graft_test_dsir_b")
    assert(canon(a.collect()) == canon(b.collect()))
    // target-vocab arrival outscores raw-vocab arrival
    val byId = a.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId(11L) > byId(12L))
    // replay: re-admitting already-admitted docs must not shift counts
    val sumBefore = spark.table("graft_test_dsir_a_counts")
      .agg(sum("cr"), sum("ct")).head()
    CurationOps.appendToDsirStore(spark, df3(corpusB), col("lang") === "en",
      "graft_test_dsir_a", idempotent = true)
    spark.catalog.refreshTable("graft_test_dsir_a_counts")
    assert(spark.table("graft_test_dsir_a_counts")
      .agg(sum("cr"), sum("ct")).head() == sumBefore)
    assert(canon(CurationOps.probeDsirScore(spark, df2(arrivals),
      "graft_test_dsir_a").collect()) == canon(a.collect()))
  }

  test("novel vocabulary scores the smoothed unseen log-ratio, not zero") {
    fresh("graft_test_dsir_u", corpusA)
    val out = CurationOps.probeDsirScore(spark, df2(arrivals), "graft_test_dsir_u")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val (nBi, logw) = out(13L)
    assert(nBi == 3L)
    // model: ctt target occurrences, crt total; unseen lr = ln((crt+B)/(ctt+B))
    val cnts = spark.table("graft_test_dsir_u_counts")
      .agg(sum("ct"), sum("cr")).head()
    val (ctt, crt) = (cnts.getLong(0), cnts.getLong(1))
    val un = BigDecimal((math.log(1.0 / (ctt + B)) - math.log(1.0 / (crt + B))) * 1e9)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val want = BigDecimal(3L * un / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(logw == want, s"$logw vs $want")
    assert(logw != 0.0)
  }

  test("streaming score-then-admit equals the sequential loop across model drift") {
    val s = spark
    import s.implicits._
    // batch 1 admits heavy target use of "alpha beta"; batch 2's arrival
    // reuses that vocabulary, so its score depends on batch 1's admission
    val batches: Seq[Seq[(Long, String, String)]] = Seq(
      Seq((21L, "alpha beta alpha beta alpha", "en"), (22L, "rot grun rot", "de")),
      Seq((23L, "alpha beta gamma", "zz"), (24L, "rot grun blau", "de")),
    )
    // sequential reference
    fresh("graft_test_dsir_sr", corpusA)
    val ref = batches.flatMap { rows =>
      val b = df3(rows)
      val v = CurationOps.probeDsirScore(s, b, "graft_test_dsir_sr")
        .localCheckpoint()
      CurationOps.appendToDsirStore(s, b, col("lang") === "en",
        "graft_test_dsir_sr", idempotent = true)
      v.collect().map(_.toString)
    }.sorted
    // streaming twin
    fresh("graft_test_dsir_st", corpusA)
    val out = java.nio.file.Files.createTempDirectory("graft-dsir").toString + "/v"
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val q = StreamOps.streamingDsirAdmission(
      ms.toDF().toDF("doc_id", "text", "lang"), col("lang") === "en",
      "graft_test_dsir_st", out).start()
    try {
      batches.foreach { rows => ms.addData(rows); q.processAllAvailable() }
    } finally q.stop()
    val got = s.read.parquet(out + "/batch=*").collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == ref)
  }

  test("delta fold: probe invariant, replayed absorbed batch stays a no-op, store stays live") {
    fresh("graft_test_dsir_cp", corpusA)
    CurationOps.appendToDsirStore(spark, df3(corpusB), col("lang") === "en",
      "graft_test_dsir_cp")
    val before = canon(CurationOps.probeDsirScore(spark, df2(arrivals),
      "graft_test_dsir_cp").collect())
    val (rb, ra) = CurationOps.compactDsirStore(spark, "graft_test_dsir_cp")
    assert(ra <= rb, s"fold must not grow the store: $rb -> $ra")
    assert(canon(CurationOps.probeDsirScore(spark, df2(arrivals),
      "graft_test_dsir_cp").collect()) == before, "fold must be probe-invariant")
    // a PRE-compaction batch replayed unguarded: its fingerprint is
    // tombstoned, so the re-appended delta must not double-count
    CurationOps.appendToDsirStore(spark, df3(corpusB), col("lang") === "en",
      "graft_test_dsir_cp", idempotent = false)
    assert(canon(CurationOps.probeDsirScore(spark, df2(arrivals),
      "graft_test_dsir_cp").collect()) == before,
      "replay of an absorbed batch must stay a no-op after the fold")
    // NEW admissions still count, and a second fold is also invariant
    val corpusC = Seq((31L, "nova vocab nova vocab nova", "en"))
    CurationOps.appendToDsirStore(spark, df3(corpusC), col("lang") === "en",
      "graft_test_dsir_cp")
    val mid = canon(CurationOps.probeDsirScore(spark, df2(arrivals),
      "graft_test_dsir_cp").collect())
    assert(mid != before, "a genuinely new admission must still shift the model")
    CurationOps.compactDsirStore(spark, "graft_test_dsir_cp")
    assert(canon(CurationOps.probeDsirScore(spark, df2(arrivals),
      "graft_test_dsir_cp").collect()) == mid, "second fold must be invariant too")
  }

  test("fingerprints see content and predicate: same-id re-admissions both count") {
    fresh("graft_test_dsir_fp", corpusA)
    // same doc-id set, different TEXT: a real second admission, not a replay
    CurationOps.appendToDsirStore(spark, df3(Seq((50L, "alpha beta alpha", "en"))),
      col("lang") === "en", "graft_test_dsir_fp", idempotent = false)
    val p1 = canon(CurationOps.probeDsirScore(spark, df2(arrivals),
      "graft_test_dsir_fp").collect())
    CurationOps.appendToDsirStore(spark, df3(Seq((50L, "gamma rot gamma", "en"))),
      col("lang") === "en", "graft_test_dsir_fp", idempotent = false)
    val p2 = canon(CurationOps.probeDsirScore(spark, df2(arrivals),
      "graft_test_dsir_fp").collect())
    assert(p1 != p2,
      "same ids + different content must fingerprint differently and count")
    // same rows, flipped target predicate: also a distinct admission
    CurationOps.appendToDsirStore(spark, df3(Seq((50L, "gamma rot gamma", "en"))),
      lit(false), "graft_test_dsir_fp", idempotent = false)
    val p3 = canon(CurationOps.probeDsirScore(spark, df2(arrivals),
      "graft_test_dsir_fp").collect())
    assert(p2 != p3,
      "same rows + different predicate must fingerprint differently and count")
  }

  test("a replayed identical delta is deduped by batch fingerprint (crash-window safety)") {
    // simulate the crash-between-writes replay: the SAME batch appended
    // twice with NO doc guard - the probe must answer as if once
    fresh("graft_test_dsir_cw", corpusA)
    val before = canon(CurationOps.probeDsirScore(spark, df2(arrivals),
      "graft_test_dsir_cw").collect())
    CurationOps.appendToDsirStore(spark, df3(corpusB), col("lang") === "en",
      "graft_test_dsir_cw", idempotent = false)
    val once = canon(CurationOps.probeDsirScore(spark, df2(arrivals),
      "graft_test_dsir_cw").collect())
    CurationOps.appendToDsirStore(spark, df3(corpusB), col("lang") === "en",
      "graft_test_dsir_cw", idempotent = false)
    val twice = canon(CurationOps.probeDsirScore(spark, df2(arrivals),
      "graft_test_dsir_cw").collect())
    assert(once == twice, "identical replayed delta must not bias the model")
    assert(before != once, "the first admission must actually change the model")
  }
}

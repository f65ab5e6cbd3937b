package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.text.BigramStore
import graft.streaming.StreamOps

/** The standing bigram LM (q198 + streamingBigramAdmission): additive
  * bigram/unigram count deltas, capped KN serve. Pins:
  *
  *  - append ≡ rebuild (delta-maintained counts score like a one-shot
  *    fit on the union corpus);
  *  - idempotent replay adds nothing (counts are additive — an unguarded
  *    replay would bias every c1/n1l statistic);
  *  - the top-V cap binds deterministically: a capped model scores a
  *    dropped bigram through the continuation branch, and tightening V
  *    can only change scores in the capped direction;
  *  - streaming score-then-admit ≡ the sequential loop, including a
  *    batch whose score depends on an earlier batch's admission.
  */
class BigramStoreSpec extends SparkSpec {

  private val corpusA = Seq(
    (1L, "a b a b a c"),
    (2L, "a b c a b"),
    (3L, "x y x y x"),
  )
  private val corpusB = Seq(
    (4L, "a b a b"),
    (5L, "x y z x y"),
  )
  private val arrivals = Seq(
    (11L, "a b c"),
    (12L, "x y z"),
    (13L, "q r s"), // fully novel vocabulary
  )

  private def df2(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def fresh(name: String, rows: Seq[(Long, String)]): Unit = {
    Seq("bigrams", "grams", "docs", "meta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    BigramStore.build(spark, df2(rows), name,
      location = s"/tmp/$name", datasetTag = "fix")
  }

  private def canon(rows: Array[Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("append equals rebuild; idempotent replay adds nothing") {
    fresh("graft_test_bglm_a", corpusA)
    BigramStore.append(spark, df2(corpusB), "graft_test_bglm_a")
    fresh("graft_test_bglm_b", corpusA ++ corpusB)
    val a = BigramStore.serveKn(spark, df2(arrivals), "graft_test_bglm_a", 512)
    val b = BigramStore.serveKn(spark, df2(arrivals), "graft_test_bglm_b", 512)
    assert(canon(a.collect()) == canon(b.collect()))
    // in-vocabulary arrival must beat the fully-novel one on perplexity
    val byId = a.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId(11L) < byId(13L), s"in-vocab ppl ${byId(11L)} vs novel ${byId(13L)}")
    // replay: re-admitting already-admitted docs must not shift counts
    val sumBefore = spark.table("graft_test_bglm_a_bigrams")
      .agg(sum("bf")).head()
    BigramStore.append(spark, df2(corpusB), "graft_test_bglm_a",
      idempotent = true)
    spark.catalog.refreshTable("graft_test_bglm_a_bigrams")
    assert(spark.table("graft_test_bglm_a_bigrams").agg(sum("bf")).head()
      == sumBefore)
    assert(canon(BigramStore.serveKn(spark, df2(arrivals),
      "graft_test_bglm_a", 512).collect()) == canon(a.collect()))
  }

  test("the serve-time cap binds: V = 1 keeps only the heaviest bigram and the verdict matches a hand KN replay") {
    fresh("graft_test_bglm_c", corpusA ++ corpusB)
    // model bigram counts: (a,b)=6 (heaviest), (b,a)=4, (x,y)=5, ...
    // V = 1 keeps exactly (a,b): c1(a)=6, n1l(a)=1, n1r(b)=1, T=1, V=6
    val out = BigramStore.serveKn(spark, df2(Seq((21L, "a b"), (22L, "b a"))),
        "graft_test_bglm_c", 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val vSize = 6.0 // distinct tokens across corpusA ++ corpusB: a b c x y z
    // kept pair (a,b): p = (max(6 - .75, 0) + .75·1·pCont(b)) / 6
    val pContB = (1.0 + 1.0) / (1.0 + vSize + 1.0)
    val pAB = ((6.0 - 0.75) + 0.75 * 1.0 * pContB) / 6.0
    // dropped pair (b,a): unseen context b -> continuation of a: (0+1)/(T+V+1)
    val pBA = (0.0 + 1.0) / (1.0 + vSize + 1.0)
    def ppl(p: Double) = {
      val lnFp = BigDecimal(math.log(p) * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      BigDecimal(math.exp(-(lnFp / 1e9) / 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(21L) === ((1L, ppl(pAB))), s"kept bigram ${out(21L)} vs ${ppl(pAB)}")
    assert(out(22L) === ((1L, ppl(pBA))), s"dropped bigram ${out(22L)} vs ${ppl(pBA)}")
  }

  test("the serve cap plans as TakeOrdered, never a global vocabulary sort") {
    fresh("graft_test_bglm_pl", corpusA)
    val p = BigramStore.cappedBigrams(spark, "graft_test_bglm_pl", 512)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"cap lost its TakeOrdered shape:\n${p.take(1000)}")
  }

  test("crash matrix: sink-committed/store-lost and store-committed windows both replay to the clean state") {
    val s = spark
    val batch = df2(Seq((23L, "a b m n"), (24L, "x y a b")))
    def sink(dir: String) =
      s.read.parquet(dir + "/batch=*").collect().map(_.toString).sorted.toSeq
    def serve(name: String) =
      canon(BigramStore.serveKn(s, df2(arrivals), name, 512).collect())
    // the reference: one clean admit call
    fresh("graft_test_bglm_cwr", corpusA)
    val outR = java.nio.file.Files
      .createTempDirectory("graft-bglm-cwr").toString + "/v"
    StreamOps.bigramAdmitBatch(batch, "graft_test_bglm_cwr", 512, outR, 7L)
    val refSink = sink(outR)
    val refServe = serve("graft_test_bglm_cwr")
    // window: the sink half committed, then the store append was lost —
    // a same-id redelivery re-scores against the UNCHANGED model and the
    // batchId-keyed overwrite rewrites identical rows
    fresh("graft_test_bglm_cww", corpusA)
    val outW = java.nio.file.Files
      .createTempDirectory("graft-bglm-cww").toString + "/v"
    BigramStore.serveKn(s, batch, "graft_test_bglm_cww", 512)
      .write.mode("overwrite").parquet(outW + "/batch=7")
    StreamOps.bigramAdmitBatch(batch, "graft_test_bglm_cww", 512, outW, 7L)
    assert(sink(outW) == refSink, "redelivery must overwrite the same rows")
    assert(serve("graft_test_bglm_cww") == refServe, "store must converge")
    // window: store committed — the same-id redelivery's guard empties
    // and the skip leaves the committed sink INTACT (an unconditional
    // overwrite would erase it)
    StreamOps.bigramAdmitBatch(batch, "graft_test_bglm_cww", 512, outW, 7L)
    assert(sink(outW) == refSink, "post-append redelivery must not erase the sink")
    assert(serve("graft_test_bglm_cww") == refServe)
  }

  test("delta fold: serve invariant, replayed absorbed batch stays a no-op, store stays live") {
    fresh("graft_test_bglm_cp", corpusA)
    BigramStore.append(spark, df2(corpusB), "graft_test_bglm_cp")
    def serve() = canon(BigramStore.serveKn(spark, df2(arrivals),
      "graft_test_bglm_cp", 512).collect())
    val before = serve()
    val (rb, ra) = BigramStore.compact(spark, "graft_test_bglm_cp")
    assert(ra <= rb, s"fold must not grow the store: $rb -> $ra")
    assert(serve() == before, "fold must be serve-invariant")
    // a PRE-fold batch replayed unguarded: its fingerprint is
    // tombstoned, so the re-appended delta must not double-count
    BigramStore.append(spark, df2(corpusB), "graft_test_bglm_cp",
      idempotent = false)
    assert(serve() == before,
      "replay of an absorbed batch must stay a no-op after the fold")
    // NEW admissions still count, and a second fold is also invariant
    BigramStore.append(spark, df2(Seq((31L, "q r q r q"))), "graft_test_bglm_cp")
    val mid = serve()
    assert(mid != before, "a genuinely new admission must still shift the model")
    BigramStore.compact(spark, "graft_test_bglm_cp")
    assert(serve() == mid, "second fold must be invariant too")
  }

  test("q211 trigram extension: append equals rebuild; fold invariant; replay adds nothing") {
    def freshTri(name: String, rows: Seq[(Long, String)]): Unit = {
      Seq("trigrams", "bigrams", "grams", "docs", "meta").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
      BigramStore.buildTri(spark, df2(rows), name,
        location = s"/tmp/$name", datasetTag = "fix")
    }
    freshTri("graft_test_trg_a", corpusA)
    BigramStore.appendTri(spark, df2(corpusB), "graft_test_trg_a")
    freshTri("graft_test_trg_b", corpusA ++ corpusB)
    def serve(name: String) = canon(BigramStore.serveBackoff(spark,
      df2(arrivals), name, 512).collect())
    val a = serve("graft_test_trg_a")
    assert(a.nonEmpty && a == serve("graft_test_trg_b"),
      "trigram append must equal rebuild")
    // idempotent replay of an admitted batch shifts nothing
    BigramStore.appendTri(spark, df2(corpusB), "graft_test_trg_a",
      idempotent = true)
    assert(serve("graft_test_trg_a") == a, "replay must add nothing")
    // delta fold is serve-invariant and the store stays live
    val (rb, ra) = BigramStore.compactTri(spark, "graft_test_trg_a")
    assert(ra <= rb && serve("graft_test_trg_a") == a,
      s"fold must shrink ($rb -> $ra) and stay serve-invariant")
    BigramStore.appendTri(spark, df2(Seq((31L, "q r q r q"))), "graft_test_trg_a")
    assert(serve("graft_test_trg_a") != a, "new admission must still shift the model")
  }

  test("q211 backoff chain: seen trigram, backed-off bigram, and add-one unigram levels each hand-check") {
    freshTriCorpus()
    // model "a b c a b c" ×1 doc: trigrams (a,b,c)×2, (b,c,a), (c,a,b);
    // bigrams (a,b)×2, (b,c)×2, (c,a); unigrams a,b,c ×2 each
    def ppl(p: Double, n: Long = 1L) = {
      val lnFp = BigDecimal(math.log(p) * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      BigDecimal(math.exp(-(lnFp / 1e9) / n.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ln04 = BigDecimal(math.log(0.4) * 1e9)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def pplChain(fps: Long*) = BigDecimal(math.exp(-(fps.sum / 1e9) / 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def fp(p: Double) = BigDecimal(math.log(p) * 1e9)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val out = BigramStore.serveBackoff(spark,
      df2(Seq((41L, "a b c"), (42L, "x b c"), (43L, "q r s"))),
      "graft_test_trg_c", 512)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // seen trigram: tf(a,b,c)=2, c12(a,b)=2 → p = 1
    assert(out(41L) === ((1L, ppl(1.0))), s"seen trigram: ${out(41L)}")
    // unseen trigram, seen bigram (b,c): 0.4 · bf(b,c)/c2(b) = 0.4 · 2/2
    assert(out(42L) === ((1L, pplChain(ln04, fp(2.0 / 2.0)))),
      s"bigram backoff level: ${out(42L)}")
    // fully unseen: 0.4² · (0+1)/(t_total=6 + v_size=3)
    assert(out(43L) === ((1L, pplChain(ln04, ln04, fp(1.0 / 9.0)))),
      s"unigram backoff level: ${out(43L)}")
  }

  private def freshTriCorpus(): Unit = {
    Seq("trigrams", "bigrams", "grams", "docs", "meta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_test_trg_c_$t"))
    BigramStore.buildTri(spark, df2(Seq((1L, "a b c a b c"))),
      "graft_test_trg_c", location = "/tmp/graft_test_trg_c", datasetTag = "fix")
  }

  test("streaming score-then-admit equals the sequential loop across model drift") {
    val s = spark
    import s.implicits._
    // batch 1 admits heavy "a b" mass; batch 2's arrival reuses that
    // vocabulary, so its score depends on batch 1's admission
    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq((21L, "a b a b a b"), (22L, "m n m")),
      Seq((23L, "a b m n"), (24L, "x y a b")),
    )
    // sequential reference
    fresh("graft_test_bglm_sr", corpusA)
    val ref = batches.flatMap { rows =>
      val b = df2(rows)
      val v = BigramStore.serveKn(s, b, "graft_test_bglm_sr", 512)
        .localCheckpoint()
      BigramStore.append(s, b, "graft_test_bglm_sr", idempotent = true)
      v.collect().map(_.toString)
    }.sorted
    // streaming twin
    fresh("graft_test_bglm_st", corpusA)
    val out = java.nio.file.Files.createTempDirectory("graft-bglm").toString + "/v"
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamOps.streamingBigramAdmission(
      ms.toDF().toDF("doc_id", "text"), "graft_test_bglm_st", 512, out).start()
    try {
      batches.foreach { rows => ms.addData(rows); q.processAllAvailable() }
      // at-least-once replay: re-delivering batch 1 must neither shift
      // the model (doc guard) nor append duplicate drifted rows to the
      // sink (the loop scores only guard-surviving docs — r16 ADVICE)
      ms.addData(batches.head); q.processAllAvailable()
    } finally q.stop()
    val got = s.read.parquet(out + "/batch=*").collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == ref,
      "replayed batch must not re-emit scored rows")
  }
}

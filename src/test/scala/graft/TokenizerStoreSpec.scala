package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.{TokenizerStore, UnigramLmOps}
import graft.streaming.StreamOps

/** The standing tokenizer-model store (q207 + the q200-family rewire):
  * train once, serve many. Pins:
  *
  *  - store-serve ≡ inline-train (vocab/merges survive the parquet
  *    round-trip bit-exactly — BIGINT/VARCHAR columns only);
  *  - the guard refuses a stale tag or different hyper-parameters;
  *  - OOV fallback: a serving word with a character the training corpus
  *    never saw is COUNTED (chars at the OovLnpFp floor), not silently
  *    dropped from fertility (the r16 ADVICE defect);
  *  - streaming serve ≡ the batch serve, and an at-least-once replay
  *    overwrites its batchId-keyed output instead of duplicating it.
  */
class TokenizerStoreSpec extends SparkSpec {

  private def df2(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpus = Seq(
    (0L, "abcd abcd ab cd"),
    (1L, "abcd ab ab cd cd"),
    (2L, "xy xy abcd"),
  )

  private def fresh(name: String, rows: Seq[(Long, String)],
      bpeRounds: Int = 3): Unit = {
    Seq("vocab", "merges", "meta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    TokenizerStore.build(spark, df2(rows), name, s"/tmp/$name",
      ulmRounds = 2, capV = 8, bpeRounds = bpeRounds, datasetTag = "fix")
  }

  test("store-serve equals inline-train for both model families") {
    fresh("graft_test_tok_a", corpus)
    val docs = df2(corpus)
    // unigram: stored vocab rows == inline train rows
    val inline = UnigramLmOps.train(docs, 2, 8).localCheckpoint()
    val inlineRows = inline.join(UnigramLmOps.modelOf(inline), Seq("piece"))
      .select("piece", "cnt", "lnp_fp")
      .collect().map(_.toString).sorted.toSeq
    val storedRows = TokenizerStore.vocab(spark, "graft_test_tok_a")
      .collect().map(_.toString).sorted.toSeq
    assert(storedRows == inlineRows, "stored vocab must equal inline training")
    // BPE: stored merge pairs == inline trainer's
    val inlinePairs = graft.text.BpeOps.mergesDriver(docs, 3)
      .orderBy("round").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(TokenizerStore.bpeMergePairs(spark, "graft_test_tok_a") == inlinePairs)
    // guard: same tag+params match; different params or tag refuse
    assert(TokenizerStore.matches(spark, "graft_test_tok_a", "fix", 2, 8, 3))
    assert(!TokenizerStore.matches(spark, "graft_test_tok_a", "fix", 2, 9, 3),
      "different capV must refuse")
    assert(!TokenizerStore.matches(spark, "graft_test_tok_a", "other", 2, 8, 3),
      "different dataset tag must refuse")
  }

  test("OOV fallback: a word with an unseen character is counted at the char floor, not dropped") {
    val s = spark
    import s.implicits._
    fresh("graft_test_tok_b", corpus)
    val model = TokenizerStore.vocab(spark, "graft_test_tok_b")
      .select("piece", "lnp_fp")
    // 'q' and 'z' never occur in the training corpus
    val words = Seq("abqz", "abcd").toDF("w")
    val vit = UnigramLmOps.viterbiBest(words, model)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(vit.contains("abqz"), "OOV word must not vanish from the serve")
    assert(vit("abqz") === 3L, // "ab" + 'q' + 'z' beats 4 chars
      s"OOV chars fall back to single pieces: ${vit("abqz")}")
    val gre = UnigramLmOps.greedyCounts(words, model)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gre("abqz") === 3L, s"greedy walks OOV chars too: ${gre("abqz")}")
    // fertility counts the OOV word (the actual r16 defect surface)
    val fert = UnigramLmOps.fertility(
      Seq((9L, "abqz abcd")).toDF("doc_id", "text"),
      UnigramLmOps.viterbiBest(Seq("abqz", "abcd").toDF("w"), model)
        .select("w", "np"))
      .head()
    assert(fert.getLong(1) === 2L && fert.getLong(2) === 4L,
      s"both words counted: $fert")
  }

  test("streaming serve equals the batch serve; a replayed batch overwrites, never duplicates") {
    val s = spark
    import s.implicits._
    fresh("graft_test_tok_c", corpus, bpeRounds = 0)
    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq((11L, "abcd ab"), (12L, "xy cd cd")),
      Seq((13L, "abqz abcd")), // OOV char in flight
    )
    val model = TokenizerStore.vocab(spark, "graft_test_tok_c")
      .select("piece", "lnp_fp")
    val ref = batches.flatMap { rows =>
      val b = df2(rows)
      UnigramLmOps.fertility(b,
        UnigramLmOps.viterbiBest(UnigramLmOps.wordFreqs(b).select("w"), model)
          .select("w", "np"))
        .collect().map(_.toString)
    }.sorted
    val out = java.nio.file.Files.createTempDirectory("graft-tok").toString + "/v"
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamOps.streamingTokenizerServe(
      ms.toDF().toDF("doc_id", "text"), "graft_test_tok_c", out).start()
    try {
      batches.foreach { rows => ms.addData(rows); q.processAllAvailable() }
    } finally q.stop()
    // at-least-once replay: redeliver batch 0 with the SAME batchId — the
    // keyed sink overwrites with identical rows (frozen model), so the
    // total output is unchanged, not duplicated
    StreamOps.tokenizerServeBatch(df2(batches.head), "graft_test_tok_c",
      out, batchId = 0L)
    val got = s.read.parquet(out + "/batch=*").collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == ref,
      s"streaming + same-id replay must equal the sequential serve: $got vs $ref")
  }
}

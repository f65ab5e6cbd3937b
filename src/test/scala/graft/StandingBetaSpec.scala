package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.glm.BetaStore
import graft.streaming.StreamOps

/** The standing second level (q156 + streamingBetaAdmission): persisted
  * per-subject first-level betas, bounded re-probe of the full inference
  * chain per admission. Pins:
  *
  *  - append ≡ rebuild (two-stage admission answers like a one-shot build
  *    on the union cohort);
  *  - replay safety WITHOUT fingerprints (betas are deterministic facts:
  *    an unguarded double append max-dedupes at probe time);
  *  - streaming admit-then-probe ≡ the sequential loop, including a
  *    cross-batch admission that CHANGES an earlier hypothesis's
  *    permutation p (the probe must read state across batches).
  */
class StandingBetaSpec extends SparkSpec {

  // planted first-level facts, one run, two regressors: j=0 a strong
  // consistent effect, j=1 subject-varying noise
  private def cohortA: Seq[(Long, Long, Long, Long)] =
    (0L until 6L).flatMap(g => Seq(
      (0L, g, 0L, 8000000L + g * 10000L),
      (0L, g, 1L, (g % 3L - 1L) * 1500000L + g * 7000L)))
  private def cohortB: Seq[(Long, Long, Long, Long)] =
    (6L until 10L).flatMap(g => Seq(
      (0L, g, 0L, 8000000L - g * 5000L),
      (0L, g, 1L, (g % 2L * 2L - 1L) * 2000000L)))

  private def df(rows: Seq[(Long, Long, Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("run", "g", "j", "b_fp")
  }

  private def fresh(name: String, rows: Seq[(Long, Long, Long, Long)]): Unit = {
    Seq("betas", "subjects", "meta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    BetaStore.buildBetaStore(spark, df(rows), name,
      location = s"/tmp/$name", datasetTag = "fix")
  }

  private def probe(name: String): Seq[String] =
    graft.queries.Glm
      .inferenceChainCore(spark, BetaStore.betaRelation(spark, name))
      .collect().map(_.toString).toSeq

  test("append equals rebuild") {
    fresh("graft_test_beta_a", cohortA)
    BetaStore.appendSubjects(spark, df(cohortB), "graft_test_beta_a")
    fresh("graft_test_beta_b", cohortA ++ cohortB)
    val a = probe("graft_test_beta_a")
    val b = probe("graft_test_beta_b")
    assert(a.nonEmpty && a == b)
    // the strong effect separates from the noise on the full cohort
    // (BH verdict semantics themselves are pinned in GlmSpec)
    val rows = graft.queries.Glm
      .inferenceChainCore(spark, BetaStore.betaRelation(spark, "graft_test_beta_a"))
      .collect().map(r => r.getLong(1) -> r).toMap
    // with 10 subjects ~2^-10 of the 256 patterns are constant-sign and
    // tie |t_obs| exactly, so the floor is a few /257 — not 1/257
    assert(rows(0L).getDouble(rows(0L).fieldIndex("p_perm")) <= 0.02,
      "consistent effect must reach a near-floor permutation p")
    assert(rows(1L).getDouble(rows(1L).fieldIndex("p_perm")) > 0.05,
      "noise must not")
    assert(!rows(1L).getBoolean(rows(1L).fieldIndex("rejected_bh")))
  }

  test("unguarded replay max-dedupes: facts need no batch fingerprint") {
    fresh("graft_test_beta_r", cohortA)
    val before = probe("graft_test_beta_r")
    BetaStore.appendSubjects(spark, df(cohortB), "graft_test_beta_r",
      idempotent = false)
    val once = probe("graft_test_beta_r")
    // crash-window simulation: the SAME batch appended again, no guard
    BetaStore.appendSubjects(spark, df(cohortB), "graft_test_beta_r",
      idempotent = false)
    val twice = probe("graft_test_beta_r")
    assert(once == twice, "replayed identical facts must not shift the probe")
    assert(before != once, "the first admission must actually change it")
    // the guarded path skips already-admitted subjects entirely
    BetaStore.appendSubjects(spark, df(cohortB), "graft_test_beta_r",
      idempotent = true)
    assert(probe("graft_test_beta_r") == twice)
  }

  test("streaming admission re-probes across batches (verdict snapshot per admission)") {
    val s = spark
    import s.implicits._
    val batches: Seq[Seq[(Long, Long, Long, Long)]] =
      Seq(cohortB.take(4), cohortB.drop(4))
    // sequential reference: admit, then probe the store as it stands
    fresh("graft_test_beta_sr", cohortA)
    val ref = batches.map { rows =>
      BetaStore.appendSubjects(s, df(rows), "graft_test_beta_sr",
        idempotent = true)
      probe("graft_test_beta_sr").sorted
    }
    assert(ref(0) != ref(1),
      "cross-batch admission must change some hypothesis's verdict row")
    // streaming twin: outPath is overwritten with the snapshot per batch
    fresh("graft_test_beta_st", cohortA)
    val out = java.nio.file.Files.createTempDirectory("graft-beta").toString + "/v"
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, Long)]
    val q = StreamOps.streamingBetaAdmission(
      ms.toDF().toDF("run", "g", "j", "b_fp"), "graft_test_beta_st", out)
      .start()
    try {
      batches.zipWithIndex.foreach { case (rows, i) =>
        ms.addData(rows); q.processAllAvailable()
        val got = s.read.parquet(out).collect().map(_.toString).sorted.toSeq
        assert(got == ref(i), s"batch $i snapshot diverged from sequential loop")
      }
    } finally q.stop()
  }
}

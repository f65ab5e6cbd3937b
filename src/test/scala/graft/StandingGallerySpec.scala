package graft

import org.apache.spark.sql.DataFrame
import graft.image.GalleryStore
import graft.streaming.StreamOps

/** The standing fingerprint gallery (q190 + streamingGalleryEnrollment):
  * persisted per-scan connectome edge vectors, bounded identification
  * re-probe per enrollment. Pins:
  *
  *  - enroll ≡ rebuild (two-stage enrollment answers like a one-shot
  *    build on the union gallery);
  *  - replay safety WITHOUT fingerprints (edge vectors are deterministic
  *    facts: an unguarded double enroll max-dedupes at probe time);
  *  - streaming enroll-then-probe ≡ the sequential loop, including a
  *    cross-batch enrollment that FLIPS an earlier probe's best match
  *    (the probe must read gallery state across batches).
  */
class StandingGallerySpec extends SparkSpec {

  // probe scans: subject 0 = (100, 200, 300), subject 1 = (300, 100, 200)
  private def probeVecs: Seq[(Int, Int, Int, Long)] = Seq(
    (0, 0, 1, 100L), (0, 0, 2, 200L), (0, 1, 2, 300L),
    (1, 0, 1, 300L), (1, 0, 2, 100L), (1, 1, 2, 200L))
  // gallery stage 1: only subject 1's reference scan (subject 0's probe
  // will mis-match to it at r = -0.5, the only candidate)
  private def galleryA: Seq[(Int, Int, Int, Long)] = Seq(
    (1, 0, 1, 300L), (1, 0, 2, 100L), (1, 1, 2, 200L))
  // gallery stage 2: subject 0's reference scan arrives (scaled 2x → its
  // probe now matches it at r = 1.0 — the cross-batch flip)
  private def galleryB: Seq[(Int, Int, Int, Long)] = Seq(
    (0, 0, 1, 200L), (0, 0, 2, 400L), (0, 1, 2, 600L))

  private def df(rows: Seq[(Int, Int, Int, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("g", "p1", "p2", "r_fp")
  }

  private def fresh(name: String, rows: Seq[(Int, Int, Int, Long)]): Unit = {
    Seq("vecs", "scans", "meta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    GalleryStore.buildGallery(spark, df(rows), name,
      location = s"/tmp/$name", datasetTag = "fix")
  }

  private def probe(name: String): Seq[String] =
    graft.queries.DesignImage
      .fingerprintMatch(df(probeVecs), GalleryStore.galleryRelation(spark, name))
      .collect().map(_.toString).toSeq

  test("enroll equals rebuild; identification flips once the true twin is enrolled") {
    fresh("graft_test_gal_a", galleryA)
    GalleryStore.enrollScans(spark, df(galleryB), "graft_test_gal_a")
    fresh("graft_test_gal_b", galleryA ++ galleryB)
    val a = probe("graft_test_gal_a")
    val b = probe("graft_test_gal_b")
    assert(a.nonEmpty && a == b)
    val rows = graft.queries.DesignImage
      .fingerprintMatch(df(probeVecs),
        GalleryStore.galleryRelation(spark, "graft_test_gal_a"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4),
          r.getBoolean(5)))).toMap
    assert(rows((0, 0)) === ((Some(1.0), true, true)), s"${rows((0, 0))}")
    assert(rows((1, 1)) === ((Some(1.0), true, true)))
    assert(rows((0, 1)) === ((Some(-0.5), false, false)))
  }

  test("unguarded replay max-dedupes: vectors need no batch fingerprint") {
    fresh("graft_test_gal_r", galleryA)
    val before = probe("graft_test_gal_r")
    GalleryStore.enrollScans(spark, df(galleryB), "graft_test_gal_r",
      idempotent = false)
    val once = probe("graft_test_gal_r")
    GalleryStore.enrollScans(spark, df(galleryB), "graft_test_gal_r",
      idempotent = false)
    val twice = probe("graft_test_gal_r")
    assert(once == twice, "replayed identical facts must not shift the probe")
    assert(before != once, "the first enrollment must actually change it")
    GalleryStore.enrollScans(spark, df(galleryB), "graft_test_gal_r",
      idempotent = true)
    assert(probe("graft_test_gal_r") == twice)
  }

  test("streaming enrollment re-probes across batches (match snapshot per batch)") {
    val s = spark
    import s.implicits._
    // sequential reference
    fresh("graft_test_gal_sr", galleryA)
    val ref = Seq(galleryB).map { rows =>
      GalleryStore.enrollScans(s, df(rows), "graft_test_gal_sr",
        idempotent = true)
      probe("graft_test_gal_sr").sorted
    }
    val initial = {
      fresh("graft_test_gal_s0", galleryA)
      probe("graft_test_gal_s0").sorted
    }
    assert(initial != ref(0),
      "the enrollment batch must flip subject 0's best match")
    // streaming twin
    fresh("graft_test_gal_st", galleryA)
    val out = java.nio.file.Files.createTempDirectory("graft-gal").toString + "/v"
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Int, Int, Int, Long)]
    val q = StreamOps.streamingGalleryEnrollment(
      ms.toDF().toDF("g", "p1", "p2", "r_fp"), "graft_test_gal_st",
      df(probeVecs), out)
      .start()
    try {
      ms.addData(galleryB); q.processAllAvailable()
      val got = s.read.parquet(out).collect().map(_.toString).sorted.toSeq
      assert(got == ref(0), "stream snapshot diverged from sequential loop")
    } finally q.stop()
  }
}

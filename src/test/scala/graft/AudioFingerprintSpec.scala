package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Afp
import graft.multimodal.AudioOps
import graft.streaming.StreamOps

/** The audio fingerprint modality member (q210 + the standing audio
  * index + streamingAudioAdmission). Pins:
  *
  *  - Haitsma–Kalker semantics: a constant waveform fingerprints to 0, a
  *    single band-energy boost sets exactly its (frame, band) bit, and
  *    amplitude SCALING is invariant (energies scale by the square, all
  *    second-difference signs survive — the robustness HK banks on);
  *  - dedup verdicts: exact dup (dist 0), within-τ near-dup (dist 1),
  *    far pair kept (dist 6 — all planted, distances asserted);
  *  - standing index: probe ≡ the batch verdicts, append ≡ rebuild;
  *  - streaming probe-then-admit ≡ the sequential loop, and a replayed
  *    batch adds nothing (the guard-surviving discipline).
  */
class AudioFingerprintSpec extends SparkSpec {

  private val flat = Array.fill[Byte](36)(65)
  private val boosted = { val a = flat.clone(); a(4) = 90; a } // bit 0 only
  private val far =
    Array.tabulate[Byte](36)(i => (60 + 7 * ((i / 4 * (i % 4)) % 5)).toByte)

  private def media(rows: Seq[(Long, Array[Byte])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "payload")
  }

  test("afp24: constant → 0; one band boost sets its bit; amplitude scaling is invariant; empty → 0") {
    assert(Afp.afp24(flat) === 0L)
    assert(Afp.afp24(boosted) === 1L, "boost at (frame 1, band 0) is bit 0")
    val scaled = boosted.map(b => ((b & 0xff) * 2).toByte) // 130/180 unsigned
    assert(Afp.afp24(scaled) === Afp.afp24(boosted),
      "amplitude scaling must not move any sign")
    assert(Afp.afp24(Array.emptyByteArray) === 0L)
    assert(java.lang.Long.bitCount(Afp.afp24(far) ^ Afp.afp24(flat)) === 6,
      "the planted far pair sits beyond the banding radius")
  }

  test("q210 verdicts: exact dup and within-tau near-dup collapse to the min id; far pair kept") {
    val out = AudioOps.dedupVerdicts(
      media(Seq(1L -> flat, 2L -> flat.clone(), 3L -> boosted, 4L -> far)))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3)))).toMap
    assert(out(1L) === ((None, true)), s"first copy kept: ${out(1L)}")
    assert(out(2L) === ((Some(1L), false)), s"exact dup: ${out(2L)}")
    assert(out(3L) === ((Some(1L), false)), s"near dup at dist 1: ${out(3L)}")
    assert(out(4L) === ((None, true)), s"far pair kept: ${out(4L)}")
  }

  test("standing index: probe equals batch verdicts, append equals rebuild, streaming twin incl. replay") {
    val s = spark
    import s.implicits._
    def fresh(name: String, rows: Seq[(Long, Array[Byte])]): Unit = {
      Seq("abands", "adocs", "ameta").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
      AudioOps.buildAudioIndex(spark, media(rows), name,
        location = s"/tmp/$name", datasetTag = "fix")
    }
    fresh("graft_test_afp_a", Seq(1L -> flat))
    AudioOps.appendToAudioIndex(spark, media(Seq(2L -> far)), "graft_test_afp_a")
    fresh("graft_test_afp_b", Seq(1L -> flat, 2L -> far))
    def probe(name: String) =
      AudioOps.probeAudioIndex(spark, media(Seq(11L -> boosted, 12L -> far)), name)
        .collect().map(_.toString).sorted.toSeq
    val a = probe("graft_test_afp_a")
    assert(a == probe("graft_test_afp_b"), "append must equal rebuild")
    assert(a.exists(_.contains("11,1,false")), s"near-dup probed: $a")
    assert(a.exists(_.contains("12,2,false")), s"exact corpus twin probed: $a")
    // streaming: verdicts depend on earlier admissions; replay adds nothing
    val batches: Seq[Seq[(Long, Array[Byte])]] = Seq(
      Seq(21L -> boosted),           // dup of corpus 1 (dist 1)
      Seq(22L -> boosted.clone()),   // dup of ADMITTED 21 → min id is 1
    )
    fresh("graft_test_afp_s", Seq(1L -> flat))
    val ref = batches.flatMap { rows =>
      val b = media(rows)
      val v = AudioOps.probeAudioIndex(s, b, "graft_test_afp_s")
        .localCheckpoint()
      AudioOps.appendToAudioIndex(s, b, "graft_test_afp_s", idempotent = true)
      v.collect().map(_.toString)
    }.sorted
    fresh("graft_test_afp_t", Seq(1L -> flat))
    val out = java.nio.file.Files.createTempDirectory("graft-afp").toString + "/v"
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    val q = StreamOps.streamingAudioAdmission(
      ms.toDF().toDF("doc_id", "payload"), "graft_test_afp_t", AudioOps.Tau,
      out).start()
    try {
      batches.foreach { rows => ms.addData(rows); q.processAllAvailable() }
      ms.addData(batches.head); q.processAllAvailable() // at-least-once replay
    } finally q.stop()
    val got = s.read.parquet(out + "/batch=*").collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == ref,
      s"stream ≡ sequential and replay adds nothing: $got vs $ref")
  }

  test("crash window: a half-appended batch (bands landed, guard lost) replays clean") {
    val s = spark
    val name = "graft_test_afp_c"
    Seq("abands", "adocs", "ameta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    AudioOps.buildAudioIndex(spark, media(Seq(1L -> flat)), name,
      location = s"/tmp/$name", datasetTag = "fix")
    val guardSchema = s.table(s"${name}_adocs").schema
    val snap = s.table(s"${name}_adocs").collect().toSeq
    val buckets = s.table(s"${name}_ameta").head().getAs[Int]("buckets")
    AudioOps.appendToAudioIndex(s, media(Seq(22L -> far)), name)
    // roll the GUARD back to the pre-batch snapshot — the exact state a
    // crash between the index's two (non-atomic) table appends leaves
    s.createDataFrame(s.sparkContext.parallelize(snap), guardSchema)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "corp_id").sortBy("corp_id")
      .option("path", s"/tmp/$name/adocs_rb")
      .saveAsTable(s"${name}_adocs")
    // the replayed probe must not self-match doc 22's orphaned band rows
    // (far is beyond tau of the whole real corpus → keep must stay true)
    val v = AudioOps.probeAudioIndex(s, media(Seq(22L -> far)), name)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(2))).toSeq
    assert(v === Seq((22L, None, true)), s"self-match leaked: $v")
    // and the idempotent re-append lands ONLY the missing guard row
    AudioOps.appendToAudioIndex(s, media(Seq(22L -> far)), name,
      idempotent = true)
    val bandRows = s.table(s"${name}_abands")
      .filter(col("corp_id") === 22L).count()
    assert(bandRows === AudioOps.Bands.toLong, s"band rows doubled: $bandRows")
    assert(s.table(s"${name}_adocs")
      .filter(col("corp_id") === 22L).count() === 1L, "guard row must land once")
  }

  test("crash window: a PARTIALLY committed band append (one band row lost) replays the missing rows") {
    // the r17 ADVICE window: a doc-grain replay guard would skip doc 33's
    // remaining bands forever once ANY of its band rows had landed; the
    // (corp_id, r, bv)-grain anti-join must land exactly the missing ones
    val s = spark
    val name = "graft_test_afp_p"
    Seq("abands", "adocs", "ameta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    AudioOps.buildAudioIndex(spark, media(Seq(1L -> flat)), name,
      location = s"/tmp/$name", datasetTag = "fix")
    val buckets = s.table(s"${name}_ameta").head().getAs[Int]("buckets")
    val guardSnap = s.table(s"${name}_adocs").collect().toSeq
    val guardSchema = s.table(s"${name}_adocs").schema
    AudioOps.appendToAudioIndex(s, media(Seq(33L -> far)), name)
    // roll the band table back to "only band r=0 of doc 33 committed" and
    // the guard to the pre-batch state (bands append first, so a mid-band
    // crash has no guard row)
    val partial = s.table(s"${name}_abands")
      .filter(col("corp_id") =!= 33L || col("r") === 0).collect().toSeq
    val bandSchema = s.table(s"${name}_abands").schema
    s.createDataFrame(s.sparkContext.parallelize(partial), bandSchema)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "r", "bv").sortBy("r", "bv")
      .option("path", s"/tmp/$name/abands_rb")
      .saveAsTable(s"${name}_abands")
    s.createDataFrame(s.sparkContext.parallelize(guardSnap), guardSchema)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "corp_id").sortBy("corp_id")
      .option("path", s"/tmp/$name/adocs_rb")
      .saveAsTable(s"${name}_adocs")
    // idempotent replay: exactly the two missing band rows + the guard land
    AudioOps.appendToAudioIndex(s, media(Seq(33L -> far)), name,
      idempotent = true)
    val bands = s.table(s"${name}_abands").filter(col("corp_id") === 33L)
      .select("r").collect().map(_.getInt(0)).sorted.toSeq
    assert(bands === (0 until AudioOps.Bands).toSeq,
      s"replay must land exactly the missing band rows once each: $bands")
    assert(s.table(s"${name}_adocs")
      .filter(col("corp_id") === 33L).count() === 1L, "guard row must land once")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.Phash
import graft.multimodal.PhashOps
import graft.streaming.StreamOps

/** The standing perceptual index (q119 + streamingMediaAdmission): banding
  * exactness on a NON-EMPTY near-dup fixture, append ≡ rebuild, standing
  * probe ≡ direct pair semantics, and stream ≡ batch — the media leg of the
  * standing-index symmetry (text q90 / vectors q110 precedents).
  */
class PhashIndexSpec extends SparkSpec {

  /** Payloads with PLANTED fingerprints: the 128 block means are the
    * inverse DCT of a chosen ±4 sign vector, so phash64 recovers exactly
    * the planted 64 signs (margin: |c_k| = 4·64e12 against ≤ 6.4e13
    * worst-case byte-rounding noise — verified planted-exact in this
    * suite). Near-dups are then EXACT: flipping d planted signs moves the
    * fingerprint by Hamming distance d, regardless of payload length.
    * Independent seeds give ~Binomial(64, ½) cross distances (min ~14
    * over 276 pairs), far outside τ. */
  private def synth(n: Int, signs: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](n)
    for (b <- 0 until 128) {
      var v = 128.0
      for (k <- 0 until 64)
        v += 4.0 * signs(k) * math.cos(math.Pi * (k + 1) * (2 * b + 1) / 256)
      val by = math.max(0, math.min(255, math.rint(v).toInt)).toByte
      val lo = (b.toLong * n / 128).toInt
      val hi = ((b + 1).toLong * n / 128).toInt
      java.util.Arrays.fill(out, lo, hi, by)
    }
    out
  }

  private def signs(seed: Int): Array[Int] = {
    val r = new java.util.Random(seed * 1000003L)
    Array.fill(64)(if (r.nextBoolean()) 1 else -1)
  }

  /** Flip `d` planted signs → a payload at exact Hamming distance d. */
  private def near(s: Array[Int], d: Int): Array[Int] = {
    val out = s.clone()
    (0 until d).foreach(i => out(5 + 16 * i) = -out(5 + 16 * i))
    out
  }

  /** 24 distinct planted-fingerprint "images" + a near-dup of every 4th
    * one: payloads 100..123 are originals, 200+i is a DIFFERENT-LENGTH
    * payload whose planted signs differ in 1..3 positions from 100+i's
    * (for i % 4 == 0) — within τ by construction while cross-pairs stay
    * far. */
  private def fixture: Seq[(Long, Array[Byte])] = {
    val originals = (0 until 24).map { i =>
      (100L + i, synth(3000 + 40 * i, signs(i + 1)))
    }
    val nears = (0 until 24).collect { case i if i % 4 == 0 =>
      (200L + i, synth(3700 + 40 * i, near(signs(i + 1), 1 + (i / 4) % 3)))
    }
    originals ++ nears
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "payload")
  }

  private def freshIndex(name: String, corpus: Seq[(Long, Array[Byte])]): Unit = {
    val s = spark
    Seq("pbands", "pdocs", "pmeta")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    PhashOps.buildPhashIndex(s, mediaDf(corpus), name,
      location = s"/tmp/$name", buckets = 4)
  }

  test("pairRelation equals brute-force Hamming at tau=3 on a near-dup fixture") {
    val fx = fixture
    // brute force over the driver-side fingerprints: the banding must lose
    // NOTHING at radius <= bands-1 (pigeonhole) and add nothing (verified)
    val ph = fx.map { case (id, p) => id -> Phash.phash64(p) }
    val brute = (for {
      (a, ha) <- ph; (b, hb) <- ph if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= PhashOps.Tau
    } yield (a, b, d.toLong)).toSet
    assert(brute.nonEmpty, "fixture must contain at least one near pair")
    val got = PhashOps.pairRelation(mediaDf(fx))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
    // and the near-dups are exactly the PLANTED ones, not luck
    assert(brute.forall { case (a, b, _) => b - a == 100 },
      s"unexpected cross pairs: $brute")
  }

  test("append to the standing index ≡ rebuild from the union corpus") {
    val fx = fixture
    val a = fx.filter(_._1 % 2 == 0)
    val b = fx.filter(t => t._1 % 2 == 1 && t._1 < 200)
    val probe = fx.filter(t => t._1 >= 200 && t._1 % 2 == 1) ++
      Seq((999L, synth(5000, signs(99))))
    def verdicts(name: String) = PhashOps
      .probePhashIndex(spark, mediaDf(probe), name)
      .collect().map(_.toString).sorted.toSeq
    freshIndex("graft_test_phidx_app", a)
    PhashOps.appendToPhashIndex(spark, mediaDf(b), "graft_test_phidx_app")
    freshIndex("graft_test_phidx_reb", a ++ b)
    assert(verdicts("graft_test_phidx_app") === verdicts("graft_test_phidx_reb"))
    // idempotent re-append of an already-present batch inserts nothing
    val before = spark.table("graft_test_phidx_app_pdocs").count()
    PhashOps.appendToPhashIndex(spark, mediaDf(b), "graft_test_phidx_app",
      idempotent = true)
    assert(spark.table("graft_test_phidx_app_pdocs").count() === before)
  }

  test("standing probe verdicts equal the direct pair relation's admission semantics") {
    val fx = fixture
    val corpus = fx.filter(_._1 < 200)
    val inc = fx.filter(_._1 >= 200)
    freshIndex("graft_test_phidx_dir", corpus)
    val got = PhashOps.probePhashIndex(spark, mediaDf(inc), "graft_test_phidx_dir")
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getBoolean(2))).toMap
    // direct: q114's pair relation over the union, restricted to inc↔corp
    val expected = {
      val pairs = PhashOps.pairRelation(mediaDf(fx)).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      inc.map { case (id, _) =>
        val dups = pairs.collect {
          case (a, b) if b == id && corpus.exists(_._1 == a) => a
          case (a, b) if a == id && corpus.exists(_._1 == b) => b
        }
        id -> ((if (dups.isEmpty) -1L else dups.min, dups.isEmpty))
      }.toMap
    }
    assert(got === expected)
    assert(got.values.exists(!_._2), "fixture must flag at least one arrival")
  }

  test("streaming media admission equals the sequential batch loop (3 micro-batches)") {
    val s = spark
    val fx = fixture
    val corpus = fx.filter(t => t._1 < 200 && t._1 % 4 != 0)
    // synthetic cross-batch near-dup: 900002 is a re-encode-style
    // perturbation of 900001, which is ADMITTED in batch 1 — batch 2 can
    // only flag it if the bucket-aligned append ran between batches
    val syn = synth(4200, signs(77))
    val synNear = synth(4300, near(signs(77), 2))
    assert(java.lang.Long.bitCount(
      Phash.phash64(syn) ^ Phash.phash64(synNear)) <= PhashOps.Tau,
      "synthetic near-dup must be within tau")
    val batches: Seq[Seq[(Long, Array[Byte])]] = Seq(
      fx.filter(t => t._1 % 4 == 0 && t._1 < 200) :+ (900001L -> syn),
      fx.filter(t => t._1 >= 200) :+ (900002L -> synNear),
      Seq((999L, synth(5000, signs(99)))),
    )
    // batch reference: the explicit probe→admit→append loop
    freshIndex("graft_test_phidx_ref", corpus)
    val ref = batches.flatMap { rows =>
      val b = mediaDf(rows)
      val v = PhashOps.probePhashIndex(s, b, "graft_test_phidx_ref")
        .localCheckpoint()
      val admitted = b.join(v.filter(col("keep")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      PhashOps.appendToPhashIndex(s, admitted, "graft_test_phidx_ref")
      v.collect().map(_.toString)
    }.sorted
    // streaming: the same batches through the foreachBatch sink
    freshIndex("graft_test_phidx_str", corpus)
    val out = java.nio.file.Files.createTempDirectory("graft-phadmit").toString + "/v"
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    // tuple encoders don't cover Array[Byte] directly — stream base64 text
    // and unwrap in the sink-side projection
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamOps.streamingMediaAdmission(
      ms.toDF().toDF("doc_id", "payload64")
        .select(col("doc_id"), unbase64(col("payload64")).as("payload")),
      "graft_test_phidx_str", PhashOps.Tau, out).start()
    try {
      batches.foreach { rows =>
        ms.addData(rows.map { case (id, p) =>
          (id, java.util.Base64.getEncoder.encodeToString(p))
        })
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = s.read.parquet(out).collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got === ref)
    val byId = s.read.parquet(out).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getBoolean(2))).toMap
    assert(byId(900001L) === ((-1L, true)), "batch-1 synthetic should be admitted")
    assert(byId(900002L) === ((900001L, false)),
      "batch-2 near-dup of an admitted payload must be flagged against it")
  }

  test("multi-probe banding is exact at tau = 7 and 11: equals brute force on planted distances 0..13") {
    // one payload per distance d = 0..13 from a base fingerprint: the
    // widened radii must find exactly the pairs within tau and lose none
    // (pigeonhole via Hamming-<=q band-key neighborhoods), proven against
    // driver-side brute force
    val base = signs(301)
    val fx = (1001L, synth(5100, base)) +: (0 to 13).map { d =>
      (1100L + d, synth(5200 + 60 * d, (0 until d).foldLeft(base.clone()) {
        (v, i) => v(3 + 4 * i) = -v(3 + 4 * i); v
      }))
    }
    val ph = fx.map { case (id, p) => id -> Phash.phash64(p) }
    for (tau <- Seq(7, 11)) {
      val brute = (for {
        (a, ha) <- ph; (b, hb) <- ph if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= tau
      } yield (a, b, d.toLong)).toSet
      assert(brute.exists(_._3 == tau),
        s"fixture must contain a pair at exactly distance $tau")
      val got = PhashOps.pairRelation(mediaDf(fx), tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === brute, s"tau=$tau")
    }
    // standing probe agrees at the widened radius
    freshIndex("graft_test_phidx_mp", fx.filter(_._1 >= 1100))
    val probe = PhashOps.probePhashIndexPairs(spark,
      mediaDf(fx.filter(_._1 == 1001L)), "graft_test_phidx_mp", tau = 11)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val expect = ph.filter(_._1 >= 1100)
      .map { case (id, h) => (id, java.lang.Long.bitCount(ph.head._2 ^ h).toLong) }
      .filter(_._2 <= 11).toSet
    assert(probe === expect)
  }

  test("tau = 11 catches a 2x decimation that tau = 3 misses (the resize operating point)") {
    // a realistic broadband payload (not planted): its block_resize twin
    // sits at the ~8-10 bit distance PhashSpec measures — inside the
    // multi-probe radius, outside the plain-banding one
    val p = Array.tabulate(4096) { i =>
      var v = 128.0
      for (h <- 1 to 6)
        v += (50.0 / h) * math.sin(2 * math.Pi * h * i / 4096 + 0.7 * h)
      math.max(0, math.min(255, math.rint(v).toInt)).toByte
    }
    val r = graft.functions.BinaryExprs.blockResize(p, 8, 4)
    val d = java.lang.Long.bitCount(Phash.phash64(p) ^ Phash.phash64(r))
    assume(d > 3 && d <= 11, s"fixture decimation distance $d outside (3, 11]")
    val fx = Seq((1L, p), (2L, r))
    assert(PhashOps.pairRelation(mediaDf(fx), tau = 3).count() === 0,
      "tau=3 should not see a decimated twin")
    val found = PhashOps.pairRelation(mediaDf(fx), tau = 11).collect()
    assert(found.length === 1 && found.head.getLong(2) === d.toLong)
  }

  test("streaming media cluster maintenance ≡ sequential loop ≡ union re-run, with a cross-batch merge") {
    val s = spark
    import graft.dedup.DedupOps
    def flip(v: Array[Int], bits: Int*): Array[Int] = {
      val out = v.clone(); bits.foreach(b => out(b) = -out(b)); out
    }
    // planted geometry: clusters A {10, 11} and B {20, 21} sit 6 bits
    // apart (flips F = {5,21,37,53,10,26}); the batch-2 bridge flips
    // exactly {5,21,37} of A — distance 3 to BOTH sides, so it merges A
    // and B while A↔B stay out of radius on their own
    val vA = signs(201)
    val vB = flip(vA, 5, 21, 37, 53, 10, 26)
    val mid = flip(vA, 5, 21, 37)
    val vD = signs(77)
    val corpusRows = Seq(
      10L -> synth(3000, vA), 11L -> synth(3100, flip(vA, 4)),
      20L -> synth(3200, vB), 21L -> synth(3300, flip(vB, 60)),
      30L -> synth(3400, signs(55)))
    val batches: Seq[Seq[(Long, Array[Byte])]] = Seq(
      Seq(100L -> synth(4100, flip(vA, 8)), 101L -> synth(4200, vD)),
      Seq(200L -> synth(4300, mid)), // bridge: MERGES A and B
      Seq(300L -> synth(4400, flip(vD, 60)), 301L -> synth(4500, signs(88))),
    )
    def initialLabels = DedupOps
      .dedupClusters(mediaDf(corpusRows), PhashOps.pairRelation(mediaDf(corpusRows)))
      .select("doc_id", "cluster")

    // ---- sequential reference loop -------------------------------------
    freshIndex("graft_test_phclu_ref", corpusRows)
    var labels = initialLabels.localCheckpoint()
    val afterBatch = batches.map { rows =>
      val b = mediaDf(rows)
      val upd = PhashOps
        .incrementalPhashClusters(s, labels, b, "graft_test_phclu_ref")
        .select("doc_id", "cluster").localCheckpoint()
      PhashOps.appendToPhashIndex(s, b, "graft_test_phclu_ref")
      labels = upd
      upd.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val ref = afterBatch.last
    assert(afterBatch(0)(10L) !== afterBatch(0)(20L), "A and B merged too early")
    assert(afterBatch(1)(20L) === afterBatch(1)(10L), "bridge did not merge A and B")
    assert(ref(100L) === 10L, "batch-1 arrival should have joined cluster A")
    assert(ref(300L) === 101L, "batch-3 near-dup of an admitted doc must join its cluster")

    // ---- union re-run (the ground truth q121's oracle replays) ---------
    val union = mediaDf(corpusRows ++ batches.flatten)
    val full = DedupOps.dedupClusters(union, PhashOps.pairRelation(union))
      .select("doc_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ref === full)

    // ---- streaming twin ------------------------------------------------
    freshIndex("graft_test_phclu_str", corpusRows)
    val dir = java.nio.file.Files.createTempDirectory("graft-phclu").toString
    val labelsPath = s"$dir/labels"
    val outPath = s"$dir/verdicts"
    initialLabels.write.parquet(labelsPath)
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamOps.streamingMediaClusters(
      ms.toDF().toDF("doc_id", "payload64")
        .select(col("doc_id"), unbase64(col("payload64")).as("payload")),
      "graft_test_phclu_str", PhashOps.Tau, labelsPath, outPath).start()
    try {
      def send(rows: Seq[(Long, Array[Byte])]): Unit = {
        ms.addData(rows.map { case (id, p) =>
          (id, java.util.Base64.getEncoder.encodeToString(p))
        })
        q.processAllAvailable()
      }
      batches.foreach(send)
      // at-least-once REPLAY: re-deliver batch 3 verbatim — neither
      // standing store may change
      val before = s.read.parquet(labelsPath)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val docsBefore = s.table("graft_test_phclu_str_pdocs").count()
      send(batches.last)
      val after = s.read.parquet(labelsPath)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(after === before, "replayed batch changed the label store")
      assert(s.table("graft_test_phclu_str_pdocs").count() === docsBefore,
        "replayed batch double-appended to the index")
    } finally q.stop()
    val streamed = s.read.parquet(labelsPath)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === ref)
    val outIds = s.read.parquet(outPath).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(outIds === batches.flatten.map(_._1).sorted)
  }

  test("probe candidates come off the bucketed band relation (no corpus-side shuffle)") {
    val fx = fixture
    freshIndex("graft_test_phidx_plan", fx.filter(_._1 < 200))
    val probe = PhashOps.probePhashIndexPairs(spark,
      mediaDf(fx.filter(_._1 >= 200)), "graft_test_phidx_plan")
    val planStr = probe.queryExecution.executedPlan.toString
    assert(planStr.contains("Bucketed: true"),
      s"index scan not bucket-aware:\n$planStr")
    // the pbands SCAN must not sit under any shuffle: downstream exchanges
    // (the candidate distinct) repartition batch-derived pair rows, which
    // is fine — re-shuffling the corpus-side table is the 100 TB defect
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val root: SparkPlan = probe.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def pbandsUnder(p: SparkPlan): Boolean = p.collectFirst {
      case f: FileSourceScanExec
        if f.tableIdentifier.exists(_.table.contains("pbands")) => f
    }.nonEmpty
    assert(pbandsUnder(root), "expected a pbands table scan in the plan")
    // scope to the JOIN SIDE feeding the candidate join: downstream
    // exchanges (the candidate distinct) repartition batch-derived pair
    // rows above the join, which is fine — an Exchange BETWEEN the scan
    // and its join is the corpus re-shuffle this test forbids
    val sides = root.collect {
      case j if j.children.length == 2 => j.children.filter(pbandsUnder)
    }.flatten
    assert(sides.nonEmpty, "expected the pbands scan on a join side")
    val side = sides.minBy(_.collect { case n => n }.size)
    val offending = side.collect { case e: ShuffleExchangeExec => e }
    assert(offending.isEmpty,
      s"pbands rows shuffle before their join:\n${offending.mkString("\n")}")
  }
}

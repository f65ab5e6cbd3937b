package graft

import org.apache.spark.sql.functions._
import graft.functions.{BinaryExprs, Phash}

/** The perceptual hash (q114/q115): invariance, exactness, and plumbing
  * pins for the blocked-DCT sign hash over binary payloads.
  */
class PhashSpec extends SparkSpec {

  private def smooth(n: Int, f1: Int, f2: Int, phase: Double): Array[Byte] =
    Array.tabulate(n) { i =>
      val v = 128 + 60 * math.sin(2 * math.Pi * f1 * i / n) +
        40 * math.sin(2 * math.Pi * f2 * i / n + phase)
      math.max(0, math.min(255, math.rint(v).toInt)).toByte
    }

  private def dist(a: Long, b: Long): Int =
    java.lang.Long.bitCount((a ^ b) & 0xffffffffL)

  private def dist64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("a smooth payload survives its own block_resize; the exact hash does not") {
    // 32 smooth "images" (two-harmonic byte signals): stride decimation
    // (q56's resize) keeps the low-frequency structure the hash reads, so
    // the fingerprint moves a few bits at most — while any exact content
    // hash changes completely. This is the invariance that motivates a
    // perceptual hash over exact hashing for re-encoded media.
    val cases = for (f1 <- 1 to 8; f2 <- 9 to 12) yield {
      val p = smooth(4096, f1, f2, 0.7 * f1)
      val r = BinaryExprs.blockResize(p, 8, 4)
      (dist(Phash.phash32(p), Phash.phash32(r)),
        java.util.Arrays.equals(p, r))
    }
    assert(cases.forall(!_._2), "resize must actually change the bytes")
    val ds = cases.map(_._1)
    assert(ds.max <= 10, s"resize moved too many bits: ${ds.mkString(",")}")
    assert(ds.sorted.apply(ds.size / 2) <= 4, "median resize distance too high")
  }

  test("phash64: smooth payloads survive resize; all 64 bits are live") {
    // the q114 production width keeps the same invariance per-bit: the 32
    // extra coefficients are higher-frequency but still pooled structure,
    // so decimation moves a bounded fraction of the 64 bits
    val cases = for (f1 <- 1 to 8; f2 <- 9 to 12) yield {
      val p = smooth(4096, f1, f2, 0.7 * f1)
      val r = BinaryExprs.blockResize(p, 8, 4)
      dist64(Phash.phash64(p), Phash.phash64(r))
    }
    assert(cases.max <= 20, s"resize moved too many of 64 bits: ${cases.mkString(",")}")
    assert(cases.sorted.apply(cases.size / 2) <= 8, "median resize distance too high")
    // no degenerate bit: over a broadband payload population every one of
    // the 64 positions fires both ways (at Grid == Bits the last DCT row
    // would be identically zero — the Grid64 = 128 geometry keeps it
    // live). The population must be spectrally dense: narrow two-harmonic
    // signals legitimately pin their high-frequency signs.
    val pop = (1 to 128).map { s =>
      val rnd = new java.util.Random(s * 7919L)
      val p = new Array[Byte](2048 + s * 7)
      rnd.nextBytes(p)
      Phash.phash64(p)
    }
    val ones = (0 until 64).map(k => pop.count(h => ((h >> k) & 1L) == 1L))
    assert(ones.forall(c => c > 0 && c < pop.size),
      s"degenerate fingerprint bits: ${ones.zipWithIndex.filter(t => t._1 == 0 || t._1 == pop.size).map(_._2).mkString(",")}")
  }

  test("phash64 banding is pigeonhole-exact at tau=3 with 16-bit bands") {
    val base = smooth(2048, 3, 11, 0.4)
    assert(Phash.phash64(base) === Phash.phash64(base.clone()))
    // flipping any 3 of the 64 sign bits leaves at least one of the 4
    // disjoint 16-bit bands untouched — including flips of bit 63, the
    // int64 sign bit, which must stay a plain band bit after masking
    val h = Phash.phash64(base)
    val rnd = new scala.util.Random(11)
    val trials = (1 to 200).map(_ =>
      rnd.shuffle((0 until 64).toList).take(3)) :+ List(63, 47, 31)
    trials.foreach { bits =>
      val h2 = bits.foldLeft(h)((acc, b) => acc ^ (1L << b))
      val shared = (0 until 4).exists(r =>
        ((h >> (16 * r)) & 65535L) === ((h2 >> (16 * r)) & 65535L))
      assert(shared, s"dist-3 variant lost all bands: bits $bits")
    }
  }

  test("text payloads scramble under resize — the hash reads structure, not bytes") {
    // ASCII text block-means are noise around the ASCII mean: decimation
    // re-rolls the signs. The CONTRAST with the smooth case is the point:
    // pHash responds to low-frequency content, not byte identity.
    val s = spark
    val d = s.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("p"))
      .select(BinaryExprs.phash32(col("p")).as("h0"),
        BinaryExprs.phash32(BinaryExprs.block_resize(col("p"), 8, 4)).as("h1"))
      .select(expr("percentile(bit_count(h0 ^ h1), 0.5)").as("med"))
      .head().getDouble(0)
    assert(d >= 8.0, s"text resize distance unexpectedly small: $d")
  }

  test("identical payloads collide exactly; banding is pigeonhole-exact at tau=3") {
    val base = smooth(2048, 3, 11, 0.4)
    assert(Phash.phash32(base) === Phash.phash32(base.clone()))
    // flipping any 3 of the 32 sign bits leaves at least one of the 4
    // disjoint 8-bit bands untouched — the exact-recall guarantee the q114
    // join relies on (no MinHash-style luck)
    val h = Phash.phash32(base)
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val bits = rnd.shuffle((0 until 32).toList).take(3)
      val h2 = bits.foldLeft(h)((acc, b) => acc ^ (1L << b))
      val shared = (0 until 4).exists(r => ((h >> (8 * r)) & 255) === ((h2 >> (8 * r)) & 255))
      assert(shared, s"dist-3 variant lost all bands: bits $bits")
    }
  }

  test("phash32 generates and compiles inside whole-stage codegen") {
    val s = spark
    val conf = s.conf
    val prev = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = s.read.parquet(s"$sf0001/documents.parquet")
        .select(BinaryExprs.phash32(encode(col("text"), "UTF-8")).as("h"),
          BinaryExprs.phash64(encode(col("text"), "UTF-8")).as("h64"))
      assert(df.count() > 0)
      import org.apache.spark.sql.execution.debug._
      val gen = df.queryExecution.debug.codegenToSeq().map(_._2).mkString("\n")
      assert(gen.contains("Phash.phash32"), "phash32 not in generated code")
      assert(gen.contains("Phash.phash64"), "phash64 not in generated code")
    } finally prev match {
      case Some(v) => conf.set("spark.sql.codegen.fallback", v)
      case None => conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("q114 pairs are symmetric-free, verified, and ordered") {
    val out = graft.queries.Multimodal.phashPairs(spark, sf0001).collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(r => r.getLong(2) <= 3))
  }

  test("q115 manifest: keep iff both modalities novel") {
    val out = graft.queries.Multimodal.crossmodalManifest(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getBoolean(3) === (r.isNullAt(1) && r.isNullAt(2))))
  }

  test("q186: identical frames drop to the EARLIEST twin, per video; novel frames keep") {
    val s = spark
    import s.implicits._
    val still = ("the same slow scene byte for byte " * 2).take(64)
    val cut = ("completely different content after a hard scene cut here " * 2).take(64)
    val frames = Seq(
      (10L, 0L, still), (10L, 1L, still), // oversampled twin → drop, dup_of 0
      (10L, 2L, still),                   // suppressed frame 1 still points to 0
      (10L, 3L, cut),                     // scene cut → novel, kept
      (20L, 0L, still),                   // SAME bytes in another video: kept
    ).toDF("doc_id", "frame_idx", "ftext")
      .select(col("doc_id"), col("frame_idx"),
        encode(col("ftext"), "UTF-8").as("frame"))
    val out = graft.queries.Multimodal.keyframeDedupCore(frames, tau = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3)))).toMap
    assert(out((10L, 0L)) === ((None, true)))
    assert(out((10L, 1L)) === ((Some(0L), false)))
    assert(out((10L, 2L)) === ((Some(0L), false)),
      "a frame suppressed by a suppressed frame must still cite the earliest")
    assert(out((10L, 3L)) === ((None, true)), "scene cut must survive")
    assert(out((20L, 0L)) === ((None, true)), "dedup is strictly intra-video")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.design.DesignOps
import graft.dedup.DedupOps
import graft.stats.StatsOps
import graft.glm.TDist

/** ScalaCheck-generated property tests (SURVEY.md §5.4): linearity of
  * convolution, z-score moments, histogram mass conservation, mode
  * membership, MinHash union-min, t-CDF shape. Deterministic seeds so the
  * suite is reproducible.
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .collect { case Some(v) => v }
      .take(n).toSeq

  test("property: convolution is linear — conv(a+b) = conv(a)+conv(b)") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(12, Gen.choose(0L, 3L))
    val kernel = DesignOps.hrfKernelInts(1.0, 6)
    for (Seq(a, b) <- samples(Gen.zip(gen, gen).map(t => Seq(t._1, t._2)), 8)) {
      val df = a.zip(b).zipWithIndex
        .map { case ((av, bv), t) => (t.toLong, av, bv, av + bv) }
        .toDF("t", "a", "b", "ab")
      val out = DesignOps.convolve(df, s, kernel, Seq("a", "b", "ab"), 12)
        .collect()
      out.foreach { r =>
        val lhs = r.getAs[Double]("conv_ab")
        val rhs = r.getAs[Double]("conv_a") + r.getAs[Double]("conv_b")
        assert(math.abs(lhs - rhs) < 1e-9, s"linearity broken at $r")
      }
    }
  }

  test("property: pointer-doubling CC labels equal a union-find oracle") {
    val s = spark
    import s.implicits._
    // random graphs across the density spectrum (sparse chains → near-
    // cliques): labels must equal the component minima a driver-side
    // union-find computes, and rounds must stay within the log budget
    val genGraph = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m,
        Gen.zip(Gen.choose(0L, n.toLong - 1), Gen.choose(0L, n.toLong - 1)))
    } yield edges.filter(e => e._1 != e._2)
    for ((edges, gi) <- samples(genGraph, 6).zipWithIndex if edges.nonEmpty) {
      // union-find oracle
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val parent = scala.collection.mutable.Map(verts.map(v => v -> v): _*)
      def find(v: Long): Long = {
        var r = v
        while (parent(r) != r) r = parent(r)
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = verts.map(v => v -> {
        // component min = min over members sharing the root
        val root = find(v)
        verts.filter(w => find(w) == root).min
      }).toMap
      val (labels, rounds) = DedupOps.ccLabels(edges.toDF("doc_a", "doc_b"))
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"graph $gi: $edges")
      val budget = 64 - java.lang.Long.numberOfLeadingZeros(verts.size.toLong) + 16
      assert(rounds <= budget, s"graph $gi took $rounds rounds")
      // the alternating large-star/small-star path lands the same labels
      val (alt, altRounds) = DedupOps.ccLabelsAlternating(edges.toDF("doc_a", "doc_b"))
      val gotAlt = alt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotAlt === expected, s"alternating, graph $gi: $edges")
      assert(altRounds <= budget * 2, s"alternating graph $gi took $altRounds rounds")
    }
  }

  test("property: zscore has mean ~0 and population sd ~1 per group") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(30, Gen.choose(-100.0, 100.0))
    for ((vs, i) <- samples(gen, 6).zipWithIndex if vs.distinct.size > 1) {
      val df = vs.map(v => (s"g$i", math.rint(v * 100) / 100)).toDF("g", "v")
      val z = StatsOps.zscore(df, "v", Seq("g")).select("z").as[Double].collect()
      val mean = z.sum / z.length
      val sd = math.sqrt(z.map(x => x * x).sum / z.length - mean * mean)
      assert(math.abs(mean) < 1e-8)
      assert(math.abs(sd - 1.0) < 1e-8)
    }
  }

  test("property: histogram bin counts sum to the row count") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(40, Gen.choose(0L, 57L))
    for (vs <- samples(gen, 6)) {
      val df = vs.toDF("c")
      val total = StatsOps.histogram(df, "c", 5L)
        .agg(sum("n")).head().getLong(0)
      assert(total === vs.length.toLong)
    }
  }

  test("property: deterministic mode is a member and a maximizer") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(25, Gen.choose(1, 6))
    for (vs <- samples(gen, 8)) {
      val df = vs.map(v => ("g", v)).toDF("g", "v")
      val m = StatsOps.modeDeterministic(df, Seq("g"), "v").head().getInt(1)
      val counts = vs.groupBy(identity).view.mapValues(_.size).toMap
      assert(counts.contains(m))
      assert(counts(m) === counts.values.max)
      // smallest among maximizers (hmode tie rule)
      assert(m === counts.filter(_._2 == counts.values.max).keys.min)
    }
  }

  test("property: minhash signature of a doc union is the elementwise min") {
    val s = spark
    import s.implicits._
    val word = Gen.choose(1, 40).map(i => s"w$i")
    val gen = Gen.listOfN(12, word)
    for (Seq(a, b) <- samples(Gen.zip(gen, gen).map(t => Seq(t._1, t._2)), 5)) {
      val docs = Seq(
        (1L, a.mkString(" ")), (2L, b.mkString(" ")),
        (3L, (a ++ b).mkString(" ")), // shingle set ⊇ A-shingles ∪ B-shingles
      ).toDF("doc_id", "text")
      val sig = DedupOps
        .minhashSignatures(graft.text.TextOps.shingleHashes(docs, 3), 8)
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(r => r.getAs[Long]("j") -> r.getAs[Long]("mh")).toMap)
        .toMap
      // union contains all of A's and B's shingles plus boundary shingles →
      // its min can only be ≤ both
      for (j <- 0L until 8L) {
        assert(sig(3L)(j) <= math.min(sig(1L)(j), sig(2L)(j)))
      }
    }
  }

  test("property: two-sided p decreases as |t| grows; p(0) = 1") {
    for (df <- Seq(1.0, 5.0, 30.0, 200.0)) {
      assert(TDist.pTwoSided(0.0, df) === 1.0)
      val ts = Seq(0.0, 0.5, 1.0, 2.0, 4.0, 8.0)
      val ps = ts.map(t => TDist.pTwoSided(t, df))
      ps.zip(ps.tail).foreach { case (hi, lo) => assert(lo < hi) }
      // df=1 is Cauchy: p(|t|=8) ≈ 0.079 — heavy tails are correct
      assert(ps.last > 0.0 && ps.last < 0.1)
    }
  }

  test("property: series_slots + dot_slots equal a BigInt reference, any partitioning") {
    val s = spark
    import s.implicits._
    import graft.functions.SeriesSlots.{dot_slots, series_slots}
    import org.apache.spark.sql.functions.typedlit
    val n = 12
    val rowsGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(-2L, n + 1L), Gen.choose(-99999L, 99999L))) // incl. out-of-range t
    val wGen = Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
    for ((rows, w) <- samples(Gen.zip(rowsGen, wGen), 6)) {
      val ref = {
        val acc = Array.fill(n)(BigInt(0))
        rows.foreach { case (t, y) => if (t >= 0 && t < n) acc(t.toInt) += y }
        acc.zip(w).map { case (a, b) => a * b }.sum
      }
      val df = rows.map { case (t, y) => ("g", t, y) }.toDF("g", "t", "y").repartition(5)
      val out = df.groupBy("g")
        .agg(series_slots(col("t"), col("y"), n).as("ys"))
        .select(dot_slots(col("ys"), typedlit(w)).as("d"))
        .head().getLong(0)
      assert(BigInt(out) === ref)
    }
  }

  test("property: native segment/chunk/dedup kernels equal the HOF spec forms on random docs") {
    import graft.text.CurationOps
    val s = spark
    import s.implicits._
    // small vocab forces intra-doc repeats; occasional empty tokens via
    // "" entries exercise the double-space framing path
    val word = Gen.frequency((8, Gen.choose(1, 6).map(i => s"w$i")), (1, Gen.const("")))
    val doc = Gen.choose(1, 24).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val docsGen = Gen.listOfN(12, doc)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(df.columns.map(col): _*).collect().map(_.toString).toSeq
    for (texts <- samples(docsGen, 6)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      for (st <- Seq(1, 2, 5)) {
        assert(rows(CurationOps.segmentRelation(docs, st))
          == rows(CurationOps.segmentRelationSpec(docs, st)), s"segments st=$st: $texts")
        assert(rows(CurationOps.intraDocDedup(docs, st))
          == rows(CurationOps.intraDocDedupSpec(docs, st)), s"dedup st=$st: $texts")
      }
      for ((w, st) <- Seq((3, 2), (4, 4), (6, 1)))
        assert(rows(CurationOps.chunk(docs, w, st))
          == rows(CurationOps.chunkSpec(docs, w, st)), s"chunk w=$w st=$st: $texts")
    }
  }

  test("property: trilinear resample reproduces random linear fields under random dyadic affines") {
    import graft.image.ImageOps
    val s = spark
    import s.implicits._
    val gen = for {
      den <- Gen.oneOf(2L, 4L)
      a <- Gen.choose(1L, 3L) // diagonal scale numerator
      bn <- Gen.choose(0L, den - 1) // sub-voxel shift numerator
      cx <- Gen.choose(1, 5); cy <- Gen.choose(1, 5); cz <- Gen.choose(1, 5)
    } yield (den, a, bn, cx, cy, cz)
    for ((den, a, bn, cx, cy, cz) <- samples(gen, 8)) {
      // v = cx·x + cy·y + cz·z scaled to keep 2-decimal exactness
      val g = (for { x <- 0 to 3; y <- 0 to 3; z <- 0 to 3 }
        yield (x, y, z, 0, BigDecimal(cx * x + cy * y + cz * z)))
        .toDF("x", "y", "z", "label", "value_dec")
        .withColumn("value_dec", col("value_dec").cast("decimal(18,2)"))
      val out = ImageOps.resampleAffineTrilinear(s, g,
          Array(Array(a, 0L, 0L), Array(0L, a, 0L), Array(0L, 0L, a)),
          Array(bn, bn, bn), den, (4, 4, 4))
        .collect()
      // interior-only: every emitted cell must equal the field AT the
      // exact rational source point (trilinear is exact on linear fields)
      out.foreach { r =>
        val (x, y, z, v) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3))
        def src(o: Int) = (a * o + bn).toDouble / den
        val expect = cx * src(x) + cy * src(y) + cz * src(z)
        assert(math.abs(v - expect) < 1e-9,
          s"den=$den a=$a b=$bn cell=($x,$y,$z): $v != $expect")
      }
      assert(out.nonEmpty, s"den=$den a=$a b=$bn produced no interior cells")
    }
  }

  test("property: simhash / shingle / minhash-band kernels equal spec forms on random docs") {
    import graft.functions.TextExprs
    import graft.text.TextOps
    val s = spark
    import s.implicits._
    // empty tokens AND leading/trailing spaces — the framing class the
    // curation sweep proved productive
    val word = Gen.frequency((8, Gen.choose(1, 7).map(i => s"w$i")), (1, Gen.const("")))
    val doc = Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val docsGen = Gen.listOfN(10, doc)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    for (texts <- samples(docsGen, 5)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      assert(rows(graft.dedup.DedupOps.simhash(docs))
        == rows(graft.dedup.DedupOps.simhashViaExplode(docs)), s"simhash: $texts")
      for (k <- Seq(1, 2, 3)) {
        val native = docs.select(col("doc_id"),
          explode(TextExprs.shingle_hash_set(col("text"), k)).as("h"))
        val hof = docs
          .withColumn("__th", expr(TextOps.tokenHashArrayExpr))
          .select(col("doc_id"), explode(expr(TextOps.shingleHashExpr(k))).as("h"))
          .distinct()
        assert(rows(native) == rows(hof), s"shingle_hash_set k=$k: $texts")
      }
      assert(rows(docs.select(col("doc_id"),
          explode(TextExprs.term_counts(col("text"))).as("tc"))
          .select(col("doc_id"), col("tc.term"), col("tc.c")))
        == rows(docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).cast("long").as("c"))),
        s"term_counts: $texts")
      val specBands = graft.dedup.DedupOps
        .lshBands(graft.dedup.DedupOps.minhashSignatures(
          TextOps.shingleHashes(docs, 2), 8), 2)
        .select(col("doc_id"), col("band"), col("bkey"))
      val nativeBands = docs
        .select(col("doc_id"), TextExprs.shingle_hash_set(col("text"), 2).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"),
          posexplode(TextExprs.lsh_band_keys(TextExprs.min_hash_sig(col("sh"), 8), 2)))
        .select(col("doc_id"), col("pos").cast("long").as("band"), col("col").as("bkey"))
      assert(rows(nativeBands) == rows(specBands), s"minhash bands: $texts")
    }
  }

  test("property: dsir bigram buckets (native) equal the HOF spec form on random docs") {
    import graft.text.{CurationOps, TextOps}
    import graft.functions.TextExprs
    val s = spark
    import s.implicits._
    val word = Gen.frequency((8, Gen.choose(1, 6).map(i => s"w$i")), (1, Gen.const("")))
    val doc = Gen.choose(1, 24).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val docsGen = Gen.listOfN(12, doc)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(df.columns.map(col): _*).collect().map(_.toString).toSeq
    for (texts <- samples(docsGen, 6)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      for (b <- Seq(16, 512)) {
        val native = docs.select(col("doc_id"),
          transform(TextExprs.shingle_hashes(col("text"), 2), h => h % b).as("f"))
        val hof = docs
          .selectExpr("doc_id", s"${TextOps.tokenHashArrayExpr} AS __th")
          .selectExpr("doc_id", s"${CurationOps.dsirBucketsExpr(b)} AS f")
        assert(rows(native) == rows(hof), s"dsir buckets b=$b: $texts")
      }
      // dsirWeights end-to-end stays finite and partition-invariant on
      // random framing-heavy docs (empty tokens, 1-token docs)
      val lang = docs.withColumn("lang",
        when(col("doc_id") % 2 === 0, "en").otherwise("xx"))
      val a = CurationOps.dsirWeights(lang, col("lang") === "en", 64)
        .orderBy("doc_id").collect().map(_.toString).toSeq
      val b2 = CurationOps.dsirWeights(lang.repartition(5), col("lang") === "en", 64)
        .orderBy("doc_id").collect().map(_.toString).toSeq
      assert(a == b2, s"dsirWeights partition-variance: $texts")
    }
  }
}

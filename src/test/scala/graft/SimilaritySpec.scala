package graft

import org.apache.spark.sql.functions._
import graft.similarity.SimilarityOps

class SimilaritySpec extends SparkSpec {

  private def emb(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("cosineTopK ranks by exact cosine with deterministic ties") {
    // q = [1,0]; cos with [1,0]=1 (excluded, self), [0.8,0.6]=0.8, [0,1]=0, [-1,0]=-1
    val d = emb(
      0L -> Seq(1f, 0f),
      1L -> Seq(0.8f, 0.6f),
      2L -> Seq(0f, 1f),
      3L -> Seq(-1f, 0f),
    )
    val r = SimilarityOps.cosineTopK(d, col("vec_id") === 0, k = 3)
      .orderBy("rank").collect()
    assert(r.map(_.getLong(2)).toSeq === Seq(1L, 2L, 3L))
    assert(math.abs(r(0).getDouble(3) - 0.8) < 1e-6)
    assert(r(1).getDouble(3) === 0.0)
    assert(r(2).getDouble(3) === -1.0)
  }

  test("sign-LSH bucket packs coordinate signs into bits") {
    val d = emb(0L -> Seq(1f, -1f, 1f, 0f, 0f, 0f, 0f, 0f))
    val b = SimilarityOps.prepared(d)
      .selectExpr(SimilarityOps.signBucketExpr("v", 8)).head().getLong(0)
    assert(b === (1L | (1L << 2))) // bits 0 and 2 set, bit 1 negative, rest zero
  }

  test("lshTopK only returns same-bucket neighbors") {
    val d = emb(
      0L -> Seq(1f, 1f),   // bucket 3
      1L -> Seq(2f, 3f),   // bucket 3
      2L -> Seq(-1f, 1f),  // bucket 2 — invisible to query 0
    )
    val r = SimilarityOps.lshTopK(d, col("vec_id") === 0, k = 5, nBits = 2).collect()
    assert(r.map(_.getLong(2)).toSet === Set(1L))
  }

  test("cosineDupPairs finds high-cosine same-bucket pairs once (a < b)") {
    val d = emb(
      0L -> Seq(1f, 0.1f),
      1L -> Seq(2f, 0.2f), // parallel to 0 → cosine 1
      2L -> Seq(0.1f, 1f), // same bucket, near-orthogonal
    )
    val r = SimilarityOps.cosineDupPairs(d, threshold = 0.99, nBits = 2).collect()
    assert(r.length === 1)
    assert((r.head.getLong(0), r.head.getLong(1)) === ((0L, 1L)))
    assert(r.head.getDouble(2) === 1.0)
  }

  test("kmeansCentroids: separated clusters converge to their means") {
    // two tight clusters on orthogonal axes; init = two lowest ids, one in
    // each cluster → after one update the centroids ARE the cluster means
    val d = emb(
      0L -> Seq(1.0f, 0.1f), 1L -> Seq(0.1f, 1.0f),
      2L -> Seq(0.9f, 0.0f), 3L -> Seq(1.1f, 0.2f),
      4L -> Seq(0.0f, 0.9f), 5L -> Seq(0.2f, 1.1f),
    )
    val out = SimilarityOps.kmeansCentroids(d, nCentroids = 2, iters = 2)
      .collect().map(r => (r.getInt(0), r.getInt(2)) -> (r.getLong(1), r.getDouble(3))).toMap
    // cell 0 ← {0,2,3}: mean (1.0, 0.1); cell 1 ← {1,4,5}: mean (0.1, 1.0)
    assert(out((0, 0))._1 === 3L && out((1, 0))._1 === 3L)
    assert(math.abs(out((0, 0))._2 - 1.0) < 1e-5)
    assert(math.abs(out((0, 1))._2 - 0.1) < 1e-5)
    assert(math.abs(out((1, 0))._2 - 0.1) < 1e-5)
    assert(math.abs(out((1, 1))._2 - 1.0) < 1e-5)
  }

  test("kmeansCentroids: partitioning-invariant (exact fixed-point sums)") {
    val s = spark
    import s.implicits._
    val rows = (0L until 60L).map { i =>
      (i, Seq.tabulate(8)(j => (math.sin(i * 0.7 + j) * 0.9).toFloat))
    }
    val d1 = rows.toDF("vec_id", "embedding")
    val d2 = rows.toDF("vec_id", "embedding").repartition(13)
    def key(df: org.apache.spark.sql.DataFrame) = SimilarityOps
      .kmeansCentroids(df, nCentroids = 4, iters = 2)
      .collect().map(r => (r.getInt(0), r.getInt(2), r.getLong(1), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(key(d1) === key(d2))
  }

  test("ivfTopK nProbe=2 recovers a neighbor across the cell boundary") {
    // centroids (lowest ids): v0=(1,0), v1=(0,1). Query v2 sits in cell 0;
    // its TRUE nearest neighbor v3 (cos ≈ 0.939) is assigned to cell 1 —
    // just across the Voronoi boundary — while cell 0's best is only v0
    // (cos ≈ 0.805). nProbe=1 must miss v3; nProbe=2 must find it.
    val d = emb(
      0L -> Seq(1f, 0f),
      1L -> Seq(0f, 1f),
      2L -> Seq(0.8f, 0.59f),  // query: cell 0
      3L -> Seq(0.55f, 0.83f), // true NN of v2: cell 1
    )
    def top1(p: Int) = SimilarityOps
      .ivfTopK(d, col("vec_id") === 2, k = 1, nCentroids = 2, nProbe = p)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    val Array((n1, c1)) = top1(1)
    assert(n1 === 0L, s"nProbe=1 should only see cell 0 (got $n1)")
    assert(c1 < 0.9)
    val Array((n2, c2)) = top1(2)
    assert(n2 === 3L, s"nProbe=2 should recover the cross-cell neighbor (got $n2)")
    assert(c2 > 0.9)
  }

  test("farthest-point init spreads seeds and beats lowest-id on objective") {
    // three tight clusters on orthogonal axes, ids ordered so the three
    // LOWEST ids all fall in cluster A — the geometry lowid init loses
    // seed 0 carries the only y/z lean among the A seeds, so with lowid
    // init BOTH the y-cluster and the z-cluster assign to cell 0, merge
    // into one smeared centroid, and 2 Lloyd rounds cannot unmerge them
    // (cell 2 even empties out) — while farthest-point seeds one per
    // cluster and lands the proper 3-cluster solution
    val rows: Seq[(Long, Seq[Float])] =
      Seq[(Long, Seq[Float])](
        0L -> Seq(1.00f, 0.03f, 0.03f), 1L -> Seq(0.98f, 0.00f, 0.00f),
        2L -> Seq(1.02f, 0.00f, 0.00f), 3L -> Seq(1.00f, 0.01f, 0.00f),
        4L -> Seq(0.02f, 1.00f, 0.0f), 5L -> Seq(0.00f, 0.97f, 0.02f),
        6L -> Seq(0.01f, 1.03f, 0.01f),
        7L -> Seq(0.0f, 0.02f, 1.00f), 8L -> Seq(0.02f, 0.0f, 0.98f),
        9L -> Seq(0.01f, 0.01f, 1.02f),
      )
    val d = emb(rows: _*)
    // seeds: one per cluster (0 → then the most remote → then the other)
    val seeds = SimilarityOps.farthestPointInit(d, 3).map(_._1)
    assert(seeds.head === 0L)
    val cluster = (id: Long) => if (id <= 3) 0 else if (id <= 6) 1 else 2
    assert(seeds.map(cluster).toSet === Set(0, 1, 2))
    // spherical objective Σ(1 − max cosine to a centroid) after 2 rounds
    def objective(init: String): Double = {
      val cents = SimilarityOps.kmeansCentroids(d, nCentroids = 3, iters = 2,
          init = init)
        .collect().map(r => (r.getInt(0), r.getInt(2), r.getDouble(3)))
        .groupBy(_._1).values.map(_.sortBy(_._2).map(_._3).toSeq).toSeq
      def cos(a: Seq[Double], b: Seq[Double]) = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      rows.map { case (_, vf) =>
        val v = vf.map(_.toDouble)
        1.0 - cents.map(c => cos(v, c)).max
      }.sum
    }
    val objFar = objective("farthest")
    val objLow = objective("lowid")
    assert(objFar < objLow,
      s"farthest-point objective $objFar should beat lowest-id $objLow")
  }

  test("kmeansRepresentatives: per-cell medoids come from their own cluster, closest first") {
    // two tight clusters on orthogonal axes; lowid seeds (0, 4) land one
    // per cluster, so after training each cell's representatives must be
    // drawn from its own cluster with the closest-to-centroid first
    val d = emb(
      0L -> Seq(1.00f, 0.00f), 1L -> Seq(0.98f, 0.02f),
      2L -> Seq(1.02f, 0.01f), 3L -> Seq(0.99f, 0.03f),
      4L -> Seq(0.00f, 1.00f), 5L -> Seq(0.02f, 0.97f),
      6L -> Seq(0.01f, 1.03f),
    )
    val reps = SimilarityOps.kmeansRepresentatives(d, nCentroids = 2,
        iters = 2, m = 2)
      .orderBy("cell", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(reps.length === 4)
    val cluster = (id: Long) => if (id <= 3) 0L else 1L
    reps.foreach { case (cell, _, vid, _) => assert(cluster(vid) === cell) }
    // within a cell, rank 1's cosine >= rank 2's
    reps.groupBy(_._1).values.foreach { rs =>
      val s = rs.sortBy(_._2).map(_._4)
      assert(s(0) >= s(1))
    }
  }

  test("farthest-point init fails loudly when k exceeds the corpus size") {
    // exhausting the corpus with chosen.size < k must throw, not spin a
    // driver job per iteration forever (the lowid path degrades to fewer
    // seeds; this path has no such fallback by construction)
    val d = emb(0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.0f, 1.0f))
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.farthestPointInit(d, 5)
    }
    assert(e.getMessage.contains("exceeds corpus size"))
  }

  test("ivfTopKTrained serves the probe from the Lloyd-trained centroids") {
    // two tight clusters; after training the centroids ARE the cluster
    // means, so every query's neighbors come from its own cluster
    val d = emb(
      0L -> Seq(1.0f, 0.1f), 1L -> Seq(0.1f, 1.0f),
      2L -> Seq(0.9f, 0.0f), 3L -> Seq(1.1f, 0.2f),
      4L -> Seq(0.0f, 0.9f), 5L -> Seq(0.2f, 1.1f),
    )
    val out = SimilarityOps
      .ivfTopKTrained(d, col("vec_id") === 0 || col("vec_id") === 1,
        k = 2, nCentroids = 2, iters = 2, nProbe = 1)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(out(0L) === Set(2L, 3L)) // x-cluster neighbors only
    assert(out(1L) === Set(4L, 5L)) // y-cluster neighbors only
    // and the trained path is exactly ivfTopKWith over kmeansCents
    val viaCents = SimilarityOps.ivfTopKWith(d, col("vec_id") === 0, 2,
      SimilarityOps.kmeansCents(d, 2, 2), nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val direct = SimilarityOps.ivfTopKTrained(d, col("vec_id") === 0, 2, 2, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(viaCents.sortBy(_._2) === direct.sortBy(_._2))
  }

  test("vec_sum_fixed: exact element-wise sums through partial buffers") {
    val s = spark
    import s.implicits._
    import graft.functions.VecSumFixed.vec_sum_fixed
    val df = Seq(
      (1L, Seq(0.5, -0.5, 1.25)),
      (1L, Seq(0.5, -0.5, 1.25)),
      (1L, Seq(-1.0, 2.0, 0.0)),
      (2L, Seq(10.0, -10.0, 0.125)),
    ).toDF("k", "v").repartition(5)
    val out = df.groupBy("k").agg(vec_sum_fixed(col("v"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // per-element: round(x*8) summed — 0.5*8=4, 1.25*8=10, -1*8=-8, 2*8=16
    assert(out(1L) === Seq(4L + 4L - 8L, -4L - 4L + 16L, 10L + 10L + 0L))
    assert(out(2L) === Seq(80L, -80L, 1L))
  }

  test("int8Quantize: hand codebook, constant-dim guard, half-step error bound") {
    // dim0 spans [0,1] → code = round(x*255); dim1 is constant → code 0
    val d = emb(
      0L -> Seq(0f, 5f),
      1L -> Seq(1f, 5f),
      2L -> Seq(0.5f, 5f),
    )
    val r = SimilarityOps.int8Quantize(d).orderBy("vec_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    // codes: vec0 (0,0) sum 0; vec1 (255,0) sum 255; vec2 (round(127.5+0.5)=128, 0)
    assert(r.map(x => (x._1, x._2)).toSeq === Seq((0L, 0L), (1L, 255L), (2L, 128L)))
    // max reconstruction error ≤ half a quantization step (1/255/2 ≈
    // 0.0019608); +5e-7 because the emitted err is rounded to 6 dp
    r.foreach(x => assert(x._3 <= 0.5 / 255 + 5e-7, s"vec ${x._1} err ${x._3}"))
    assert(r(0)._3 === 0.0) // endpoints are representable exactly
    assert(r(1)._3 === 0.0)
  }

  test("embeddingAdmission: full probe equals brute-force threshold admission") {
    val s = spark
    val e = s.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val pred = col("vec_id") < 20
    // nProbe = nCentroids: every cell probed → verdicts must equal the
    // exhaustive check of every arrival against every standing vector
    val got = SimilarityOps
      .embeddingAdmission(e, pred, nCentroids = 8, nProbe = 8, threshold = 0.35)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getBoolean(2)))
    val v = e.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val corpusIds = v.keys.filter(_ >= 20).toSeq.sorted
    val want = v.keys.filter(_ < 20).toSeq.sorted.map { id =>
      val hits = corpusIds.filter(c => cos(v(id), v(c)) >= 0.35)
      (id, if (hits.isEmpty) -1L else hits.min, hits.isEmpty)
    }
    assert(got.toSeq === want)
    // both verdicts represented at this threshold, else the test is vacuous
    assert(got.exists(_._3) && got.exists(!_._3))
  }

  test("int8ServeTopK: asymmetric serving tracks exact cosine top-k (recall + score error)") {
    val s = spark
    val e = s.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val k = 3
    // nProbe = nCentroids: every cell probed, so the ONLY difference from
    // exact brute force is the int8 reconstruction of the corpus side
    val served = SimilarityOps
      .int8ServeTopK(e, col("vec_id") < 20, k, nCentroids = 8, nProbe = 8)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    val exact = SimilarityOps.cosineTopK(e, col("vec_id") < 20, k)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    val servedSet = served.map(_._1).toSet
    val recall = exact.count(x => servedSet(x._1)).toDouble / exact.length
    assert(recall >= 0.8, s"recall@$k vs exact = $recall")
    // every agreeing pair's served score sits within the quantization
    // error envelope of the exact cosine
    val exactScore = exact.toMap
    served.filter(x => exactScore.contains(x._1)).foreach { case (pair, sc) =>
      assert(math.abs(sc - exactScore(pair)) < 0.02,
        s"$pair served $sc vs exact ${exactScore(pair)}")
    }
  }

  test("pqServeTopK: ADC serving tracks exact L2 top-k (recall)") {
    val s = spark
    val e = s.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val k = 3
    // nProbe = nCentroids: every coarse cell probed, so the ONLY
    // difference from exact L2 brute force is the PQ reconstruction
    val served = SimilarityOps
      .pqServeTopK(e, col("vec_id") < 20, k, m = 8, ksub = 8, iters = 2,
        nCentroids = 8, nProbe = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // exact L2 top-k, driver-side brute force
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val byId = vecs.toMap
    val exact = vecs.filter(_._1 < 20).flatMap { case (q, qv) =>
      vecs.filter(_._1 != q)
        .map { case (c, cv) =>
          var d = 0.0; var i = 0
          while (i < qv.length) { val t = qv(i) - cv(i); d += t * t; i += 1 }
          (c, d)
        }
        .sortBy { case (c, d) => (d, c) }.take(k)
        .map { case (c, _) => (q, c) }
    }
    assert(byId.size >= 100)
    val servedSet = served.toSet
    val recall = exact.count(servedSet).toDouble / exact.length
    // this corpus is near-iid random — the WORST case for PQ (neighbors
    // nearly equidistant, reconstruction error dominates): a driver-side
    // numpy replication of the identical training/codes/ADC gives exactly
    // 0.15 here. The pin is "far above chance" (random recall@3 ≈ 0.006);
    // the clustered-corpus test below pins the high-recall regime.
    assert(recall >= 0.1, s"recall@$k vs exact L2 = $recall")
  }

  test("pqServeTopK: clustered corpus — every served neighbor is in-cluster") {
    // 8 tight clusters × 10 members; vec_ids 0..7 are one member per
    // cluster (cluster = id % 8), so lowest-id init seeds every cluster.
    // Within a tight cluster PQ codes coincide, so WITHIN-cluster ranking
    // is tie-broken by id (quantized distances can't see 0.01 jitter —
    // inherent to PQ, not a defect); what PQ must get right is the
    // CLUSTER: all k served neighbors come from the query's own cluster,
    // and the in-cluster tie-break is the deterministic lowest-id one.
    val vecs = for (c <- 0 until 8; i <- 0 until 10) yield {
      val id = (c + 8 * i).toLong
      id -> Seq.tabulate(64) { j =>
        (((c * 37 + j * 11) % 13 - 6) / 3.0 +
          ((i * 7 + j) % 5 - 2) * 0.01).toFloat
      }
    }
    val e = emb(vecs.sortBy(_._1): _*)
    val served = SimilarityOps
      .pqServeTopK(e, col("vec_id") < 8, k = 3, m = 8, ksub = 8, iters = 2,
        nCentroids = 8, nProbe = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(served.length === 8 * 3)
    served.foreach { case (q, _, c) =>
      assert(c % 8 === q, s"query $q served out-of-cluster neighbor $c")
    }
    // identical codes ⇒ identical ADC distance ⇒ rank order is the
    // lowest-id members of the cluster after the query itself
    for (q <- 0L until 8L) {
      val mine = served.filter(_._1 == q).sortBy(_._2).map(_._3)
      assert(mine === Seq(q + 8, q + 16, q + 24), s"query $q got $mine")
    }
  }

  test("ivfadcTopK: residual PQ ≥ raw-vector PQ recall at equal bytes on a clustered corpus") {
    // 8 far-apart clusters × 10 members with LARGE within-cluster
    // structure: raw-PQ's 8-cells-per-sub budget is spent separating the
    // cluster offsets, while IVFADC re-centers every vector at its coarse
    // centroid and spends the SAME bits on the within-cluster geometry
    // that actually ranks neighbors — the Jégou et al. motivation,
    // reproduced as a recall pin at equal code bytes (m=8, ksub=8).
    val vecs = for (c <- 0 until 8; i <- 0 until 10) yield {
      val id = (c + 8 * i).toLong
      id -> Seq.tabulate(64) { j =>
        (((c * 37 + j * 11) % 13 - 6) * 2.0 +
          ((i * 31 + c * 17 + j * 13 + i * j * 7) % 23 - 11) * 0.08).toFloat
      }
    }
    val e = emb(vecs.sortBy(_._1): _*)
    val k = 3
    val byId = vecs.toMap
    val exact = (0L until 8L).map { q =>
      val qv = byId(q).map(_.toDouble)
      q -> vecs.filter(_._1 != q).map { case (cid, cv) =>
        var d = 0.0; var i = 0
        while (i < 64) { val t = qv(i) - cv(i).toDouble; d += t * t; i += 1 }
        (cid, d)
      }.sortBy { case (cid, d) => (d, cid) }.take(k).map(_._1).toSet
    }.toMap
    def recall(rows: Array[org.apache.spark.sql.Row]): Double =
      rows.count(r => exact(r.getLong(0)).contains(r.getLong(2))).toDouble /
        (8 * k)
    val pq = recall(SimilarityOps
      .pqServeTopK(e, col("vec_id") < 8, k, m = 8, ksub = 8, iters = 2,
        nCentroids = 8, nProbe = 8).collect())
    val ad = recall(SimilarityOps
      .ivfadcTopK(e, col("vec_id") < 8, k, m = 8, ksub = 8, iters = 2,
        nCentroids = 8, nProbe = 8).collect())
    assert(ad >= pq, s"ivfadc recall $ad < raw-pq recall $pq")
    // chance recall@3 on 79 candidates is ~0.04; the pin is "far above
    // chance AND never below raw PQ" — the equal-bytes comparison above is
    // the substantive Jégou-motivation claim
    assert(ad >= 0.4, s"ivfadc recall $ad too close to chance")
  }

  test("semDedup: tight clusters collapse to their lowest-id representative") {
    // 8 tight clusters × 10 members (jitter 1e-3 ⇒ in-cluster cosines
    // ≈ 1); lowid k-means seeds one centroid per cluster, so every
    // member except the cluster's lowest id must be dropped AGAINST that
    // lowest id, and the 8 representatives all keep
    val vecs = for (c <- 0 until 8; i <- 0 until 10) yield {
      val id = (c + 8 * i).toLong
      id -> Seq.tabulate(64) { j =>
        (((c * 37 + j * 11) % 13 - 6) / 3.0 +
          ((i * 7 + j) % 5 - 2) * 0.001).toFloat
      }
    }
    val out = SimilarityOps
      .semDedup(emb(vecs.sortBy(_._1): _*), nCentroids = 8, iters = 2,
        threshold = 0.999)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) -1L else r.getLong(2)), r.getBoolean(3))).toMap
    assert(out.size === 80)
    for (c <- 0L until 8L) assert(out(c) === ((-1L, true)), s"rep $c")
    for ((id, _) <- vecs; if id >= 8)
      assert(out(id) === ((id % 8, false)), s"member $id")
  }

  test("pq training is partitioning-invariant (exact fixed-point sums)") {
    val s = spark
    val e = s.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def key(df: org.apache.spark.sql.DataFrame) = df.orderBy("sub", "cell", "j")
      .collect().map(_.toString).toSeq
    val a = key(SimilarityOps.pqCentroidsRelation(e, m = 4, ksub = 8, iters = 2))
    val b = key(SimilarityOps.pqCentroidsRelation(e.repartition(7), m = 4, ksub = 8, iters = 2))
    assert(a === b && a.nonEmpty)
  }

  test("int8Quantize codebook is global: partitioning does not change codes") {
    val vecs = (0 until 40).map(i =>
      i.toLong -> Seq.tabulate(8)(j => ((i * 31 + j * 17) % 97 / 96.0f) - 0.5f))
    val one = SimilarityOps.int8Quantize(emb(vecs: _*).repartition(1))
      .orderBy("vec_id").collect().toSeq
    val many = SimilarityOps.int8Quantize(emb(vecs: _*).repartition(7))
      .orderBy("vec_id").collect().toSeq
    assert(one === many)
  }

  test("standing vector index: probe verdicts ≡ embeddingAdmission, bit for bit") {
    val s = spark
    val e = s.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val name = "graft_vec_spec_probe"
    val loc = java.nio.file.Files.createTempDirectory("graft-vecidx").toString
    try {
      SimilarityOps.buildVecIndex(s, e.filter(col("vec_id") >= 20), name,
        nCentroids = 8, location = loc, datasetTag = "spec")
      // same centroid pick (lowest corpus ids), same probe cells, same
      // exact cosines — the index path must change NOTHING but cost shape
      val got = SimilarityOps
        .probeVecIndex(s, e.filter(col("vec_id") < 20), name,
          nProbe = 2, threshold = 0.35)
        .orderBy("vec_id").collect().toSeq
      val want = SimilarityOps
        .embeddingAdmission(e, col("vec_id") < 20,
          nCentroids = 8, nProbe = 2, threshold = 0.35)
        .orderBy("vec_id").collect().toSeq
      assert(got === want)
      assert(got.exists(_.getBoolean(2)) && got.exists(!_.getBoolean(2)))
      // scale shape: the index side is a BUCKETED scan with the probed-cell
      // IN filter applied (bucket pruning reports SelectedBucketsCount) and
      // the batch broadcasts — no exchange ever touches the corpus side
      val plan = SimilarityOps
        .probeVecIndex(s, e.filter(col("vec_id") < 20), name,
          nProbe = 2, threshold = 0.35)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"), plan.take(2000))
      assert(plan.contains("BroadcastExchange"))
    } finally Seq("cells", "cents", "meta")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
  }

  test("standing vector index: appended batch probes exactly like a rebuilt index") {
    val s = spark
    val e = s.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val a = e.filter(col("vec_id") >= 20 && col("vec_id") < 200)
    val b = e.filter(col("vec_id") >= 200 && col("vec_id") < 260)
    val probe = e.filter(col("vec_id") < 20)
    val n1 = "graft_vec_spec_app"
    val n2 = "graft_vec_spec_full"
    val l1 = java.nio.file.Files.createTempDirectory("graft-vecidx-a").toString
    val l2 = java.nio.file.Files.createTempDirectory("graft-vecidx-f").toString
    try {
      SimilarityOps.buildVecIndex(s, a, n1, nCentroids = 8, location = l1,
        datasetTag = "spec")
      SimilarityOps.appendToVecIndex(s, b, n1)
      // the rebuilt index picks the same lowest-id centroids (b's ids are
      // all above a's), so append ≡ rebuild must hold bit for bit
      SimilarityOps.buildVecIndex(s, a.unionByName(b), n2, nCentroids = 8,
        location = l2, datasetTag = "spec")
      val viaAppend = SimilarityOps
        .probeVecIndex(s, probe, n1, nProbe = 2, threshold = 0.35)
        .orderBy("vec_id").collect().toSeq
      val viaRebuild = SimilarityOps
        .probeVecIndex(s, probe, n2, nProbe = 2, threshold = 0.35)
        .orderBy("vec_id").collect().toSeq
      assert(viaAppend === viaRebuild)
    } finally for (n <- Seq(n1, n2); t <- Seq("cells", "cents", "meta"))
      s.sql(s"DROP TABLE IF EXISTS ${n}_$t")
  }
  test("q118 cluster quota: every cell capped, ranks contiguous, deterministic") {
    val out = graft.queries.Similarity.clusterQuotaSample(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val byCell = out.groupBy(_._1)
    byCell.foreach { case (cell, rows) =>
      assert(rows.length <= 20, s"cell $cell over quota: ${rows.length}")
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq,
        s"cell $cell ranks not contiguous")
    }
    // pure function of (vec_id, centroids): a second run is identical
    val again = graft.queries.Similarity.clusterQuotaSample(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("contrastivePairs: a confusable different-label vector is the top hard negative") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // anchor 0 (label 0); 10 is a same-label near-copy (pos rank 1);
    // 20 (label 1) sits CLOSER to the anchor than any other label-0
    // vector — plain top-k would rank it globally first, contrastive
    // mining must surface it as the rank-1 NEGATIVE with its label
    val rows = Seq(
      (0L, Seq(1f, 0f, 0f), 0),
      (10L, Seq(0.9f, 0.1f, 0f), 0),
      (11L, Seq(0f, 1f, 0f), 0),
      (20L, Seq(0.99f, 0.01f, 0f), 1),
      (21L, Seq(0f, 0f, 1f), 1),
    ).toDF("vec_id", "embedding", "label")
    val out = graft.similarity.SimilarityOps
      .contrastivePairs(rows, col("vec_id") === 0, k = 2)
      .collect()
      .map(r => (r.getString(1), r.getLong(2)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(("neg", 1L)) == ((20L, 1L)), "hard negative must lead the neg list")
    assert(out(("pos", 1L)) == ((10L, 0L)))
    assert(out(("pos", 2L)) == ((11L, 0L)))
    assert(out(("neg", 2L)) == ((21L, 1L)))
    assert(out.size == 4)
  }

  test("annRecall (q135): complete frame, bounded, monotone in nprobe, exact on a planted gap") {
    val rows = graft.queries.Similarity.annRecall(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rows.size == 20) // 10 queries x nprobe in {1, 2}, zero-hit rows included
    rows.foreach { case ((_, _), (h, rec)) =>
      assert(h >= 0L && h <= 3L && rec >= 0.0 && rec <= 1.0)
    }
    // probing MORE cells can only add exact neighbors to the candidate set
    (0L until 10L).foreach { q =>
      assert(rows((2, q))._1 >= rows((1, q))._1, s"recall must be monotone in nprobe (query $q)")
    }
  }

  test("annNdcg (q139): exact Scala replay, bounds, monotone in nprobe") {
    import org.apache.spark.sql.functions._
    val k = 3
    val emb = graft.util.Tables.embeddings(spark, sf001)
    val pred = col("vec_id") < 10
    // replay the fixed-point DCG from the two public relations q139 composes
    val grade = graft.similarity.SimilarityOps.cosineTopK(emb, pred, k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (k + 1 - r.getLong(1))).toMap
    def dcgFp(np: Int): Map[Long, Long] = graft.similarity.SimilarityOps
      .ivfTopK(emb, pred, k, nCentroids = 16, nProbe = np)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map { r =>
        val g = grade.getOrElse((r.getLong(0), r.getLong(2)), 0L)
        val v = g / (math.log(r.getLong(1) + 1.0) / math.log(2.0)) * 1e6
        BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum).toMap
    val idcg = (1 to k).map(i =>
      math.rint((k + 1 - i) / (math.log(i + 1.0) / math.log(2.0)) * 1e6).toLong).sum
    val want = (1 to 2).flatMap { np =>
      val d = dcgFp(np)
      (0L until 10L).map { q =>
        val fp = d.getOrElse(q, 0L)
        (np, q) -> ((fp, BigDecimal(fp.toDouble / idcg)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.toMap
    val got = graft.queries.Similarity.annNdcg(spark, sf001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.size == 20)
    assert(got == want, "q139 must equal the per-position fixed-point replay")
    got.foreach { case (_, (_, nd)) => assert(nd >= 0.0 && nd <= 1.0) }
    // a superset candidate pool can only improve each served position's grade
    (0L until 10L).foreach { q =>
      assert(got((2, q))._1 >= got((1, q))._1, s"nDCG monotone in nprobe (query $q)")
    }
  }

  test("q174: same-direction slices cos 1, inverted -1, empty slice NULL; shares shift") {
    val s = spark
    import s.implicits._
    // cell 0: ref 2× e1, cur 3× 2e1 (same direction, larger magnitude)
    // cell 1: ref e2 vs cur −e2 (inverted); cell 2: ref-only
    val assigned = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0), 0L, true),
      (2L, Seq(1.0, 0.0, 0.0, 0.0), 0L, true),
      (3L, Seq(2.0, 0.0, 0.0, 0.0), 0L, false),
      (4L, Seq(2.0, 0.0, 0.0, 0.0), 0L, false),
      (5L, Seq(2.0, 0.0, 0.0, 0.0), 0L, false),
      (6L, Seq(0.0, 1.0, 0.0, 0.0), 1L, true),
      (7L, Seq(0.0, -1.0, 0.0, 0.0), 1L, false),
      (8L, Seq(0.0, 0.0, 1.0, 0.0), 2L, true),
    ).toDF("vec_id", "v", "cell", "is_ref")
    val out = graft.queries.Similarity.embeddingDriftCore(assigned)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(out.keySet === Set(0L, 1L, 2L))
    assert(out(0L) === ((2L, 3L, 0.25, Some(1.0))), s"cell 0: ${out(0L)}")
    assert(out(1L) === ((1L, 1L, 0.0, Some(-1.0))), s"cell 1: ${out(1L)}")
    assert(out(2L) === ((1L, 0L, -0.25, None)), s"cell 2: ${out(2L)}")
  }

  test("q181: sign-bit packing, word boundary, and exact Hamming ranking") {
    // 34 dims: positives at 0, 2, and 33 — bit 33 must land in WORD 1
    // (bit index 1), proving the 32-bit word split; zeros pack as 0 bits.
    val high = Seq.tabulate(34)(i =>
      if (i == 0 || i == 2 || i == 33) 1f else if (i % 2 == 0) 0f else -1f)
    val d = emb(
      0L -> high,                                    // code [5, 2]
      1L -> high.updated(33, -1f),                   // hamming 1 from q
      2L -> high.updated(0, -1f).updated(2, -1f),    // hamming 2
      3L -> Seq.tabulate(34)(i => if (i % 2 == 0 && i != 0 && i != 2 || i == 33) 1f else -1f), // far
    )
    val r = SimilarityOps.binaryHammingRecall(d, col("vec_id") === 0, k = 3)
      .orderBy("rank").collect()
    assert(r.map(_.getLong(2)).toSeq === Seq(1L, 2L, 3L))
    // v3: word0 symmetric diff = {0,2} vs {4,6,..,30} = 2 + 14; word1 =
    // bit 0 (i=32) only — 17 total
    assert(r.map(_.getLong(3)).toSeq === Seq(1L, 2L, 17L))
  }

  test("q191: re-rank restores exact order WITHIN the shortlist; the c knob gates it") {
    // q181's failure fixture: v1 is cosine-nearest but Hamming-farther
    val d = emb(
      0L -> Seq(1f, 0.1f),
      1L -> Seq(1f, -0.1f),
      2L -> Seq(0.1f, 1f),
    )
    // c = 2: both candidates shortlist → exact re-rank puts v1 first
    val wide = SimilarityOps.binaryRerankRecall(d, col("vec_id") === 0, k = 1, c = 2)
      .collect()
    assert(wide.head.getLong(2) === 1L && wide.head.getDouble(5) === 1.0,
      s"re-rank must recover the cosine-nearest: ${wide.head}")
    // c = 1: the shortlist is Hamming-only → v2 survives, recall 0
    val tight = SimilarityOps.binaryRerankRecall(d, col("vec_id") === 0, k = 1, c = 1)
      .collect()
    assert(tight.head.getLong(2) === 2L && tight.head.getDouble(5) === 0.0,
      s"a too-tight shortlist cannot be repaired by re-ranking: ${tight.head}")
  }

  test("q216: a prefix-dominant distractor flips the truncated ranking; full dim recovers it") {
    // query 0 = e1. Full-dim nearest is v1 (cos 0.6); the distractor v2
    // has a big prefix component but a huge tail (full cos ≈ 0.287),
    // yet truncated to its first 2 dims it reads cos = 1.0 — the exact
    // failure mode MRL eval exists to measure.
    val d = emb(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0.6f, 0.8f, 0f, 0f),
      2L -> Seq(0.9f, 0f, 3f, 0f),
    )
    val out = graft.queries.Similarity
      .mrlRecallCore(d, Seq(2, 4), col("vec_id") === 0, k = 1)
      .collect().map(r => r.getInt(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(2) === ((0L, 0.0)), s"prefix-2 serves the distractor: $out")
    assert(out(4) === ((1L, 1.0)), s"full dim recovers the true neighbor: $out")
    // zero-recall queries still get a row (the frame left join)
    assert(out.keySet === Set(2, 4))
  }

  test("q181: recall@k counts Hamming hits against the exact cosine top-k") {
    // q=[1,0.1]: exact top-1 is v1 (cos≈0.98) but its sign pattern differs
    // in bit 1, while v2 (cos≈0.2) shares q's signs — Hamming picks v2,
    // recall@1 = 0. The 1-bit cut's failure mode, pinned.
    val d = emb(
      0L -> Seq(1f, 0.1f),
      1L -> Seq(1f, -0.1f),
      2L -> Seq(0.1f, 1f),
    )
    val r = SimilarityOps.binaryHammingRecall(d, col("vec_id") === 0, k = 1)
      .collect()
    assert(r.length === 1)
    assert(r.head.getLong(2) === 2L) // hamming neighbor
    assert(r.head.getLong(4) === 0L) // not an exact-cosine hit
    assert(r.head.getDouble(5) === 0.0)
  }
}

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
}

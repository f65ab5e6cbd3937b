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
}

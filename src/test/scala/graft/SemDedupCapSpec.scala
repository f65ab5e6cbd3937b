package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.similarity.SimilarityOps

/** The semDedup cell cap (r11 verdict item 3): cells past `cellCap` split
  * into id-hash sub-buckets plus a per-sub leader pass, bounding the
  * per-cell self-join at size·cap + size·⌈size/cap⌉ instead of size².
  *
  * Pins:
  *  - a mega-cell that is ONE near-dup clique (the boilerplate-page case
  *    the cap exists for) keeps the EXACT uncapped keep set — the leader
  *    rows carry the global lowest id into every sub-bucket;
  *  - a non-binding cap (cap ≥ every cell) is row-for-row identical to the
  *    uncapped operator — the q113 oracle contract;
  *  - the candidate pair relation actually shrinks (the bounded-shuffle
  *    claim, counted, not asserted from the plan).
  */
class SemDedupCapSpec extends SparkSpec {

  /** 200 near-identical vectors (one semantic clique, ids 0-199) plus 8
    * far-away distinct vectors (ids 1000-1007): k-means with k=2 lands the
    * clique in one mega-cell. */
  private lazy val fixture: DataFrame = {
    import spark.implicits._
    val dim = 8
    val clique = (0 until 200).map { i =>
      // tiny id-deterministic jitter: pairwise cosine stays > 0.999
      (i.toLong, Array.tabulate(dim)(d => 1.0 + 0.0001 * ((i * 7 + d) % 5)))
    }
    val distinct = (0 until 8).map { i =>
      (1000L + i, Array.tabulate(dim)(d => if (d == i) -50.0 - 10.0 * i else 1.0))
    }
    (clique ++ distinct).toDF("vec_id", "embedding")
  }

  private def run(cap: Int): DataFrame =
    SimilarityOps.semDedup(fixture, nCentroids = 2, iters = 2,
      threshold = 0.99, cellCap = cap)

  test("clique mega-cell: capped keep set equals uncapped keep set") {
    val uncapped = run(Int.MaxValue).filter(col("keep")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val capped = run(25).filter(col("keep")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(capped === uncapped)
    // the clique collapses to its lowest id; the distinct vectors survive
    assert(uncapped.contains(0L))
    assert(uncapped.intersect((0L until 200L).toSet) === Set(0L))
  }

  test("clique mega-cell: capped dup_of is the clique minimum (leader pass)") {
    val dupOf = run(25).filter(!col("keep"))
      .select("vec_id", "dup_of").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every dropped clique member resolves to the global clique minimum:
    // its sub-bucket's leader row carries id 0's vector into the bucket
    assert(dupOf.nonEmpty)
    assert(dupOf.forall { case (_, d) => d === 0L })
  }

  test("non-binding cap is row-for-row identical to uncapped") {
    val uncapped = run(Int.MaxValue).orderBy("vec_id").collect().toSeq
    val capped = run(100000).orderBy("vec_id").collect().toSeq
    assert(capped === uncapped)
  }

  test("cap bounds the candidate pair relation") {
    val assigned = SimilarityOps.semAssigned(fixture, nCentroids = 2, iters = 2)
    val full = SimilarityOps.semCandidatePairs(assigned, Int.MaxValue).count()
    val capped = SimilarityOps.semCandidatePairs(assigned, 25).count()
    // clique alone: 200·199/2 ≈ 19.9k uncapped pairs; capped = within-bucket
    // (≈ 8·C(25,2) ≈ 2.4k) + vs-leader (≤ 200·8) — well under a third
    assert(full > 15000L, s"fixture lost its mega-cell: $full pairs")
    assert(capped < full / 3, s"cap did not bound pairs: $capped vs $full")
  }
}

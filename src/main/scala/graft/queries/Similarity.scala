package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.similarity.SimilarityOps

/** Similarity-search queries over the `embeddings` table: brute-force cosine
  * top-k, sign-LSH bucketed ANN, and cosine near-dup pairs. Oracle SQL uses
  * the identical left-fold dot product (list order), so cosines match
  * bit-for-bit before the defensive 6-decimal rounding.
  */
object Similarity extends QueryModule {

  /** DuckDB: left-fold dot of two DOUBLE[] expressions in list order. */
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(len($a)), i -> $a[i+1] * $b[i+1])), (acc, x) -> acc + x)"

  private val duckCorpus =
    s"""corpus AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings
       |), normed AS (
       |  SELECT vec_id, v, sqrt(${duckDot("v", "v")}) AS norm FROM corpus
       |)""".stripMargin

  private def duckBucket(v: String): String =
    s"list_sum(list_transform(range(8), k -> CASE WHEN $v[k+1] > 0 THEN (CAST(1 AS BIGINT) << k) ELSE 0 END))"

  // ---- q27: brute-force cosine top-k -------------------------------------

  def cosineTopK(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .cosineTopK(embeddings(s, d), col("vec_id") < 10, k = 5)
      .orderBy("query_id", "rank")

  private val cosineTopKSql =
    s"""WITH $duckCorpus,
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${duckDot("q.v", "c.v")} / (q.norm * c.norm) AS cosine
       |  FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cosine, 6) AS cosine
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  // ---- q28: sign-LSH bucketed ANN ----------------------------------------

  def lshTopK(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .lshTopK(embeddings(s, d), col("vec_id") < 10, k = 3, nBits = 8)
      .orderBy("query_id", "rank")

  private val lshTopKSql =
    s"""WITH $duckCorpus,
       |bucketed AS (
       |  SELECT vec_id, v, norm, ${duckBucket("v")} AS bucket FROM normed
       |),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${duckDot("q.v", "c.v")} / (q.norm * c.norm) AS cosine
       |  FROM bucketed q JOIN bucketed c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cosine, 6) AS cosine
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  // ---- q29: cosine near-dup pairs ----------------------------------------

  def cosinePairs(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .cosineDupPairs(embeddings(s, d), threshold = 0.35, nBits = 8)
      .orderBy("id_a", "id_b")

  private val cosinePairsSql =
    s"""WITH $duckCorpus,
       |bucketed AS (
       |  SELECT vec_id, v, norm, ${duckBucket("v")} AS bucket FROM normed
       |)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(${duckDot("a.v", "b.v")} / (a.norm * b.norm), 6) AS cosine
       |FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE ${duckDot("a.v", "b.v")} / (a.norm * b.norm) >= 0.35
       |ORDER BY id_a, id_b""".stripMargin

  // ---- q49: IVF-cell ANN -------------------------------------------------

  def ivfTopK(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .ivfTopK(embeddings(s, d), col("vec_id") < 10, k = 3, nCentroids = 16)
      .orderBy("query_id", "rank")

  private val ivfTopKSql =
    s"""WITH $duckCorpus,
       |cent AS (
       |  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
       |  FROM normed ORDER BY vec_id LIMIT 16
       |),
       |scoredc AS (
       |  SELECT n.vec_id, n.v, n.norm, c.cent_id,
       |    ${duckDot("n.v", "c.cv")} / (n.norm * c.cnorm) AS cs
       |  FROM normed n CROSS JOIN cent c
       |),
       |assigned AS (
       |  SELECT vec_id, v, norm, cent_id AS cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rn
       |    FROM scoredc) WHERE rn = 1
       |),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${duckDot("q.v", "c.v")} / (q.norm * c.norm) AS cosine
       |  FROM assigned q JOIN assigned c ON c.cell = q.cell AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cosine, 6) AS cosine
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q27_cosine_topk", cosineTopK, Some(cosineTopKSql)),
    Q("q28_lsh_topk", lshTopK, Some(lshTopKSql)),
    Q("q29_cosine_pairs", cosinePairs, Some(cosinePairsSql)),
    Q("q49_ivf_topk", ivfTopK, Some(ivfTopKSql)),
  )
}

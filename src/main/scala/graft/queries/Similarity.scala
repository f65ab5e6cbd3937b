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

  // ---- q74: IVF ANN with nProbe=2 (the recall knob) ----------------------
  // Same coarse quantizer as q49, but each query probes its TWO nearest
  // cells: neighbors just across a Voronoi boundary — invisible to q49 —
  // enter the candidate set. The oracle ranks every (vector, centroid)
  // cosine once and reads rn=1 as the corpus assignment, rn<=2 as the
  // query probe list.

  def ivfNprobe(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .ivfTopK(embeddings(s, d), col("vec_id") < 10, k = 3, nCentroids = 16,
        nProbe = 2)
      .orderBy("query_id", "rank")

  private val ivfNprobeSql =
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
       |rankedc AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rn
       |  FROM scoredc
       |),
       |assigned AS (
       |  SELECT vec_id, v, norm, cent_id AS cell FROM rankedc WHERE rn = 1
       |),
       |qprobe AS (
       |  SELECT vec_id, v, norm, cent_id AS cell FROM rankedc
       |  WHERE rn <= 2 AND vec_id < 10
       |),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${duckDot("q.v", "c.v")} / (q.norm * c.norm) AS cosine
       |  FROM qprobe q JOIN assigned c ON c.cell = q.cell AND c.vec_id <> q.vec_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cosine, 6) AS cosine
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  // ---- q135: ANN recall@k evaluation (the index-quality measurement) -----
  // The operator a serving team actually runs to pick nprobe: per query,
  // |IVF top-k ∩ exact top-k| / k at nprobe 1 and 2 — composed entirely
  // from the already-hash-proven q27 (exact) and q74 (probed) relations,
  // so determinism is inherited (same float ordering + tie-breaks both
  // engines). Queries with zero recall survive via the query-frame left
  // join; both nprobe settings ride ONE union so the corpus assignment
  // is planned once.

  private val recallK = 3

  def annRecall(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val pred = col("vec_id") < 10
    val exact = SimilarityOps.cosineTopK(emb, pred, recallK)
      .select(col("query_id"), col("neighbor_id"))
    val probes = Seq(1, 2).map(np =>
      SimilarityOps.ivfTopK(emb, pred, recallK, nCentroids = 16, nProbe = np)
        .select(lit(np).as("nprobe"), col("query_id"), col("neighbor_id")))
      .reduce(_ unionByName _)
    val hits = probes
      .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("nprobe", "query_id").agg(count(lit(1)).as("hits"))
    import s.implicits._
    val frame = emb.filter(pred).select(col("vec_id").as("query_id"))
      .crossJoin(Seq(1, 2).toDF("nprobe"))
    frame
      .join(hits, Seq("nprobe", "query_id"), "left")
      .select(col("nprobe"), col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall", round(col("hits").cast("double") / recallK, 6))
      .orderBy("nprobe", "query_id")
  }

  private val annRecallSql = {
    def cand(np: Int) =
      s"""qprobe$np AS (
         |  SELECT vec_id, v, norm, cent_id AS cell FROM rankedc
         |  WHERE rn <= $np AND vec_id < 10
         |),
         |scored$np AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${duckDot("q.v", "c.v")} / (q.norm * c.norm) AS cosine
         |  FROM qprobe$np q JOIN assigned c ON c.cell = q.cell AND c.vec_id <> q.vec_id
         |),
         |cand$np AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
         |    FROM scored$np) WHERE rank <= $recallK
         |),
         |hits$np AS (
         |  SELECT c.query_id, count(*) AS hits
         |  FROM cand$np c JOIN exact e ON e.query_id = c.query_id AND e.neighbor_id = c.neighbor_id
         |  GROUP BY c.query_id
         |)""".stripMargin
    def half(np: Int) =
      s"""SELECT $np AS nprobe, q.query_id, COALESCE(h.hits, 0) AS hits,
         |  round(COALESCE(h.hits, 0) / $recallK.0, 6) AS recall
         |FROM queries q LEFT JOIN hits$np h ON h.query_id = q.query_id""".stripMargin
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
       |rankedc AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rn
       |  FROM scoredc
       |),
       |assigned AS (
       |  SELECT vec_id, v, norm, cent_id AS cell FROM rankedc WHERE rn = 1
       |),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY ${duckDot("q.v", "c.v")} / (q.norm * c.norm) DESC, c.vec_id ASC) AS rank
       |    FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < 10) WHERE rank <= $recallK
       |),
       |queries AS (SELECT vec_id AS query_id FROM corpus WHERE vec_id < 10),
       |${cand(1)},
       |${cand(2)}
       |${half(1)}
       |UNION ALL
       |${half(2)}
       |ORDER BY nprobe, query_id""".stripMargin
  }

  // ---- q139: ANN nDCG@k evaluation (graded companion to q135) ------------
  // Recall@k treats every true neighbor equally; nDCG grades them: the
  // exact rank-i neighbor carries gain k+1-i, the served list's position
  // discounts by 1/log2(pos+1), and the score normalizes by the ideal
  // DCG. Per-position terms are integerized (round(gain/discount * 1e6)
  // BIGINT) so per-query sums are exact-integer and order-free; IDCG is
  // one shared literal (a full graded list is always available — the
  // exact top-k is k rows by construction). Composed from the same
  // hash-proven q27/q74 relations as q135: determinism is inherited.

  private lazy val idcgFp: Long = (1 to recallK).map(i =>
    math.rint((recallK + 1 - i) / (math.log(i + 1.0) / math.log(2.0)) * 1e6)
      .toLong).sum

  def annNdcg(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val pred = col("vec_id") < 10
    val exact = SimilarityOps.cosineTopK(emb, pred, recallK)
      .select(col("query_id"), col("neighbor_id"),
        (lit(recallK + 1L) - col("rank")).as("grade"))
    val probes = Seq(1, 2).map(np =>
      SimilarityOps.ivfTopK(emb, pred, recallK, nCentroids = 16, nProbe = np)
        .select(lit(np).as("nprobe"), col("query_id"), col("rank"),
          col("neighbor_id")))
      .reduce(_ unionByName _)
    val dcg = probes
      .join(exact, Seq("query_id", "neighbor_id"), "left")
      .withColumn("g", coalesce(col("grade"), lit(0L)))
      .withColumn("term_fp",
        expr("CAST(round(g / (ln(rank + 1) / ln(2)) * 1e6, 0) AS BIGINT)"))
      .groupBy("nprobe", "query_id").agg(sum("term_fp").as("dcg_fp"))
    import s.implicits._
    val frame = emb.filter(pred).select(col("vec_id").as("query_id"))
      .crossJoin(Seq(1, 2).toDF("nprobe"))
    frame
      .join(dcg, Seq("nprobe", "query_id"), "left")
      .select(col("nprobe"), col("query_id"),
        coalesce(col("dcg_fp"), lit(0L)).as("dcg_fp"))
      .withColumn("ndcg",
        expr(s"round(CAST(dcg_fp AS DOUBLE) / $idcgFp, 6)"))
      .orderBy("nprobe", "query_id")
  }

  private val annNdcgSql = {
    def cand(np: Int) =
      s"""qprobe$np AS (
         |  SELECT vec_id, v, norm, cent_id AS cell FROM rankedc
         |  WHERE rn <= $np AND vec_id < 10
         |),
         |scored$np AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${duckDot("q.v", "c.v")} / (q.norm * c.norm) AS cosine
         |  FROM qprobe$np q JOIN assigned c ON c.cell = q.cell AND c.vec_id <> q.vec_id
         |),
         |cand$np AS (
         |  SELECT query_id, neighbor_id, rank FROM (
         |    SELECT query_id, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
         |    FROM scored$np) WHERE rank <= $recallK
         |),
         |dcg$np AS (
         |  SELECT c.query_id,
         |    SUM(CAST(round(COALESCE(e.grade, 0) / (ln(c.rank + 1) / ln(2)) * 1e6, 0) AS BIGINT)) AS dcg_fp
         |  FROM cand$np c
         |  LEFT JOIN exact e ON e.query_id = c.query_id AND e.neighbor_id = c.neighbor_id
         |  GROUP BY c.query_id
         |)""".stripMargin
    def half(np: Int) =
      s"""SELECT $np AS nprobe, q.query_id,
         |  CAST(COALESCE(d.dcg_fp, 0) AS BIGINT) AS dcg_fp,
         |  round(CAST(COALESCE(d.dcg_fp, 0) AS DOUBLE) / $idcgFp, 6) AS ndcg
         |FROM queries q LEFT JOIN dcg$np d ON d.query_id = q.query_id""".stripMargin
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
       |rankedc AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rn
       |  FROM scoredc
       |),
       |assigned AS (
       |  SELECT vec_id, v, norm, cent_id AS cell FROM rankedc WHERE rn = 1
       |),
       |exact AS (
       |  SELECT query_id, neighbor_id, ${recallK + 1} - rank AS grade FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY ${duckDot("q.v", "c.v")} / (q.norm * c.norm) DESC, c.vec_id ASC) AS rank
       |    FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < 10) WHERE rank <= $recallK
       |),
       |queries AS (SELECT vec_id AS query_id FROM corpus WHERE vec_id < 10),
       |${cand(1)},
       |${cand(2)}
       |${half(1)}
       |UNION ALL
       |${half(2)}
       |ORDER BY nprobe, query_id""".stripMargin
  }

  // ---- q216: Matryoshka (MRL) truncation recall@k -------------------------
  // Kusupati et al. 2022 (NeurIPS, "Matryoshka Representation Learning"):
  // production truncates embeddings to a prefix dimension and serves
  // prefix-cosine; the eval a serving team runs to PICK the truncation is
  // recall@k of the prefix top-k against the full-dim exact top-k, per
  // truncation level. Composed exactly like q135 from the hash-proven q27
  // relation — each truncated ranking reuses cosineTopK over a sliced
  // corpus (same left-fold dot, same tie-breaks), so determinism is
  // inherited; zero-recall queries survive via the query-frame left join.
  // Fixture prefixes are norm-safe (min prefix norm 0.04 at dim 4, both
  // SFs) so no cosine denominator can hit zero.
  //
  // Scale shape: each truncation is one broadcast-queries corpus pass
  // with a WindowGroupLimit-bounded rank (the q27 plan); the union is
  // linear in |dims|. At 100 TB the slice also SHRINKS bytes scored per
  // pass — which is the point of MRL serving.

  private val mrlDims = Seq(4, 8, 16, 32)

  /** MRL eval core: recall@k of prefix-cosine top-k vs full-dim top-k,
    * one row per (trunc_dim, query). Split out so specs can plant
    * corpora where the prefix ranking provably flips. */
  private[graft] def mrlRecallCore(emb: DataFrame, dims: Seq[Int],
      pred: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val exact = SimilarityOps.cosineTopK(emb, pred, k)
      .select(col("query_id"), col("neighbor_id"))
    val truncated = dims.map { dt =>
      SimilarityOps.cosineTopK(
          emb.withColumn("embedding", expr(s"slice(embedding, 1, $dt)")),
          pred, k)
        .select(lit(dt).as("trunc_dim"), col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _)
    val hits = truncated
      .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("trunc_dim", "query_id").agg(count(lit(1)).as("hits"))
    val s = emb.sparkSession
    import s.implicits._
    val frame = emb.filter(pred).select(col("vec_id").as("query_id"))
      .crossJoin(dims.toDF("trunc_dim"))
    frame
      .join(hits, Seq("trunc_dim", "query_id"), "left")
      .select(col("trunc_dim"), col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall", round(col("hits").cast("double") / k, 6))
      .orderBy("trunc_dim", "query_id")
  }

  def mrlRecall(s: SparkSession, d: String): DataFrame =
    mrlRecallCore(embeddings(s, d), mrlDims, col("vec_id") < 10, recallK)

  private val mrlRecallSql = {
    def trunc(dt: Int) = {
      val sl = s"list_slice(v, 1, $dt)"
      s"""t$dt AS MATERIALIZED (
         |  SELECT vec_id, $sl AS tv, sqrt(${duckDot(sl, sl)}) AS tnorm
         |  FROM corpus
         |),
         |cand$dt AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ${duckDot("q.tv", "c.tv")} / (q.tnorm * c.tnorm) DESC, c.vec_id ASC) AS rank
         |    FROM t$dt q JOIN t$dt c ON c.vec_id <> q.vec_id
         |    WHERE q.vec_id < 10) WHERE rank <= $recallK
         |),
         |hits$dt AS (
         |  SELECT c.query_id, count(*) AS hits
         |  FROM cand$dt c JOIN exact e ON e.query_id = c.query_id AND e.neighbor_id = c.neighbor_id
         |  GROUP BY c.query_id
         |)""".stripMargin
    }
    def half(dt: Int) =
      s"""SELECT $dt AS trunc_dim, q.query_id,
         |  CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
         |  round(COALESCE(h.hits, 0) / $recallK.0, 6) AS recall
         |FROM queries q LEFT JOIN hits$dt h ON h.query_id = q.query_id""".stripMargin
    s"""WITH $duckCorpus,
       |exact AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY ${duckDot("q.v", "c.v")} / (q.norm * c.norm) DESC, c.vec_id ASC) AS rank
       |    FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < 10) WHERE rank <= $recallK
       |),
       |queries AS MATERIALIZED (SELECT vec_id AS query_id FROM corpus WHERE vec_id < 10),
       |${mrlDims.map(trunc).mkString(",\n")}
       |${mrlDims.map(half).mkString("\nUNION ALL\n")}
       |ORDER BY trunc_dim, query_id""".stripMargin
  }

  // ---- q65: distributed k-means IVF training -----------------------------
  // The training step q49's centroid pick defers to: 2 Lloyd iterations,
  // deterministic init (lowest vec_ids), exact int64 fixed-point coordinate
  // sums (vec_sum_fixed) so the trained centroids hash-match the SQL replay
  // of the same rounds and sums.

  private val kmK = 8
  private val kmIters = 2
  private val kmScale = 1L << 20
  private val kmDim = 64

  def kmeansTrain(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .kmeansCentroids(embeddings(s, d), nCentroids = kmK, iters = kmIters)
      .withColumn("coord", round(col("coord"), 6))
      .orderBy("cell", "j")

  /** The k-means iteration CTE chain c0, a1, s1, c1, …, s_iters
    * (optionally ending in the final centroid list c_iters) — shared by
    * q65 (reads the final sums) and q76 (probes against the final
    * centroids), so both oracles replay the IDENTICAL training. */
  private def kmIterCtesSql(withFinalCent: Boolean): String = {
    def assign(prev: String, i: Int): String =
      s"""a$i AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT n.vec_id, n.v, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
         |        ${duckDot("n.v", "c.cv")} / (n.norm * sqrt(${duckDot("c.cv", "c.cv")})) DESC,
         |        c.cell ASC) AS rn
         |    FROM normed n CROSS JOIN $prev c) WHERE rn = 1
         |)""".stripMargin
    def sums(i: Int): String =
      s"""s$i AS (
         |  SELECT a.cell, r.j, CAST(count(*) AS BIGINT) AS n,
         |    SUM(CAST(round(a.v[r.j + 1] * $kmScale.0) AS BIGINT)) AS s
         |  FROM a$i a CROSS JOIN range($kmDim) r(j) GROUP BY a.cell, r.j
         |)""".stripMargin
    def cent(i: Int): String =
      s"""c$i AS (
         |  SELECT cell, list(CAST(s AS DOUBLE) / $kmScale.0 / n ORDER BY j) AS cv
         |  FROM s$i GROUP BY cell
         |)""".stripMargin
    val iterCtes = (1 to kmIters).flatMap { i =>
      Seq(assign(if (i == 1) "c0" else s"c${i - 1}", i), sums(i)) ++
        (if (i < kmIters || withFinalCent) Seq(cent(i)) else Nil)
    }
    s"""c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, v AS cv
       |  FROM (SELECT vec_id, v FROM corpus ORDER BY vec_id LIMIT $kmK)
       |),
       |${iterCtes.mkString(",\n")}""".stripMargin
  }

  private def kmeansTrainSql: String =
    s"""WITH $duckCorpus,
       |${kmIterCtesSql(withFinalCent = false)}
       |SELECT cell, n AS n_members, CAST(j AS INTEGER) AS j,
       |  round(CAST(s AS DOUBLE) / $kmScale.0 / n, 6) AS coord
       |FROM s$kmIters
       |ORDER BY cell, j""".stripMargin

  // ---- q76: IVF served from TRAINED centroids (q65 ∘ q74) ----------------
  // The full quantizer loop: Lloyd training (exact int64 sums, bit-replayed
  // by the oracle's CTE chain) feeds the nProbe=2 probe pipeline. Closes
  // q49's "production trains k-means, then serves" deferral end-to-end.

  def ivfTrained(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .ivfTopKTrained(embeddings(s, d), col("vec_id") < 10, k = 3,
        nCentroids = kmK, iters = kmIters, nProbe = 2)
      .orderBy("query_id", "rank")

  private def ivfTrainedSql: String =
    s"""WITH $duckCorpus,
       |${kmIterCtesSql(withFinalCent = true)},
       |scoredc AS (
       |  SELECT n.vec_id, n.v, n.norm, c.cell,
       |    ${duckDot("n.v", "c.cv")} / (n.norm * sqrt(${duckDot("c.cv", "c.cv")})) AS cs
       |  FROM normed n CROSS JOIN c$kmIters c
       |),
       |rankedc AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell ASC) AS rn
       |  FROM scoredc
       |),
       |assigned AS (SELECT vec_id, v, norm, cell FROM rankedc WHERE rn = 1),
       |qprobe AS (SELECT vec_id, v, norm, cell FROM rankedc WHERE rn <= 2 AND vec_id < 10),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${duckDot("q.v", "c.v")} / (q.norm * c.norm) AS cosine
       |  FROM qprobe q JOIN assigned c ON c.cell = q.cell AND c.vec_id <> q.vec_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cosine, 6) AS cosine
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  // ---- q84: coreset / representative sampling per trained cell ----------
  // Diversity-aware selection: the 5 vectors closest to each TRAINED
  // centroid — per-cluster medoids, the "cover every region of embedding
  // space" sampling a frequency-weighted sample can't give. Oracle replays
  // the identical Lloyd iterations (same CTE chain as q65/q76), then ranks
  // within each final-assignment cell.

  def kmeansCoreset(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .kmeansRepresentatives(embeddings(s, d), nCentroids = kmK,
        iters = kmIters, m = 5)
      .orderBy("cell", "rank")

  private def kmeansCoresetSql: String =
    s"""WITH $duckCorpus,
       |${kmIterCtesSql(withFinalCent = true)},
       |scoredc AS (
       |  SELECT n.vec_id, c.cell,
       |    ${duckDot("n.v", "c.cv")} / (n.norm * sqrt(${duckDot("c.cv", "c.cv")})) AS cs
       |  FROM normed n CROSS JOIN c$kmIters c
       |),
       |assigned AS (
       |  SELECT vec_id, cell, cs FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell ASC) AS rn
       |    FROM scoredc) WHERE rn = 1
       |),
       |percell AS (
       |  SELECT cell, vec_id, cs,
       |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY cs DESC, vec_id ASC) AS rank
       |  FROM assigned
       |)
       |SELECT CAST(cell AS BIGINT) AS cell, CAST(rank AS BIGINT) AS rank,
       |  vec_id, round(cs, 6) AS cosine
       |FROM percell WHERE rank <= 5
       |ORDER BY cell, rank""".stripMargin

  // ---- q174: embedding-space drift monitor (q101's vector twin) -----------
  // The retrain signal a frozen ANN index needs: assign EVERY vector to
  // the q65-trained centroids (the frozen quantizer), split the corpus
  // into reference (vec_id % 3 == 0, mirroring q101) and current slices,
  // and report per cell the occupancy shift (share_cur − share_ref) plus
  // the cosine between the two slices' mean vectors (from exact
  // fixed-point coordinate sums; the scale cancels in the ratio). Cell
  // occupancy drifting or slice means decorrelating is exactly "the
  // quantizer no longer fits the data" — when it trips, retrain (q65)
  // and rebuild (q110).
  //
  // Determinism: per-slice sums are exact int64 (vec_sum_fixed); the
  // cross-moment terms are integer-quantized PER j (÷1e6, int64-safe at
  // |s| ≤ n·2^20·|v|) before the order-free integer sum; cos is one
  // shared double expression over exact ints. Scale shape: assignment is
  // the k×d-literal projection (no shuffle); ONE data-sized exchange for
  // the (cell, slice) sums (map-side combined to 2k rows); everything
  // after is k-bounded.

  def embeddingDrift(s: SparkSession, d: String): DataFrame =
    embeddingDriftCore(
      SimilarityOps.semAssigned(embeddings(s, d), kmK, kmIters)
        .withColumn("is_ref", col("vec_id") % 3 === 0))

  /** The q174 body from an assigned (vec_id, v, cell, is_ref) relation —
    * split out so specs can plant slice geometries. */
  private[graft] def embeddingDriftCore(assigned: DataFrame): DataFrame = {
    import graft.functions.VecSumFixed.vec_sum_fixed
    val per = assigned
      .groupBy("cell", "is_ref")
      .agg(count(lit(1)).as("n"), vec_sum_fixed(col("v"), kmScale).as("sv"))
    val ref = per.filter(col("is_ref"))
      .select(col("cell"), col("n").as("n_ref"), col("sv").as("s_ref"))
    val cur = per.filter(!col("is_ref"))
      .select(col("cell"), col("n").as("n_cur"), col("sv").as("s_cur"))
    def momFp(a: String, b: String) =
      s"aggregate(zip_with($a, $b, (x, y) -> " +
        "CAST(round(CAST(x AS DOUBLE) * y / 1e6, 0) AS BIGINT)), " +
        "CAST(0 AS BIGINT), (acc, t) -> acc + t)"
    ref.join(cur, Seq("cell"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(broadcast(
        per.agg(sum(when(col("is_ref"), col("n")).otherwise(0L)).as("t_ref"),
          sum(when(!col("is_ref"), col("n")).otherwise(0L)).as("t_cur"))))
      .selectExpr("cell", "n_ref", "n_cur",
        "round(CAST(n_cur AS DOUBLE) / t_cur - CAST(n_ref AS DOUBLE) / t_ref, 6) AS shift",
        s"${momFp("s_ref", "s_cur")} AS dot_fp",
        s"${momFp("s_ref", "s_ref")} AS na2_fp",
        s"${momFp("s_cur", "s_cur")} AS nb2_fp")
      .selectExpr("cell", "n_ref", "n_cur", "shift",
        "CASE WHEN na2_fp > 0 AND nb2_fp > 0 THEN " +
          "round(CAST(dot_fp AS DOUBLE) / (sqrt(CAST(na2_fp AS DOUBLE)) * sqrt(CAST(nb2_fp AS DOUBLE))), 6) " +
          "END AS mean_cos")
      .orderBy("cell")
  }

  private def embeddingDriftSql: String =
    s"""WITH $duckCorpus,
       |${kmIterCtesSql(withFinalCent = true)},
       |scoredc AS (
       |  SELECT n.vec_id, n.v, c.cell,
       |    ${duckDot("n.v", "c.cv")} / (n.norm * sqrt(${duckDot("c.cv", "c.cv")})) AS cs
       |  FROM normed n CROSS JOIN c$kmIters c
       |),
       |assigned AS (
       |  SELECT vec_id, v, cell, (vec_id % 3 = 0) AS is_ref FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell ASC) AS rn
       |    FROM scoredc) WHERE rn = 1
       |),
       |nc AS (
       |  SELECT cell, is_ref, CAST(count(*) AS BIGINT) AS n
       |  FROM assigned GROUP BY 1, 2
       |),
       |sj AS (
       |  SELECT cell, is_ref, r.j,
       |    SUM(CAST(round(v[r.j + 1] * $kmScale.0) AS BIGINT)) AS s
       |  FROM assigned CROSS JOIN range($kmDim) r(j) GROUP BY 1, 2, 3
       |),
       |mom AS (
       |  SELECT a.cell,
       |    SUM(CAST(round(CAST(a.s AS DOUBLE) * b.s / 1e6, 0) AS BIGINT)) AS dot_fp,
       |    SUM(CAST(round(CAST(a.s AS DOUBLE) * a.s / 1e6, 0) AS BIGINT)) AS na2_fp,
       |    SUM(CAST(round(CAST(b.s AS DOUBLE) * b.s / 1e6, 0) AS BIGINT)) AS nb2_fp
       |  FROM sj a JOIN sj b ON b.cell = a.cell AND b.j = a.j
       |  WHERE a.is_ref AND NOT b.is_ref
       |  GROUP BY a.cell
       |),
       |cellsfull AS (
       |  SELECT COALESCE(r.cell, c.cell) AS cell,
       |    COALESCE(r.n, 0) AS n_ref, COALESCE(c.n, 0) AS n_cur
       |  FROM (SELECT cell, n FROM nc WHERE is_ref) r
       |  FULL OUTER JOIN (SELECT cell, n FROM nc WHERE NOT is_ref) c
       |    ON c.cell = r.cell
       |),
       |tot AS (
       |  SELECT SUM(CASE WHEN is_ref THEN n ELSE 0 END) AS t_ref,
       |         SUM(CASE WHEN NOT is_ref THEN n ELSE 0 END) AS t_cur
       |  FROM nc
       |)
       |SELECT CAST(f.cell AS BIGINT) AS cell, f.n_ref, f.n_cur,
       |  round(CAST(f.n_cur AS DOUBLE) / t.t_cur - CAST(f.n_ref AS DOUBLE) / t.t_ref, 6) AS shift,
       |  CASE WHEN m.na2_fp > 0 AND m.nb2_fp > 0 THEN
       |    round(CAST(m.dot_fp AS DOUBLE) / (sqrt(CAST(m.na2_fp AS DOUBLE)) * sqrt(CAST(m.nb2_fp AS DOUBLE))), 6)
       |  END AS mean_cos
       |FROM cellsfull f
       |LEFT JOIN mom m ON m.cell = f.cell
       |CROSS JOIN tot t
       |ORDER BY cell""".stripMargin

  // ---- q77: near-dup cluster resolution over COSINE pairs (q29 ∘ q66) ---
  // dedupClusters is detector-agnostic: here the pair graph comes from
  // embedding cosine (q29's detector) instead of MinHash, and the same
  // min-label + pointer-doubling components produce per-vector
  // cluster/keep verdicts. Oracle: q29's pair SQL + the q66-style
  // recursive reachability CTE.

  def cosineClusters(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    graft.dedup.DedupOps
      .dedupClusters(
        emb.select(col("vec_id").as("doc_id")),
        SimilarityOps.cosineDupPairs(emb, threshold = 0.35, nBits = 8)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
      .orderBy("doc_id")
  }

  private val cosineClustersSql =
    s"""WITH RECURSIVE $duckCorpus,
       |bucketed AS (
       |  SELECT vec_id, v, norm, ${duckBucket("v")} AS bucket FROM normed
       |),
       |pairs AS (
       |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
       |  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE ${duckDot("a.v", "b.v")} / (a.norm * b.norm) >= 0.35
       |),
       |sym AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs
       |),
       |reach(v, m) AS (
       |  SELECT src, src FROM sym
       |  UNION
       |  SELECT s.src, r.m FROM sym s JOIN reach r ON r.v = s.dst
       |),
       |lbl AS (SELECT v, min(m) AS cluster FROM reach GROUP BY v)
       |SELECT e.vec_id AS doc_id,
       |  COALESCE(l.cluster, e.vec_id) AS cluster,
       |  (COALESCE(l.cluster, e.vec_id) = e.vec_id) AS keep
       |FROM embeddings e LEFT JOIN lbl l ON l.v = e.vec_id
       |ORDER BY doc_id""".stripMargin

  // ---- q89: scalar int8 quantization of the embedding corpus ------------
  // The ANN serving-compression step: per-dimension (min,max) codebook,
  // floor(+0.5) codes over the full 0..255 uint8 range so both engines round identically, per-vector code
  // checksum + max reconstruction error. See SimilarityOps.int8Quantize
  // for the broadcast-codebook / map-only-quantize scale shape.

  def int8Quant(s: SparkSession, d: String): DataFrame =
    SimilarityOps.int8Quantize(embeddings(s, d)).orderBy("vec_id")

  private val int8QuantSql =
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |),
      |e AS (
      |  SELECT vec_id, generate_subscripts(v, 1) AS d, unnest(v) AS x FROM v
      |),
      |mm AS (SELECT d, min(x) AS mn, max(x) AS mx FROM e GROUP BY d),
      |c AS (
      |  SELECT e.vec_id, e.x, mm.mn, mm.mx,
      |    CASE WHEN mm.mx = mm.mn THEN 0
      |         ELSE CAST(floor((e.x - mm.mn) * 255.0 / (mm.mx - mm.mn) + 0.5) AS BIGINT)
      |    END AS code
      |  FROM e JOIN mm USING (d)
      |)
      |SELECT vec_id,
      |  CAST(sum(code) AS BIGINT) AS code_sum,
      |  round(max(abs(x - (mn + CAST(code AS DOUBLE) * (mx - mn) / 255.0))), 6)
      |    AS max_abs_err
      |FROM c GROUP BY vec_id
      |ORDER BY vec_id""".stripMargin

  // ---- q92: asymmetric-distance ANN over the int8 codes ------------------
  // The serving half q89's compression presupposes: full-precision queries
  // probe their 2 nearest IVF cells (q74's coarse quantizer) and score
  // candidates as cos(q, dequantize(codes)) — the corpus-side payload is
  // codes only, dequantized on the fly from the broadcast codebook.

  def int8Serve(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .int8ServeTopK(embeddings(s, d), col("vec_id") < 10, k = 3,
        nCentroids = 16, nProbe = 2)
      .orderBy("query_id", "rank")

  private val int8ServeSql =
    s"""WITH $duckCorpus,
       |e AS (
       |  SELECT vec_id, generate_subscripts(v, 1) AS d, unnest(v) AS x FROM corpus
       |),
       |mm AS (SELECT d, min(x) AS mn, max(x) AS mx FROM e GROUP BY d),
       |cq AS (
       |  SELECT e.vec_id, e.d,
       |    mm.mn + CAST(CASE WHEN mm.mx = mm.mn THEN 0
       |      ELSE CAST(floor((e.x - mm.mn) * 255.0 / (mm.mx - mm.mn) + 0.5) AS BIGINT)
       |      END AS DOUBLE) * (mm.mx - mm.mn) / 255.0 AS dqx
       |  FROM e JOIN mm USING (d)
       |),
       |dqv AS (
       |  SELECT vec_id, list(dqx ORDER BY d) AS dq FROM cq GROUP BY vec_id
       |),
       |dqn AS (
       |  SELECT vec_id, dq, sqrt(${duckDot("dq", "dq")}) AS dqnorm FROM dqv
       |),
       |cent AS (
       |  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
       |  FROM normed ORDER BY vec_id LIMIT 16
       |),
       |scoredc AS (
       |  SELECT n.vec_id, n.v, n.norm, c.cent_id,
       |    ${duckDot("n.v", "c.cv")} / (n.norm * c.cnorm) AS cs
       |  FROM normed n CROSS JOIN cent c
       |),
       |rankedc AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rn
       |  FROM scoredc
       |),
       |assigned AS (
       |  SELECT r.vec_id, q.dq, q.dqnorm, r.cent_id AS cell
       |  FROM rankedc r JOIN dqn q ON q.vec_id = r.vec_id WHERE r.rn = 1
       |),
       |qprobe AS (
       |  SELECT vec_id, v, norm, cent_id AS cell FROM rankedc
       |  WHERE rn <= 2 AND vec_id < 10
       |),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${duckDot("q.v", "c.dq")} / (q.norm * c.dqnorm) AS cosine
       |  FROM qprobe q JOIN assigned c ON c.cell = q.cell AND c.vec_id <> q.vec_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, round(cosine, 6) AS cosine
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  // ---- q105/q106: product quantization + ADC serving ---------------------
  // The 100 TB ANN-serving compression ladder's top rung (q89 int8 → PQ):
  // m=4 sub-quantizers × 8 cells trained with the deterministic L2 Lloyd
  // machinery (exact int64 sums — the oracle replays every round, the q65
  // pattern per sub-space), codes are 4 small ints per vector, and serving
  // scores candidates by ASYMMETRIC DISTANCE through per-query lookup
  // tables composed with the q92 coarse IVF probe.

  private val pqM = 4
  private val pqKsub = 8
  private val pqIters = 2
  private val pqDsub = kmDim / pqM

  def pqTrain(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .pqCentroidsRelation(embeddings(s, d), m = pqM, ksub = pqKsub,
        iters = pqIters)
      .withColumn("coord", round(col("coord"), 6))
      .orderBy("sub", "cell", "j")

  /** The PQ training CTE chain psub, pc0, (pa_i, ps_i, pc_i)* — the q65
    * iteration-replay pattern keyed by sub-space, with L2 assignment.
    * Shared by the q105 oracle (reads final sums) and the q106 oracle
    * (codes + ADC tables against the final centroids). */
  private def pqTrainCtesSql(withFinalCent: Boolean, src: String = "corpus",
      vcol: String = "v", subName: String = "psub"): String = {
    def assign(prev: String, name: String): String =
      s"""$name AS (
         |  SELECT vec_id, sub, sv, cell FROM (
         |    SELECT t.vec_id, t.sub, t.sv, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY t.vec_id, t.sub ORDER BY
         |        ${duckDot("c.cv", "c.cv")} - 2 * ${duckDot("t.sv", "c.cv")} ASC,
         |        c.cell ASC) AS rn
         |    FROM $subName t JOIN $prev c ON c.sub = t.sub) WHERE rn = 1
         |)""".stripMargin
    def sums(i: Int): String =
      s"""ps$i AS (
         |  SELECT sub, cell, r.j AS j, CAST(count(*) AS BIGINT) AS n,
         |    SUM(CAST(round(sv[r.j + 1] * $kmScale.0) AS BIGINT)) AS s
         |  FROM pa$i, range($pqDsub) r(j) GROUP BY sub, cell, r.j
         |)""".stripMargin
    def cent(i: Int): String =
      s"""pc$i AS (
         |  SELECT sub, cell, list(CAST(s AS DOUBLE) / $kmScale.0 / n ORDER BY j) AS cv
         |  FROM ps$i GROUP BY sub, cell
         |)""".stripMargin
    val iterCtes = (1 to pqIters).flatMap { i =>
      Seq(assign(if (i == 1) "pc0" else s"pc${i - 1}", s"pa$i"), sums(i)) ++
        (if (i < pqIters || withFinalCent) Seq(cent(i)) else Nil)
    }
    s"""$subName AS (
       |  SELECT c.vec_id, s.s AS sub,
       |    list_slice(c.$vcol, s.s * $pqDsub + 1, (s.s + 1) * $pqDsub) AS sv
       |  FROM $src c, range($pqM) s(s)
       |),
       |pc0 AS (
       |  SELECT s.s AS sub,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY s.s ORDER BY b.vec_id) - 1 AS BIGINT) AS cell,
       |    list_slice(b.$vcol, s.s * $pqDsub + 1, (s.s + 1) * $pqDsub) AS cv
       |  FROM (SELECT vec_id, $vcol FROM $src ORDER BY vec_id LIMIT $pqKsub) b,
       |    range($pqM) s(s)
       |),
       |${iterCtes.mkString(",\n")}""".stripMargin
  }

  private def pqTrainSql: String =
    s"""WITH $duckCorpus,
       |${pqTrainCtesSql(withFinalCent = false)}
       |SELECT CAST(sub AS BIGINT) AS sub, CAST(cell AS BIGINT) AS cell,
       |  n AS n_members, CAST(j AS BIGINT) AS j,
       |  round(CAST(s AS DOUBLE) / $kmScale.0 / n, 6) AS coord
       |FROM ps$pqIters
       |ORDER BY sub, cell, j""".stripMargin

  def pqServe(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .pqServeTopK(embeddings(s, d), col("vec_id") < 10, k = 3, m = pqM,
        ksub = pqKsub, iters = pqIters, nCentroids = 16, nProbe = 2)
      .orderBy("query_id", "rank")

  private def pqServeSql: String = {
    val qs = s"list_slice(q.v, c.sub * $pqDsub + 1, (c.sub + 1) * $pqDsub)"
    s"""WITH $duckCorpus,
       |${pqTrainCtesSql(withFinalCent = true)},
       |pcode AS (
       |  SELECT vec_id, list(cell ORDER BY sub) AS codes FROM (
       |    SELECT t.vec_id, t.sub, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY t.vec_id, t.sub ORDER BY
       |        ${duckDot("c.cv", "c.cv")} - 2 * ${duckDot("t.sv", "c.cv")} ASC,
       |        c.cell ASC) AS rn
       |    FROM psub t JOIN pc$pqIters c ON c.sub = t.sub) WHERE rn = 1
       |  GROUP BY vec_id
       |),
       |cent AS (
       |  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
       |  FROM normed ORDER BY vec_id LIMIT 16
       |),
       |scoredc AS (
       |  SELECT n.vec_id, n.v, n.norm, c.cent_id,
       |    ${duckDot("n.v", "c.cv")} / (n.norm * c.cnorm) AS cs
       |  FROM normed n CROSS JOIN cent c
       |),
       |rankedc AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rn
       |  FROM scoredc
       |),
       |assigned AS (
       |  SELECT r.vec_id, p.codes, r.cent_id AS cell
       |  FROM rankedc r JOIN pcode p ON p.vec_id = r.vec_id WHERE r.rn = 1
       |),
       |qterm AS (
       |  SELECT q.vec_id, c.sub,
       |    list(${duckDot(qs, qs)} - 2 * ${duckDot(qs, "c.cv")} +
       |      ${duckDot("c.cv", "c.cv")} ORDER BY c.cell) AS tab
       |  FROM (SELECT vec_id, v FROM corpus WHERE vec_id < 10) q
       |  CROSS JOIN pc$pqIters c
       |  GROUP BY q.vec_id, c.sub
       |),
       |qt AS (
       |  SELECT vec_id, list(tab ORDER BY sub) AS qtab FROM qterm GROUP BY vec_id
       |),
       |qprobe AS (
       |  SELECT vec_id, cent_id AS cell FROM rankedc
       |  WHERE rn <= 2 AND vec_id < 10
       |),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(range($pqM), s -> t.qtab[s+1][c.codes[s+1]+1])),
       |      (acc, x) -> acc + x) AS dist
       |  FROM qprobe q
       |  JOIN assigned c ON c.cell = q.cell AND c.vec_id <> q.vec_id
       |  JOIN qt t ON t.vec_id = q.vec_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, dist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       |  round(dist, 6) AS adc_dist
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---- q111: IVFADC — PQ over coarse residuals ----------------------------
  // The last rung of the compression ladder (q89 int8 → q106 raw-vector
  // PQ → residual PQ): codebooks train on x − coarse_centroid(x), so the
  // same 4×8-cell budget quantizes the residual support instead of the
  // whole corpus spread; serving tables are per (query, probed cell).

  def ivfadc(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .ivfadcTopK(embeddings(s, d), col("vec_id") < 10, k = 3, m = pqM,
        ksub = pqKsub, iters = pqIters, nCentroids = 16, nProbe = 2)
      .orderBy("query_id", "rank")

  private def ivfadcSql: String = {
    val qs = s"list_slice(r.qr, c.sub * $pqDsub + 1, (c.sub + 1) * $pqDsub)"
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
       |rankedc AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rn
       |  FROM scoredc
       |),
       |rfr AS (
       |  SELECT r.vec_id,
       |    list_transform(range($kmDim), i -> r.v[i+1] - ct.cv[i+1]) AS rv,
       |    r.cent_id AS ccell
       |  FROM rankedc r JOIN cent ct ON ct.cent_id = r.cent_id
       |  WHERE r.rn = 1
       |),
       |rtrain AS (
       |  SELECT * FROM rfr WHERE vec_id NOT IN (SELECT cent_id FROM cent)
       |),
       |${pqTrainCtesSql(withFinalCent = true, src = "rtrain", vcol = "rv", subName = "psubt")},
       |psub AS (
       |  SELECT c.vec_id, s.s AS sub,
       |    list_slice(c.rv, s.s * $pqDsub + 1, (s.s + 1) * $pqDsub) AS sv
       |  FROM rfr c, range($pqM) s(s)
       |),
       |pcode AS (
       |  SELECT vec_id, list(cell ORDER BY sub) AS codes FROM (
       |    SELECT t.vec_id, t.sub, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY t.vec_id, t.sub ORDER BY
       |        ${duckDot("c.cv", "c.cv")} - 2 * ${duckDot("t.sv", "c.cv")} ASC,
       |        c.cell ASC) AS rn
       |    FROM psub t JOIN pc$pqIters c ON c.sub = t.sub) WHERE rn = 1
       |  GROUP BY vec_id
       |),
       |assigned AS (
       |  SELECT p.vec_id, p.codes, f.ccell AS cell
       |  FROM pcode p JOIN rfr f ON f.vec_id = p.vec_id
       |),
       |qprobe AS (
       |  SELECT vec_id, cent_id AS cell, v FROM rankedc
       |  WHERE rn <= 2 AND vec_id < 10
       |),
       |qres AS (
       |  SELECT q.vec_id, q.cell,
       |    list_transform(range($kmDim), i -> q.v[i+1] - ct.cv[i+1]) AS qr
       |  FROM qprobe q JOIN cent ct ON ct.cent_id = q.cell
       |),
       |qterm AS (
       |  SELECT r.vec_id, r.cell, c.sub,
       |    list(${duckDot(qs, qs)} - 2 * ${duckDot(qs, "c.cv")} +
       |      ${duckDot("c.cv", "c.cv")} ORDER BY c.cell) AS tab
       |  FROM qres r CROSS JOIN pc$pqIters c
       |  GROUP BY r.vec_id, r.cell, c.sub
       |),
       |qt AS (
       |  SELECT vec_id, cell, list(tab ORDER BY sub) AS qtab
       |  FROM qterm GROUP BY vec_id, cell
       |),
       |scored AS (
       |  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(range($pqM), s -> t.qtab[s+1][a.codes[s+1]+1])),
       |      (acc, x) -> acc + x) AS dist
       |  FROM qprobe q
       |  JOIN assigned a ON a.cell = q.cell AND a.vec_id <> q.vec_id
       |  JOIN qt t ON t.vec_id = q.vec_id AND t.cell = q.cell
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, dist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       |  round(dist, 6) AS adc_dist
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---- q113: SemDeDup — semantic near-dedup within trained clusters ------
  // Abbas et al. 2023: within each trained k-means cluster, drop every
  // vector with a lower-id neighbor at cosine ≥ 0.35; survivor = lowest
  // id. The oracle replays the q65 Lloyd rounds, assigns rn=1 (the q76
  // chain), and mirrors the per-cell lower-id scan.

  def semDedupQuery(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .semDedup(embeddings(s, d), nCentroids = kmK, iters = kmIters,
        threshold = 0.35)
      .orderBy("vec_id")

  private def semDedupSql: String =
    s"""WITH $duckCorpus,
       |${kmIterCtesSql(withFinalCent = true)},
       |scoredc AS (
       |  SELECT n.vec_id, n.v, n.norm, c.cell,
       |    ${duckDot("n.v", "c.cv")} / (n.norm * sqrt(${duckDot("c.cv", "c.cv")})) AS cs
       |  FROM normed n CROSS JOIN c$kmIters c
       |),
       |rankedc AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell ASC) AS rn
       |  FROM scoredc
       |),
       |assigned AS (SELECT vec_id, v, norm, cell FROM rankedc WHERE rn = 1),
       |dups AS (
       |  SELECT a.vec_id, min(b.vec_id) AS dup_of
       |  FROM assigned a JOIN assigned b
       |    ON b.cell = a.cell AND b.vec_id < a.vec_id
       |  WHERE ${duckDot("a.v", "b.v")} / (a.norm * b.norm) >= 0.35
       |  GROUP BY a.vec_id
       |)
       |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell, d.dup_of,
       |  (d.dup_of IS NULL) AS keep
       |FROM assigned a LEFT JOIN dups d ON d.vec_id = a.vec_id
       |ORDER BY a.vec_id""".stripMargin

  // ---- q117: SemDeDup with a BINDING cell cap -----------------------------
  // The capped path itself as a hash-checked relation: cells past
  // cellCap = 16 split into id-hash sub-buckets plus the per-sub leader
  // pass (SimilarityOps.semCandidatePairs). Verdicts differ from q113
  // exactly where the cap's documented recall trade binds — and the oracle
  // replays the split and leader machinery, so the trade is pinned, not
  // hand-waved. The sub-bucket hash is the oracle-expressible
  // ((id mod P)·2654435761 mod P) mod s.

  private val semCap = 16

  def semDedupCappedQuery(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .semDedup(embeddings(s, d), nCentroids = kmK, iters = kmIters,
        threshold = 0.35, cellCap = semCap)
      .orderBy("vec_id")

  private def semDedupCappedSql: String =
    s"""WITH $duckCorpus,
       |${kmIterCtesSql(withFinalCent = true)},
       |scoredc AS (
       |  SELECT n.vec_id, n.v, n.norm, c.cell,
       |    ${duckDot("n.v", "c.cv")} / (n.norm * sqrt(${duckDot("c.cv", "c.cv")})) AS cs
       |  FROM normed n CROSS JOIN c$kmIters c
       |),
       |rankedc AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell ASC) AS rn
       |  FROM scoredc
       |),
       |assigned AS (SELECT vec_id, v, norm, cell FROM rankedc WHERE rn = 1),
       |cnts AS (SELECT cell, count(*) AS cn FROM assigned GROUP BY cell),
       |sub AS (
       |  SELECT a.*, ((a.vec_id % 1000000007) * 2654435761) % 1000000007
       |      % ((c.cn + ${semCap - 1}) // $semCap) AS sb
       |  FROM assigned a JOIN cnts c USING (cell)
       |),
       |leaders AS (SELECT cell, sb, min(vec_id) AS lid FROM sub GROUP BY cell, sb),
       |pairs AS (
       |  SELECT a.vec_id, b.vec_id AS bid, a.v AS av, a.norm AS an,
       |    b.v AS bv, b.norm AS bn
       |  FROM sub a JOIN sub b ON b.cell = a.cell AND b.sb = a.sb
       |    AND b.vec_id < a.vec_id
       |  UNION ALL
       |  SELECT a.vec_id, lb.vec_id AS bid, a.v AS av, a.norm AS an,
       |    lb.v AS bv, lb.norm AS bn
       |  FROM sub a
       |  JOIN leaders l ON l.cell = a.cell AND l.lid < a.vec_id
       |  JOIN assigned lb ON lb.vec_id = l.lid
       |),
       |dups AS (
       |  SELECT vec_id, min(bid) AS dup_of
       |  FROM pairs
       |  WHERE ${duckDot("av", "bv")} / (an * bn) >= 0.35
       |  GROUP BY vec_id
       |)
       |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell, d.dup_of,
       |  (d.dup_of IS NULL) AS keep
       |FROM assigned a LEFT JOIN dups d ON d.vec_id = a.vec_id
       |ORDER BY a.vec_id""".stripMargin

  // ---- q118: cluster-balanced sampling ------------------------------------
  // The semantic analog of q58's per-language quota (the domain-balancing
  // step of corpus assembly, done by TRAINED clusters instead of metadata
  // labels): assign every vector to its Lloyd-trained cell, then keep at
  // most `clusterQuota` per cell by a deterministic salt-hash ranking —
  // boilerplate-heavy regions of embedding space stop dominating the
  // mixture no matter how many near-copies they contribute. Membership is
  // a pure function of (vec_id, trained centroids): partition-invariant,
  // retry-stable, and coordinated (raising the quota only ADDS vectors).
  // Scale shape: assignment is the map-side k×d-literal argmax; the only
  // exchange is the per-cell rank window (keyed by cell — exactly the
  // TopKPerKey rewrite's shape when installed).

  private val clusterQuota = 20

  def clusterQuotaSample(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = SimilarityOps
      .semAssigned(embeddings(s, d), nCentroids = kmK, iters = kmIters)
      .select(col("vec_id"), col("cell"))
    val slot = pmod(
      pmod(col("vec_id"), lit(1000000007L)) * lit(2654435761L) % lit(1000000007L),
      lit(1000000L))
    val w = Window.partitionBy("cell").orderBy(col("__slot").asc, col("vec_id").asc)
    assigned
      .withColumn("__slot", slot)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= clusterQuota)
      .select(col("cell").cast("long").as("cell"),
        col("rank").cast("long").as("rank"), col("vec_id"))
      .orderBy("cell", "rank")
  }

  private def clusterQuotaSampleSql: String =
    s"""WITH $duckCorpus,
       |${kmIterCtesSql(withFinalCent = true)},
       |scoredc AS (
       |  SELECT n.vec_id, c.cell,
       |    ${duckDot("n.v", "c.cv")} / (n.norm * sqrt(${duckDot("c.cv", "c.cv")})) AS cs
       |  FROM normed n CROSS JOIN c$kmIters c
       |),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell ASC) AS rn
       |    FROM scoredc) WHERE rn = 1
       |),
       |slotted AS (
       |  SELECT vec_id, cell,
       |    ((vec_id % 1000000007) * 2654435761) % 1000000007 % 1000000 AS slot
       |  FROM assigned
       |),
       |ranked AS (
       |  SELECT cell, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY slot ASC, vec_id ASC) AS rank
       |  FROM slotted
       |)
       |SELECT CAST(cell AS BIGINT) AS cell, CAST(rank AS BIGINT) AS rank, vec_id
       |FROM ranked WHERE rank <= $clusterQuota
       |ORDER BY cell, rank""".stripMargin

  // ---- q99: embedding-space incremental admission -------------------------
  // The vector-modality twin of q83: arrivals (vec_id < 100) judged
  // against the standing corpus through its IVF cells (nProbe=2), flagged
  // near-dup at cosine >= 0.35, keep = no standing match.

  def embeddingAdmission(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .embeddingAdmission(embeddings(s, d), col("vec_id") < 100,
        nCentroids = 16, nProbe = 2, threshold = 0.35)
      .orderBy("vec_id")

  private val embeddingAdmissionSql =
    s"""WITH $duckCorpus,
       |corp AS (SELECT * FROM normed WHERE vec_id >= 100),
       |inc AS (SELECT * FROM normed WHERE vec_id < 100),
       |cent AS (
       |  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
       |  FROM corp ORDER BY vec_id LIMIT 16
       |),
       |scoredc AS (
       |  SELECT n.vec_id, n.v, n.norm, c.cent_id,
       |    ${duckDot("n.v", "c.cv")} / (n.norm * c.cnorm) AS cs
       |  FROM corp n CROSS JOIN cent c
       |),
       |assigned AS (
       |  SELECT vec_id, v, norm, cent_id AS cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rn
       |    FROM scoredc) WHERE rn = 1
       |),
       |scoredq AS (
       |  SELECT n.vec_id, n.v, n.norm, c.cent_id,
       |    ${duckDot("n.v", "c.cv")} / (n.norm * c.cnorm) AS cs
       |  FROM inc n CROSS JOIN cent c
       |),
       |qprobe AS (
       |  SELECT vec_id, v, norm, cent_id AS cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id ASC) AS rn
       |    FROM scoredq) WHERE rn <= 2
       |),
       |near AS (
       |  SELECT q.vec_id, min(c.vec_id) AS near_dup_of
       |  FROM qprobe q JOIN assigned c ON c.cell = q.cell
       |  WHERE ${duckDot("q.v", "c.v")} / (q.norm * c.norm) >= 0.35
       |  GROUP BY q.vec_id
       |)
       |SELECT i.vec_id, near.near_dup_of,
       |  (near.near_dup_of IS NULL) AS keep
       |FROM inc i LEFT JOIN near ON near.vec_id = i.vec_id
       |ORDER BY i.vec_id""".stripMargin

  // ---- q110: persisted standing vector index ------------------------------

  /** q99's verdicts served from the PREBUILT standing vector index
    * (SimilarityOps.buildVecIndex) — the production per-arrival shape
    * where the corpus is prepared/assigned once and every batch pays only
    * its own probe. Same arrival split, centroids, nProbe, and threshold
    * as q99, and the oracle IS q99's SQL: the hash match proves the index
    * path changes nothing but the cost shape. The build runs once per
    * session (Bench's warmup absorbs it), so the timed number is the
    * per-batch probe cost. */
  def standingVecAdmission(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val tag = (d.hashCode.toLong & 0xffffffffL).toHexString
    val name = s"graft_vec_idx_$tag"
    if (!SimilarityOps.vecIndexMatches(s, name, d))
      SimilarityOps.buildVecIndex(s, emb.filter(col("vec_id") >= 100), name,
        nCentroids = 16,
        location = s"${sys.props("java.io.tmpdir")}/graft_vec_idx/$tag",
        datasetTag = d)
    SimilarityOps
      .probeVecIndex(s, emb.filter(col("vec_id") < 100), name,
        nProbe = 2, threshold = 0.35)
      .orderBy("vec_id")
  }

  // ---- q127: contrastive pair mining --------------------------------------
  // Anchors = vec_id < 5; per anchor, the 5 most similar SAME-label
  // neighbors ('pos') and the 5 most similar DIFFERENT-label neighbors
  // ('neg' — hard negatives). Exercises the corpus's label column; the
  // plan is the q27 broadcast-anchor shape with a (query, kind) window.

  def contrastive(s: SparkSession, d: String): DataFrame =
    SimilarityOps.contrastivePairs(embeddings(s, d), col("vec_id") < 5, k = 5)
      .orderBy("query_id", "kind", "rank")

  private val contrastiveSql =
    s"""WITH corpus AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings
       |), normed AS (
       |  SELECT vec_id, label, v, sqrt(${duckDot("v", "v")}) AS norm FROM corpus
       |),
       |scored AS (
       |  SELECT q.vec_id AS query_id,
       |    CASE WHEN c.label = q.label THEN 'pos' ELSE 'neg' END AS kind,
       |    c.vec_id AS neighbor_id, c.label,
       |    ${duckDot("q.v", "c.v")} / (q.norm * c.norm) AS cosine
       |  FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 5
       |),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id, kind
       |    ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, kind, CAST(rank AS BIGINT) AS rank, neighbor_id,
       |  label, round(cosine, 6) AS cosine
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, kind, rank""".stripMargin

  // ---- q181: binary (1-bit) quantization + Hamming ANN recall ------------
  // The serving tier BELOW q89's int8: sign-bit codes (⌈d/32⌉ BIGINT
  // words — 32-bit words because bit 63 of a signed 64-bit word overflows
  // checked engines), Hamming ranking via bit_count(XOR) — integer-only
  // scoring, exact in both engines with no rounding discipline — and
  // recall@k against the exact cosine top-k (q27's relation, same
  // tie-breaks). See SimilarityOps.binaryHammingRecall for the
  // map-only-code / broadcast-query / WindowGroupLimit scale shape.

  private val bqK = 5
  private val bqWords = 2

  def binaryHamming(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .binaryHammingRecall(embeddings(s, d), col("vec_id") < 10, k = bqK)
      .orderBy("query_id", "rank")

  private val binaryHammingSql =
    s"""WITH $duckCorpus,
       |coded AS (
       |  SELECT vec_id, list_transform(range($bqWords), w ->
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(32), i ->
       |      CASE WHEN v[w * 32 + i + 1] > 0 THEN CAST(1 AS BIGINT) << i
       |           ELSE CAST(0 AS BIGINT) END)), (a, b) -> a | b)) AS code
       |  FROM corpus
       |),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range($bqWords),
       |      w -> bit_count(xor(q.code[w + 1], c.code[w + 1])))) AS BIGINT) AS hamming
       |  FROM coded q JOIN coded c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10
       |),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY hamming ASC, neighbor_id ASC) AS rank
       |  FROM scored
       |),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY ${duckDot("q.v", "c.v")} / (q.norm * c.norm) DESC, c.vec_id ASC) AS rnk
       |    FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < 10) WHERE rnk <= $bqK
       |),
       |hits AS (
       |  SELECT r.query_id, CAST(r.rank AS BIGINT) AS rank, r.neighbor_id,
       |    r.hamming,
       |    CASE WHEN e.neighbor_id IS NOT NULL THEN CAST(1 AS BIGINT)
       |         ELSE CAST(0 AS BIGINT) END AS hit
       |  FROM ranked r
       |  LEFT JOIN exact e
       |    ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
       |  WHERE r.rank <= $bqK
       |)
       |SELECT query_id, rank, neighbor_id, hamming, hit,
       |  round(CAST(SUM(hit) OVER (PARTITION BY query_id) AS DOUBLE) / $bqK, 6) AS recall
       |FROM hits
       |ORDER BY query_id, rank""".stripMargin

  // ---- q191: two-stage BQ serving (Hamming shortlist → exact re-rank) ----
  // The production answer to q181's recall numbers: a coarse 1-bit
  // Hamming scan shortlists c = 50 candidates per query (integer-only,
  // 10% of this corpus; ~0.1% at production scale), then exact cosine
  // re-ranks ONLY the shortlist — float math touches |queries|·c
  // vectors instead of the corpus. recall@k against q27's exact top-k
  // shows what the shortlist recovers over the raw 1-bit ranking.

  private val rerankC = 50

  def binaryRerank(s: SparkSession, d: String): DataFrame =
    SimilarityOps
      .binaryRerankRecall(embeddings(s, d), col("vec_id") < 10, k = bqK,
        c = rerankC)
      .orderBy("query_id", "rank")

  private val binaryRerankSql =
    s"""WITH $duckCorpus,
       |coded AS (
       |  SELECT vec_id, list_transform(range($bqWords), w ->
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(32), i ->
       |      CASE WHEN v[w * 32 + i + 1] > 0 THEN CAST(1 AS BIGINT) << i
       |           ELSE CAST(0 AS BIGINT) END)), (a, b) -> a | b)) AS code
       |  FROM corpus
       |),
       |hscored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range($bqWords),
       |      w -> bit_count(xor(q.code[w + 1], c.code[w + 1])))) AS BIGINT) AS hamming
       |  FROM coded q JOIN coded c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10
       |),
       |shortlist AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY hamming ASC, neighbor_id ASC) AS hrank
       |    FROM hscored) WHERE hrank <= $rerankC
       |),
       |rescored AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    ${duckDot("q.v", "c.v")} / (q.norm * c.norm) AS cosine
       |  FROM shortlist s
       |  JOIN normed q ON q.vec_id = s.query_id
       |  JOIN normed c ON c.vec_id = s.neighbor_id
       |),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM rescored
       |),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY ${duckDot("q.v", "c.v")} / (q.norm * c.norm) DESC, c.vec_id ASC) AS rnk
       |    FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < 10) WHERE rnk <= $bqK
       |),
       |hits AS (
       |  SELECT r.query_id, CAST(r.rank AS BIGINT) AS rank, r.neighbor_id,
       |    round(r.cosine, 6) AS cosine,
       |    CASE WHEN e.neighbor_id IS NOT NULL THEN CAST(1 AS BIGINT)
       |         ELSE CAST(0 AS BIGINT) END AS hit
       |  FROM ranked r
       |  LEFT JOIN exact e
       |    ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
       |  WHERE r.rank <= $bqK
       |)
       |SELECT query_id, rank, neighbor_id, cosine, hit,
       |  round(CAST(SUM(hit) OVER (PARTITION BY query_id) AS DOUBLE) / $bqK, 6) AS recall
       |FROM hits
       |ORDER BY query_id, rank""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q191_binary_rerank", binaryRerank, Some(binaryRerankSql)),
    Q("q127_contrastive_pairs", contrastive, Some(contrastiveSql)),
    Q("q27_cosine_topk", cosineTopK, Some(cosineTopKSql)),
    Q("q28_lsh_topk", lshTopK, Some(lshTopKSql)),
    Q("q29_cosine_pairs", cosinePairs, Some(cosinePairsSql)),
    Q("q49_ivf_topk", ivfTopK, Some(ivfTopKSql)),
    Q("q135_ann_recall", annRecall, Some(annRecallSql)),
    Q("q139_ann_ndcg", annNdcg, Some(annNdcgSql)),
    Q("q216_mrl_recall", mrlRecall, Some(mrlRecallSql)),
    Q("q74_ivf_nprobe", ivfNprobe, Some(ivfNprobeSql)),
    Q("q65_kmeans_train", kmeansTrain, Some(kmeansTrainSql)),
    Q("q76_ivf_trained", ivfTrained, Some(ivfTrainedSql)),
    Q("q77_cosine_clusters", cosineClusters, Some(cosineClustersSql)),
    Q("q84_kmeans_coreset", kmeansCoreset, Some(kmeansCoresetSql)),
    Q("q174_embedding_drift", embeddingDrift, Some(embeddingDriftSql)),
    Q("q89_int8_quant", int8Quant, Some(int8QuantSql)),
    Q("q92_int8_serve", int8Serve, Some(int8ServeSql)),
    Q("q105_pq_train", pqTrain, Some(pqTrainSql)),
    Q("q106_pq_serve", pqServe, Some(pqServeSql)),
    Q("q99_embedding_admission", embeddingAdmission, Some(embeddingAdmissionSql)),
    Q("q110_standing_vec", standingVecAdmission, Some(embeddingAdmissionSql)),
    Q("q111_ivfadc", ivfadc, Some(ivfadcSql)),
    Q("q113_semdedup", semDedupQuery, Some(semDedupSql)),
    Q("q117_semdedup_capped", semDedupCappedQuery, Some(semDedupCappedSql)),
    Q("q118_cluster_quota", clusterQuotaSample, Some(clusterQuotaSampleSql)),
    Q("q181_binary_hamming", binaryHamming, Some(binaryHammingSql)),
  )
}

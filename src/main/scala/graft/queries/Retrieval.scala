package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.text.RetrievalOps

/** Retrieval/corpus-statistics queries over `documents`: vocabulary
  * dictionary (q80), TF-IDF top terms (q78), BM25 query scoring (q79),
  * context packing (q81). Tokenization is the engine-wide single-space
  * split so every oracle reproduces the counts exactly; every float is
  * rounded to 6 decimals BEFORE ranking (Q.scala determinism rules).
  */
object Retrieval extends QueryModule {

  // ---- q100: KMV distinct-count sketch ------------------------------------
  // Per-language distinct-token cardinality two ways: the exact
  // count(DISTINCT) (one row per distinct key through the exchange) and
  // the bottom-k KMV estimate (O(k) state, O(k × partitions)
  // communication). KMV over a SET is deterministic — the k smallest
  // distinct hashes don't depend on partitioning or order — so the
  // oracle replays the estimate EXACTLY, not just its error bound.
  // k=64 < per-lang vocab here, so the estimate regime is exercised.

  def kmvDistinct(s: SparkSession, d: String): DataFrame = {
    import graft.functions.{Hashing, KmvDistinct}
    documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .select(col("lang"), Hashing.poly_hash(col("term")).as("h"))
      .groupBy("lang")
      .agg(
        KmvDistinct.kmv_distinct(col("h"), 64, graft.text.TextOps.P)
          .as("est_distinct"),
        countDistinct(col("h")).as("n_distinct"))
      .orderBy("lang")
  }

  private val kmvDistinctSql =
    s"""WITH tok AS (
       |  SELECT lang,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(t.term, ''), c -> CAST(ord(c) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % 1000000007) AS h
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |),
       |dh AS (SELECT DISTINCT lang, h FROM tok),
       |rk AS (
       |  SELECT lang, h,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS r,
       |    count(*) OVER (PARTITION BY lang) AS nd
       |  FROM dh
       |)
       |SELECT lang,
       |  CAST(CASE WHEN max(nd) < 64 THEN max(nd)
       |       ELSE 63 * 1000000007 // (max(CASE WHEN r = 64 THEN h END) + 1)
       |       END AS BIGINT) AS est_distinct,
       |  CAST(max(nd) AS BIGINT) AS n_distinct
       |FROM rk
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  // ---- q101: unigram distribution drift (corpus QA) ------------------------
  // Reference slice = doc_id % 3 == 0; current = the rest. Per-language
  // KL(current ‖ reference) over the union vocab with add-one smoothing,
  // each term's contribution int64-quantized pre-sum.

  def unigramDrift(s: SparkSession, d: String): DataFrame =
    RetrievalOps.unigramDrift(documents(s, d), col("doc_id") % 3 === 0)
      .orderBy("lang")

  private val unigramDriftSql =
    """WITH tok AS (
      |  SELECT lang, t.term, (doc_id % 3 = 0) AS is_ref
      |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
      |),
      |cfr AS (
      |  SELECT lang, term, count(*) AS cf_ref FROM tok WHERE is_ref GROUP BY lang, term
      |),
      |cfc AS (
      |  SELECT lang, term, count(*) AS cf_cur FROM tok WHERE NOT is_ref GROUP BY lang, term
      |),
      |j AS (
      |  SELECT COALESCE(cfr.lang, cfc.lang) AS lang,
      |    COALESCE(cfr.term, cfc.term) AS term,
      |    COALESCE(cf_ref, 0) AS cf_ref, COALESCE(cf_cur, 0) AS cf_cur
      |  FROM cfr FULL OUTER JOIN cfc ON cfr.lang = cfc.lang AND cfr.term = cfc.term
      |),
      |tot AS (
      |  SELECT lang, sum(cf_ref) AS t_ref, sum(cf_cur) AS t_cur,
      |    count(*) AS v_union
      |  FROM j GROUP BY lang
      |),
      |terms AS (
      |  SELECT j.lang,
      |    CAST(round(
      |      ((CAST(cf_cur AS DOUBLE) + 1.0) / CAST(t_cur + v_union AS DOUBLE))
      |      * ln(((CAST(cf_cur AS DOUBLE) + 1.0) / CAST(t_cur + v_union AS DOUBLE))
      |         / ((CAST(cf_ref AS DOUBLE) + 1.0) / CAST(t_ref + v_union AS DOUBLE)))
      |      * 1e12, 0) AS BIGINT) AS term_fp,
      |    t_ref, t_cur, v_union
      |  FROM j JOIN tot ON tot.lang = j.lang
      |)
      |SELECT lang, CAST(max(t_ref) AS BIGINT) AS t_ref,
      |  CAST(max(t_cur) AS BIGINT) AS t_cur,
      |  CAST(max(v_union) AS BIGINT) AS v_union,
      |  round(CAST(sum(term_fp) AS DOUBLE) / 1e12, 6) AS kl
      |FROM terms
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---- q80: vocabulary dictionary (df / cf / smoothed idf) ---------------

  def vocabStats(s: SparkSession, d: String): DataFrame =
    RetrievalOps.vocabulary(documents(s, d)).orderBy("term")

  private val vocabStatsSql =
    """WITH tok AS (
      |  SELECT doc_id, t.term
      |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
      |),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT term,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
      |  CAST(count(*) AS BIGINT) AS cf,
      |  round(ln((n.n_docs + 1.0) / (count(DISTINCT doc_id) + 1.0)) + 1.0, 6) AS idf
      |FROM tok CROSS JOIN n
      |GROUP BY term, n.n_docs
      |ORDER BY term""".stripMargin

  // ---- q78: TF-IDF top terms per document --------------------------------

  def tfidfTerms(s: SparkSession, d: String): DataFrame =
    RetrievalOps.tfIdfTopTerms(documents(s, d), k = 3).orderBy("doc_id", "rank")

  private val tfidfTermsSql =
    """WITH tf AS (
      |  SELECT doc_id, t.term, CAST(count(*) AS BIGINT) AS tf
      |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
      |  GROUP BY doc_id, t.term
      |),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term,
      |    round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
      |  FROM tf JOIN df USING (term) CROSS JOIN n
      |),
      |rk AS (
      |  SELECT doc_id, term, tfidf,
      |    CAST(row_number() OVER (PARTITION BY doc_id
      |      ORDER BY tfidf DESC, term) AS BIGINT) AS rank
      |  FROM scored
      |)
      |SELECT doc_id, rank, term, tfidf FROM rk
      |WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  // ---- q79: BM25 scoring against a fixed query-term set ------------------

  private val bmTerms = Seq("join", "customer", "filter")
  private val bmK1 = 1.2
  private val bmB = 0.75

  def bm25(s: SparkSession, d: String): DataFrame =
    RetrievalOps.bm25TopK(documents(s, d), bmTerms, bmK1, bmB, topN = 20)
      .orderBy(col("score").desc, col("doc_id").asc)

  private val bm25Sql = {
    // mirror the Spark expression shape term by term, same fold order
    val tfExpr = bmTerms.map(t =>
      s"CAST(len(list_filter(string_split(text, ' '), x -> x = '$t')) AS BIGINT) AS tf_$t")
      .mkString(",\n      |    ")
    val dfExpr = bmTerms.map(t =>
      s"CAST(sum(CASE WHEN list_contains(string_split(text, ' '), '$t') THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
      .mkString(",\n      |    ")
    val scoreTerms = bmTerms.map(t =>
      s"ln(1.0 + (n_docs - df_$t + 0.5) / (df_$t + 0.5)) * (tf_$t * ($bmK1 + 1.0)) / (tf_$t + $bmK1 * (1.0 - $bmB + $bmB * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))")
      .mkString(" + ")
    s"""WITH per_doc AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
      |    $tfExpr
      |  FROM documents
      |),
      |stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_dl,
      |    $dfExpr
      |  FROM documents
      |)
      |SELECT doc_id, dl, round($scoreTerms, 6) AS score
      |FROM per_doc CROSS JOIN stats
      |ORDER BY score DESC, doc_id
      |LIMIT 20""".stripMargin
  }

  // ---- q102: hybrid retrieval via reciprocal-rank fusion -------------------
  // Queries = docs 0..9 (their text for BM25, their embedding for cosine);
  // each list is top-10, fused as rrf = Σ 1/(60 + rank), final top-5.

  def hybridRrf(s: SparkSession, d: String): DataFrame = {
    val lex = RetrievalOps.bm25PerQuery(documents(s, d),
      col("doc_id") < 10, bmK1, bmB, k = 10)
    val sem = graft.similarity.SimilarityOps.cosineTopK(
      embeddings(s, d), col("vec_id") < 10, k = 10)
    RetrievalOps.hybridTopK(lex, sem, rrfK = 60, kOut = 5)
      .orderBy("query_id", "rank")
  }

  private val hybridRrfSql = {
    val duckDot =
      "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(len(%1$s)), i -> %1$s[i+1] * %2$s[i+1])), (acc, x) -> acc + x)"
    s"""WITH sized AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM documents
       |),
       |tf AS (
       |  SELECT doc_id, dl, t.term, count(*) AS tf
       |  FROM sized, unnest(tk) AS t(term)
       |  GROUP BY doc_id, dl, t.term
       |),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM sized),
       |qt AS (
       |  SELECT DISTINCT doc_id AS query_id, t.term
       |  FROM sized, unnest(tk) AS t(term) WHERE doc_id < 10
       |),
       |contrib AS (
       |  SELECT qt.query_id, tf.doc_id,
       |    CAST(round(ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
       |      * (tf.tf * ($bmK1 + 1.0))
       |      / (tf.tf + $bmK1 * (1.0 - $bmB + $bmB * tf.dl / (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))
       |      * 1e9, 0) AS BIGINT) AS c_fp
       |  FROM tf JOIN qt USING (term) JOIN df USING (term) CROSS JOIN st
       |  WHERE tf.doc_id <> qt.query_id
       |),
       |lexs AS (
       |  SELECT query_id, doc_id,
       |    round(CAST(sum(c_fp) AS DOUBLE) / 1e9, 6) AS score
       |  FROM contrib GROUP BY query_id, doc_id
       |),
       |lexr AS (
       |  SELECT query_id, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS r_lex
       |  FROM lexs
       |),
       |corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |normed AS (
       |  SELECT vec_id, v, sqrt(${duckDot.format("v", "v")}) AS norm FROM corpus
       |),
       |sems AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
       |    ${duckDot.format("q.v", "c.v")} / (q.norm * c.norm) AS cosine
       |  FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10
       |),
       |semr AS (
       |  SELECT query_id, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id ASC) AS r_sem
       |  FROM sems
       |),
       |fused AS (
       |  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
       |    COALESCE(l.doc_id, s.doc_id) AS doc_id,
       |    round(COALESCE(1.0 / (60 + l.r_lex), 0.0)
       |        + COALESCE(1.0 / (60 + s.r_sem), 0.0), 6) AS rrf
       |  FROM (SELECT * FROM lexr WHERE r_lex <= 10) l
       |  FULL OUTER JOIN (SELECT * FROM semr WHERE r_sem <= 10) s
       |    ON s.query_id = l.query_id AND s.doc_id = l.doc_id
       |),
       |ranked AS (
       |  SELECT query_id, doc_id, rrf,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rank
       |  FROM fused
       |)
       |SELECT query_id, rank, doc_id, rrf
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---- q87: temperature-scaled language mixing weights -------------------

  /** Multilingual sampling-temperature weights (mT5/XLM-R recipe) at
    * α = 0.5 over the language strata — see RetrievalOps.mixWeights. */
  def mixWeights(s: SparkSession, d: String): DataFrame =
    RetrievalOps.mixWeights(documents(s, d), "lang", alpha = 0.5)
      .orderBy("lang")

  private val mixWeightsSql =
    """WITH per_lang AS (
      |  SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY lang
      |),
      |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS t_total FROM per_lang),
      |scored AS (
      |  SELECT lang, tokens,
      |    CAST(tokens AS DOUBLE) / t_total AS p,
      |    CAST(round(pow(CAST(tokens AS DOUBLE) / t_total, 0.5) * 1e12, 0) AS BIGINT) AS pow_fp
      |  FROM per_lang CROSS JOIN tot
      |),
      |ps AS (SELECT CAST(sum(pow_fp) AS BIGINT) AS pow_total FROM scored)
      |SELECT lang, tokens,
      |  round(p, 6) AS p,
      |  round(CAST(pow_fp AS DOUBLE) / pow_total, 6) AS mix_weight,
      |  round(CAST(pow_fp AS DOUBLE) / pow_total / p, 6) AS boost
      |FROM scored CROSS JOIN ps
      |ORDER BY lang""".stripMargin

  // ---- q85: PMI bigram collocations --------------------------------------

  def pmiCollocations(s: SparkSession, d: String): DataFrame =
    RetrievalOps.pmiCollocations(documents(s, d), minCount = 10L, topN = 20)
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)

  private val pmiCollocationsSql =
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS th FROM documents
      |),
      |bg AS (
      |  SELECT th[r.i + 1] AS w1, th[r.i + 2] AS w2, count(*) AS n
      |  FROM toks, unnest(CASE WHEN len(th) >= 2 THEN range(len(th) - 1) ELSE [] END) AS r(i)
      |  GROUP BY th[r.i + 1], th[r.i + 2]
      |),
      |uni AS (
      |  SELECT t.term, count(*) AS c1
      |  FROM toks, unnest(th) AS t(term) GROUP BY t.term
      |),
      |tot AS (
      |  SELECT CAST(sum(len(th)) AS BIGINT) AS t_total,
      |    CAST(sum(greatest(len(th) - 1, 0)) AS BIGINT) AS b_total
      |  FROM toks
      |)
      |SELECT bg.w1, bg.w2, CAST(bg.n AS BIGINT) AS n,
      |  round(ln((CAST(bg.n AS DOUBLE) / b_total) /
      |    ((CAST(a.c1 AS DOUBLE) / t_total) * (CAST(b.c1 AS DOUBLE) / t_total))), 6) AS pmi
      |FROM bg
      |JOIN uni a ON a.term = bg.w1
      |JOIN uni b ON b.term = bg.w2
      |CROSS JOIN tot
      |WHERE bg.n >= 10
      |ORDER BY pmi DESC, bg.w1, bg.w2
      |LIMIT 20""".stripMargin

  // ---- q82: unigram perplexity quality signal ----------------------------

  def unigramPpl(s: SparkSession, d: String): DataFrame =
    RetrievalOps.unigramPerplexity(documents(s, d)).orderBy("doc_id")

  private val unigramPplSql =
    """WITH tok AS (
      |  SELECT doc_id, t.term
      |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
      |),
      |cf AS (SELECT term, count(*) AS cf FROM tok GROUP BY term),
      |tot AS (SELECT count(*) AS t_total FROM tok),
      |lnp AS (
      |  SELECT term,
      |    CAST(round(ln(CAST(cf AS DOUBLE) / t_total) * 1e9, 0) AS BIGINT)
      |      AS lnp_fp
      |  FROM cf CROSS JOIN tot
      |),
      |agg AS (
      |  SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(sum(lnp.lnp_fp) AS BIGINT) AS s_fp
      |  FROM tok JOIN lnp USING (term)
      |  GROUP BY tok.doc_id
      |)
      |SELECT doc_id, n_tokens,
      |  round(exp(-(CAST(s_fp AS DOUBLE) / 1e9) / n_tokens), 6) AS ppl
      |FROM agg
      |ORDER BY doc_id""".stripMargin

  // ---- q98: bigram stupid-backoff held-out scoring -----------------------
  // Model = even doc_ids; held-out = odd. Seen bigrams score
  // ln(bf/cf(w1)); unseen back off to ln(0.4) + add-one unigram. Scoring
  // a DISJOINT slice is what exercises the backoff branch.

  def bigramBackoff(s: SparkSession, d: String): DataFrame =
    RetrievalOps.bigramBackoffScore(documents(s, d), col("doc_id") % 2 === 0)
      .orderBy("doc_id")

  private val bigramBackoffSql =
    """WITH mtok AS (
      |  SELECT t.term FROM documents, unnest(string_split(text, ' ')) AS t(term)
      |  WHERE doc_id % 2 = 0
      |),
      |cf AS (SELECT term, count(*) AS cf FROM mtok GROUP BY term),
      |st AS (SELECT count(*) AS t_total, count(DISTINCT term) AS v_size FROM mtok),
      |mth AS (
      |  SELECT doc_id, string_split(text, ' ') AS th FROM documents WHERE doc_id % 2 = 0
      |),
      |mp AS (
      |  SELECT th[j + 1] AS w1, th[j + 2] AS w2
      |  FROM mth, unnest(CASE WHEN len(th) >= 2 THEN range(len(th) - 1) ELSE [] END) AS u(j)
      |),
      |bf AS (SELECT w1, w2, count(*) AS bf FROM mp GROUP BY w1, w2),
      |hth AS (
      |  SELECT doc_id, string_split(text, ' ') AS th FROM documents WHERE doc_id % 2 <> 0
      |),
      |hp AS (
      |  SELECT doc_id, th[j + 1] AS w1, th[j + 2] AS w2
      |  FROM hth, unnest(CASE WHEN len(th) >= 2 THEN range(len(th) - 1) ELSE [] END) AS u(j)
      |),
      |sc AS (
      |  SELECT hp.doc_id,
      |    CASE WHEN bf.bf IS NOT NULL
      |      THEN CAST(round(ln(CAST(bf.bf AS DOUBLE) / CAST(c1.cf AS DOUBLE)) * 1e9, 0) AS BIGINT)
      |      ELSE CAST(round(ln(0.4) * 1e9, 0) AS BIGINT)
      |         + CAST(round(ln((CAST(COALESCE(c2.cf, 0) AS DOUBLE) + 1.0)
      |             / CAST(st.t_total + st.v_size AS DOUBLE)) * 1e9, 0) AS BIGINT)
      |    END AS lnp_fp
      |  FROM hp
      |  LEFT JOIN bf ON bf.w1 = hp.w1 AND bf.w2 = hp.w2
      |  LEFT JOIN cf c1 ON c1.term = hp.w1
      |  LEFT JOIN cf c2 ON c2.term = hp.w2
      |  CROSS JOIN st
      |),
      |agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(lnp_fp) AS BIGINT) AS s_fp
      |  FROM sc GROUP BY doc_id
      |)
      |SELECT doc_id, n_pairs,
      |  round(exp(-(CAST(s_fp AS DOUBLE) / 1e9) / n_pairs), 6) AS ppl
      |FROM agg
      |ORDER BY doc_id""".stripMargin

  // ---- q165: interpolated Kneser–Ney bigram held-out scoring -------------
  // The principled counterpart to q98's stupid backoff: discounted bigram
  // mass interpolated with the CONTINUATION (type-count) unigram, fixed
  // D = 0.75. Model = even doc_ids, held-out = odd — the disjoint slice
  // keeps both the discount and the unseen-context branch live. All
  // counts derive from one bigram-type relation; the probability is the
  // shared RetrievalOps.knPStr expression in both engines.

  def kneserNey(s: SparkSession, d: String): DataFrame =
    RetrievalOps.kneserNeyScore(documents(s, d), col("doc_id") % 2 === 0)
      .orderBy("doc_id")

  private val kneserNeySql =
    s"""WITH mtok AS (
       |  SELECT t.term FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE doc_id % 2 = 0
       |),
       |st AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v_size FROM mtok),
       |mth AS (
       |  SELECT doc_id, string_split(text, ' ') AS th FROM documents WHERE doc_id % 2 = 0
       |),
       |mp AS (
       |  SELECT th[j + 1] AS w1, th[j + 2] AS w2
       |  FROM mth, unnest(CASE WHEN len(th) >= 2 THEN range(len(th) - 1) ELSE [] END) AS u(j)
       |),
       |bf AS MATERIALIZED (SELECT w1, w2, CAST(count(*) AS BIGINT) AS bf FROM mp GROUP BY w1, w2),
       |cl AS (
       |  SELECT w1, CAST(sum(bf) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS n1l
       |  FROM bf GROUP BY w1
       |),
       |nr AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1r FROM bf GROUP BY w2),
       |tb AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM bf),
       |hth AS (
       |  SELECT doc_id, string_split(text, ' ') AS th FROM documents WHERE doc_id % 2 <> 0
       |),
       |hp AS (
       |  SELECT doc_id, th[j + 1] AS w1, th[j + 2] AS w2
       |  FROM hth, unnest(CASE WHEN len(th) >= 2 THEN range(len(th) - 1) ELSE [] END) AS u(j)
       |),
       |sc AS (
       |  SELECT hp.doc_id,
       |    CAST(round(ln(${RetrievalOps.knPStr}) * 1e9, 0) AS BIGINT) AS lnp_fp
       |  FROM hp
       |  LEFT JOIN bf ON bf.w1 = hp.w1 AND bf.w2 = hp.w2
       |  LEFT JOIN cl ON cl.w1 = hp.w1
       |  LEFT JOIN nr ON nr.w2 = hp.w2
       |  CROSS JOIN tb CROSS JOIN st
       |),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(lnp_fp) AS BIGINT) AS s_fp
       |  FROM sc GROUP BY doc_id
       |)
       |SELECT doc_id, n_pairs,
       |  round(exp(-(CAST(s_fp AS DOUBLE) / 1e9) / n_pairs), 6) AS ppl
       |FROM agg
       |ORDER BY doc_id""".stripMargin

  // ---- q198: standing bigram LM (incremental KN admission + capped serve) --
  // The q143 road applied to q165's family, the wall SCALE.md named: at
  // ~10⁹ bigram types the model-sized pin becomes a STORED standing
  // model. Admission appends additive (w1,w2) / unigram count deltas
  // (fingerprint replay guard, never re-counting the corpus); serving
  // re-aggregates the live deltas to exact counts, caps the model at the
  // top-V bigram types by the TOTAL (bf DESC, w1, w2) order (q161's
  // frozen-serving discipline — V = 512 binds at both SFs), derives KN's
  // non-additive type statistics (n1l, n1r, T) from the capped relation,
  // and scores arrivals with the shared knPStr expression. The oracle
  // fits q165's model on the admitted slice directly, caps identically,
  // and scores the arrivals — its hash match proves delta-maintained
  // admission ≡ the one-shot fit (append ≡ rebuild at the driver grain).

  private val knTopV = 512

  def standingBigramLm(s: SparkSession, d: String): DataFrame = {
    import graft.text.BigramStore
    val docs = documents(s, d)
    val tag = (d.hashCode.toLong & 0xffffffffL).toHexString
    val name = s"graft_bglm_$tag"
    val loc = s"${sys.props("java.io.tmpdir")}/graft_bglm/$tag"
    if (!BigramStore.matches(s, name, d)) {
      val admitted = docs.filter(col("doc_id") % 10 >= 2)
      // two-stage admission exercises the delta path on the driver's own
      // data: build from half, append the rest, seal via the final tag
      BigramStore.build(s, admitted.filter(col("doc_id") % 2 === 0),
        name, loc, datasetTag = s"$d:building")
      BigramStore.append(s, admitted.filter(col("doc_id") % 2 === 1), name)
      import s.implicits._
      Seq(Tuple1(d)).toDF("dataset_tag")
        .write.mode("overwrite").option("path", s"$loc/meta")
        .saveAsTable(s"${name}_meta")
    }
    BigramStore.serveKn(s, docs.filter(col("doc_id") % 10 < 2), name, knTopV)
      .orderBy("doc_id")
  }

  private def standingBigramLmSql: String =
    s"""WITH mtok AS (
       |  SELECT t.term FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE doc_id % 10 >= 2
       |),
       |st AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v_size FROM mtok),
       |mth AS (
       |  SELECT doc_id, string_split(text, ' ') AS th FROM documents WHERE doc_id % 10 >= 2
       |),
       |mp AS (
       |  SELECT th[j + 1] AS w1, th[j + 2] AS w2
       |  FROM mth, unnest(CASE WHEN len(th) >= 2 THEN range(len(th) - 1) ELSE [] END) AS u(j)
       |),
       |bf0 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS bf FROM mp GROUP BY w1, w2),
       |bf AS MATERIALIZED (
       |  SELECT w1, w2, bf FROM bf0 ORDER BY bf DESC, w1, w2 LIMIT $knTopV
       |),
       |cl AS (
       |  SELECT w1, CAST(sum(bf) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS n1l
       |  FROM bf GROUP BY w1
       |),
       |nr AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1r FROM bf GROUP BY w2),
       |tb AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM bf),
       |hth AS (
       |  SELECT doc_id, string_split(text, ' ') AS th FROM documents WHERE doc_id % 10 < 2
       |),
       |hp AS (
       |  SELECT doc_id, th[j + 1] AS w1, th[j + 2] AS w2
       |  FROM hth, unnest(CASE WHEN len(th) >= 2 THEN range(len(th) - 1) ELSE [] END) AS u(j)
       |),
       |sc AS (
       |  SELECT hp.doc_id,
       |    CAST(round(ln(${RetrievalOps.knPStr}) * 1e9, 0) AS BIGINT) AS lnp_fp
       |  FROM hp
       |  LEFT JOIN bf ON bf.w1 = hp.w1 AND bf.w2 = hp.w2
       |  LEFT JOIN cl ON cl.w1 = hp.w1
       |  LEFT JOIN nr ON nr.w2 = hp.w2
       |  CROSS JOIN tb CROSS JOIN st
       |),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(lnp_fp) AS BIGINT) AS s_fp
       |  FROM sc GROUP BY doc_id
       |)
       |SELECT doc_id, n_pairs,
       |  round(exp(-(CAST(s_fp AS DOUBLE) / 1e9) / n_pairs), 6) AS ppl
       |FROM agg
       |ORDER BY doc_id""".stripMargin

  // ---- q211: standing TRIGRAM LM (the store family generalized in n) ------
  // One more additive delta table on q198's store — (w1, w2, w3, tf)
  // batch deltas through the identical fingerprint-dedup / tombstone-
  // compaction machinery — proving the standing-store discipline
  // generalizes in n (the r16 verdict's ask). Serving is stupid backoff
  // (Brants et al. 2007, q98 raised one order): capped-trigram ML →
  // 0.4 · capped-bigram ML → 0.4² · add-one unigram, each level's
  // context total derived from the same capped relation it scores from
  // (the q198 self-consistency discipline). The oracle fits the model
  // on the admitted slice directly and caps identically, so the hash
  // proves append ≡ rebuild at the trigram grain.

  private def standingTrigramLm(s: SparkSession, d: String): DataFrame = {
    import graft.text.BigramStore
    val docs = documents(s, d)
    val tag = (d.hashCode.toLong & 0xffffffffL).toHexString
    val name = s"graft_trglm_$tag"
    val loc = s"${sys.props("java.io.tmpdir")}/graft_trglm/$tag"
    if (!BigramStore.matchesTri(s, name, d)) {
      val admitted = docs.filter(col("doc_id") % 10 >= 2)
      BigramStore.buildTri(s, admitted.filter(col("doc_id") % 2 === 0),
        name, loc, datasetTag = s"$d:building")
      BigramStore.appendTri(s, admitted.filter(col("doc_id") % 2 === 1), name)
      import s.implicits._
      Seq(Tuple1(d)).toDF("dataset_tag")
        .write.mode("overwrite").option("path", s"$loc/meta")
        .saveAsTable(s"${name}_meta")
    }
    BigramStore.serveBackoff(s, docs.filter(col("doc_id") % 10 < 2), name, knTopV)
      .orderBy("doc_id")
  }

  private def standingTrigramLmSql: String =
    s"""WITH mtok AS (
       |  SELECT t.term FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE doc_id % 10 >= 2
       |),
       |cf AS MATERIALIZED (SELECT term AS w, CAST(count(*) AS BIGINT) AS cf FROM mtok GROUP BY 1),
       |st AS (
       |  SELECT CAST(SUM(cf) AS BIGINT) AS t_total,
       |    CAST(count(*) AS BIGINT) AS v_size
       |  FROM cf
       |),
       |mth AS (
       |  SELECT doc_id, string_split(text, ' ') AS th FROM documents WHERE doc_id % 10 >= 2
       |),
       |mtr AS (
       |  SELECT th[j + 1] AS w1, th[j + 2] AS w2, th[j + 3] AS w3
       |  FROM mth, unnest(CASE WHEN len(th) >= 3 THEN range(len(th) - 2) ELSE [] END) AS u(j)
       |),
       |tf0 AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS tf FROM mtr GROUP BY 1, 2, 3),
       |tri AS MATERIALIZED (
       |  SELECT w1, w2, w3, tf FROM tf0 ORDER BY tf DESC, w1, w2, w3 LIMIT $knTopV
       |),
       |c12 AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c12 FROM tri GROUP BY 1, 2),
       |mp AS (
       |  SELECT th[j + 1] AS w1, th[j + 2] AS w2
       |  FROM mth, unnest(CASE WHEN len(th) >= 2 THEN range(len(th) - 1) ELSE [] END) AS u(j)
       |),
       |bf0 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS bf FROM mp GROUP BY w1, w2),
       |bf AS MATERIALIZED (
       |  SELECT w1, w2, bf FROM bf0 ORDER BY bf DESC, w1, w2 LIMIT $knTopV
       |),
       |c2 AS (SELECT w1 AS w2, CAST(SUM(bf) AS BIGINT) AS c2 FROM bf GROUP BY 1),
       |hth AS (
       |  SELECT doc_id, string_split(text, ' ') AS th FROM documents WHERE doc_id % 10 < 2
       |),
       |htr AS (
       |  SELECT doc_id, th[j + 1] AS w1, th[j + 2] AS w2, th[j + 3] AS w3
       |  FROM hth, unnest(CASE WHEN len(th) >= 3 THEN range(len(th) - 2) ELSE [] END) AS u(j)
       |),
       |scj AS (
       |  SELECT hp.doc_id, tri.tf AS tf, c12.c12 AS c12, bg.bf AS bf,
       |    c2.c2 AS c2, u3.cf AS cf3, st.t_total, st.v_size
       |  FROM htr hp
       |  LEFT JOIN tri ON tri.w1 = hp.w1 AND tri.w2 = hp.w2 AND tri.w3 = hp.w3
       |  LEFT JOIN c12 ON c12.w1 = hp.w1 AND c12.w2 = hp.w2
       |  LEFT JOIN bf bg ON bg.w1 = hp.w2 AND bg.w2 = hp.w3
       |  LEFT JOIN c2 ON c2.w2 = hp.w2
       |  LEFT JOIN cf u3 ON u3.w = hp.w3
       |  CROSS JOIN st
       |),
       |sc AS (
       |  SELECT doc_id, ${graft.text.BigramStore.backoffLnpStr} AS lnp_fp FROM scj
       |),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triples,
       |    CAST(sum(lnp_fp) AS BIGINT) AS s_fp
       |  FROM sc GROUP BY doc_id
       |)
       |SELECT doc_id, n_triples,
       |  round(exp(-(CAST(s_fp AS DOUBLE) / 1e9) / n_triples), 6) AS ppl
       |FROM agg
       |ORDER BY doc_id""".stripMargin

  // ---- q81: fixed-budget context packing ---------------------------------

  def contextPack(s: SparkSession, d: String): DataFrame =
    RetrievalOps.contextPack(documents(s, d), budgetTokens = 512L)
      .orderBy("lang", "doc_id")

  private val contextPackSql =
    """WITH sized AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      |  FROM documents
      |),
      |cum AS (
      |  SELECT doc_id, lang, tokens,
      |    CAST(sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id) - tokens
      |      AS BIGINT) AS start
      |  FROM sized
      |)
      |SELECT doc_id, lang, tokens,
      |  start // 512 AS pack_id,
      |  start % 512 AS pack_offset
      |FROM cum
      |ORDER BY lang, doc_id""".stripMargin

  // ---- q91: SHARDED context packing --------------------------------------

  /** q81's layout with the |langs| parallelism ceiling removed: every
    * language splits into doc_id % 4 sub-streams with independent cumsums
    * (pure row function — reproducible on any engine/partitioning); a pack
    * is addressed by (lang, shard, pack_id). */
  def contextPackSharded(s: SparkSession, d: String): DataFrame =
    RetrievalOps.contextPack(documents(s, d), budgetTokens = 512L,
        numShards = 4)
      .orderBy("lang", "shard", "doc_id")

  private val contextPackShardedSql =
    """WITH sized AS (
      |  SELECT doc_id, lang, doc_id % 4 AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      |  FROM documents
      |),
      |cum AS (
      |  SELECT doc_id, lang, shard, tokens,
      |    CAST(sum(tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id)
      |      - tokens AS BIGINT) AS start
      |  FROM sized
      |)
      |SELECT doc_id, lang, shard, tokens,
      |  start // 512 AS pack_id,
      |  start % 512 AS pack_offset
      |FROM cum
      |ORDER BY lang, shard, doc_id""".stripMargin

  // ---- q88: heavy-hitter terms via bounded-memory Space-Saving -----------

  /** Capacity 64 > the corpus vocabulary at every SF, so the sketch runs in
    * its exact regime and hash-matches the exact top-20 — while keeping the
    * 100 TB plan shape (fixed-size partials, no term-keyed shuffle).
    * SpaceSavingSpec covers the overflow regime the oracle can't. */
  def heavyHitters(s: SparkSession, d: String): DataFrame =
    RetrievalOps.heavyHitters(documents(s, d), capacity = 64, k = 20)
      .orderBy("rank")

  private val heavyHittersSql =
    """WITH tok AS (
      |  SELECT t.term
      |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
      |),
      |cf AS (SELECT term, count(*) AS cf FROM tok GROUP BY term),
      |rk AS (
      |  SELECT term, cf,
      |    CAST(row_number() OVER (ORDER BY cf DESC, term) AS BIGINT) AS rank
      |  FROM cf
      |)
      |SELECT rank, term, CAST(cf AS BIGINT) AS est_cf, CAST(0 AS BIGINT) AS err
      |FROM rk WHERE rank <= 20
      |ORDER BY rank""".stripMargin

  // ---- q93: BPE merge induction ------------------------------------------
  // The tokenizer-training loop (Sennrich 2016) the packing/mixing layer
  // presupposes: 12 rounds of most-frequent-adjacent-pair merging from
  // characters, deterministic tie-break, oracle = a generated CTE chain
  // replaying every round (the q65 unrolled-iterations pattern). Runs the
  // DRIVER-FINISHED trainer (one word-count aggregation, merge loop over
  // the vocabulary on the driver — the shape that survives 30k merges);
  // the relational per-round form is spec-pinned row-identical and the
  // oracle is unchanged.

  // ---- the standing tokenizer-model store (train once, serve many) --------
  // The r16 verdict's top item: q200/q201/q202/q206 each retrained the
  // unigram model (q206 also re-ran the BPE merge loop) inside the query
  // — 4 of the 5 most expensive suite members, ~20 s of pure re-training.
  // Now the FIRST tokenizer query to run trains both families once and
  // persists them under the dataset-tagged store (graft.text
  // .TokenizerStore — the q198 discipline); every tokenizer query serves
  // from the stored model. The oracles still train inline, so every hash
  // match PROVES store-serve ≡ inline-train at the driver grain.

  private val bpeRounds = 12

  private def tokenizerStoreName(s: SparkSession, d: String): String = {
    import graft.text.TokenizerStore
    val tag = (d.hashCode.toLong & 0xffffffffL).toHexString
    val name = s"graft_tok_$tag"
    val loc = s"${sys.props("java.io.tmpdir")}/graft_tok/$tag"
    TokenizerStore.ensure(s, documents(s, d), name, loc,
      ulmRounds, ulmCapV, bpeRounds, d)
    name
  }

  /** The stored (piece, lnp_fp) unigram serving model for dataset `d`. */
  private def storedUnigram(s: SparkSession, d: String): DataFrame =
    graft.text.TokenizerStore.vocab(s, tokenizerStoreName(s, d))
      .select("piece", "lnp_fp")

  def bpeMerges(s: SparkSession, d: String): DataFrame =
    s.table(s"${tokenizerStoreName(s, d)}_merges").orderBy("round")

  private val bpeMergesSql = graft.text.BpeOps.mergesOracleSql(12)

  // ---- q200: unigram-LM tokenizer training (SentencePiece's algorithm) ----
  // The second mainstream subword family next to BPE (Kudo 2018; q93's
  // counterpart): pieces carry probabilities, tokenization is maximum-
  // likelihood segmentation. Two hard-EM (Viterbi) rounds from the
  // substring seed, +1 char floor each M-step, top-24 cap with chars
  // retained — the full rationale and determinism argument live on
  // graft.text.UnigramLmOps; the oracle replays the identical rounds as
  // generated recursive-CTE blocks (the q65 unrolled-iterations
  // pattern). Output: the final vocabulary with exact counts and the
  // 1e9-fixed-point serving log-probs.

  private val ulmRounds = 2
  private val ulmCapV = 24

  def unigramLmTrain(s: SparkSession, d: String): DataFrame =
    graft.text.TokenizerStore.vocab(s, tokenizerStoreName(s, d))
      .orderBy("piece")

  private def unigramLmTrainSql: String =
    s"""WITH RECURSIVE ${graft.text.UnigramLmOps.oracleCtes(ulmRounds, ulmCapV)}
       |SELECT f.piece, f.cnt, m.lnp_fp
       |FROM ufin f JOIN umf m USING (piece)
       |ORDER BY f.piece""".stripMargin

  // ---- q201: unigram-LM segmentation + fertility (the serving half) -------
  // Serve the q200 model: Viterbi-segment every distinct word once
  // (vocabulary-bounded), then join the per-doc word stream against the
  // |vocab|-row best-segmentation relation — per doc the word count,
  // piece count, and fertility (pieces per word, the q170 metric on the
  // unigram tokenizer). The corpus is scanned once; the expensive
  // enumeration never touches it.

  /** The q201/q202/q207 shared tail — UnigramLmOps.fertility, sorted. */
  private def fertilityOf(docs: DataFrame, perWord: DataFrame): DataFrame =
    graft.text.UnigramLmOps.fertility(docs, perWord).orderBy("doc_id")

  def unigramLmSegment(s: SparkSession, d: String): DataFrame = {
    import graft.text.UnigramLmOps
    val docs = documents(s, d)
    val best = UnigramLmOps.viterbiBest(
      UnigramLmOps.wordFreqs(docs).select("w"), storedUnigram(s, d))
      .select(col("w"), col("np"))
    fertilityOf(docs, best)
  }

  private def unigramLmSegmentSql: String = {
    val ops = graft.text.UnigramLmOps
    s"""WITH RECURSIVE ${ops.oracleCtes(ulmRounds, ulmCapV)},
       |${ops.serveSegCtes(ulmRounds + 1)},
       |dw AS (
       |  SELECT doc_id, t.term AS w
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |)
       |SELECT dw.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(SUM(b.np) AS BIGINT) AS n_pieces,
       |  round(CAST(SUM(b.np) AS DOUBLE) / count(*), 6) AS fertility
       |FROM dw JOIN ubest${ulmRounds + 1} b ON b.w = dw.w
       |GROUP BY dw.doc_id
       |ORDER BY dw.doc_id""".stripMargin
  }

  // ---- q202: WordPiece-rule (greedy) segmentation over the q200 vocab -----
  // The third decoding family: maximum-munch longest-prefix matching (the
  // WordPiece serving rule; Song et al. 2021's "Fast WordPiece" is this
  // walk linearized) under the SAME capped unigram vocabulary as q201's
  // Viterbi — so per doc, q202.fertility − q201.fertility is the price
  // of greedy decoding in isolation, the comparison a tokenizer bake-off
  // actually wants. Single-path integer walk: the longest vocab match at
  // every (word, position) is one vocabulary-bounded join; the char
  // floor guarantees a match everywhere, so the walk always terminates
  // at the word end.

  def wordpieceSegment(s: SparkSession, d: String): DataFrame = {
    import graft.text.UnigramLmOps
    val docs = documents(s, d)
    fertilityOf(docs,
      UnigramLmOps.greedyCounts(UnigramLmOps.wordFreqs(docs).select("w"),
        storedUnigram(s, d)))
  }

  private def wordpieceSegmentSql: String = {
    val ops = graft.text.UnigramLmOps
    s"""WITH RECURSIVE ${ops.oracleCtes(ulmRounds, ulmCapV)},
       |${ops.greedySegCtes()},
       |dw AS (
       |  SELECT doc_id, t.term AS w
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |)
       |SELECT dw.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(SUM(b.np) AS BIGINT) AS n_pieces,
       |  round(CAST(SUM(b.np) AS DOUBLE) / count(*), 6) AS fertility
       |FROM dw JOIN ugw b ON b.w = dw.w
       |GROUP BY dw.doc_id
       |ORDER BY dw.doc_id""".stripMargin
  }

  // ---- q206: tokenizer bake-off — BPE vs unigram-Viterbi vs WordPiece -----
  // The composed comparison a model team actually reads before picking a
  // tokenizer (the Rust et al. 2021 fertility table across FAMILIES):
  // per language, the fertility of all three in-engine tokenizers — the
  // learned 12-round BPE (q94), the trained unigram LM decoded by
  // Viterbi (q201), and the same unigram vocabulary decoded by greedy
  // maximum-munch (q202) — in ONE relation with one shared denominator
  // (the identical nonempty-word count). The q155 composition
  // discipline: each trainer runs once, the unigram model is pinned and
  // feeds BOTH decoders, and the corpus word stream is read once for
  // the word-level pair.
  //
  // Scale shape: BPE's merge table is driver-finished (q93's documented
  // shape) then map-only; the unigram side is one corpus word count +
  // vocabulary-bounded decoding joined broadcast; rollups are
  // |langs|-bounded.

  def tokenizerBakeoff(s: SparkSession, d: String): DataFrame = {
    import graft.text.{BpeOps, TokenizerStore, UnigramLmOps}
    val docs = documents(s, d)
    val name = tokenizerStoreName(s, d)
    val bpe = BpeOps.segmentCountsWith(docs, TokenizerStore.bpeMergePairs(s, name))
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .groupBy("lang")
      .agg(sum("n_words").as("n_words"), sum("n_subwords").as("s_bpe"))
    val fin = TokenizerStore.vocab(s, name)
    val words = UnigramLmOps.wordFreqs(docs).select("w").localCheckpoint()
    // The two serving walks are independent driver-paced loops of mostly
    // single-task checkpoint jobs over the SAME words — built sequentially
    // they serialize ~40 tiny jobs end to end. Build them on two driver
    // threads so the scheduler interleaves their rounds (guide §2.6
    // overlap-independent-jobs); results are order-independent.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val fVit = Future(UnigramLmOps.viterbiBest(words, fin.select("piece", "lnp_fp"))
      .select(col("w"), col("np").as("np_v")))
    val fGre = Future(UnigramLmOps.greedyCounts(words, fin)
      .select(col("w"), col("np").as("np_g")))
    val perWord = Await.result(fVit, scala.concurrent.duration.Duration.Inf)
      .join(Await.result(fGre, scala.concurrent.duration.Duration.Inf), Seq("w"))
    val uni = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .join(broadcast(perWord), Seq("w"))
      .groupBy("lang").agg(sum("np_v").as("s_vit"), sum("np_g").as("s_gre"))
    bpe.join(uni, Seq("lang"))
      .selectExpr("lang", "n_words",
        "round(CAST(s_bpe AS DOUBLE) / n_words, 6) AS fert_bpe",
        "round(CAST(s_vit AS DOUBLE) / n_words, 6) AS fert_unigram",
        "round(CAST(s_gre AS DOUBLE) / n_words, 6) AS fert_wordpiece")
      .orderBy("lang")
  }

  private def tokenizerBakeoffSql: String = {
    val ops = graft.text.UnigramLmOps
    s"""WITH RECURSIVE ${graft.text.BpeOps.segmentCtes(12)},
       |${ops.oracleCtes(ulmRounds, ulmCapV)},
       |${ops.serveSegCtes(ulmRounds + 1)},
       |${ops.greedySegCtes()},
       |bl AS (
       |  SELECT d.lang, CAST(SUM(b.n_words) AS BIGINT) AS n_words,
       |    CAST(SUM(b.n_subwords) AS BIGINT) AS s_bpe
       |  FROM bseg b JOIN documents d USING (doc_id)
       |  GROUP BY d.lang
       |),
       |dwl AS (
       |  SELECT lang, t.term AS w
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |),
       |ul AS (
       |  SELECT dwl.lang, CAST(SUM(v.np) AS BIGINT) AS s_vit,
       |    CAST(SUM(g.np) AS BIGINT) AS s_gre
       |  FROM dwl
       |  JOIN ubest${ulmRounds + 1} v ON v.w = dwl.w
       |  JOIN ugw g ON g.w = dwl.w
       |  GROUP BY dwl.lang
       |)
       |SELECT bl.lang, bl.n_words,
       |  round(CAST(s_bpe AS DOUBLE) / bl.n_words, 6) AS fert_bpe,
       |  round(CAST(s_vit AS DOUBLE) / bl.n_words, 6) AS fert_unigram,
       |  round(CAST(s_gre AS DOUBLE) / bl.n_words, 6) AS fert_wordpiece
       |FROM bl JOIN ul ON ul.lang = bl.lang
       |ORDER BY bl.lang""".stripMargin
  }

  // ---- q207: tokenizer store-serve on ARRIVALS (train/apply split) ---------
  // The pipeline shape the store exists for: the tokenizer trains on the
  // corpus snapshot (doc_id % 10 ≥ 2, the q198 admission slice) and is
  // then APPLIED to data it never saw (doc_id % 10 < 2) — per arrival
  // doc the word/piece counts and fertility under the frozen stored
  // model. This is also where the OOV fallback is structurally live:
  // arrival words may carry characters the training slice never
  // produced, and the serve must count them (at the OovLnpFp floor)
  // instead of silently dropping the word (the fixture's slices share
  // one alphabet, so the fallback set is empty THERE — the divergence is
  // spec-planted, the q196/q202 non-vacuity protocol). The oracle trains
  // inline on the same slice and serves with the mirrored fallback
  // block, so the hash pins store-serve ≡ inline-train end to end.
  //
  // Scale shape: training cost is paid once at build (store hit on every
  // later call); the serve is one arrival-corpus scan joined broadcast
  // against the |vocab|-row best-segmentation relation.

  def tokenizerStoreServe(s: SparkSession, d: String): DataFrame = {
    import graft.text.{TokenizerStore, UnigramLmOps}
    val docs = documents(s, d)
    val arrivals = docs.filter(col("doc_id") % 10 < 2)
    val tag = (d.hashCode.toLong & 0xffffffffL).toHexString
    val name = s"graft_tokadm_$tag"
    val loc = s"${sys.props("java.io.tmpdir")}/graft_tokadm/$tag"
    TokenizerStore.ensure(s, docs.filter(col("doc_id") % 10 >= 2), name, loc,
      ulmRounds, ulmCapV, bpeRounds = 0, datasetTag = s"$d:adm")
    val best = UnigramLmOps.viterbiBest(
      UnigramLmOps.wordFreqs(arrivals).select("w"),
      TokenizerStore.vocab(s, name).select("piece", "lnp_fp"))
      .select(col("w"), col("np"))
    fertilityOf(arrivals, best)
  }

  private def tokenizerStoreServeSql: String = {
    val ops = graft.text.UnigramLmOps
    s"""WITH RECURSIVE ${ops.oracleCtes(ulmRounds, ulmCapV,
        docsSrc = "(SELECT * FROM documents WHERE doc_id % 10 >= 2)")},
       |awf AS (
       |  SELECT DISTINCT t.term AS w
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE doc_id % 10 < 2 AND t.term <> ''
       |),
       |${ops.serveSegCtes(ulmRounds + 1, wordsSrc = "awf")},
       |dw AS (
       |  SELECT doc_id, t.term AS w
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE doc_id % 10 < 2
       |)
       |SELECT dw.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(SUM(b.np) AS BIGINT) AS n_pieces,
       |  round(CAST(SUM(b.np) AS DOUBLE) / count(*), 6) AS fertility
       |FROM dw JOIN ubest${ulmRounds + 1} b ON b.w = dw.w
       |GROUP BY dw.doc_id
       |ORDER BY dw.doc_id""".stripMargin
  }

  // ---- q94: BPE segmentation (the serving half of q93) --------------------
  // Apply the learned 12-round merge table to every document as one
  // map-only chained-replace projection; per-doc subword counts are the
  // packing-budget statistic under the REAL tokenizer.

  def bpeSegment(s: SparkSession, d: String): DataFrame =
    graft.text.BpeOps.segmentCountsWith(documents(s, d),
        graft.text.TokenizerStore.bpeMergePairs(s, tokenizerStoreName(s, d)))
      .orderBy("doc_id")

  private val bpeSegmentSql = graft.text.BpeOps.segmentOracleSql(12)

  // ---- q170: tokenizer fertility by language ------------------------------
  // The multilingual-tokenizer efficiency statistic (subwords per word —
  // Rust et al. 2021's fertility): roll the q94 per-doc segmentation
  // counts under the learned 12-round BPE up to the language grain.
  // High-fertility languages burn more context budget per word — the
  // number the packing (q81/q91) and mixing (q87) layers should see.
  // One doc-keyed join of two projections of the same table + a
  // |langs|-bounded aggregate; the oracle embeds the q94 chain verbatim
  // as a subquery.

  def bpeFertility(s: SparkSession, d: String): DataFrame =
    bpeFertilityWith(documents(s, d),
      graft.text.TokenizerStore.bpeMergePairs(s, tokenizerStoreName(s, d)))
      .orderBy("lang")

  /** The q170 body — split out so specs can drive small corpora at a
    * hand-checkable merge count. */
  private[graft] def bpeFertilityOf(docs: DataFrame, rounds: Int): DataFrame =
    bpeFertilityWith(docs,
      graft.text.BpeOps.mergesDriver(docs, rounds).orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)

  private def bpeFertilityWith(docs: DataFrame,
      ms: Seq[(String, String)]): DataFrame = {
    val seg = graft.text.BpeOps.segmentCountsWith(docs, ms)
    docs.select(col("doc_id"), col("lang"))
      .join(seg, Seq("doc_id"))
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"), sum("n_words").as("words"),
        sum("n_subwords").as("subwords"))
      .selectExpr("lang", "docs", "CAST(words AS BIGINT) AS words",
        "CAST(subwords AS BIGINT) AS subwords",
        "CASE WHEN words > 0 THEN round(CAST(subwords AS DOUBLE) / words, 6) END AS fertility")
  }

  private val bpeFertilitySql =
    s"""WITH seg AS (
       |  SELECT * FROM (${graft.text.BpeOps.segmentOracleSql(12)})
       |)
       |SELECT d.lang, CAST(count(*) AS BIGINT) AS docs,
       |  CAST(SUM(seg.n_words) AS BIGINT) AS words,
       |  CAST(SUM(seg.n_subwords) AS BIGINT) AS subwords,
       |  CASE WHEN SUM(seg.n_words) > 0 THEN round(CAST(SUM(seg.n_subwords) AS DOUBLE) / SUM(seg.n_words), 6) END AS fertility
       |FROM seg JOIN documents d ON d.doc_id = seg.doc_id
       |GROUP BY d.lang
       |ORDER BY d.lang""".stripMargin

  // ---- q149: Zipf slope of the term-frequency head -------------------------
  // The corpus-statistics sanity check (does the token distribution look
  // like natural language?): OLS of ln(frequency) on ln(rank) over the
  // top-100 terms — natural corpora fit slope ≈ −1. Log values are
  // integerized per point BEFORE the moment sums (products overflow
  // int64 → DECIMAL(38,0)/HUGEINT), so the regression consumes exact
  // integers and the final slope/intercept are shared-string double ops.
  // Vocabulary-sized work after one token aggregate; the rank window is
  // vocab-bounded.

  private val zipfTop = 100

  private val zipfSlopeStr =
    "CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE) / " +
      "CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"
  private val zipfInterceptStr =
    s"(CAST(sy AS DOUBLE) - ($zipfSlopeStr) * CAST(sx AS DOUBLE)) / (n * 1e9)"

  def zipfSlope(s: SparkSession, d: String): DataFrame = {
    val cf = documents(s, d)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cf"))
    val ranked = cf
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cf").desc, col("term").asc)).cast("long"))
      .filter(col("rank") <= zipfTop)
      .selectExpr("CAST(round(ln(rank) * 1e9, 0) AS BIGINT) AS lx",
        "CAST(round(ln(cf) * 1e9, 0) AS BIGINT) AS ly")
    ranked
      .agg(expr("COUNT(*)").as("n"), expr("SUM(lx)").as("sx"),
        expr("SUM(ly)").as("sy"),
        expr("SUM(CAST(lx AS DECIMAL(38,0)) * lx)").as("sxx"),
        expr("SUM(CAST(lx AS DECIMAL(38,0)) * ly)").as("sxy"))
      .selectExpr("n", s"round($zipfSlopeStr, 6) AS slope",
        s"round($zipfInterceptStr, 6) AS intercept")
  }

  private val zipfSlopeSql =
    s"""WITH cf AS (
       |  SELECT t.term, count(*) AS cf
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  GROUP BY t.term
       |),
       |ranked AS (
       |  SELECT CAST(round(ln(rank) * 1e9, 0) AS BIGINT) AS lx,
       |    CAST(round(ln(cf) * 1e9, 0) AS BIGINT) AS ly
       |  FROM (SELECT cf, ROW_NUMBER() OVER (ORDER BY cf DESC, term ASC) AS rank
       |        FROM cf)
       |  WHERE rank <= $zipfTop
       |),
       |mom AS (
       |  SELECT COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
       |    SUM(CAST(lx AS HUGEINT) * lx) AS sxx,
       |    SUM(CAST(lx AS HUGEINT) * ly) AS sxy
       |  FROM ranked
       |)
       |SELECT CAST(n AS BIGINT) AS n, round($zipfSlopeStr, 6) AS slope,
       |  round($zipfInterceptStr, 6) AS intercept
       |FROM mom""".stripMargin

  // ---- q161: capped-vocabulary frozen-model scoring ----------------------
  // The WEB-SCALE serving shape of q82, fully in-engine (the batch twin
  // of StreamOps.unigramModelCapped): freeze a unigram model on the
  // reference slice (even doc_ids) but keep only the top-V terms by
  // corpus frequency (deterministic (cf DESC, term ASC) tie-break);
  // normalization stays the FULL corpus total, so a retained term's ln p
  // is identical to the exact model's and every truncated-tail or unseen
  // token takes the same OOV floor ln(1/total). Scoring the held-out
  // slice (odd doc_ids) exercises both branches.
  //
  // Scale shape: the vocabulary relation is pinned once (two consumers:
  // the grand total and the cap); top-V is TakeOrdered (top-V per
  // partition, merged — NOT a global sort, the q151 lesson applied to
  // model freezing); the V-row model broadcasts to the scoring side,
  // which never shuffles anything but its own per-doc aggregate.

  private val CapV = 64

  def cappedPpl(s: SparkSession, d: String): DataFrame =
    cappedPplCore(documents(s, d), CapV)

  /** The q161 body over any (doc_id, text) frame — split out (with the
    * cap a parameter) so specs can pin capped ≡ exact and the one-sided
    * drift when the cap binds. */
  private[graft] def cappedPplCore(docs: DataFrame, capV: Int): DataFrame = {
    val cf = docs.filter(col("doc_id") % 2 === 0)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cf"))
      .localCheckpoint() // vocabulary-bounded, two consumers
    val tot = cf.agg(sum("cf").as("t_total"))
    val lnp = cf.orderBy(col("cf").desc, col("term").asc).limit(capV)
      .crossJoin(broadcast(tot))
      .selectExpr("term",
        "CAST(round(ln(CAST(cf AS DOUBLE) / t_total) * 1e9, 0) AS BIGINT) AS lnp_fp")
    docs.filter(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .join(broadcast(lnp), Seq("term"), "left")
      .crossJoin(broadcast(tot))
      .selectExpr("doc_id",
        "COALESCE(lnp_fp, CAST(round(ln(1.0 / t_total) * 1e9, 0) AS BIGINT)) AS fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"), sum("fp").as("s_fp"))
      .selectExpr("doc_id", "n_tokens",
        "round(exp(-(CAST(s_fp AS DOUBLE) / 1e9) / n_tokens), 6) AS ppl")
      .orderBy("doc_id")
  }

  private val cappedPplSql =
    s"""WITH mtok AS (
       |  SELECT t.term
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE doc_id % 2 = 0
       |),
       |cf AS (SELECT term, count(*) AS cf FROM mtok GROUP BY term),
       |tot AS (SELECT count(*) AS t_total FROM mtok),
       |lnp AS (
       |  SELECT term,
       |    CAST(round(ln(CAST(cf AS DOUBLE) / t_total) * 1e9, 0) AS BIGINT)
       |      AS lnp_fp
       |  FROM cf CROSS JOIN tot
       |  ORDER BY cf DESC, term ASC LIMIT $CapV
       |),
       |htok AS (
       |  SELECT doc_id, t.term
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE doc_id % 2 <> 0
       |),
       |sc AS (
       |  SELECT doc_id,
       |    COALESCE(lnp.lnp_fp,
       |      CAST(round(ln(1.0 / t_total) * 1e9, 0) AS BIGINT)) AS fp
       |  FROM htok LEFT JOIN lnp USING (term) CROSS JOIN tot
       |),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(fp) AS BIGINT) AS s_fp
       |  FROM sc GROUP BY doc_id
       |)
       |SELECT doc_id, n_tokens,
       |  round(exp(-(CAST(s_fp AS DOUBLE) / 1e9) / n_tokens), 6) AS ppl
       |FROM agg
       |ORDER BY doc_id""".stripMargin

  // ---- q205: CCNet perplexity buckets (head / middle / tail) ---------------
  // The curation idiom of CCNet (Wenzek et al. 2020) that downstream
  // pipelines consume as a quality label: score every document's
  // perplexity under a frozen reference LM (the q161 capped model,
  // trained on even doc_ids), then per LANGUAGE split the corpus into
  // head/middle/tail terciles — head = lowest perplexity. Buckets are
  // assigned by VALUE CUTOFFS, not per-doc ranks (CCNet's own method:
  // thresholds from the distribution, membership by comparison): the
  // cutoff is the smallest mean-NLL value whose cumulative doc count
  // reaches n/3 (then 2n/3), computed on the per-(lang, knll)
  // DISTINCT-VALUE relation — so ties share a bucket, membership is a
  // pure function of (model, score), and the only window runs over the
  // aggregated distinct relation partitioned by lang (the q150/q151
  // discipline: never a doc-grain global rank).
  //
  // Determinism of the bucket key (r16 ADVICE): perplexity is MONOTONE
  // in the exact integer mean NLL, so membership keys on
  // knll = CAST(-s_fp AS DOUBLE) / n_tokens — both operands exact
  // integers < 2^53, and IEEE division is CORRECTLY ROUNDED (unlike
  // exp/ln, which vary across libm/DuckDB builds at the last ulp), so
  // the key is bit-identical in any engine and no tercile boundary can
  // ULP-flip. exp() survives only in the DISPLAY ppl column. The 2^53
  // bound: |s_fp| ≈ 12e9·n_tokens holds to n_tokens ≈ 7.5e5 per doc —
  // beyond that, pre-divide s_fp by a power of two on both sides.
  //
  // Scale shape: one scoring pass (broadcast V-row model), one doc-grain
  // aggregate; the cutoff machinery is distinct-value-bounded; the final
  // bucket label is a broadcast-join comparison. At the 100 TB regime
  // CCNet derives cutoffs from a SAMPLE — q197's deterministic
  // hash-sample slots in front of the cutoff relation unchanged.

  def pplBuckets(s: SparkSession, d: String): DataFrame =
    pplBucketsCore(documents(s, d))

  /** The q205/q209 scoring pass: per (doc_id, lang) the exact integer
    * NLL sum and the knll bucket key, under the frozen even-doc model. */
  private def pplScored(docs: DataFrame): DataFrame = {
    val cf = docs.filter(col("doc_id") % 2 === 0)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cf"))
      .localCheckpoint()
    val tot = cf.agg(sum("cf").as("t_total"))
    val lnp = cf.orderBy(col("cf").desc, col("term").asc).limit(CapV)
      .crossJoin(broadcast(tot))
      .selectExpr("term",
        "CAST(round(ln(CAST(cf AS DOUBLE) / t_total) * 1e9, 0) AS BIGINT) AS lnp_fp")
    docs
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("term"))
      .join(broadcast(lnp), Seq("term"), "left")
      .crossJoin(broadcast(tot))
      .selectExpr("doc_id", "lang",
        "COALESCE(lnp_fp, CAST(round(ln(1.0 / t_total) * 1e9, 0) AS BIGINT)) AS fp")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).cast("long").as("n_tokens"), sum("fp").as("s_fp"))
      .selectExpr("doc_id", "lang", "n_tokens", "s_fp",
        "CAST(-s_fp AS DOUBLE) / n_tokens AS knll")
      .localCheckpoint() // doc-grain facts; 2 consumers (cutoffs + labels)
  }

  /** Per-lang tercile VALUE cutoffs over a (lang, knll) doc relation:
    * the smallest distinct knll whose cumulative count reaches n/3 and
    * 2n/3 — distinct-value-bounded, lang-partitioned window only. */
  private def pplCuts(scored: DataFrame): DataFrame = {
    val dist = scored.groupBy("lang", "knll").agg(count(lit(1)).as("c"))
    val nl = scored.groupBy("lang").agg(count(lit(1)).as("n"))
    dist.withColumn("cum",
      sum("c").over(org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("knll")))
      .join(broadcast(nl), Seq("lang"))
      .groupBy("lang")
      .agg(expr("MIN(CASE WHEN cum * 3 >= n THEN knll END)").as("cut1"),
        expr("MIN(CASE WHEN cum * 3 >= 2 * n THEN knll END)").as("cut2"))
  }

  /** The q205 body over any (doc_id, lang, text) frame — spec-plantable. */
  private[graft] def pplBucketsCore(docs: DataFrame): DataFrame = {
    val scored = pplScored(docs)
    scored.join(broadcast(pplCuts(scored)), Seq("lang"))
      .selectExpr("doc_id", "lang", "n_tokens",
        "round(exp(-(CAST(s_fp AS DOUBLE) / 1e9) / n_tokens), 6) AS ppl",
        "CASE WHEN knll <= cut1 THEN 'head' " +
          "WHEN knll <= cut2 THEN 'middle' ELSE 'tail' END AS bucket")
      .orderBy("doc_id")
  }

  // ---- q209: q205's cutoffs from a deterministic hash-SAMPLE ---------------
  // The scale posture q205 documented but didn't execute (the exact
  // q188→q197 move): at 100 TB CCNet derives its tercile cutoffs from a
  // SAMPLE of the scored corpus — the cutoff relation is an estimation
  // problem, not a production pass — while every document is still
  // LABELED against those cutoffs. The sample gate is the q197 salted
  // slot (poly_hash("ppl-sample-v1:" ‖ doc_id) Knuth-mixed mod 1000 <
  // mill): membership is a pure projection of doc_id, reproducible
  // across engines/executions/cluster sizes. mill = 1000 degenerates to
  // q205's full cutoffs exactly (spec-pinned); a lang with an empty
  // sample labels all-'head' via the NULL-safe comparison (left join —
  // docs are never dropped by an unlucky sample).

  private val pplSampleMill = 500

  /** The q209 body: q205's scoring + labels, cutoffs from the sample. */
  private[graft] def pplBucketsSampledCore(docs: DataFrame, mill: Int): DataFrame = {
    import graft.functions.Hashing
    val gate = (Hashing.poly_hash(
      concat_ws(":", lit("ppl-sample-v1"), col("doc_id").cast("string")))
      * lit(2654435761L)) % lit(1000L) < lit(mill.toLong)
    val scored = pplScored(docs)
    scored.join(broadcast(pplCuts(scored.filter(gate))), Seq("lang"), "left")
      .selectExpr(s"CAST($mill AS BIGINT) AS sample_mill",
        "doc_id", "lang", "n_tokens",
        "round(exp(-(CAST(s_fp AS DOUBLE) / 1e9) / n_tokens), 6) AS ppl",
        "CASE WHEN cut2 IS NOT NULL AND knll > cut2 THEN 'tail' " +
          "WHEN cut1 IS NOT NULL AND knll > cut1 THEN 'middle' " +
          "ELSE 'head' END AS bucket")
      .orderBy("doc_id")
  }

  def pplBucketsSampled(s: SparkSession, d: String): DataFrame =
    pplBucketsSampledCore(documents(s, d), pplSampleMill)

  /** The shared q205/q209 scoring + cutoff CTE chain; `cutSrc` is the
    * doc relation the tercile cutoffs are computed over. */
  private def pplBucketsCtes(cutSrc: String): String =
    s"""mtok AS (
       |  SELECT t.term
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE doc_id % 2 = 0
       |),
       |cf AS (SELECT term, count(*) AS cf FROM mtok GROUP BY term),
       |tot AS (SELECT count(*) AS t_total FROM mtok),
       |lnp AS (
       |  SELECT term,
       |    CAST(round(ln(CAST(cf AS DOUBLE) / t_total) * 1e9, 0) AS BIGINT)
       |      AS lnp_fp
       |  FROM cf CROSS JOIN tot
       |  ORDER BY cf DESC, term ASC LIMIT $CapV
       |),
       |atok AS (
       |  SELECT doc_id, lang, t.term
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |),
       |sc AS (
       |  SELECT doc_id, lang,
       |    COALESCE(lnp.lnp_fp,
       |      CAST(round(ln(1.0 / t_total) * 1e9, 0) AS BIGINT)) AS fp
       |  FROM atok LEFT JOIN lnp USING (term) CROSS JOIN tot
       |),
       |scored AS (
       |  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(fp) AS BIGINT) AS s_fp,
       |    -- route HUGEINT sum through BIGINT: BIGINT→DOUBLE is exact
       |    -- below 2^53 on every build, HUGEINT→DOUBLE is not (q166)
       |    CAST(-CAST(sum(fp) AS BIGINT) AS DOUBLE) / count(*) AS knll
       |  FROM sc GROUP BY doc_id, lang
       |),
       |dist AS (SELECT lang, knll, count(*) AS c FROM $cutSrc GROUP BY 1, 2),
       |nl AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM $cutSrc GROUP BY lang),
       |cum AS (
       |  SELECT d.lang, d.knll,
       |    SUM(d.c) OVER (PARTITION BY d.lang ORDER BY d.knll) AS cum, nl.n
       |  FROM dist d JOIN nl ON nl.lang = d.lang
       |),
       |cuts AS (
       |  SELECT lang,
       |    MIN(CASE WHEN cum * 3 >= n THEN knll END) AS cut1,
       |    MIN(CASE WHEN cum * 3 >= 2 * n THEN knll END) AS cut2
       |  FROM cum GROUP BY lang
       |)""".stripMargin

  private val pplBucketsSql =
    s"""WITH ${pplBucketsCtes("scored")}
       |SELECT s.doc_id, s.lang, s.n_tokens,
       |  round(exp(-(CAST(s.s_fp AS DOUBLE) / 1e9) / s.n_tokens), 6) AS ppl,
       |  CASE WHEN s.knll <= c.cut1 THEN 'head'
       |    WHEN s.knll <= c.cut2 THEN 'middle' ELSE 'tail' END AS bucket
       |FROM scored s JOIN cuts c ON c.lang = s.lang
       |ORDER BY s.doc_id""".stripMargin

  /** DuckDB: polynomial char-fold hash (the TextDedup/Curation mirror). */
  private def duckHash(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($e, ''), c -> CAST(ord(c) AS BIGINT))), (acc, x) -> (acc * 31 + x) % ${graft.text.TextOps.P})"

  private val pplBucketsSampledSql =
    s"""WITH ${pplBucketsCtes(
      s"""(SELECT * FROM scored
         |   WHERE (${duckHash("'ppl-sample-v1:' || CAST(doc_id AS VARCHAR)")}
         |     * 2654435761) % 1000 < $pplSampleMill)""".stripMargin)}
       |SELECT CAST($pplSampleMill AS BIGINT) AS sample_mill,
       |  s.doc_id, s.lang, s.n_tokens,
       |  round(exp(-(CAST(s.s_fp AS DOUBLE) / 1e9) / s.n_tokens), 6) AS ppl,
       |  CASE WHEN c.cut2 IS NOT NULL AND s.knll > c.cut2 THEN 'tail'
       |    WHEN c.cut1 IS NOT NULL AND s.knll > c.cut1 THEN 'middle'
       |    ELSE 'head' END AS bucket
       |FROM scored s LEFT JOIN cuts c ON c.lang = s.lang
       |ORDER BY s.doc_id""".stripMargin

  // ---- q185: DoReMi-style domain reweighting ------------------------------
  // The excess-loss step of DoReMi (Xie et al. 2023) as one deterministic
  // relation: per domain (source), the held-out slice's mean NLL under
  // the GLOBAL frozen unigram model minus under the domain's OWN model —
  // a domain the global model underserves (positive excess) gets
  // upweighted w'_k ∝ baseline_k · exp(η · max(excess_k, 0)), the
  // multiplicative-weights update with the baseline as the prior. Models
  // train on even doc_ids, score odd doc_ids (the q161 freeze/score
  // split); baselines are full-corpus token shares derived from the two
  // passes already made (train totals + held counts — no third pass).
  //
  // Determinism: per-token ln p is 1e9-quantized under EACH model (the
  // q161 idiom) so per-domain sums are exact integers; excess and the
  // exp reweight are shared double expressions over those integers,
  // 1e12-quantized per domain (the q87 discipline) before the bounded
  // normalization sum.
  //
  // Scale shape: one corpus pass to train (vocab×K-bounded model,
  // pinned), one to score (two broadcast model joins, per-source
  // partial-combined aggregate); everything after is |sources|-bounded.

  private val doremiEta = 1.0

  /** The q185 body over any (doc_id, text, source) frame — split out so
    * specs can plant domains with known excess. */
  private[graft] def doremiCore(docs: DataFrame, eta: Double): DataFrame = {
    // the train/held split must be INDEPENDENT of source (doc_id parity
    // is not: the fixture's source IS a doc_id residue) — Knuth-mix
    // parity (the q57/q97 split construction) balances every domain.
    // doc_id is reduced mod P BEFORE the mix so the int64 product can
    // never overflow (wrap in Spark vs checked error in DuckDB for
    // doc_id ≳ 3.5e9); identical mod-P value either way.
    val isTrain = expr(
      s"((doc_id % ${graft.text.TextOps.P}L) * 2654435761L) % ${graft.text.TextOps.P}L % 2 = 0")
    // vocab×K-bounded model relation: one training pass, pinned for its
    // four consumers (domain model, domain totals, global model, total)
    val domCf = docs.filter(isTrain)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("cfk"))
      .localCheckpoint()
    val domTot = domCf.groupBy("source").agg(sum("cfk").as("tk"))
    val refCf = domCf.groupBy("term").agg(sum("cfk").as("cf"))
    val refTot = refCf.agg(sum("cf").as("tt"))
    val held = docs.filter(!isTrain)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .join(broadcast(refCf), Seq("term"), "left")
      .join(broadcast(domCf.select("source", "term", "cfk")),
        Seq("source", "term"), "left")
      .join(broadcast(domTot), Seq("source"), "left")
      .crossJoin(broadcast(refTot))
      // reference: the frozen global model with the 1-count OOV floor;
      // own: Jelinek-Mercer 0.5·domain + 0.5·global (the cheap analogue
      // of DoReMi's trained proxy — an unsmoothed per-domain unigram is
      // so sparse the global model always wins and excess never fires)
      .selectExpr("source",
        "CAST(round(ln(CAST(COALESCE(cf, 1) AS DOUBLE) / tt) * 1e9, 0) AS BIGINT) AS fp_ref",
        "CAST(round(ln(0.5 * CAST(COALESCE(cfk, 0) AS DOUBLE) / tk + 0.5 * CAST(COALESCE(cf, 1) AS DOUBLE) / tt) * 1e9, 0) AS BIGINT) AS fp_own")
      .groupBy("source")
      .agg(count(lit(1)).as("n_h"), sum("fp_ref").as("s_ref"),
        sum("fp_own").as("s_own"))
    // baseline share: train totals + held counts = full-corpus tokens
    val base = domTot.selectExpr("source", "tk AS tok")
      .unionByName(held.selectExpr("source", "n_h AS tok"))
      .groupBy("source").agg(sum("tok").as("tokens"))
    val nllRef = "-(CAST(s_ref AS DOUBLE) / 1e9) / n_h"
    val nllOwn = "-(CAST(s_own AS DOUBLE) / 1e9) / n_h"
    val excess =
      s"CASE WHEN s_ref IS NULL OR s_own IS NULL THEN 0.0 " +
        s"ELSE GREATEST(($nllRef) - ($nllOwn), 0.0) END"
    val scored = base
      .join(held, Seq("source"), "left")
      .crossJoin(broadcast(base.agg(sum("tokens").as("tot"))))
      .selectExpr("source", "tokens",
        "CAST(tokens AS DOUBLE) / tot AS p",
        s"round($nllRef, 6) AS nll_ref", s"round($nllOwn, 6) AS nll_own",
        s"round($excess, 6) AS excess",
        s"CAST(round(CAST(tokens AS DOUBLE) / tot * exp($eta * ($excess)) * 1e12, 0) AS BIGINT) AS w_fp")
      .localCheckpoint() // |sources|-bounded; weight normalization reads twice
    scored
      .crossJoin(broadcast(scored.agg(sum("w_fp").as("w_tot"))))
      .selectExpr("source", "tokens", "round(p, 6) AS p",
        "nll_ref", "nll_own", "excess",
        "round(CAST(w_fp AS DOUBLE) / w_tot, 6) AS mix_weight",
        "round(CAST(w_fp AS DOUBLE) / w_tot / p, 6) AS boost")
      .orderBy("source")
  }

  def doremiWeights(s: SparkSession, d: String): DataFrame =
    doremiCore(documents(s, d), doremiEta)

  private val doremiSql = {
    val nllRef = "-(CAST(s_ref AS DOUBLE) / 1e9) / n_h"
    val nllOwn = "-(CAST(s_own AS DOUBLE) / 1e9) / n_h"
    val excess =
      s"CASE WHEN s_ref IS NULL OR s_own IS NULL THEN 0.0 " +
        s"ELSE GREATEST(($nllRef) - ($nllOwn), 0.0) END"
    s"""WITH dtok AS (
       |  SELECT source, t.term
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE ((doc_id % 1000000007) * 2654435761) % 1000000007 % 2 = 0
       |),
       |domcf AS (SELECT source, term, count(*) AS cfk FROM dtok GROUP BY 1, 2),
       |domtot AS (SELECT source, CAST(SUM(cfk) AS BIGINT) AS tk FROM domcf GROUP BY 1),
       |refcf AS (SELECT term, CAST(SUM(cfk) AS BIGINT) AS cf FROM domcf GROUP BY 1),
       |reftot AS (SELECT CAST(SUM(cf) AS BIGINT) AS tt FROM refcf),
       |htok AS (
       |  SELECT source, t.term
       |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE ((doc_id % 1000000007) * 2654435761) % 1000000007 % 2 <> 0
       |),
       |held AS (
       |  SELECT h.source, CAST(count(*) AS BIGINT) AS n_h,
       |    SUM(CAST(round(ln(CAST(COALESCE(g.cf, 1) AS DOUBLE) / reftot.tt) * 1e9, 0) AS BIGINT)) AS s_ref,
       |    SUM(CAST(round(ln(0.5 * CAST(COALESCE(k.cfk, 0) AS DOUBLE) / dt.tk + 0.5 * CAST(COALESCE(g.cf, 1) AS DOUBLE) / reftot.tt) * 1e9, 0) AS BIGINT)) AS s_own
       |  FROM htok h
       |  LEFT JOIN refcf g ON g.term = h.term
       |  LEFT JOIN domcf k ON k.source = h.source AND k.term = h.term
       |  LEFT JOIN domtot dt ON dt.source = h.source
       |  CROSS JOIN reftot
       |  GROUP BY h.source
       |),
       |base AS (
       |  SELECT source, CAST(SUM(tok) AS BIGINT) AS tokens FROM (
       |    SELECT source, tk AS tok FROM domtot
       |    UNION ALL SELECT source, n_h AS tok FROM held
       |  ) GROUP BY source
       |),
       |btot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tot FROM base),
       |scored AS (
       |  SELECT base.source, tokens,
       |    CAST(tokens AS DOUBLE) / tot AS p,
       |    round($nllRef, 6) AS nll_ref, round($nllOwn, 6) AS nll_own,
       |    round($excess, 6) AS excess,
       |    CAST(round(CAST(tokens AS DOUBLE) / tot * exp($doremiEta * ($excess)) * 1e12, 0) AS BIGINT) AS w_fp
       |  FROM base LEFT JOIN held ON held.source = base.source CROSS JOIN btot
       |),
       |wtot AS (SELECT CAST(SUM(w_fp) AS BIGINT) AS w_tot FROM scored)
       |SELECT source, tokens, round(p, 6) AS p, nll_ref, nll_own, excess,
       |  round(CAST(w_fp AS DOUBLE) / w_tot, 6) AS mix_weight,
       |  round(CAST(w_fp AS DOUBLE) / w_tot / p, 6) AS boost
       |FROM scored CROSS JOIN wtot
       |ORDER BY source""".stripMargin
  }

  override def queries: Seq[Q] = Seq(
    Q("q185_doremi_weights", doremiWeights, Some(doremiSql)),
    Q("q161_capped_ppl", cappedPpl, Some(cappedPplSql)),
    Q("q149_zipf", zipfSlope, Some(zipfSlopeSql)),
    Q("q78_tfidf_terms", tfidfTerms, Some(tfidfTermsSql)),
    Q("q79_bm25_topk", bm25, Some(bm25Sql)),
    Q("q80_vocab_stats", vocabStats, Some(vocabStatsSql)),
    Q("q81_context_pack", contextPack, Some(contextPackSql)),
    Q("q91_context_pack_sharded", contextPackSharded, Some(contextPackShardedSql)),
    Q("q93_bpe_merges", bpeMerges, Some(bpeMergesSql)),
    Q("q94_bpe_segment", bpeSegment, Some(bpeSegmentSql)),
    Q("q200_unigram_lm_train", unigramLmTrain, Some(unigramLmTrainSql)),
    Q("q201_unigram_lm_segment", unigramLmSegment, Some(unigramLmSegmentSql)),
    Q("q202_wordpiece_segment", wordpieceSegment, Some(wordpieceSegmentSql)),
    Q("q205_ppl_buckets", pplBuckets, Some(pplBucketsSql)),
    Q("q209_ppl_buckets_sampled", pplBucketsSampled, Some(pplBucketsSampledSql)),
    Q("q206_tokenizer_bakeoff", tokenizerBakeoff, Some(tokenizerBakeoffSql)),
    Q("q207_tokenizer_store_serve", tokenizerStoreServe, Some(tokenizerStoreServeSql)),
    Q("q98_bigram_backoff", bigramBackoff, Some(bigramBackoffSql)),
    Q("q165_kneser_ney", kneserNey, Some(kneserNeySql)),
    Q("q198_standing_bigram_lm", standingBigramLm, Some(standingBigramLmSql)),
    Q("q211_standing_trigram_lm", standingTrigramLm, Some(standingTrigramLmSql)),
    Q("q170_bpe_fertility", bpeFertility, Some(bpeFertilitySql)),
    Q("q100_kmv_distinct", kmvDistinct, Some(kmvDistinctSql)),
    Q("q101_unigram_drift", unigramDrift, Some(unigramDriftSql)),
    Q("q102_hybrid_rrf", hybridRrf, Some(hybridRrfSql)),
    Q("q82_unigram_ppl", unigramPpl, Some(unigramPplSql)),
    Q("q85_pmi_bigrams", pmiCollocations, Some(pmiCollocationsSql)),
    Q("q87_mix_weights", mixWeights, Some(mixWeightsSql)),
    Q("q88_heavy_hitters", heavyHitters, Some(heavyHittersSql)),
  )
}

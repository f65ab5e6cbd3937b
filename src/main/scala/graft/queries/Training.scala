package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.functions.Hashing

/** Training-set assembly operators: deterministic hash splits and per-key
  * quota selection — the last mile of a training-data pipeline.
  *
  * Why not `df.sample`/`TABLESAMPLE`: Spark's sampling draws per
  * partition from a seeded RNG, so the selected SET changes with
  * partitioning, AQE re-plans, and retries — unacceptable for
  * reproducible train/val/test membership at 100 TB. A content-keyed hash
  * split is a pure projection: stable under any physical execution, cheap
  * to recompute, and auditable (membership is a function of the key
  * alone).
  */
object Training extends QueryModule {

  /** The shared per-mill slot: polyHash("<salt>:<key>") Knuth-mixed
    * (×2654435761, fits int64 since h < 1e9+7) then mod 1000 —
    * membership a pure function of (salt, key). The multiplicative mix is
    * essential: the radix-31 fold alone maps consecutive integer keys to
    * consecutive slots (no avalanche), which would put a contiguous id
    * range entirely in one split; the ×phi-reciprocal stride (761 mod
    * 1000, coprime) equidistributes even adversarially-sequential keys. */
  private def splitSlot(keyCol: String, salt: String) =
    (Hashing.poly_hash(
      concat_ws(":", lit(salt), col(keyCol).cast("string"))) * lit(2654435761L)) % 1000

  def hashSplit(docs: DataFrame, keyCol: String, salt: String,
      perMill: Seq[(String, Int)]): DataFrame = {
    require(perMill.map(_._2).sum == 1000, "per-mill weights must sum to 1000")
    val slot = splitSlot(keyCol, salt)
    val cum = perMill.scanLeft(0)(_ + _._2).tail
    val expr0 = perMill.zip(cum).foldRight(lit(null).cast("string")) {
      case (((name, _), hi), rest) => when(slot < hi, lit(name)).otherwise(rest)
    }
    docs.withColumn("split", expr0)
  }

  /** q57: split the corpus 900/50/50 per-mill into train/val/test keyed on
    * doc_id; output per-split×lang counts plus an exact membership
    * fingerprint (sum of doc_ids) so the oracle checks the SET, not just
    * its size. */
  def hashSplitQuery(s: SparkSession, d: String): DataFrame =
    hashSplit(documents(s, d), "doc_id", "graft-v1",
      Seq("train" -> 900, "val" -> 50, "test" -> 50))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
      .orderBy("split", "lang")

  private val hashSplitSql =
    """WITH slotted AS (
      |  SELECT doc_id, lang,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split('graft-v1:' || CAST(doc_id AS VARCHAR), ''),
      |        c -> CAST(ord(c) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) * 2654435761 % 1000 AS slot
      |  FROM documents
      |)
      |SELECT CASE WHEN slot < 900 THEN 'train'
      |            WHEN slot < 950 THEN 'val'
      |            ELSE 'test' END AS split,
      |  lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM slotted
      |GROUP BY 1, 2
      |ORDER BY split, lang""".stripMargin

  /** q58: per-language quota — the `quota` highest-quality docs per lang
    * (quality = distinct-token ratio, deterministic tie-break on doc_id).
    * Declarative row_number window; TopKPerKey plans it as bounded heaps
    * when installed. */
  def langQuota(s: SparkSession, d: String): DataFrame = {
    val scored = graft.text.TextOps
      .qualityStats(documents(s, d), Seq("the", "a"))
      .select(col("doc_id"), col("lang"), col("type_token_ratio"))
    val w = Window.partitionBy("lang")
      .orderBy(col("type_token_ratio").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 25)
      .select(col("lang"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("type_token_ratio"))
      .orderBy("lang", "rank")
  }

  private val langQuotaSql =
    """WITH tok AS (
      |  SELECT doc_id, lang, u.t AS tok
      |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents), unnest(w) AS u(t)
      |),
      |agg AS (
      |  SELECT doc_id, lang,
      |    round(CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*), 6) AS ttr
      |  FROM tok GROUP BY doc_id, lang
      |),
      |ranked AS (
      |  SELECT lang, doc_id, ttr,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ttr DESC, doc_id ASC) AS rank
      |  FROM agg
      |)
      |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, ttr AS type_token_ratio
      |FROM ranked WHERE rank <= 25
      |ORDER BY lang, rank""".stripMargin

  /** Deterministic STRATIFIED downsampling: keep a document iff its
    * hash slot < its stratum's per-mill rate — the language-rebalancing
    * step of corpus assembly (e.g. keep all low-resource languages, 25%
    * of English). Same slot as [[hashSplit]], so membership is again a
    * pure function of (salt, key): stable under partitioning, retries,
    * and re-plans, and the SAME doc keeps its fate if rates change only
    * for other strata (hash-rate sampling's coordinated-sampling
    * property — a rate bump only ADDS documents to a stratum). */
  def stratifiedSample(docs: DataFrame, keyCol: String, strataCol: String,
      salt: String, ratesPerMill: Map[String, Int],
      defaultPerMill: Int): DataFrame = {
    (ratesPerMill.values.toSeq :+ defaultPerMill).foreach(r =>
      require(r >= 0 && r <= 1000, s"per-mill rate out of range: $r"))
    val rate = ratesPerMill.foldLeft(lit(defaultPerMill)) {
      case (rest, (k, r)) => when(col(strataCol) === k, lit(r)).otherwise(rest)
    }
    docs.filter(splitSlot(keyCol, salt) < rate)
  }

  /** EXACT-n deterministic sample per stratum: rank documents within
    * each stratum by the salted mixed hash (ties to the key) and keep
    * the first n — exact sample sizes where [[stratifiedSample]]'s rate
    * filter gives binomially-varying ones. Membership is still a pure
    * function of (salt, the stratum's key set): stable under
    * partitioning, retries, and re-plans. The stated trade vs the rate
    * filter: a NEWLY ARRIVED document can displace the current rank-n
    * member — exact-n and coordinated sampling are fundamentally at
    * odds; pick per use. The rank window is the TopKPerKey bounded-heap
    * shape (state: n rows per stratum). */
  def exactNSample(docs: DataFrame, keyCol: String, strataCol: String,
      salt: String, n: Int): DataFrame = {
    require(n >= 1, s"exactNSample: n must be >= 1, got $n")
    // full mixed hash (no mod-1000 coarsening — rank needs few ties);
    // poly_hash < 1e9+7 so the ×2654435761 product fits int64
    val h = Hashing.poly_hash(
      concat_ws(":", lit(salt), col(keyCol).cast("string"))) * lit(2654435761L)
    val w = Window.partitionBy(strataCol)
      .orderBy(col("__h").asc, col(keyCol).asc)
    docs
      .withColumn("__h", h)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
      .drop("__h")
  }

  /** q86: exactly 30 docs per language by salted hash rank. */
  def exactSampleQuery(s: SparkSession, d: String): DataFrame =
    exactNSample(documents(s, d), "doc_id", "lang", "graft-v1", n = 30)
      .select("lang", "rank", "doc_id")
      .orderBy("lang", "rank")

  private val exactSampleSql =
    """WITH hashed AS (
      |  SELECT doc_id, lang,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split('graft-v1:' || CAST(doc_id AS VARCHAR), ''),
      |        c -> CAST(ord(c) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) * 2654435761 AS h
      |  FROM documents
      |),
      |ranked AS (
      |  SELECT lang, doc_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h ASC, doc_id ASC) AS BIGINT) AS rank
      |  FROM hashed
      |)
      |SELECT lang, rank, doc_id FROM ranked
      |WHERE rank <= 30
      |ORDER BY lang, rank""".stripMargin

  /** q69: language-rebalanced corpus — keep 250‰ of English, all of
    * French, 500‰ elsewhere; per-lang counts + id_sum membership
    * fingerprint (the oracle checks the selected SET, like q57). */
  def stratifiedQuery(s: SparkSession, d: String): DataFrame =
    stratifiedSample(documents(s, d), "doc_id", "lang", "graft-v1",
      Map("en" -> 250, "fr" -> 1000), defaultPerMill = 500)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
      .orderBy("lang")

  private val stratifiedSql =
    """WITH slotted AS (
      |  SELECT doc_id, lang,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split('graft-v1:' || CAST(doc_id AS VARCHAR), ''),
      |        c -> CAST(ord(c) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) * 2654435761 % 1000 AS slot
      |  FROM documents
      |)
      |SELECT lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM slotted
      |WHERE slot < (CASE lang WHEN 'en' THEN 250 WHEN 'fr' THEN 1000 ELSE 500 END)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---- q96: per-stratum TOKEN-budget sampling -----------------------------

  /** Sample documents per language, in salted-hash order, until a TOKEN
    * budget fills — the statistic that matters for training-set assembly
    * is tokens, not document count (q86 takes exact-n DOCS; this takes
    * exact-budget TOKENS). A doc is admitted iff its exclusive running
    * token sum is still under budget (the packing discipline: it STARTS
    * inside the budget; the boundary doc may straddle). Deterministic:
    * the order key is the salted Knuth-mixed hash (+ doc_id tie-break), a
    * pure row function — membership survives any partitioning, retry, or
    * re-plan. One window per stratum; the 100 TB shape is the same
    * per-stream cumsum as contextPack (shardable by the same (lang,
    * shard) trick when |langs| bounds parallelism). */
  def tokenBudgetSample(docs: DataFrame, salt: String,
      budgetTokens: Long): DataFrame = {
    val ord = Hashing.poly_hash(
      concat_ws(":", lit(salt), col("doc_id").cast("string"))) * lit(2654435761L)
    val w = Window.partitionBy("lang").orderBy(ord.asc, col("doc_id").asc)
    docs
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
      .withColumn("cum_before", sum(col("tokens")).over(w) - col("tokens"))
      .filter(col("cum_before") < budgetTokens)
      .select("doc_id", "lang", "tokens", "cum_before")
  }

  def tokenBudgetQuery(s: SparkSession, d: String): DataFrame =
    tokenBudgetSample(documents(s, d), "budget-v1", budgetTokens = 2000L)
      .orderBy("lang", "doc_id")

  private val tokenBudgetSql =
    """WITH sized AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split('budget-v1:' || CAST(doc_id AS VARCHAR), ''),
      |        c -> CAST(ord(c) AS BIGINT))),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) * 2654435761 AS ord
      |  FROM documents
      |),
      |cum AS (
      |  SELECT doc_id, lang, tokens,
      |    CAST(sum(tokens) OVER (PARTITION BY lang ORDER BY ord, doc_id)
      |      - tokens AS BIGINT) AS cum_before
      |  FROM sized
      |)
      |SELECT doc_id, lang, tokens, cum_before
      |FROM cum WHERE cum_before < 2000
      |ORDER BY lang, doc_id""".stripMargin

  // ---- q97: weighted priority sampling (Efraimidis–Spirakis) --------------

  /** Weighted sample WITHOUT replacement, k per stratum: each doc draws a
    * deterministic pseudo-uniform u ∈ (0,1) from its salted hash and gets
    * priority ln(u)/w (monotone in the classic u^(1/w) — larger is
    * better), w = its token count; the top-k priorities per language are
    * the sample (Efraimidis & Spirakis, IPL 2006). Long documents are
    * proportionally likelier WITHOUT any global sort by weight, and
    * membership is again a pure row function. The per-stratum top-k is
    * the TopKPerKey bounded-heap window; priorities are rounded to 6 dp
    * BEFORE ranking (engine-ulp discipline), ties to the lowest doc_id. */
  def prioritySample(docs: DataFrame, salt: String, k: Int): DataFrame = {
    val h = Hashing.poly_hash(
      concat_ws(":", lit(salt), col("doc_id").cast("string")))
    // u in (0,1]: (mixed hash mod P) + 1 over P + 1 — never 0, so ln is finite
    val u = ((h * lit(2654435761L)) % lit(1000000007L) + lit(1L))
      .cast("double") / lit(1000000008.0)
    val w = Window.partitionBy("lang")
      .orderBy(col("priority").desc, col("doc_id").asc)
    docs
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
      .withColumn("priority", round(log(u) / col("tokens"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("tokens"), col("priority"))
  }

  def prioritySampleQuery(s: SparkSession, d: String): DataFrame =
    prioritySample(documents(s, d), "prio-v1", k = 10)
      .orderBy("lang", "rank")

  private val prioritySampleSql =
    """WITH scored AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
      |    round(ln(CAST((list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(string_split('prio-v1:' || CAST(doc_id AS VARCHAR), ''),
      |          c -> CAST(ord(c) AS BIGINT))),
      |        (acc, x) -> (acc * 31 + x) % 1000000007) * 2654435761) % 1000000007 + 1
      |      AS DOUBLE) / 1000000008.0)
      |      / CAST(len(string_split(text, ' ')) AS BIGINT), 6) AS priority
      |  FROM documents
      |),
      |ranked AS (
      |  SELECT lang, doc_id, tokens, priority,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY priority DESC, doc_id ASC) AS BIGINT) AS rank
      |  FROM scored
      |)
      |SELECT lang, rank, doc_id, tokens, priority
      |FROM ranked WHERE rank <= 10
      |ORDER BY lang, rank""".stripMargin

  // ---- q133: deterministic epoch shuffle + shard assignment ---------------
  // The "global shuffle" a training data-loader consumes: each epoch needs a
  // DIFFERENT but fully REPRODUCIBLE corpus order, materialized as (shard,
  // pos) so N loader workers each read one shard sequentially. Random
  // shuffles fail the q57 reproducibility argument (partitioning/retry
  // changes the order); a keyed hash mix is a pure function of
  // (doc_id, epoch): restartable mid-epoch, auditable, identical on any
  // cluster. Plan: pure projection + ONE exchange keyed (epoch, shard) with
  // a shard-local sort — exactly the write path of sharded training files;
  // at 100 TB nShards scales to writer parallelism and no global sort or
  // driver state exists anywhere.

  /** mix = ((doc_id mod P)·2654435761 + epoch·40503 + 17) mod P: the q57
    * Knuth stride decorrelates consecutive ids; the epoch term relocates
    * every doc each epoch. All operands bound the product under 2^63.
    *
    * `epochs` is a SMALL demo cross (the query uses two to prove orders
    * differ); production materializes one epoch per nightly run —
    * `epochs = Seq(e)` — so the explode never multiplies corpus bytes.
    * Nothing is epoch-stateful: epoch N+1's order needs no artifact from
    * epoch N. */
  def epochShuffle(docs: DataFrame, epochs: Seq[Int], nShards: Int): DataFrame = {
    val P = graft.text.TextOps.P
    docs
      .select(col("doc_id"))
      .withColumn("epoch", explode(lit(epochs.toArray)))
      .withColumn("mix",
        pmod(pmod(col("doc_id"), lit(P)) * lit(2654435761L)
          + col("epoch") * lit(40503L) + lit(17L), lit(P)))
      .withColumn("shard", pmod(col("mix"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("epoch", "shard").orderBy("mix", "doc_id")).cast("long"))
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"), col("mix"))
  }

  def epochShuffleQuery(s: SparkSession, d: String): DataFrame =
    epochShuffle(documents(s, d), epochs = Seq(1, 2), nShards = 8)
      .orderBy("epoch", "shard", "pos")

  private val epochShuffleSql =
    """WITH mixed AS (
      |  SELECT e.epoch, doc_id,
      |    ((doc_id % 1000000007) * 2654435761 + e.epoch * 40503 + 17) % 1000000007 AS mix
      |  FROM documents, unnest([1, 2]) AS e(epoch)
      |)
      |SELECT epoch, CAST(mix % 8 AS INTEGER) AS shard,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch, mix % 8 ORDER BY mix, doc_id) AS BIGINT) AS pos,
      |  doc_id, mix
      |FROM mixed ORDER BY epoch, shard, pos""".stripMargin

  // ---- q144: epoch schedule (mixture × budget × shuffle, composed) --------
  // The nightly artifact a training launch actually consumes: for each
  // epoch, (1) the temperature-scaled language mixture (q87's integer
  // pow_fp machinery) converts the epoch's token budget into per-language
  // budgets by EXACT integer division; (2) each language admits docs in
  // epoch-salted mix order until its budget fills (q96's exclusive-cumsum
  // discipline — the boundary doc may straddle); (3) admitted docs land
  // in (shard, pos) slots (q133's keyed mix), so N loader workers read N
  // sequential shards and every epoch reorders reproducibly. One window
  // per (epoch, lang) for admission + one per (epoch, shard) for
  // placement — the q96/q133 shapes composed, nothing new shuffles.

  private val schedEpochs = Seq(1, 2)
  private val schedBudget = 3000L // tokens per epoch, split by the mixture
  private val schedShards = 8

  def epochSchedule(s: SparkSession, d: String): DataFrame = {
    val P = graft.text.TextOps.P
    val sized = documents(s, d).select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("tokens"))
    val perLang = sized.groupBy("lang").agg(sum("tokens").cast("long").as("ltokens"))
    val tot = perLang.agg(sum(col("ltokens")).as("t_total"))
    val pw = perLang.crossJoin(broadcast(tot)).selectExpr("lang",
      "CAST(round(pow(CAST(ltokens AS DOUBLE) / t_total, 0.5) * 1e12, 0) AS BIGINT) AS pow_fp")
    val ps = pw.agg(sum(col("pow_fp")).as("pow_total"))
    val budgets = pw.crossJoin(broadcast(ps))
      .selectExpr("lang", s"($schedBudget * pow_fp) div pow_total AS budget")
    // NOTE: not q133's additive epoch term — adding a constant mod P only
    // ROTATES the mix order, which leaves a budget PREFIX almost
    // unchanged across epochs; admission needs a per-epoch PERMUTATION,
    // so the epoch perturbs the multiplicative stride itself
    val mixed = sized
      .withColumn("epoch", explode(lit(schedEpochs.toArray)))
      .withColumn("mix",
        pmod(pmod(col("doc_id"), lit(P))
          * (lit(2654435761L) + col("epoch") * lit(40503L)) + lit(17L), lit(P)))
    val wAdmit = Window.partitionBy("epoch", "lang").orderBy(col("mix"), col("doc_id"))
    val admitted = mixed.join(broadcast(budgets), Seq("lang"))
      .withColumn("cum_before", sum(col("tokens")).over(wAdmit) - col("tokens"))
      .filter(col("cum_before") < col("budget"))
    admitted
      .withColumn("shard", pmod(col("mix"), lit(schedShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("epoch", "shard").orderBy("mix", "doc_id")).cast("long"))
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"),
        col("lang"), col("tokens"))
      .orderBy("epoch", "shard", "pos")
  }

  private val epochScheduleSql =
    s"""WITH sized AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
       |  FROM documents
       |),
       |per_lang AS (
       |  SELECT lang, CAST(SUM(tokens) AS BIGINT) AS ltokens FROM sized GROUP BY lang
       |),
       |tot AS (SELECT CAST(SUM(ltokens) AS BIGINT) AS t_total FROM per_lang),
       |pw AS (
       |  SELECT lang,
       |    CAST(round(pow(CAST(ltokens AS DOUBLE) / t_total, 0.5) * 1e12, 0) AS BIGINT) AS pow_fp
       |  FROM per_lang CROSS JOIN tot
       |),
       |ps AS (SELECT CAST(SUM(pow_fp) AS BIGINT) AS pow_total FROM pw),
       |budgets AS (SELECT lang, ($schedBudget * pow_fp) // pow_total AS budget
       |            FROM pw CROSS JOIN ps),
       |mixed AS (
       |  SELECT s.doc_id, s.lang, s.tokens, e.epoch,
       |    ((s.doc_id % ${graft.text.TextOps.P}) * (2654435761 + e.epoch * 40503) + 17) % ${graft.text.TextOps.P} AS mix
       |  FROM sized s, unnest([${schedEpochs.mkString(", ")}]) AS e(epoch)
       |),
       |adm AS (
       |  SELECT m.*, b.budget,
       |    SUM(m.tokens) OVER (PARTITION BY m.epoch, m.lang ORDER BY m.mix, m.doc_id)
       |      - m.tokens AS cum_before
       |  FROM mixed m JOIN budgets b USING (lang)
       |),
       |fin AS (
       |  SELECT epoch, CAST(mix % $schedShards AS INTEGER) AS shard, doc_id, lang, tokens, mix
       |  FROM adm WHERE cum_before < budget
       |)
       |SELECT epoch, shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY mix, doc_id) AS BIGINT) AS pos,
       |  doc_id, lang, tokens
       |FROM fin ORDER BY epoch, shard, pos""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q57_hash_split", hashSplitQuery, Some(hashSplitSql)),
    Q("q144_epoch_schedule", epochSchedule, Some(epochScheduleSql)),
    Q("q133_epoch_shuffle", epochShuffleQuery, Some(epochShuffleSql)),
    Q("q58_lang_quota", langQuota, Some(langQuotaSql)),
    Q("q69_stratified_sample", stratifiedQuery, Some(stratifiedSql)),
    Q("q86_exact_sample", exactSampleQuery, Some(exactSampleSql)),
    Q("q96_token_budget", tokenBudgetQuery, Some(tokenBudgetSql)),
    Q("q97_priority_sample", prioritySampleQuery, Some(prioritySampleSql)),
  )
}

package graft.text

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** BPE merge induction — the tokenizer-training operator the packing /
  * mixing layer presupposes (Sennrich et al., "Neural machine translation
  * of rare words with subword units", ACL 2016): starting from characters,
  * repeatedly merge the most frequent adjacent symbol pair, k rounds,
  * deterministic tie-break (freq desc, then (left, right) lexicographic).
  *
  * Scale shape: ONE corpus pass builds the (word, count) relation — after
  * that every round runs on the VOCABULARY (distinct words), which is ≪
  * corpus for any word-level tokenizer (millions of types vs billions of
  * tokens at 100 TB). Per round: a vocabulary-sized pair aggregation, a
  * 1-row top-pair collect (model state, like the k×d kmeans barrier), and
  * a map-only merge projection. The driver loop is bounded by `rounds`,
  * exactly the q65 Lloyd-iteration pattern.
  *
  * Determinism / oracle replayability: a word is represented as its
  * symbols each wrapped in a  sentinel (`␁s₁␁␁s₂␁…`), and a merge
  * of (l, r) is ONE non-overlapping left-to-right string replace of
  * `␁l␁␁r␁` with `␁lr␁` — the per-symbol wrapping means consecutive
  * matches share no characters, so SQL `replace` (same greedy semantics
  * in Spark and DuckDB) IS the BPE merge step: for a run "a a a a" the
  * pair (a,a) merges to "aa aa", never the overlapped "aa a a". No
  * floats anywhere; the oracle replays the rounds as a generated CTE
  * chain and hash-matches.
  */
object BpeOps {

  /** Symbol sentinel: must not occur in corpus tokens (control char). */
  val SEP = "\u0001"

  /** Code-point (= UTF-8 byte = Spark UTF8String) string ordering. Java's
    * String `<` compares UTF-16 code units, which sorts supplementary-
    * plane characters (surrogate pairs, 0xD800\u20130xDFFF units) BELOW
    * U+E000\u2013U+FFFF \u2014 the opposite of code-point order. The driver trainer
    * must break ties exactly like the relational trainer's Spark orderBy,
    * so compare UTF-8 bytes unsigned. */
  private[text] def cpLt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  /** The learned merge table: (round, left_sym, right_sym, freq) for
    * `rounds` rounds of top-pair merging over the whitespace-tokenized
    * corpus. Stops early (fewer rows) if no adjacent pair remains. */
  def merges(docs: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"BPE rounds must be >= 1, got $rounds")
    val s = docs.sparkSession
    import s.implicits._
    // one corpus pass → vocabulary-sized (repr, cnt); checkpointed so the
    // k merge projections chain off a materialized relation
    var words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(
        concat(lit(SEP), concat_ws(SEP + SEP, split(col("w"), "")), lit(SEP))
          .as("repr"),
        col("cnt"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    val symsSql = s"split(trim(BOTH '$SEP' FROM repr), '$SEP$SEP')"
    val pairsSql =
      s"""zip_with(
         |  slice($symsSql, 1, size($symsSql) - 1),
         |  slice($symsSql, 2, size($symsSql) - 1),
         |  (a, b) -> struct(a AS l, b AS r))""".stripMargin
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val best = words
        .select(explode(expr(pairsSql)).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("f"))
        .orderBy(col("f").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((round.toLong, l, r, f))
        words = words.withColumn("repr",
          F.replace(col("repr"),
            lit(SEP + l + SEP + SEP + r + SEP), lit(SEP + l + r + SEP)))
        // merge projections are cheap but chain: truncate lineage every
        // few rounds so round k doesn't replay rounds 1..k-1
        if (round % 4 == 0) words = words.localCheckpoint()
        round += 1
      }
    }
    out.toSeq.toDF("round", "left_sym", "right_sym", "freq")
  }

  /** Bound on the driver-side vocabulary collect: a web-scale corpus has
    * 10⁸–10⁹ word types, and an unbounded `.collect()` there is a silent
    * OOM. The trainer fetches at most `maxVocab + 1` rows (top-frequency
    * first) and REFUSES loudly if the cap binds — capped ≡ uncapped
    * whenever the corpus fits (spec-pinned). */
  val DefaultMaxVocab = 5000000

  /** DRIVER-FINISHED BPE training — the production path for realistic
    * merge counts: ONE distributed word-count aggregation (the only
    * corpus-sized work BPE training has), then the whole merge loop over
    * the collected vocabulary-sized (word, count) relation on the driver.
    * [[merges]] runs one Spark job + collect PER ROUND — fine for the
    * 12-round checked query, unusable at a real tokenizer's 30k merges
    * (30k sequential jobs); this form runs 1k merges in seconds
    * (Probe.bpeDriverProbe) and is spec-pinned row-identical to the
    * relational form on the same corpus/rounds.
    *
    * Semantics mirrored exactly: pair counts sum word counts over EVERY
    * adjacent position (overlaps included), the top pair breaks ties
    * (freq desc, left asc, right asc), and a merge rewrites each word's
    * symbol sequence greedily left-to-right without overlap — the same
    * result as the sentinel-string `replace`. Stops early when no
    * adjacent pair remains.
    *
    * Scale shape (100 TB): the aggregation shuffles (word, count) —
    * vocabulary-sized after map-side combine; the collect is the model
    * barrier every tokenizer trainer has (the vocabulary IS the model
    * input). The driver loop is O(rounds × vocabulary symbols). */
  def mergesDriver(docs: DataFrame, rounds: Int,
      maxVocab: Int = DefaultMaxVocab): DataFrame = {
    require(rounds >= 1, s"BPE rounds must be >= 1, got $rounds")
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    val s = docs.sparkSession
    import s.implicits._
    // TakeOrderedAndProject bounds the barrier: at most maxVocab+1 rows
    // ever cross to the driver, whatever the corpus size. Row order is
    // irrelevant to the merge loop (pair counts are a sum over words).
    val vocabRows = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("w"))
      .limit(maxVocab + 1)
      .collect()
    require(vocabRows.length <= maxVocab,
      s"BPE vocabulary exceeds maxVocab=$maxVocab word types; raise maxVocab " +
        "or apply a min-count floor upstream — refusing an unbounded driver collect")
    val vocab: Array[(Array[String], Long)] = vocabRows
      .map(r => (r.getString(0).split("").filter(_.nonEmpty), r.getLong(1)))
    val words: Array[Array[String]] = vocab.map(_._1)
    val counts: Array[Long] = vocab.map(_._2)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val w = words(wi); val c = counts(wi)
        var i = 0
        while (i < w.length - 1) {
          val p = (w(i), w(i + 1))
          pairs.update(p, pairs.getOrElse(p, 0L) + c)
          i += 1
        }
        wi += 1
      }
      if (pairs.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        pairs.foreach { case (p, f) =>
          // tie-break by CODE POINTS (= UTF-8 byte order = Spark's
          // UTF8String ordering), not Java String's UTF-16 code-unit
          // order — the two differ for supplementary-plane symbols, and
          // the relational trainer's orderBy uses the former
          if (best == null || f > best._2 ||
            (f == best._2 && (cpLt(p._1, best._1._1) ||
              (p._1 == best._1._1 && cpLt(p._2, best._1._2))))) best = (p, f)
        }
        val ((l, r), f) = best
        out += ((round.toLong, l, r, f))
        wi = 0
        while (wi < words.length) {
          val w = words(wi)
          var has = false
          var i = 0
          while (!has && i < w.length - 1) {
            if (w(i) == l && w(i + 1) == r) has = true; i += 1
          }
          if (has) {
            // greedy left-to-right non-overlapping merge, exactly the
            // sentinel-string replace
            val nb = scala.collection.mutable.ArrayBuffer.empty[String]
            i = 0
            while (i < w.length) {
              if (i < w.length - 1 && w(i) == l && w(i + 1) == r) {
                nb += l + r; i += 2
              } else { nb += w(i); i += 1 }
            }
            words(wi) = nb.toArray
          }
          wi += 1
        }
        round += 1
      }
    }
    out.toSeq.toDF("round", "left_sym", "right_sym", "freq")
  }

  /** Segmentation under the learned tokenizer — the serving half of
    * BPE training (the q89→q92 pattern): learn the k-round merge table
    * ([[mergesDriver]] — the production trainer, row-identical to the
    * relational [[merges]]), then apply it to every document as ONE
    * map-only projection (the k replaces chain inside a single codegen'd
    * expression over the sentinel-wrapped text; word boundaries are plain
    * spaces, which no sentinel pattern can cross) and count the resulting
    * subword tokens — the statistic packing budgets and training-cost
    * estimates need under the REAL tokenizer rather than the whitespace
    * proxy. Output: (doc_id, n_words, n_subwords). */
  def segmentCounts(docs: DataFrame, rounds: Int): DataFrame =
    segmentCountsWith(docs,
      mergesDriver(docs, rounds).orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)

  /** Segmentation under a FROZEN merge table — the projection shared by
    * the batch operator (which learns the table first) and the streaming
    * twin (which scores arrivals against a trained tokenizer, the same
    * frozen-model serve shape as streamingQualityScore). Pure map-only:
    * no state, no shuffle. */
  def segmentCountsWith(docs: DataFrame,
      ms: Seq[(String, String)]): DataFrame = {
    val wrapped: org.apache.spark.sql.Column = expr(
      s"""array_join(transform(filter(split(text, ' '), w -> length(w) > 0),
         | w -> concat('$SEP', array_join(split(w, ''), '$SEP$SEP'), '$SEP')), ' ')"""
        .stripMargin)
    val merged = ms.foldLeft(wrapped)((c, m) =>
      F.replace(c, lit(SEP + m._1 + SEP + SEP + m._2 + SEP),
        lit(SEP + m._1 + m._2 + SEP)))
    docs.select(
      col("doc_id"),
      size(filter(split(col("text"), " "),
        w => length(w) > 0)).cast("long").as("n_words"),
      // every subword symbol carries exactly two sentinels
      ((length(merged) - length(F.replace(merged, lit(SEP), lit("")))) / 2)
        .cast("long").as("n_subwords"))
  }

  /** The shared k-round training CTE chain: w0 (wrapped word counts) and
    * per-round (pair counts p_i, top pair b_i, merged words w_i). */
  private def trainingCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT s.l AS l, s.r AS r, sum(s.cnt) AS f FROM (
         |    SELECT cnt, syms[j + 1] AS l, syms[j + 2] AS r
         |    FROM (SELECT cnt, string_split(trim(repr, chr(1)), chr(1)||chr(1)) AS syms FROM w${i - 1}),
         |      unnest(CASE WHEN len(syms) >= 2 THEN range(len(syms) - 1) ELSE [] END) AS u(j)
         |  ) s GROUP BY s.l, s.r
         |),
         |b$i AS MATERIALIZED (SELECT l, r, f FROM p$i ORDER BY f DESC, l ASC, r ASC LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT replace(repr, chr(1)||b.l||chr(1)||chr(1)||b.r||chr(1),
         |                 chr(1)||b.l||b.r||chr(1)) AS repr, cnt
         |  FROM w${i - 1}, b$i b
         |)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS MATERIALIZED (
       |  SELECT chr(1) || array_to_string(string_split(w, ''), chr(1)||chr(1)) || chr(1) AS repr,
       |    count(*) AS cnt
       |  FROM (SELECT t.w FROM documents, unnest(string_split(text, ' ')) AS t(w) WHERE len(t.w) > 0)
       |  GROUP BY w
       |),
       |$roundCtes""".stripMargin
  }

  /** The DuckDB replay of [[merges]] as a generated CTE chain (the q65
    * pattern: one CTE trio per round), for oracle SQL construction. */
  def mergesOracleSql(rounds: Int): String = {
    val union = (1 to rounds).map(i =>
      s"SELECT CAST($i AS BIGINT) AS round, l AS left_sym, r AS right_sym, CAST(f AS BIGINT) AS freq FROM b$i")
      .mkString("\nUNION ALL\n")
    s"""WITH ${trainingCtes(rounds)}
       |$union
       |ORDER BY round""".stripMargin
  }

  /** The full train+apply CTE chain through `bseg` — one (doc_id,
    * n_words, n_subwords) row per document — for composed oracles
    * (q94 wraps it directly; q206 joins it against other tokenizers). */
  def segmentCtes(rounds: Int): String = {
    val applyCtes = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT doc_id, n_words,
         |    replace(repr, chr(1)||b.l||chr(1)||chr(1)||b.r||chr(1),
         |            chr(1)||b.l||b.r||chr(1)) AS repr
         |  FROM d${i - 1}, b$i b
         |)""".stripMargin
    }.mkString(",\n")
    s"""${trainingCtes(rounds)},
       |d0 AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS BIGINT) AS n_words,
       |    array_to_string(
       |      list_transform(list_filter(string_split(text, ' '), t -> len(t) > 0),
       |        t -> chr(1) || array_to_string(string_split(t, ''), chr(1)||chr(1)) || chr(1)),
       |      ' ') AS repr
       |  FROM documents
       |),
       |$applyCtes,
       |bseg AS (
       |  SELECT doc_id, n_words,
       |    CAST((len(repr) - len(replace(repr, chr(1), ''))) // 2 AS BIGINT) AS n_subwords
       |  FROM d$rounds
       |)""".stripMargin
  }

  /** The DuckDB replay of [[segmentCounts]]: train via [[trainingCtes]],
    * then chain the k replaces over per-document wrapped text. */
  def segmentOracleSql(rounds: Int): String =
    s"""WITH ${segmentCtes(rounds)}
       |SELECT doc_id, n_words, n_subwords
       |FROM bseg
       |ORDER BY doc_id""".stripMargin
}

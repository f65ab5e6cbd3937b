package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram language-model tokenizer training (Kudo 2018, the
  * SentencePiece unigram algorithm) — the second mainstream subword
  * family next to BPE (BpeOps, q93/q94): pieces carry probabilities and
  * a word's tokenization is its maximum-likelihood segmentation.
  *
  * This is the VITERBI (hard-EM) variant: each E-step assigns every
  * distinct word its single best segmentation under the current piece
  * probabilities (enumerated exhaustively — with piece length ≤
  * [[PieceLenMax]] a w-char word has at most tetranacci(w) compositions,
  * ≤ 108 for the corpus's 8-char words), and the M-step recounts pieces
  * from those segmentations, word-frequency-weighted. Soft-EM's
  * forward–backward marginals would need per-position float DPs; the
  * hard variant keeps EVERY comparison on integers — segmentation scores
  * are exact sums of 1e9-fixed-point log-probs, and the argmax tie-break
  * (score DESC, piece count ASC, segmentation string ASC) is total — so
  * both engines pick identical segmentations, which is what makes the
  * training oracle-checkable at all. Residual risk: the fixed-point
  * INPUTS are ln() values, engine/libm-dependent at the last ulp; a
  * disagreement exactly on a .5 rounding boundary could flip one
  * lnp_fp. Audited (SCALE.md, the q196 margin pattern): min boundary
  * distance across every segmenting model relation is ≥ 6.6e-4 at both
  * SFs vs ~1e-6 of worst-case ulp drift — ≥ 650× margin on fixtures.
  *
  * Seeding counts every substring occurrence of length ≤ 4 (the standard
  * suffix-array seed truncated to the enumerable length); every M-step
  * adds a +1 floor on every single character so each word stays
  * segmentable in the next round; after the fixed rounds the vocabulary
  * is capped at the top-V pieces by the TOTAL (cnt DESC, piece ASC)
  * order with all single characters retained (the pruning step of
  * unigram training, q161's bounded-serving discipline).
  *
  * Oracle: the q65 unrolled-iterations pattern — each EM round is a
  * generated CTE block (a recursive composition walk + the recount), so
  * DuckDB replays the IDENTICAL training ([[oracleCtes]]).
  *
  * Scale shape: everything after [[wordFreqs]] (the one corpus-sized
  * aggregate) is VOCABULARY-bounded — the composition expansion is
  * |vocab|·compositions rows joined against a broadcast model, the
  * argmax is a vocabulary-partitioned window, and serving (q201) joins
  * the per-doc word stream against the |vocab|-row best-segmentation
  * relation. The corpus is scanned once per query, never re-shuffled.
  */
object UnigramLmOps {

  val PieceLenMax = 4

  /** Shared fixed-point log-probability string (needs cols cnt, tot). */
  val lnpStr = "CAST(round(ln(CAST(cnt AS DOUBLE) / tot) * 1e9, 0) AS BIGINT)"

  /** Fallback log-prob (1e9 fixed point) for an OOV single character —
    * a character in a SERVING word that the training corpus never saw.
    * Without it the serve's model join silently DROPPED the whole word
    * from fertility counts (r16 ADVICE: the exact binaryHammingTopK
    * genre — safe on every in-corpus caller, wrong for the public API).
    * The value is a plain integer literal (lnp = −100, far below any
    * trained piece) shared verbatim by both engines — no transcendental
    * to ULP-drift. During TRAINING the fallback set is provably empty
    * (the substring seed and the per-round char floor keep every corpus
    * character in the model), so training CTEs don't mirror it. */
  val OovLnpFp = -100000000000L

  /** The single characters of `words` absent from `pieces` — the OOV
    * fallback alphabet of a serve call (empty when the serving words are
    * drawn from the training corpus). */
  private def oovChars(words: DataFrame, pieces: DataFrame): DataFrame =
    words.filter(length(col("w")) > 0)
      .select(explode(expr(
        "transform(sequence(0, length(w) - 1), i -> substring(w, i + 1, 1))"))
        .as("piece"))
      .distinct()
      .join(pieces.select("piece"), Seq("piece"), "left_anti")

  /** (w, freq) distinct-word frequencies — the one corpus aggregate.
    * Empty tokens (doubled separators) are dropped: Spark's
    * sequence(0, -1) DESCENDS, so a zero-length word would feed garbage
    * substring indices into the seed where DuckDB's range(0) is empty —
    * the guard is mirrored in the oracle (uwf WHERE term <> ''). */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Seed counts: every substring occurrence of length ≤ 4, weighted by
    * word frequency (two occurrences inside one word count twice). */
  def seedCounts(wf: DataFrame): DataFrame =
    wf.select(col("freq"), explode(expr(
      s"""flatten(transform(sequence(0, length(w) - 1),
         |  i -> transform(sequence(1, $PieceLenMax),
         |    l -> struct(l AS l, substring(w, i + 1, l) AS piece))))""".stripMargin))
      .as("s"))
      .filter(expr("length(s.piece) = s.l"))
      .select(col("s.piece").as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** (piece, lnp_fp) model from a (piece, cnt) count relation. */
  def modelOf(counts: DataFrame): DataFrame =
    counts.crossJoin(broadcast(counts.agg(sum("cnt").as("tot"))))
      .selectExpr("piece", s"$lnpStr AS lnp_fp")

  /** The +1-per-character floor keeping every word segmentable. */
  def charFloor(wf: DataFrame): DataFrame =
    wf.select(explode(expr(
      "transform(sequence(0, length(w) - 1), i -> substring(w, i + 1, 1))"))
      .as("piece"))
      .distinct().withColumn("cnt", lit(1L))

  /** Longest word in `words` — the loop bound shared by both walks. Read
    * defensively: on an EMPTY words relation max() is NULL, and the walks
    * must return an empty segmentation, not NPE (r16 ADVICE). */
  private def maxWordLen(words: DataFrame): Int =
    Option(words.agg(max(length(col("w")))).head().get(0))
      .map(_.asInstanceOf[Int]).getOrElse(0)

  /** Best (max-likelihood) segmentation per word under a (piece, lnp_fp)
    * model, by exhaustive composition enumeration: partials extend one
    * model piece at a time (loop rounds = the input's max word length, a
    * bounded driver probe), completed segmentations argmax on the total
    * integer order (sc DESC, np ASC, seg ASC). */
  def viterbiBest(words: DataFrame, model0: DataFrame,
      oovFallback: Boolean = true): DataFrame = {
    // `oovFallback = false` is the TRAINER's path: during training the
    // fallback set is provably empty (substring seed + per-round char
    // floor keep every corpus character in the model), so the per-round
    // distinct-char anti-join would be pure hot-path waste; every SERVE
    // entry point keeps the default.
    val model = (if (oovFallback) model0.select("piece", "lnp_fp")
      .unionByName(oovChars(words, model0).withColumn("lnp_fp", lit(OovLnpFp)))
    else model0.select("piece", "lnp_fp"))
      .localCheckpoint() // vocab-sized; broadcast-joined every round
    val maxLen = maxWordLen(words)
    var partial = words.select(col("w"), lit(0).as("pos"),
      lit("").as("seg"), lit(0L).as("np"), lit(0L).as("sc")).localCheckpoint()
    // completed rides as a LAZY union of per-round filters over the
    // already-checkpointed round states — re-checkpointing the growing
    // accumulator every round was one whole job + a rewrite of every
    // accumulated row per round, for state the final union reads anyway
    // (r20: halves the loop's scheduled jobs; plan depth stays maxLen-
    // bounded because each branch is a filter over a checkpoint leaf)
    val doneParts = Seq.newBuilder[DataFrame]
    doneParts += partial.filter(expr("pos = length(w)"))
    for (r <- 0 until maxLen) {
      var ext = partial.filter(expr("pos < length(w)"))
        .withColumn("l", explode(expr(s"sequence(1, $PieceLenMax)")))
        .withColumn("piece", expr("substring(w, pos + 1, l)"))
        .filter(expr("length(piece) = l"))
        .join(broadcast(model), Seq("piece"))
        .selectExpr("w", "pos + l AS pos",
          "CASE WHEN pos = 0 THEN piece ELSE concat(seg, ' ', piece) END AS seg",
          "np + 1 AS np", "sc + lnp_fp AS sc")
      // checkpoint every 3rd round (the BpeOps batching pattern): the
      // chain between checkpoints is linear (no self-reference), so
      // this trades ≤ 2 rounds of recompute on the completion branches
      // for a third of the scheduled jobs — the loop's dominant cost
      if (r % 3 == 2 || r == maxLen - 1) ext = ext.localCheckpoint()
      doneParts += ext.filter(expr("pos = length(w)"))
      partial = ext
    }
    val completed = doneParts.result().reduce(_.unionByName(_))
    completed
      .withColumn("rn", row_number().over(Window.partitionBy("w")
        .orderBy(col("sc").desc, col("np").asc, col("seg").asc)))
      .filter(col("rn") === 1)
      .select("w", "seg", "np", "sc")
  }

  /** M-step: piece counts from best segmentations, frequency-weighted. */
  def usageCounts(best: DataFrame, wf: DataFrame): DataFrame =
    best.join(wf, Seq("w"))
      .select(col("freq"), explode(split(col("seg"), " ")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** `rounds` hard-EM rounds from the substring seed, then the top-V cap
    * (single characters always retained): the final (piece, cnt). */
  def train(docs: DataFrame, rounds: Int, capV: Int): DataFrame = {
    val wf = wordFreqs(docs).localCheckpoint()
    var counts = seedCounts(wf)
    for (_ <- 0 until rounds) {
      counts = usageCounts(viterbiBest(wf.select("w"), modelOf(counts),
          oovFallback = false), wf)
        .unionByName(charFloor(wf))
        .groupBy("piece").agg(sum("cnt").as("cnt"))
        .localCheckpoint()
    }
    val cap = counts.orderBy(col("cnt").desc, col("piece")).limit(capV)
    val chars = charFloor(wf).select("piece").join(counts, Seq("piece"))
    cap.unionByName(chars).groupBy("piece").agg(max("cnt").as("cnt"))
  }

  /** Greedy longest-match segmentation counts per word — the WordPiece
    * SERVING rule (maximum-munch; Song et al. 2021's "Fast WordPiece"
    * linearizes exactly this walk) applied to the q200 vocabulary, so
    * greedy and Viterbi tokenize under the SAME pieces and their
    * fertility gap is attributable to the decoding rule alone. The walk
    * is single-path and integer-only: precompute the longest vocab match
    * at every (word, position) — one vocabulary-bounded join — then fold
    * positions (loop rounds = max word length; each round consumes ≥ 1
    * char, and the char floor guarantees a match at every position). */
  def greedyCounts(words: DataFrame, vocab: DataFrame): DataFrame = {
    val pieces = vocab.select("piece")
      .unionByName(oovChars(words, vocab))
      .localCheckpoint() // vocab-sized; guarantees a match everywhere
    val lm = words
      .withColumn("pos", explode(expr("sequence(0, length(w) - 1)")))
      .withColumn("l", explode(expr(s"sequence(1, $PieceLenMax)")))
      .withColumn("piece", expr("substring(w, pos + 1, l)"))
      .filter(expr("length(piece) = l"))
      .join(broadcast(pieces), Seq("piece"))
      .groupBy("w", "pos").agg(max("l").as("l"))
      .localCheckpoint()
    val maxLen = maxWordLen(words)
    var partial = words.select(col("w"), lit(0).as("pos"), lit(0L).as("np"))
      .localCheckpoint()
    // lazy union of per-round completions — see viterbiBest's note
    val doneParts = Seq.newBuilder[DataFrame]
    doneParts += partial.filter(expr("pos = length(w)"))
    for (r <- 0 until maxLen) {
      var step = partial.filter(expr("pos < length(w)"))
        .join(lm, Seq("w", "pos"))
        .selectExpr("w", "pos + l AS pos", "np + 1 AS np")
      // every-3rd-round checkpoint — see viterbiBest's note
      if (r % 3 == 2 || r == maxLen - 1) step = step.localCheckpoint()
      doneParts += step.filter(expr("pos = length(w)"))
      partial = step
    }
    doneParts.result().reduce(_.unionByName(_)).select("w", "np")
  }

  /** Per-doc word/piece counts + fertility from a (w, np) per-word
    * piece-count relation — the serving tail shared by q201/q202/q206/
    * q207 and the streaming twin. Unordered; callers sort. */
  def fertility(docs: DataFrame, perWord: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .join(broadcast(perWord), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("np").as("n_pieces"))
      .selectExpr("doc_id", "n_words", "n_pieces",
        "round(CAST(n_pieces AS DOUBLE) / n_words, 6) AS fertility")

  // ---------------------------------------------------------------------
  // DuckDB oracle: the generated CTE chain replaying the same training.
  // ---------------------------------------------------------------------

  private def segCte(i: Int, model: String, wordsSrc: String): String =
    s"""useg$i(w, pos, seg, np, sc) AS (
       |  SELECT w, CAST(0 AS BIGINT), '', CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM $wordsSrc
       |  UNION ALL
       |  SELECT s.w, s.pos + length(m.piece),
       |    CASE WHEN s.pos = 0 THEN m.piece ELSE s.seg || ' ' || m.piece END,
       |    s.np + 1, s.sc + m.lnp_fp
       |  FROM useg$i s JOIN $model m
       |    ON m.piece = substring(s.w, s.pos + 1, length(m.piece))
       |  WHERE s.pos < length(s.w)
       |),
       |ubest$i AS MATERIALIZED (
       |  SELECT w, seg, np FROM (
       |    SELECT w, seg, np, ROW_NUMBER() OVER (PARTITION BY w
       |      ORDER BY sc DESC, np ASC, seg ASC) AS rn
       |    FROM useg$i WHERE pos = length(w)) WHERE rn = 1
       |)""".stripMargin

  /** The OOV-fallback-augmented model `umfx$sfx` over serving words
    * `wordsSrc`: chars of the serving words absent from `model` enter at
    * the [[OovLnpFp]] floor — the [[oovChars]] mirror. The inner UNION
    * stays in a subquery (the engine-wide WITH RECURSIVE caveat). */
  private def fallbackModelCtes(sfx: String, model: String,
      wordsSrc: String): String =
    s"""uoov$sfx AS MATERIALIZED (
       |  SELECT piece FROM (
       |    SELECT DISTINCT substring(w, s.i + 1, 1) AS piece
       |    FROM $wordsSrc, unnest(range(length(w))) AS s(i)
       |  ) cx WHERE NOT EXISTS (SELECT 1 FROM $model m WHERE m.piece = cx.piece)
       |),
       |umfx$sfx AS MATERIALIZED (
       |  SELECT piece, lnp_fp FROM (
       |    SELECT piece, lnp_fp FROM $model
       |    UNION ALL
       |    SELECT piece, CAST($OovLnpFp AS BIGINT) FROM uoov$sfx
       |  )
       |)""".stripMargin

  private def recountCte(i: Int): String =
    s"""uc$i AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
       |    SELECT u.piece AS piece, uwf.freq AS cnt
       |    FROM ubest$i b JOIN uwf ON uwf.w = b.w,
       |         unnest(string_split(b.seg, ' ')) AS u(piece)
       |    UNION ALL SELECT piece, 1 FROM uchars
       |  ) GROUP BY piece
       |)""".stripMargin

  private def modelCte(name: String, counts: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT piece, $lnpStr AS lnp_fp
       |  FROM $counts CROSS JOIN (SELECT SUM(cnt) AS tot FROM $counts)
       |)""".stripMargin

  /** CTE chain through the final capped count relation `ufin` (and its
    * model `umf`); requires WITH RECURSIVE at the head. Non-recursive
    * unions stay inside subqueries (the engine-wide RECURSIVE caveat).
    * `docsSrc` is the training-corpus relation (q207 trains on a slice).
    * Training blocks carry NO OOV fallback: every training-word char is
    * in every round's model by construction (seed + char floor). */
  def oracleCtes(rounds: Int, capV: Int,
      docsSrc: String = "documents"): String = {
    val emBlocks = (1 to rounds).map { i =>
      val model = if (i == 1) "um0" else s"um${i - 1}"
      Seq(segCte(i, model, "uwf"), recountCte(i)) ++
        (if (i < rounds) Seq(modelCte(s"um$i", s"uc$i")) else Nil)
    }.flatten.mkString(",\n")
    s"""uwf AS MATERIALIZED (
       |  SELECT t.term AS w, CAST(count(*) AS BIGINT) AS freq
       |  FROM $docsSrc, unnest(string_split(text, ' ')) AS t(term)
       |  WHERE t.term <> ''
       |  GROUP BY 1
       |),
       |uchars AS MATERIALIZED (
       |  SELECT DISTINCT substring(w, s.i + 1, 1) AS piece
       |  FROM uwf, unnest(range(length(w))) AS s(i)
       |),
       |uc0 AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
       |    SELECT substring(w, s.i + 1, l.l) AS piece, freq
       |    FROM uwf, unnest(range(length(w))) AS s(i),
       |         unnest([1, 2, 3, 4]) AS l(l)
       |    WHERE s.i + l.l <= length(w)
       |  ) GROUP BY piece
       |),
       |${modelCte("um0", "uc0")},
       |$emBlocks,
       |ucap AS MATERIALIZED (
       |  SELECT piece, cnt FROM uc$rounds ORDER BY cnt DESC, piece ASC LIMIT $capV
       |),
       |ufin AS MATERIALIZED (
       |  SELECT piece, MAX(cnt) AS cnt FROM (
       |    SELECT piece, cnt FROM ucap
       |    UNION ALL
       |    SELECT c.piece, c.cnt FROM uc$rounds c JOIN uchars USING (piece)
       |  ) GROUP BY piece
       |),
       |${modelCte("umf", "ufin")}""".stripMargin
  }

  /** The serving segmentation block: OOV-fallback model + `useg<i>`/
    * `ubest<i>` over the final model `umf` — appended after
    * [[oracleCtes]] by q201/q206/q207's oracles. `wordsSrc` is the
    * serving-word relation (column w); when it is the training `uwf`
    * the fallback set is provably empty. */
  def serveSegCtes(i: Int, wordsSrc: String = "uwf"): String =
    s"""${fallbackModelCtes(i.toString, "umf", wordsSrc)},
       |${segCte(i, s"umfx$i", wordsSrc)}""".stripMargin

  /** The greedy (WordPiece-rule) serving block over `umf`: `ulm` is the
    * longest fallback-augmented-vocab match at every (word, position);
    * `ugseg`/`ugw` the single-path maximum-munch walk — appended after
    * [[oracleCtes]] by q202/q206's oracles. */
  def greedySegCtes(wordsSrc: String = "uwf"): String =
    s"""${fallbackModelCtes("g", "umf", wordsSrc)},
       |ulm AS MATERIALIZED (
       |  SELECT w, p.i AS pos, CAST(MAX(length(m.piece)) AS BIGINT) AS l
       |  FROM $wordsSrc, unnest(range(length(w))) AS p(i)
       |  JOIN umfxg m ON m.piece = substring(w, p.i + 1, length(m.piece))
       |  GROUP BY w, p.i
       |),
       |ugseg(w, pos, np) AS (
       |  SELECT w, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM $wordsSrc
       |  UNION ALL
       |  SELECT s.w, s.pos + ulm.l, s.np + 1
       |  FROM ugseg s JOIN ulm ON ulm.w = s.w AND ulm.pos = s.pos
       |  WHERE s.pos < length(s.w)
       |),
       |ugw AS MATERIALIZED (SELECT w, np FROM ugseg WHERE pos = length(w))""".stripMargin
}

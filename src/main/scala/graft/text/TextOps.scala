package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, deterministic hashing, shingling, quality stats,
  * language-ID heuristic, document fingerprinting.
  *
  * Cross-engine determinism: every hash is a 31-radix polynomial char fold
  * mod 1e9+7 — pure integer arithmetic, bit-identical in any engine (the
  * DuckDB oracle recomputes it with list_reduce). No engine-native hash
  * (xxhash64, murmur) appears in any checked output.
  *
  * Scale notes (100 TB): all ops are per-row projections or explode +
  * groupBy(doc_id) — no cross-doc shuffle; the explode fan-out (~tokens/doc)
  * stays inside the stage and aggregates map-side before any exchange.
  */
object TextOps {

  /** Modulus for all polynomial hashes (fits products in int64: acc < 1e9+7,
    * acc*31 + 127 < 2^35). */
  val P = 1000000007L

  /** Polynomial rolling hash of a string expression, radix 31 mod P —
    * `h = fold(chars, 0, (acc,c) => (acc*31 + ord(c)) % P)`. */
  def polyHash(e: String): String =
    s"aggregate(split($e, ''), 0L, (acc, c) -> (acc * 31 + ascii(c)) % ${P}L)"

  /** Whitespace tokens of `text`. Source texts are single-space separated. */
  def tokensExpr: String = "split(text, ' ')"

  /** Token-hash array of `text`: each token char-folded once. */
  def tokenHashArrayExpr: String =
    s"transform($tokensExpr, tok -> aggregate(split(tok, ''), 0L, (acc, c) -> (acc * 31 + ascii(c)) % ${P}L))"

  /** k-shingle hashes from the token-hash array `__th`: a second radix-31
    * fold over each k-slice of token hashes. Two-level hashing touches each
    * character exactly once (vs k× for hashing shingle strings) — ~3×
    * cheaper at shingleK=3 on the corpus scan. Empty when < k tokens
    * (guards Spark's descending `sequence`). */
  def shingleHashExpr(k: Int): String =
    s"""CASE WHEN size(__th) >= $k
       | THEN transform(sequence(0, size(__th) - $k), i -> aggregate(slice(__th, i + 1, $k), 0L, (acc, h) -> (acc * 31 + h) % ${P}L))
       | ELSE array() END""".stripMargin.replace("\n", "")

  /** doc_id → one row per *distinct* shingle hash (the shingle-set relation
    * used by Jaccard / MinHash). k-word shingles, two-level polynomial
    * hashed — ONE native expression computes the whole distinct set per doc
    * (no per-shingle slice allocation, no post-explode `.distinct()`
    * exchange); the HOF forms above remain the executable spec (HashingSpec
    * pins bit-equality, the DuckDB oracle re-checks end-to-end). */
  def shingleHashes(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.TextExprs.shingle_hash_set(col("text"), k)).as("h"))

  /** doc_id → one row per token occurrence with its hash. */
  def tokenHashes(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(expr(tokensExpr)).as("tok"))
      .withColumn("h", graft.functions.Hashing.poly_hash(col("tok")))

  /** Per-document quality stats (training-data filtering features): token
    * count, distinct-token count, type/token ratio, mean token length,
    * stopword ratio, non-alnum character ratio. All ratios are exact-integer
    * divisions rounded to 6 decimals — deterministic across engines.
    */
  def qualityStats(docs: DataFrame, stopwords: Seq[String]): DataFrame =
    docs
      .select(
        col("doc_id"),
        col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        (length(col("text")) - length(regexp_replace(col("text"), "[a-z0-9 ]", "")))
          .cast("long").as("__alnum"),
        graft.functions.TextExprs.token_stats(col("text"), stopwords).as("__ts"),
      )
      .select(
        col("doc_id"), col("lang"), col("n_chars"), col("__alnum"),
        col("__ts.n_tokens").as("n_tokens"),
        col("__ts.n_distinct").as("n_distinct"),
        col("__ts.sumlen").as("__sumlen"),
        col("__ts.nstop").as("__nstop"),
      )
      .select(
        col("doc_id"),
        col("lang"),
        col("n_chars"),
        col("n_tokens"),
        col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 6).as("type_token_ratio"),
        round(col("__sumlen").cast("double") / col("n_tokens"), 6).as("mean_token_len"),
        round(col("__nstop").cast("double") / col("n_tokens"), 6).as("stopword_ratio"),
        round((col("n_chars") - col("__alnum")).cast("double") / col("n_chars"), 6)
          .as("punct_ratio"),
      )

  /** Marker-word language-ID heuristic: count hits from per-language marker
    * sets, argmax with fixed priority order (en > de > fr > es), 'und' when
    * no marker hits. Returns the (labeled lang × predicted) confusion counts.
    */
  def langIdConfusion(docs: DataFrame, markers: Map[String, Seq[String]]): DataFrame = {
    val langs = Seq("en", "de", "fr", "es")
    docs
      .select(col("lang"),
        graft.functions.TextExprs.marker_counts(col("text"), langs.map(markers)).as("__mc"))
      .select(col("lang") +: langs.zipWithIndex.map { case (l, i) =>
        col("__mc").getItem(i).as(s"s_$l")
      }: _*)
      .withColumn(
        "predicted",
        expr(
          """CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'und'
            | WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
            | WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
            | WHEN s_fr >= s_es THEN 'fr'
            | ELSE 'es' END""".stripMargin,
        ),
      )
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
  }

  /** Document fingerprints: the full-text polynomial hash plus the minimum
    * 8-char-gram hash (the winnowing-style content fingerprint — stable under
    * suffix edits, cheap to compare at scale).
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    import graft.functions.Hashing
    docs.select(
      col("doc_id"),
      Hashing.poly_hash(col("text")).as("full_fp"),
      Hashing.min_gram_hash(col("text"), lit(8)).as("min8_fp"),
    )
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.UnigramLmOps

/** Unigram-LM tokenizer training/serving (q200/q201): hard-EM from the
  * substring seed, integer Viterbi with the total tie-break, capped
  * vocabulary with the char floor. */
class UnigramLmSpec extends SparkSpec {

  private def df2(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("viterbi: max-likelihood wins; ties break by fewer pieces then segmentation string") {
    val s = spark
    import s.implicits._
    val words = Seq("ab", "cd").toDF("w")
    // "ab" as one piece beats "a b" outright; for "cd" the two
    // segmentations tie on score, so np ASC must pick the single piece
    val model = Seq(
      ("ab", -1000000000L), ("a", -1000000000L), ("b", -1000000000L),
      ("cd", -2000000000L), ("c", -1000000000L), ("d", -1000000000L),
    ).toDF("piece", "lnp_fp")
    val out = UnigramLmOps.viterbiBest(words, model)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out("ab") === (("ab", 1L)), s"likelihood argmax: ${out("ab")}")
    assert(out("cd") === (("cd", 1L)), s"tie must prefer fewer pieces: ${out("cd")}")
  }

  test("a dominant word survives the cap as one piece; a rare word falls to characters") {
    val docs = df2((0L until 10L).map(i => (i, "abcd abcd abcd")) :+
      (10L, "xyzw"))
    // capV = 3 binds hard: top pieces are dominated by "abcd" mass
    val fin = UnigramLmOps.train(docs, rounds = 2, capV = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fin.contains("abcd"), s"dominant word must be a whole piece: $fin")
    assert(Seq("x", "y", "z", "w").forall(fin.contains),
      "char floor must keep every character")
    assert(!fin.contains("xyzw"), "rare word must not survive a binding cap")
    val best = UnigramLmOps.viterbiBest(
      UnigramLmOps.wordFreqs(docs).select("w"),
      UnigramLmOps.modelOf(UnigramLmOps.train(docs, 2, 3)))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(best("abcd") === 1L, "dominant word segments to itself")
    assert(best("xyzw") === 4L, "capped-out word segments to characters")
  }

  test("q202: greedy maximum-munch can strand itself where Viterbi stays optimal") {
    val s = spark
    import s.implicits._
    // vocab {abcd, abc, def} + chars, all equal log-prob: for "abcdef"
    // greedy takes abcd and must char-walk the tail (3 pieces); Viterbi
    // maximizes likelihood = fewest pieces here -> abc + def (2). This is
    // the canonical maximum-munch pathology the fixture's vocabulary
    // happens not to exhibit (measured: 0 of 5000 docs diverge) — the
    // decode-rule gap is real and this pin keeps it demonstrable.
    val words = Seq("abcdef").toDF("w")
    val pieces = Seq("abcd", "abc", "def", "a", "b", "c", "d", "e", "f")
    val vocab = pieces.map(p => (p, -1000000000L)).toDF("piece", "lnp_fp")
    val greedy = UnigramLmOps.greedyCounts(words, vocab.select("piece"))
      .head().getLong(1)
    val viterbi = UnigramLmOps.viterbiBest(words, vocab).head().getLong(2)
    assert(greedy === 3L && viterbi === 2L, s"greedy $greedy viterbi $viterbi")
  }

  test("q206: the bake-off row equals its donors' per-doc rollups on a planted corpus") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (0L, "en", "alpha beta alpha beta gamma"),
      (1L, "en", "beta gamma delta alpha"),
      (2L, "de", "rot grun blau rot"),
      (3L, "de", "grun blau grun rot blau"),
    ).toDF("doc_id", "lang", "text")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft-bake").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val bake = graft.queries.Retrieval.tokenizerBakeoff(s, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // donor rollups: q94 BPE counts and q201/q202 per-doc fertility,
    // re-aggregated to the language grain with the same denominator
    def roll(perDoc: org.apache.spark.sql.DataFrame, pieces: String) = perDoc
      .join(corpus.select("doc_id", "lang"), Seq("doc_id"))
      .groupBy("lang").agg(sum("n_words").as("nw"), sum(pieces).as("np"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), BigDecimal(r.getLong(2).toDouble / r.getLong(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))).toMap
    val bpe = roll(graft.text.BpeOps.segmentCounts(corpus, 12), "n_subwords")
    val vit = roll(graft.queries.Retrieval.unigramLmSegment(s, dir), "n_pieces")
    val gre = roll(graft.queries.Retrieval.wordpieceSegment(s, dir), "n_pieces")
    Seq("en", "de").foreach { l =>
      val (nw, fb, fv, fg) = bake(l)
      assert(nw === bpe(l)._1 && nw === vit(l)._1 && nw === gre(l)._1,
        s"$l denominators: $nw vs ${bpe(l)._1}/${vit(l)._1}/${gre(l)._1}")
      assert(fb === bpe(l)._2 && fv === vit(l)._2 && fg === gre(l)._2,
        s"$l fertilities: ($fb,$fv,$fg) vs (${bpe(l)._2},${vit(l)._2},${gre(l)._2})")
    }
  }

  test("empty words relation yields empty segmentations, not an NPE") {
    val s = spark
    import s.implicits._
    val words = Seq.empty[String].toDF("w")
    val model = Seq(("a", -1000000000L)).toDF("piece", "lnp_fp")
    assert(UnigramLmOps.viterbiBest(words, model).count() === 0L)
    assert(UnigramLmOps.greedyCounts(words, model.select("piece")).count() === 0L)
  }

  test("EM reallocates mass: after training, whole-word pieces out-count their substrings") {
    val docs = df2((0L until 8L).map(i => (i, "toka tokb toka")))
    val fin = UnigramLmOps.train(docs, rounds = 2, capV = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // hard-EM's recount only credits pieces the Viterbi actually used:
    // both words tokenize whole, so interior substrings get no mass
    assert(fin("toka") === 16L && fin("tokb") === 8L, s"$fin")
    assert(!fin.contains("tok") && !fin.contains("oka"),
      s"unused interior substrings must carry no mass after EM: $fin")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.Phash
import graft.queries.TextDedup

/** q120 (media-gated corpus assembly): the cross-modal verdict must be able
  * to drop a document that EVERY text gate keeps — the composition is real,
  * not subsumed by text dedup.
  */
class MultimodalAssemblySpec extends SparkSpec {

  /** ~2.4 KB of distinct tokens — long enough that the phash grid pools
    * multiple tokens per block. */
  private val baseText =
    (0 until 300).map(i => s"tok${i}xq").mkString(" ")

  /** Swap the first two characters of every token: every token hash (and
    * so every 3-shingle) changes → shingle Jaccard 0, far below the 0.5
    * near-dup gate — but block byte-SUMS are preserved except where a
    * swap straddles a block boundary, so the payload fingerprint barely
    * moves: textually novel, perceptually duplicate. */
  private val swappedText = baseText.split(" ")
    .map(w => "" + w(1) + w(0) + w.substring(2)).mkString(" ")

  test("the swapped payload is perceptually near but textually far") {
    val d = java.lang.Long.bitCount(
      Phash.phash64(baseText.getBytes("UTF-8")) ^
        Phash.phash64(swappedText.getBytes("UTF-8")))
    assert(d <= graft.multimodal.PhashOps.Tau,
      s"payload fingerprint moved $d bits — fixture broken")
    val ta = baseText.split(" ").toSet
    assert(ta.intersect(swappedText.split(" ").toSet).isEmpty,
      "token sets must be disjoint so no text gate can fire")
  }

  test("q120: a doc is dropped ONLY by its payload verdict") {
    val s = spark
    import s.implicits._
    // fillers must be byte-structurally distinct, not just textually: a
    // shared template with one varying digit is itself a perceptual
    // near-dup family (the gate would — correctly — collapse it)
    val filler = (3 to 12).map { i =>
      val r = new scala.util.Random(i * 7919)
      (i.toLong, "en",
        (0 until 25).map(_ => r.alphanumeric.filter(_.isLetter).take(3 + r.nextInt(8)).mkString.toLowerCase).mkString(" "))
    }
    val docs = (Seq(
      (1L, "en", baseText),
      (2L, "en", swappedText),
    ) ++ filler).toDF("doc_id", "lang", "text")
    val textOnly = TextDedup.assemble(docs, mediaGate = false)
      .collect().map(_.getLong(0)).toSet
    val gated = TextDedup.assemble(docs, mediaGate = true)
      .collect().map(_.getLong(0)).toSet
    assert(textOnly.contains(1L) && textOnly.contains(2L),
      "every text gate must keep both variants")
    assert(!gated.contains(2L), "the media gate must drop the payload near-dup")
    assert(gated.contains(1L), "the survivor (lower id) must stay")
    assert(textOnly - 2L === gated, "the gate must drop NOTHING else")
  }

  test("q128: boilerplate-aware accounting drops a doc only the clean count fails") {
    val s = spark
    import s.implicits._
    val boil = (0 until 6).map(i => s"bp$i").mkString(" ")
    // doc 100: 18 raw tokens but 12 of them are a segment repeated in 3
    // docs → clean count 6 < 15 → dropped ONLY under the boil gate.
    // docs 101/102 carry the repeats and enough unique bulk to survive.
    // Unique spans are RANDOM words (seeded) — byte-structurally distinct,
    // so the media gate can't fire between them (the q120 fixture lesson).
    def uniq(seed: Int, n: Int) = {
      val r = new scala.util.Random(seed * 7919)
      (0 until n).map(_ => r.alphanumeric.filter(_.isLetter)
        .take(3 + r.nextInt(8)).mkString.toLowerCase).mkString(" ")
    }
    val docs = (Seq(
      (100L, "en", s"$boil $boil ${uniq(100, 6)}"),
      (101L, "en", s"$boil ${uniq(101, 30)}"),
      (102L, "en", s"$boil ${uniq(102, 30)}"),
    ) ++ (3 to 10).map(i => (i.toLong, "en", uniq(i, 24)))).toDF("doc_id", "lang", "text")
    val raw = TextDedup.assemble(docs, mediaGate = true)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val clean = TextDedup.assemble(docs, mediaGate = true, boilGate = true)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(raw.contains(100L) && raw(100L) == 18L,
      "raw accounting keeps the mostly-boilerplate doc")
    assert(!clean.contains(100L), "clean accounting must drop it")
    assert(clean(101L) == 30L && raw(101L) == 36L,
      "survivors budget on stripped counts")
    assert(clean.keySet + 100L == raw.keySet, "nothing else changes")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.text.RetrievalOps

/** Hand-computed checks for the retrieval/corpus-statistics operators
  * (vocabulary, TF-IDF, BM25, context packing) — the oracle hash-match at
  * sf0.01/sf0.1 is the volume evidence; these pin the arithmetic and the
  * tie/boundary semantics on corpora small enough to verify by hand.
  */
class RetrievalSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  // N=3; df: a→2, b→1, c→2, d→1
  private val tiny = docs(
    (0L, "a a b", "en"),
    (1L, "a c", "en"),
    (2L, "c c c d", "fr"),
  )

  test("vocabulary: df/cf counts and smoothed idf by hand") {
    val v = RetrievalOps.vocabulary(tiny).orderBy("term").collect()
    val byTerm = v.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(byTerm("a") === ((2L, 3L,
      math.rint((math.log(4.0 / 3.0) + 1) * 1e6) / 1e6)))
    assert(byTerm("b") === ((1L, 1L,
      math.rint((math.log(4.0 / 2.0) + 1) * 1e6) / 1e6)))
    assert(byTerm("c")._1 === 2L && byTerm("c")._2 === 4L)
    assert(byTerm("d") === ((1L, 1L, byTerm("b")._3)))
  }

  test("tfIdfTopTerms: scores by hand; equal scores break ties by term") {
    val top = RetrievalOps.tfIdfTopTerms(tiny, k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val idfA = math.log(4.0 / 3.0) + 1 // df 2
    val idfB = math.log(4.0 / 2.0) + 1 // df 1
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // doc 0: tf(a)=2 → 2·idfA ≈ 2.575 beats tf(b)=1 → 1.693
    assert(top.filter(_._1 == 0L).map(t => (t._2, t._3, t._4)).toSeq ===
      Seq((1L, "a", r6(2 * idfA)), (2L, "b", r6(idfB))))
    // doc 1: tf(a)=tf(c)=1 and df(a)=df(c) → identical rounded score;
    // the term-string tiebreak must order a before c in BOTH engines
    assert(top.filter(_._1 == 1L).map(t => (t._2, t._3)).toSeq ===
      Seq((1L, "a"), (2L, "c")))
    assert(top.filter(_._1 == 1L).map(_._4).distinct.length === 1)
  }

  test("unigramPerplexity: hand-computed fixed-point fold; rare tokens raise ppl") {
    // T=9; cf: a→3, b→1, c→4, d→1. Same quantization as the operator:
    // per-token ln p → int64 ×1e9, exact sum, exp/divide at the end.
    def fp(cf: Long) = math.round(math.log(cf / 9.0) * 1e9)
    def ppl(fps: Long*) =
      math.rint(math.exp(-(fps.sum.toDouble / 1e9) / fps.size) * 1e6) / 1e6
    val out = RetrievalOps.unigramPerplexity(tiny).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._2).toSeq === Seq(3L, 2L, 4L))
    assert(out(0)._3 === ppl(fp(3), fp(3), fp(1)))
    assert(out(1)._3 === ppl(fp(3), fp(4)))
    assert(out(2)._3 === ppl(fp(4), fp(4), fp(4), fp(1)))
    // hand values: doc1 {a,c} is most corpus-typical (2.598…); doc2's rare
    // 'd' lifts it (3.182…); doc0's double-rare mix is worst (4.326…)
    assert(out(1)._3 < out(2)._3 && out(2)._3 < out(0)._3)
  }

  test("bm25TopK: more hits rank higher; longer doc is length-penalized") {
    val corpus = docs(
      (0L, "q q q x", "en"),      // tf=3, dl=4
      (1L, "q x x x", "en"),      // tf=1, dl=4
      (2L, "q x x x x x x x", "en"), // tf=1, dl=8: same tf, longer → lower
      (3L, "x x x x", "en"),      // tf=0 → zero score
    )
    val out = RetrievalOps.bm25TopK(corpus, Seq("q"), k1 = 1.2, b = 0.75,
        topN = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    val score = out.toMap
    assert(score(0L) > score(1L), "higher tf must outrank")
    assert(score(1L) > score(2L), "equal tf: shorter doc must outrank")
    assert(score(3L) === 0.0)
    // hand value for doc 1: idf = ln(1 + (4-3+0.5)/(3+0.5)), dl/avgdl = 0.8
    val idf = math.log(1.0 + 1.5 / 3.5)
    val expect1 = idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 4.0 / 5.0))
    assert(math.abs(score(1L) - math.rint(expect1 * 1e6) / 1e6) < 1e-9)
  }

  test("pmiCollocations: hand-computed PMI; order and minCount floor") {
    // docs: "p q p q p q" (5 bigrams: pq×3, qp×2) + "r r r r" (rr×3)
    // T=10, B=8; c1: p=3, q=3, r=4
    val corpus = docs((0L, "p q p q p q", "en"), (1L, "r r r r", "en"))
    val out = RetrievalOps.pmiCollocations(corpus, minCount = 2L, topN = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    def pmi(n: Long, ca: Long, cb: Long) =
      math.rint(math.log((n / 8.0) / ((ca / 10.0) * (cb / 10.0))) * 1e6) / 1e6
    assert(out.toSeq === Seq(
      ("p", "q", 3L, pmi(3, 3, 3)),
      ("q", "p", 2L, pmi(2, 3, 3)),
      ("r", "r", 3L, pmi(3, 4, 4))))
  }

  test("mixWeights: temperature flattening — weights sum to 1, small langs boosted") {
    val corpus = docs(
      (0L, Seq.fill(90)("w").mkString(" "), "en"),
      (1L, Seq.fill(9)("w").mkString(" "), "fr"),
      (2L, "w", "zh"))
    val byLang = RetrievalOps.mixWeights(corpus, "lang", alpha = 0.5)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(math.abs(byLang.values.map(_._1).sum - 1.0) < 3e-6) // 6-dp rounded
    // α=0.5 flattening: sqrt ratios — en 90% → ~67%, zh 1% → ~7%
    assert(byLang("en")._1 < 0.90 && byLang("en")._2 < 1.0)
    assert(byLang("zh")._1 > 0.01 && byLang("zh")._2 > 1.0)
    // hand value: mix(en) = sqrt(.9)/(sqrt(.9)+sqrt(.09)+sqrt(.01))
    val denom = math.sqrt(0.9) + math.sqrt(0.09) + math.sqrt(0.01)
    assert(math.abs(byLang("en")._1 - math.sqrt(0.9) / denom) < 1e-6)
  }

  test("contextPack: integer pack ids/offsets; straddlers keep their start pack") {
    val corpus = docs(
      (0L, "a b c", "en"),     // 3 tokens, start 0 → pack 0 offset 0
      (1L, "a b", "en"),       // start 3 → pack 0 offset 3 (straddles into 1)
      (2L, "a b c d", "en"),   // start 5 → pack 1 offset 1
      (3L, "a", "fr"),         // separate stream: start 0 → pack 0
    )
    val packed = RetrievalOps.contextPack(corpus, budgetTokens = 4L)
      .orderBy("lang", "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4)))
    assert(packed.toSeq === Seq(
      (0L, "en", 0L, 0L), (1L, "en", 0L, 3L), (2L, "en", 1L, 1L),
      (3L, "fr", 0L, 0L)))
  }

  test("contextPack is invariant under input partitioning") {
    val base = docs((0L to 40L).map(i =>
      (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" "), if (i % 2 == 0) "en" else "fr")): _*)
    val a = RetrievalOps.contextPack(base, 16L)
      .orderBy("lang", "doc_id").collect().toSeq
    val b = RetrievalOps.contextPack(base.repartition(7), 16L)
      .orderBy("lang", "doc_id").collect().toSeq
    assert(a === b)
  }

  test("bm25PerQuery agrees with the single-query literal-terms path") {
    val s = spark
    import s.implicits._
    // corpus plus one synthetic query doc whose text IS the term set —
    // the batch path's scores for that query must equal bm25TopK's run
    // over the same corpus WITH the query doc present (both formulations
    // see identical tf/df/avgdl; per-term quantization ≤ 1e-9 per term)
    val base = s.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text")
    val qdoc = Seq((100000L, "join customer filter")).toDF("doc_id", "text")
    val corpus = base.union(qdoc)
    val batch = RetrievalOps
      .bm25PerQuery(corpus, col("doc_id") === 100000L, 1.2, 0.75, k = 20)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val single = RetrievalOps
      .bm25TopK(corpus, Seq("join", "customer", "filter"), 1.2, 0.75, topN = 21)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
      .filter(_._1 != 100000L).take(20).toMap
    assert(batch.nonEmpty)
    batch.foreach { case (id, sc) =>
      assert(math.abs(sc - single(id)) <= 1e-5, s"doc $id: $sc vs ${single(id)}")
    }
  }

  test("hybridTopK: RRF arithmetic and one-list-only docs") {
    val s = spark
    import s.implicits._
    val lex = Seq((1L, 1L, 10L), (1L, 2L, 20L))
      .toDF("query_id", "rank", "doc_id")
    val sem = Seq((1L, 1L, 20L), (1L, 2L, 30L))
      .toDF("query_id", "rank", "neighbor_id")
    val out = RetrievalOps.hybridTopK(lex, sem, rrfK = 60, kOut = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    def rrf(rs: Seq[Long]) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 20 is in both lists (lex rank 2 + sem rank 1) and wins
    assert(out.toSeq === Seq(
      (1L, 20L, rrf(Seq(2L, 1L))),
      (2L, 10L, rrf(Seq(1L))),
      (3L, 30L, rrf(Seq(2L)))))
  }

  test("unigram drift: zero on identical slices, positive on shift, scala mirror agrees") {
    // identical distributions → KL = 0 exactly (p = q term-wise)
    val same = docs(
      (0L, "a a b", "en"), (1L, "a a b", "en"),
      (3L, "a a b", "en"), (4L, "a a b", "en"))
    val kl0 = RetrievalOps.unigramDrift(same, col("doc_id") % 3 === 0)
      .head().getDouble(4)
    assert(kl0 === 0.0)
    // shifted: reference heavy on a, current heavy on b → positive KL,
    // checked against a direct scala computation of the same formula
    val shifted = docs((0L, "a a a b", "en"), (1L, "b b b a", "en"))
    val r = RetrievalOps.unigramDrift(shifted, col("doc_id") % 3 === 0).head()
    assert(r.getLong(1) === 4L && r.getLong(2) === 4L && r.getLong(3) === 2L)
    def pq(cf: Long, t: Long, v: Long) = (cf + 1.0) / (t + v)
    val want = Seq((3L, 1L), (1L, 3L)).map { case (cfr, cfc) =>
      val (p, q) = (pq(cfr, 4, 2), pq(cfc, 4, 2))
      math.round(q * math.log(q / p) * 1e12)
    }.sum / 1e12
    val expect = BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(4) - expect) < 1e-9)
    assert(r.getDouble(4) > 0.0)
  }

  test("KMV distinct sketch: exact under k, partition-invariant, ~1/sqrt(k) accurate over") {
    val s = spark
    import s.implicits._
    import graft.functions.KmvDistinct.kmv_distinct
    val P = graft.text.TextOps.P
    // exact regime: fewer distinct values than k → the sketch IS the count
    val small = Seq.tabulate(40)(i => (i % 10) * 7919L % P).toDF("h")
    val exact = small.agg(kmv_distinct(col("h"), 64, P)).head().getLong(0)
    assert(exact === 10L)
    // estimate regime: 20k distinct pseudo-uniform hashes, k=256
    def big(parts: Int) = s.range(0, 20000L)
      .select((col("id") * 2654435761L % P).as("h")).repartition(parts)
    val est1 = big(1).agg(kmv_distinct(col("h"), 256, P)).head().getLong(0)
    val est13 = big(13).agg(kmv_distinct(col("h"), 256, P)).head().getLong(0)
    // set semantics: bit-identical under any partitioning, both regimes
    assert(est1 === est13)
    // ~1/sqrt(256) ≈ 6% expected relative error; allow 20%
    assert(math.abs(est1 - 20000.0) / 20000.0 < 0.2, s"estimate $est1")
  }

  test("bigram backoff: seen pairs use bf/cf, unseen back off with the 0.4 penalty") {
    // model (doc 0): "a b a b a" → cf: a=3, b=2; T=5, V=2;
    // bf: (a,b)=2, (b,a)=2
    // held (doc 1): "a b c" → pairs (a,b) seen: ln(2/3);
    //   (b,c) unseen: ln(0.4) + ln((cf(c)+1)/(T+V)) = ln(0.4) + ln(1/7)
    val corpus = docs((0L, "a b a b a", "en"), (1L, "a b c", "en"))
    val out = RetrievalOps.bigramBackoffScore(corpus, col("doc_id") % 2 === 0)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    val fp1 = math.round(math.log(2.0 / 3.0) * 1e9)
    val fp2 = math.round(math.log(0.4) * 1e9) +
      math.round(math.log(1.0 / 7.0) * 1e9)
    val want = BigDecimal(math.exp(-((fp1 + fp2) / 1e9) / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(2) - want) < 1e-9, s"got ${r.getDouble(2)} want $want")
  }

  test("Kneser–Ney: discounted, interpolated, and unseen-context branches by hand") {
    // model (docs 0, 2): pairs (a,b)=1, (b,a)=2, (a,c)=1 →
    //   c1: a=2 (n1l=2), b=2 (n1l=1); n1r: a=1, b=1, c=1; T=3, V=3
    // held (doc 1) "a b x y":
    //   (a,b) seen: (max(1−D,0) + D·2·pcont(b)) / 2
    //   (b,x) seen context, unseen bigram, OOV right type:
    //     (0 + D·1·pcont(x)) / 2
    //   (x,y) unseen context: pcont(y) itself
    val corpus = docs(
      (0L, "a b a c", "en"), (2L, "b a", "en"), (1L, "a b x y", "en"))
    val out = RetrievalOps.kneserNeyScore(corpus, col("doc_id") % 2 === 0)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 3L)
    val den = (3.0 + 3.0) + 1.0 // (T + V) + 1, engine association order
    def pcont(n1r: Long) = (n1r + 1.0) / den
    val p1 = (math.max(1.0 - 0.75, 0.0) + 0.75 * 2.0 * pcont(1)) / 2.0
    val p2 = (0.0 + 0.75 * 1.0 * pcont(0)) / 2.0
    val p3 = pcont(0)
    val s = Seq(p1, p2, p3).map(p => math.round(math.log(p) * 1e9)).sum
    val want = BigDecimal(math.exp(-(s / 1e9) / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(2) - want) < 1e-9, s"got ${r.getDouble(2)} want $want")
  }

  test("q170 fertility: subwords-per-word rolls up by language") {
    // 1 merge round: (a,a) f=6 merges → "aaab"→[aa,a,b]=3 subwords,
    // "ab"→[a,b]=2. en: (2w,6s)+(2w,5s) → 11/4; fr: (1w,2s) → 2.0
    val corpus = docs(
      (0L, "aaab aaab", "en"), (1L, "aaab ab", "en"), (2L, "ab", "fr"))
    val out = graft.queries.Retrieval.bpeFertilityOf(corpus, rounds = 1)
      .orderBy("lang").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("en") === ((2L, 4L, 11L, 2.75)))
    assert(out("fr") === ((1L, 1L, 2L, 2.0)))
  }

  test("BPE merges: classic hand example, greedy runs, deterministic ties") {
    // corpus: "aaab" ×3, "ab" ×2 — char pairs: (a,a) f=6 (two per "aaab",
    // non-overlap counted per occurrence position BEFORE merging: pairs in
    // a-a-a-b are (a,a),(a,a),(a,b)), (a,b) f=5
    val corpus = docs(
      (0L, "aaab aaab", "en"), (1L, "aaab ab", "en"), (2L, "ab", "en"))
    val m = graft.text.BpeOps.merges(corpus, rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (a,a) 6 → "aaab"→[aa,a,b] (greedy left-to-right on runs)
    assert(m(0) === ((1L, "a", "a", 6L)))
    // round 2 pairs: "aaab"→(aa,a),(a,b) ×3; "ab"→(a,b) ×2 → (a,b) f=5;
    // merging turns "aaab" into [aa, ab] and "ab" into [ab]
    assert(m(1) === ((2L, "a", "b", 5L)))
    // round 3: only "aaab"=[aa, ab] still has a pair → (aa, ab) f=3
    assert(m(2) === ((3L, "aa", "ab", 3L)))
  }

  test("BPE segmentation counts subwords under the learned merges") {
    // same corpus as the merge test: after 3 rounds the table is
    // [(a,a), (a,b), (aa,ab)] → "aaab" segments to [aaab]?? no:
    // round1 aaab→[aa,a,b]; round2 (a,b): [aa,ab]; round3 (aa,ab): [aaab]
    // → 1 subword; "ab" → [ab] → 1 subword
    val corpus = docs(
      (0L, "aaab aaab", "en"), (1L, "aaab ab", "en"), (2L, "ab", "en"))
    val seg = graft.text.BpeOps.segmentCounts(corpus, rounds = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(seg.toSeq === Seq((0L, 2L, 2L), (1L, 2L, 2L), (2L, 1L, 1L)))
    // with only (a,a) learned: "aaab" → [aa, a, b] = 3, "ab" → [a, b] = 2
    val seg1 = graft.text.BpeOps.segmentCounts(corpus, rounds = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(seg1.toSeq === Seq((0L, 6L), (1L, 5L), (2L, 2L)))
  }

  test("driver-finished BPE training is row-identical to the relational form") {
    // the real documents corpus at sf0.001, same rounds as q93: the
    // production trainer (one aggregation + driver merge loop) must
    // reproduce the per-round relational trainer's merge table exactly
    val corpus = graft.util.Tables.documents(spark, sf0001)
    val rel = graft.text.BpeOps.merges(corpus, rounds = 12)
      .orderBy("round").collect().map(_.toString).toSeq
    val drv = graft.text.BpeOps.mergesDriver(corpus, rounds = 12)
      .orderBy("round").collect().map(_.toString).toSeq
    assert(drv === rel && drv.length === 12)
    // early exhaustion agrees too (tiny corpus runs dry)
    val tiny = docs((0L, "ab ab", "en"))
    val r2 = graft.text.BpeOps.merges(tiny, rounds = 5).collect().map(_.toString).toSeq
    val d2 = graft.text.BpeOps.mergesDriver(tiny, rounds = 5).collect().map(_.toString).toSeq
    assert(d2 === r2 && d2.length === 1)
  }

  test("BPE merges are partitioning-invariant") {
    val corpus = docs((0L to 30L).map(i =>
      (i, s"w${i % 5} common tail w${i % 3}", "en")): _*)
    val a = graft.text.BpeOps.merges(corpus, rounds = 6)
      .collect().toSeq.map(_.toString).sorted
    val b = graft.text.BpeOps.merges(corpus.repartition(7), rounds = 6)
      .collect().toSeq.map(_.toString).sorted
    assert(a === b && a.nonEmpty)
  }

  test("sharded contextPack: shard streams are independent and partition-invariant") {
    val base = docs((0L to 60L).map(i =>
      (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" "), if (i % 2 == 0) "en" else "fr")): _*)
    val shards = 3
    def key(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val sharded = key(RetrievalOps.contextPack(base, 16L, numShards = shards)
      .orderBy("lang", "shard", "doc_id").collect().toSeq)
    assert(sharded.nonEmpty)
    // per-shard independence: restricting the sharded layout to one shard
    // equals running the UNSHARDED operator on just that shard's docs —
    // each (lang, shard) cumsum never sees another shard's tokens
    for (sh <- 0 until shards) {
      val restricted = sharded.filter(_._3 == sh)
        .map { case (id, lang, _, toks, pid, off) => (id, lang, toks, pid, off) }
      val solo = RetrievalOps
        .contextPack(base.filter(col("doc_id") % shards === sh), 16L)
        .orderBy("lang", "doc_id").collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(restricted === solo, s"shard $sh diverged")
    }
    // layout is a pure row function: any input partitioning, same bytes
    val repart = key(RetrievalOps
      .contextPack(base.repartition(11), 16L, numShards = shards)
      .orderBy("lang", "shard", "doc_id").collect().toSeq)
    assert(repart === sharded)
  }

  test("q149 Zipf: a planted 1/rank corpus fits slope ~ -1") {
    val s = spark
    import s.implicits._
    // term_i appears round(3000/i) times, i = 1..60 -> slope -1 by construction
    val text = (1 to 60).flatMap(i => Seq.fill(math.round(3000.0 / i).toInt)(s"w$i"))
      .mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val cf = docs.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(col("text"), " ")).as("term"))
      .groupBy("term").count()
    assert(cf.count() == 60)
    // run the real query body against a temp view? zipfSlope reads documents
    // from a dir - test the math through a scratch parquet dir instead
    val dir = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    docs.withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.Retrieval.zipfSlope(s, dir).head()
    val slope = out.getDouble(1)
    assert(out.getLong(0) == 60L)
    assert(math.abs(slope + 1.0) < 0.02, s"slope $slope should be ~ -1")
  }

  test("q185: a domain its own model serves better is upweighted; a mismatched one clamps to 0") {
    val s = spark
    import s.implicits._
    // Knuth-mix parity: ids 0,3 train; 1,2 held. Global model: aaa 4, bbb 4.
    // srcA held "aaa aaa": own JM p = 0.5·1 + 0.5·0.5 = 0.75 vs ref 0.5
    //   → excess = ln 1.5; srcB held "aaa aaa": own p = 0.25 < ref → clamp 0.
    val corpus = Seq(
      (0L, "aaa aaa aaa aaa", "srcA"), (1L, "aaa aaa", "srcA"),
      (3L, "bbb bbb bbb bbb", "srcB"), (2L, "aaa aaa", "srcB"),
    ).toDF("doc_id", "text", "source")
    val out = graft.queries.Retrieval.doremiCore(corpus, eta = 1.0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    val (tokA, pA, nllRefA, excA, wA, boostA) = out("srcA")
    val (tokB, pB, nllRefB, excB, wB, boostB) = out("srcB")
    assert((tokA, tokB) === ((6L, 6L)) && pA === 0.5 && pB === 0.5)
    assert(nllRefA === 0.693147 && nllRefB === 0.693147)
    assert(excA === 0.405465, s"excess A $excA")
    assert(excB === 0.0, "mismatched domain must clamp to zero excess")
    assert(wA === 0.6 && wB === 0.4, s"weights $wA/$wB")
    assert(boostA === 1.2 && boostB === 0.8)
  }
}

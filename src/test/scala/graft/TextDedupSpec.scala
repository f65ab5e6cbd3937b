package graft

import org.apache.spark.sql.functions.col
import graft.dedup.DedupOps
import graft.text.TextOps

/** Unit tests for the text / dedup operators on tiny literal tables
  * (SURVEY.md §5.2 style — edges, ties, exactness).
  */
class TextDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("gramNovelty: shared fraction, fully-novel doc, and too-short NULL") {
    // ref doc0 "a b c d": 2-grams {ab, bc, cd}
    // held doc1 "a b c x": {ab, bc, cx} → shared 2/3, novelty 1/3
    // held doc3 "z": no 2-gram → NULL novelty
    // held doc5 "q r": {qr} → shared 0, novelty 1.0
    val d = docs(0L -> "a b c d", 1L -> "a b c x", 3L -> "z", 5L -> "q r")
    val out = DedupOps.gramNovelty(
      d.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0),
      d.filter(org.apache.spark.sql.functions.col("doc_id") % 2 =!= 0),
      shingleK = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) === ((3L, 2L, Some(0.333333))))
    assert(out(3L) === ((0L, 0L, None)))
    assert(out(5L) === ((1L, 0L, Some(1.0))))
  }

  test("exactDedup keeps the minimum doc_id per distinct text") {
    val d = docs(1L -> "x y z", 5L -> "x y z", 3L -> "a b c")
    val got = DedupOps.exactDedup(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (3L, 1L)))
  }

  test("polyHash matches the radix-31 char fold") {
    val d = docs(1L -> "abc")
    val h = d.selectExpr(TextOps.polyHash("text")).head().getLong(0)
    // ((0*31+97)*31+98)*31+99 = 96354 — same fold the DuckDB oracle runs
    assert(h === 96354L)
  }

  test("minhash LSH finds a near-dup pair and skips disjoint docs") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 30).map(i => if (i == 30) "CHANGED" else s"w$i").mkString(" ")
    val other = (100 to 130).map(i => s"v$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = DedupOps
      .minhashDupPairs(d, shingleK = 3, numHashes = 16, rowsPerBand = 4, threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 2L)))
  }

  test("jaccardDupPairs: identical docs have jaccard 1.0") {
    val t = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> t, 2L -> t, 3L -> "p q r s t u")
    val rows = DedupOps.jaccardDupPairs(d, shingleK = 3, threshold = 0.7).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 1L && rows.head.getLong(1) === 2L)
    assert(rows.head.getDouble(2) === 1.0)
  }

  test("jaccardDupPairs maxDf cap prunes candidates but not scores") {
    // "c c c" shingle appears in all three docs; with maxDf=2 it can't
    // generate candidates, but 1-2 still pair via their unique overlap.
    val d = docs(
      1L -> "a b c c c c c b a",
      2L -> "a b c c c c c b x",
      3L -> "z z c c c z z",
      // 4-5 share only sub-cap shingles: the no-hot-shingle direct-scoring
      // path (slack = 0), while 1-2 — both touching the hot c-shingles —
      // exercise the array-verify fallback (slack > 0), under the same cap
      4L -> "m n o p q r s",
      5L -> "m n o p q r t",
    )
    val uncapped = DedupOps.jaccardDupPairs(d, 3, 0.3).collect()
    val capped = DedupOps.jaccardDupPairs(d, 3, 0.3, maxDf = 2).collect()
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val u = key(uncapped); val c = key(capped)
    assert(u.contains((1L, 2L)) && c.contains((1L, 2L)))
    assert(u.contains((4L, 5L)) && c.contains((4L, 5L)))
    // scores agree on surviving pairs (cap affects candidate gen only)
    c.foreach { case (k, v) => assert(u(k) === v) }
  }

  test("contaminationFlags: shared k-gram detected, clean doc absent") {
    val s = spark
    import s.implicits._
    val train = Seq(
      (1L, "p q r s t u v"), // contains eval's "q r s t u"
      (2L, "a b c d e f g"), // disjoint
    ).toDF("doc_id", "text")
    val ev = Seq((100L, "x y q r s t u z")).toDF("doc_id", "text")
    val out = DedupOps.contaminationFlags(train, ev, shingleK = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L))
  }

  test("substringContamination: longest run certifies m+k-1 shared tokens") {
    // eval doc "a b c d e f" (k=3 grams abc bcd cde def). Train doc 1
    // embeds "a b c d e" → hits at positions 2,3,4 = one island of 3 →
    // 3+2 = 5 shared tokens. Train doc 2 has TWO separated islands (abc at
    // 0, def-?? no — "a b c" then noise then "c d e": islands 1 and 1) →
    // max run 1 → 3 tokens. Clean doc 3 is absent from the output.
    val train = docs(
      1L -> "x x a b c d e y y",
      2L -> "a b c q q c d e",
      3L -> "no shared grams here at all")
    val eval_ = docs(97L -> "a b c d e f")
    val out = DedupOps.substringContamination(train, eval_, shingleK = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(1L -> ((3L, 5L)), 2L -> ((2L, 3L))))
  }

  test("substringCorpusDedup: keep-first spans, threshold floor, clean docs absent") {
    // 10-token run shared by docs 0, 1, 3. Doc 0 is the earliest holder —
    // keep-first means it is NEVER flagged; docs 1 and 3 each get one
    // qualifying span: 6 consecutive 5-gram hit positions certify
    // 6+4 = 10 shared tokens ≥ the 8-token floor. Doc 2 (clean) and a
    // short repeat in doc 4 (5 tokens < floor) are absent.
    val shared = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = docs(
      0L -> s"$shared tail0 zz",
      1L -> s"pre1 $shared tail1",
      2L -> "totally different words entirely unrelated content here",
      3L -> s"a b $shared",
      4L -> "pre4 w1 w2 w3 w4 w5 other4 stuff4 more4 words4")
    val out = DedupOps.substringCorpusDedup(d, shingleK = 5, minRunTokens = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, 1L, 6L, 10L, 10L),
      (3L, 1L, 6L, 10L, 10L)))
  }

  test("gram_stats: hand-counted uni/bigram repetition") {
    val s = spark
    import s.implicits._
    import graft.functions.TextExprs
    val d = Seq((1L, "a b a b a"), (2L, "x")).toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
      TextExprs.gram_stats(col("text"), 1).as("g1"),
      TextExprs.gram_stats(col("text"), 2).as("g2"))
      .collect().map(r => r.getLong(0) ->
        ((r.getStruct(1).getLong(0), r.getStruct(1).getLong(1), r.getStruct(1).getLong(2)),
          (r.getStruct(2).getLong(0), r.getStruct(2).getLong(1), r.getStruct(2).getLong(2))))
      .toMap
    // "a b a b a": 5 tokens, 2 distinct, 'a'×3; bigrams ab,ba,ab,ba → 4/2/2
    assert(out(1L) === (((5L, 2L, 3L), (4L, 2L, 2L))))
    // single token: no bigrams at all
    assert(out(2L) === (((1L, 1L, 1L), (0L, 0L, 0L))))
  }

  test("incrementalDedup: exact dup flagged, near dup resolved, clean doc kept") {
    val s = spark
    import s.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq(
      (100L, base),
      (101L, "one totally unrelated corpus document about streaming joins"),
    ).toDF("doc_id", "text")
    val increment = Seq(
      (200L, base),                         // byte-identical → exact dup
      (201L, base + " CHANGED"),            // near dup of 100 (high Jaccard)
      (202L, "gibberish clean arrival with no shared shingles anywhere here"),
    ).toDF("doc_id", "text")
    val out = DedupOps
      .incrementalDedup(corpus, increment, shingleK = 3, numHashes = 16,
        rowsPerBand = 4, threshold = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      (200L, true, 100L, false),   // exact AND (trivially) near of 100
      (201L, false, 100L, false),  // near-only
      (202L, false, -1L, true),    // clean → admitted
    ))
  }

  test("corpus assembly manifest: every pipeline gate actually gated") {
    val s = spark
    val out = graft.queries.TextDedup.corpusAssembly(s, sf0001).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getLong(0)).toSet
    // eval slice held out
    assert(ids.forall(_ % 97 != 0))
    // quality gate
    assert(out.forall(_.getLong(3) >= 15L))
    // pack offsets live inside the budget; pack ids non-negative
    assert(out.forall(r => r.getLong(5) >= 0 && r.getLong(5) < 512))
    assert(out.forall(_.getLong(4) >= 0))
    // survivors carry no duplicate texts (exact dedup really ran)
    val docs = s.read.parquet(s"$sf0001/documents.parquet")
    import s.implicits._
    val survivorTexts = docs.filter(col("doc_id").isin(ids.toSeq: _*))
      .groupBy("text").count().filter(col("count") > 1).count()
    assert(survivorTexts === 0L)
    // all three splits present with the hash-split proportions roughly held
    val splits = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(splits.keySet === Set("train", "val", "test"))
    assert(splits("train") > splits("val") && splits("train") > splits("test"))
  }

  test("standing band index: probe verdicts ≡ incrementalDedup, bit for bit") {
    val s = spark
    val docs = s.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 >= 2)
    val increment = docs.filter(col("doc_id") % 10 < 2)
    val name = "graft_test_standing_idx"
    Seq("bands", "docs", "texts", "meta")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    DedupOps.buildBandIndex(s, corpus, name, shingleK = 3, numHashes = 16,
      rowsPerBand = 4, location = s"/tmp/graft_test_standing_idx", buckets = 4)
    val probed = DedupOps.probeBandIndex(s, increment, name, threshold = 0.5)
      .orderBy("doc_id").collect().toSeq
    val direct = DedupOps.incrementalDedup(corpus, increment, shingleK = 3,
      numHashes = 16, rowsPerBand = 4, threshold = 0.5)
      .orderBy("doc_id").collect().toSeq
    assert(probed.nonEmpty)
    assert(probed === direct)
  }

  test("incremental cluster maintenance equals the full union re-run") {
    val s = spark
    val docs = s.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 >= 2)
    val increment = docs.filter(col("doc_id") % 10 < 2)
    val name = "graft_test_cluster_idx"
    Seq("bands", "docs", "texts", "meta")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    DedupOps.buildBandIndex(s, corpus, name, shingleK = 3, numHashes = 16,
      rowsPerBand = 4, location = "/tmp/graft_test_cluster_idx", buckets = 4)
    val standing = DedupOps
      .dedupClusters(corpus,
        DedupOps.minhashDupPairs(corpus, 3, 16, 4, 0.5))
      .select("doc_id", "cluster")
    val inc = DedupOps.incrementalClusters(s, standing, increment, name, 0.5)
      .orderBy("doc_id").collect().toSeq
    val full = DedupOps
      .dedupClusters(docs, DedupOps.minhashDupPairs(docs, 3, 16, 4, 0.5))
      .orderBy("doc_id").collect().toSeq
    assert(inc.nonEmpty)
    assert(inc === full)
    // sanity: the batch actually merged something (otherwise the test
    // proves nothing about the lifted-graph path)
    val standingMap = standing.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val changed = inc.count { r =>
      standingMap.get(r.getLong(0)).exists(_ != r.getLong(1))
    }
    assert(changed > 0, "no standing label changed — fixture too weak")
  }

  test("standing band index: appended batch probes exactly like a rebuilt index") {
    val s = spark
    val docs = s.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val a = docs.filter(col("doc_id") % 10 >= 4)        // initial corpus
    val b = docs.filter(col("doc_id") % 10 === 2 || col("doc_id") % 10 === 3)
    val c = docs.filter(col("doc_id") % 10 < 2)          // probe batch
    val name = "graft_test_append_idx"
    Seq("bands", "docs", "texts", "meta")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
    DedupOps.buildBandIndex(s, a, name, shingleK = 3, numHashes = 16,
      rowsPerBand = 4, location = "/tmp/graft_test_append_idx", buckets = 4)
    DedupOps.appendToBandIndex(s, b, name)
    val probed = DedupOps.probeBandIndex(s, c, name, threshold = 0.5)
      .orderBy("doc_id").collect().toSeq
    // ground truth: the one-shot incremental judgment against A ∪ B
    val direct = DedupOps.incrementalDedup(a.union(b), c, shingleK = 3,
      numHashes = 16, rowsPerBand = 4, threshold = 0.5)
      .orderBy("doc_id").collect().toSeq
    assert(probed.nonEmpty)
    assert(probed === direct)
  }

  test("standing band index: candidate probe leaves the index side exchange-free") {
    val s = spark
    // built by the equivalence test above (suite order within a file is
    // declaration order); re-check to stay order-independent
    val name = "graft_test_standing_idx"
    if (!s.catalog.tableExists(s"${name}_meta")) cancel("index not built")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = s.read.parquet(s"$sf0001/documents.parquet")
        .select(col("doc_id"), col("text"))
      val probe = DedupOps.probeBandIndex(
        s, docs.filter(col("doc_id") % 10 < 2), name, threshold = 0.5)
      assert(probe.count() > 0)
      val p = probe.queryExecution.executedPlan.toString
      // with broadcast off, every corpus-side join must ride the bucket
      // layout: no Exchange may sit between a standing-table scan and its
      // join. Bucketed scans print "SelectedBucketsCount"; assert each of
      // the three index relations was read bucket-aware...
      assert("Bucketed: true".r.findAllIn(p).length >= 3,
        "standing tables not read as bucketed scans:\n" + p.take(1500))
      // ...and no shuffle writes an index-sized relation: every Exchange in
      // the plan partitions increment-derived or post-join rows, never the
      // raw standing tables (their scans would show in the exchange subtree)
      val exchanges = probe.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      exchanges.foreach { e =>
        assert(!e.toString.contains("graft_test_standing_idx"),
          "standing index relation got re-shuffled:\n" + e.toString.take(800))
      }
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dedupClusters: transitive chains collapse to one survivor; singletons keep") {
    val s = spark
    import s.implicits._
    // chain 1-2, 2-3 (no direct 1-3 edge) + island 7-9 + singleton 5
    val docsDf = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val out = DedupOps.dedupClusters(docsDf, pairs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out === Map(
      1L -> ((1L, true)), 2L -> ((1L, false)), 3L -> ((1L, false)),
      5L -> ((5L, true)), 7L -> ((7L, true)), 9L -> ((7L, false))))
  }

  test("q172 dup profile is the cluster-size histogram and conserves the corpus") {
    val s = spark
    val out = graft.queries.TextDedup.dupProfile(s, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // independent histogram straight off the q66 cluster labels
    val docs = s.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val labels = DedupOps
      .dedupClusters(docs, DedupOps.minhashDupPairs(docs, 3, 16, 4, 0.5))
      .collect().map(_.getLong(1))
    val expect = labels.groupBy(identity).values.map(_.length.toLong)
      .groupBy(identity).map { case (sz, cs) => sz -> ((cs.size.toLong, sz * cs.size)) }
    assert(out === expect)
    // conservation: every document lands in exactly one histogram row
    assert(out.values.map(_._2).sum === labels.length.toLong)
    // the fixture must actually exercise the ≥2 tail
    assert(out.keySet.exists(_ >= 2L), "no dup cluster in fixture — test too weak")
  }

  test("q175 datacard: every metric equals its independent recomputation") {
    val s = spark
    val out = graft.queries.TextDedup.datacard(s, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val docs = s.read.parquet(s"$sf0001/documents.parquet")
    val n = docs.count().toDouble
    assert(out("n_docs") === n)
    val nTok = docs.selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS t")
      .agg(org.apache.spark.sql.functions.sum(col("t"))).head().getLong(0)
    assert(out("n_tokens") === nTok.toDouble)
    assert(out("mean_doc_tokens") ===
      BigDecimal(nTok / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val nLangs = docs.select("lang").distinct().count().toDouble
    assert(out("n_langs") === nLangs)
    assert(out("lang_entropy") > 0.0 && out("lang_entropy") <= math.log(nLangs) + 1e-9)
    val nc = DedupOps
      .dedupClusters(docs.select("doc_id", "text"),
        DedupOps.minhashDupPairs(docs.select("doc_id", "text"), 3, 16, 4, 0.5))
      .select("cluster").distinct().count()
    assert(out("dup_doc_share") ===
      BigDecimal((n - nc) / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val nTrain = docs.filter(col("doc_id") % 97 =!= 0).count().toDouble
    val nContam = DedupOps.contaminationFlags(
      docs.filter(col("doc_id") % 97 =!= 0).select("doc_id", "text"),
      docs.filter(col("doc_id") % 97 === 0).select("doc_id", "text"), 5).count()
    assert(out("contaminated_share") ===
      BigDecimal(nContam / nTrain).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out("mean_stopword_ratio") > 0.0 && out("mean_stopword_ratio") < 1.0)
    assert(out.size === 8)
  }

  test("q176 standing datacard equals the full-recompute datacard, bit for bit") {
    val s = spark
    val full = graft.queries.TextDedup.datacard(s, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val standing = graft.queries.TextDedup.standingDatacard(s, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(standing === full)
    // the pin is only meaningful if the increment is non-empty
    val nInc = s.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 10 < 2 && col("doc_id") % 97 =!= 0).count()
    assert(nInc > 0, "fixture increment is empty — pin proves nothing")
  }

  test("q176 streaming twin: per-batch datacard admission ends at the full card; replay is a no-op") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{count, lit, sum, when}
    val docs = s.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text", "lang")
    val isEval = col("doc_id") % 97 === 0
    val standing = docs.filter((col("doc_id") % 10 >= 2) || isEval)
    val b1 = docs.filter(col("doc_id") % 10 === 0 && !isEval)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val b2 = docs.filter(col("doc_id") % 10 === 1 && !isEval)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(b1.nonEmpty && b2.nonEmpty)
    val idxName = "graft_test_dcard_idx"
    val gramName = "graft_test_dcard_grams"
    Seq("bands", "docs", "texts", "meta").foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS ${idxName}_$t"))
    Seq("grams", "docs", "meta").foreach(t =>
      s.sql(s"DROP TABLE IF EXISTS ${gramName}_$t"))
    val dir = java.nio.file.Files.createTempDirectory("graft-dcard").toString
    // standing state, exactly the q176 build
    DedupOps
      .dedupClusters(standing,
        DedupOps.minhashDupPairs(standing, 3, 16, 4, 0.5))
      .select("doc_id", "cluster").write.parquet(s"$dir/state/labels")
    standing.groupBy("lang").agg(count(lit(1)).as("c"))
      .write.parquet(s"$dir/state/langs")
    graft.text.TextOps.qualityStats(standing, Seq("the", "a"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(org.apache.spark.sql.functions
          .expr("CAST(round(stopword_ratio * 1e6, 0) AS BIGINT)")).as("sfp"),
        sum(when(!isEval, 1L).otherwise(0L)).as("n_train"))
      .crossJoin(DedupOps
        .contaminationFlags(standing.filter(!isEval), standing.filter(isEval), 5)
        .agg(count(lit(1)).as("n_contam")))
      .write.parquet(s"$dir/state/scalars")
    DedupOps.buildBandIndex(s, standing, idxName, shingleK = 3,
      numHashes = 16, rowsPerBand = 4, location = s"$dir/idx", buckets = 4)
    DedupOps.buildEvalGramStore(s, docs.filter(isEval), gramName, 5,
      location = s"$dir/grams")
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val q = graft.streaming.StreamOps.streamingDatacardAdmission(
      ms.toDF().toDF("doc_id", "text", "lang"), idxName, gramName,
      s"$dir/state", s"$dir/cards", threshold = 0.5,
      stopwords = Seq("the", "a")).start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      val after2 = s.read.parquet(s"$dir/state/labels")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      ms.addData(b2); q.processAllAvailable() // at-least-once replay
      val after3 = s.read.parquet(s"$dir/state/labels")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(after3 === after2, "replayed batch changed the label store")
    } finally q.stop()
    val cards = s.read.parquet(s"$dir/cards")
      .collect().map(r => (r.getLong(2), r.getString(0), r.getDouble(1)))
    val full = graft.queries.TextDedup.datacard(s, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(cards.filter(_._1 == 1L).map(c => (c._2, c._3)).toSet === full,
      "card after the final admission must equal the full-recompute datacard")
    assert(cards.filter(_._1 == 2L).map(c => (c._2, c._3)).toSet === full,
      "replayed batch must re-emit the same card, not drift the state")
  }

  test("q177 source mix: hand corpus — shares, dominant-lang tie-break, contamination, quality") {
    val s = spark
    import s.implicits._
    // src a: all-stopword doc (ratio 1.0) + no-stopword doc; en/fr tie → 'en'
    // src b: eval doc 0 + a train doc sharing a 5-gram with it (contaminated)
    val docs = Seq(
      (1L, "the a", "en", "a"),
      (2L, "y y", "fr", "a"),
      (0L, "p q r s t u", "en", "b"),
      (3L, "z p q r s t", "en", "b"),
    ).toDF("doc_id", "text", "lang", "source")
    val out = graft.queries.TextDedup.sourceMixCore(docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4), r.getDouble(5),
        Option(r.get(6)).map(_.asInstanceOf[Double]), r.getDouble(7)))).toMap
    // 16 corpus tokens: src a 4, src b 12
    assert(out("a") === ((2L, 4L, 0.25, "en", 0.5, Some(0.0), 0.5)), s"src a: ${out("a")}")
    val b = out("b")
    assert(b._1 === 2L && b._2 === 12L && b._3 === 0.75)
    assert(b._4 === "en" && b._5 === 1.0)
    assert(b._6 === Some(1.0), "src b's one train doc shares a 5-gram with the eval doc")
    assert(b._7 === 0.0)
  }

  test("q180 fuzzy decontam: gram-only doc flagged without near id; near-dup carries both; clean absent") {
    // eval doc 0: "p q r s t u v w"
    // train 1: shares exactly the 5-gram window mass of "p q r s t" but is
    //          nowhere near a duplicate (long unrelated tail)
    // train 2: a near-identical copy of doc 0 (one token appended)
    // train 3: clean
    val d = docs(
      0L -> "p q r s t u v w",
      1L -> "p q r s t a1 a2 a3 a4 a5 a6 a7 a8 a9 b1 b2 b3 b4 b5 b6 b7 b8 b9 c1 c2 c3",
      2L -> "p q r s t u v w x",
      3L -> "m n o aa bb cc dd ee")
    val out = graft.queries.TextDedup.fuzzyDecontamCore(d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(out.keySet === Set(1L, 2L), s"flagged ${out.keySet}")
    assert(out(1L) === ((1L, None)), s"gram-only doc: ${out(1L)}")
    val (g2, n2) = out(2L)
    assert(g2 >= 4L && n2 === Some(0L), s"near-dup doc: ${out(2L)}")
  }

  test("dedupClusters: 16-hop chain converges in O(log) rounds via doubling") {
    val s = spark
    import s.implicits._
    // a 17-vertex path graph (16 hops): the min label must cross the whole
    // diameter. Plain neighbor-min propagation needs 16 rounds; the
    // pointer-doubling jump reaches ≥ 2d+1 hops per round (1,3,7,15,31 —
    // converged by round 5) plus one round to observe the fixpoint.
    val n = 17L
    val docsDf = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = DedupOps.ccLabels(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to n).map(_ -> 1L).toMap)
    assert(rounds <= 7, s"expected O(log n) rounds on a 16-hop chain, got $rounds")
    val out = DedupOps.dedupClusters(docsDf, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.forall(_._2 == 1L))
    assert(out.count(_._3) === 1)
  }

  test("alternating large/small-star CC equals the doubling labels on chains") {
    val s = spark
    import s.implicits._
    val n = 17L
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = DedupOps.ccLabelsAlternating(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to n).map(_ -> 1L).toMap)
    assert(rounds <= 10, s"16-hop chain took $rounds alternating rounds")
  }

  test("dedupClusters: doubling is correct when the min sits mid-chain") {
    val s = spark
    import s.implicits._
    // ids deliberately NOT monotone along the path: the global min (1) is
    // in the middle, larger ids interleave on both sides — jumps can point
    // "away" from the min and must still converge to the right fixpoint
    val path = Seq(9L, 4L, 8L, 1L, 7L, 3L, 6L, 2L, 5L)
    val pairs = path.zip(path.tail).toDF("doc_a", "doc_b")
    val (labels, rounds) = DedupOps.ccLabels(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === path.map(_ -> 1L).toMap)
    assert(rounds <= 6, s"8-hop chain took $rounds rounds")
  }

  test("collect_capped bounds aggregation state and flags overflow by size") {
    val s = spark
    import s.implicits._
    import graft.functions.CollectCapped.collect_capped
    import org.apache.spark.sql.functions.col
    // key 1: 10 values (> cap 3 → truncated at cap+1 = overflow marker),
    // key 2: exactly cap, key 3: one; repartition forces partial buffers
    // through serialize/merge
    val df = ((1 to 10).map(v => (1L, v.toLong)) ++
      Seq((2L, 1L), (2L, 2L), (2L, 3L), (3L, 9L)))
      .toDF("k", "v").repartition(8)
    val out = df.groupBy("k").agg(collect_capped(col("v"), 3).as("ds"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L).length === 4, "overflowed group must truncate at cap+1")
    assert(out(1L).toSet.subsetOf((1 to 10).map(_.toLong).toSet))
    assert(out(2L).sorted === Seq(1L, 2L, 3L))
    assert(out(3L) === Seq(9L))
  }

  test("simhash: identical docs get identical fingerprints; disjoint differ") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "alpha beta gamma", 3L -> "x1 y2 z3 q4")
    val m = DedupOps.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(2L))
    assert(m(1L) !== m(3L))
    assert(m.values.forall(v => v >= 0L && v < (1L << 32)))
  }

  test("qualityStats computes exact ratios") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "the cat sat", "en")).toDF("doc_id", "text", "lang")
    val r = TextOps.qualityStats(d, Seq("the", "a")).head()
    assert(r.getAs[Long]("n_tokens") === 3L)
    assert(r.getAs[Long]("n_distinct") === 3L)
    assert(r.getAs[Double]("stopword_ratio") === math.rint(1.0 / 3 * 1e6) / 1e6)
    assert(r.getAs[Double]("punct_ratio") === 0.0)
    assert(r.getAs[Double]("mean_token_len") === 3.0)
  }

  test("fingerprints match a reference Scala fold") {
    def fold(t: String): Long =
      t.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % TextOps.P)
    def min8(t: String): Long =
      (0 to t.length - 8).map(i => fold(t.substring(i, i + 8))).min
    val s = spark
    import s.implicits._
    val texts = Seq((1L, "the quick brown fox jumps"), (2L, "pack my box with jugs"))
    val d = texts.toDF("doc_id", "text")
    val got = TextOps.fingerprints(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) === ((fold(t), min8(t))))
    }
  }

  // ---- q147 calibration ---------------------------------------------------

  test("q147 calibration: perfectly calibrated bins show ~zero gap; a lying bin shows its lie") {
    val s = spark
    import s.implicits._
    // bin 2 (p=0.25): 1 positive of 4 -> perfectly calibrated;
    // bin 9 (p=0.95): 0 positives of 4 -> gap = 0.95;
    // p = 1.0 must land in bin 9 (the least() clamp), not a phantom bin 10
    val rows = Seq(
      (1.0, 0.25), (0.0, 0.25), (0.0, 0.25), (0.0, 0.25),
      (0.0, 0.95), (0.0, 0.95), (0.0, 0.95), (0.0, 0.95),
      (1.0, 1.0),
    )
    val out = graft.queries.TextDedup.calibrationCore(rows.toDF("y", "p"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(2L, 9L))
    assert(out(2L).getLong(1) == 4L)
    assert(math.abs(out(2L).getDouble(4)) < 1e-9, "calibrated bin gap must be ~0")
    assert(out(9L).getLong(1) == 5L) // the p=1.0 row clamps into bin 9
    assert(out(9L).getDouble(2) > 0.95 && out(9L).getDouble(3) == 0.2)
    // ECE recoverable: n-weighted gap sum matches the hand value
    val ece = out.values.map(r => r.getLong(1) * r.getDouble(4)).sum / 9.0
    assert(ece > 0.4 && ece < 0.5)
  }

  // ---- q150 AUC -----------------------------------------------------------

  test("q150 AUC: perfect separation 1.0, reversal 0.0, all-ties 0.5, hand case exact") {
    val s = spark
    import s.implicits._
    def run(rows: Seq[(Long, Double, Double)]): Double =
      graft.queries.TextDedup.aucCore(rows.toDF("doc_id", "y", "p"))
        .head().getDouble(2)
    val perfect = Seq((1L, 0.0, 0.1), (2L, 0.0, 0.2), (3L, 1.0, 0.8), (4L, 1.0, 0.9))
    assert(run(perfect) == 1.0)
    assert(run(perfect.map { case (i, y, p) => (i, 1.0 - y, p) }) == 0.0)
    val ties = Seq((1L, 0.0, 0.5), (2L, 1.0, 0.5), (3L, 0.0, 0.5), (4L, 1.0, 0.5))
    assert(run(ties) == 0.5, "tie-averaged ranks must give exactly 0.5")
    // hand case: pos at 0.9 and 0.3; neg at 0.5 and 0.1 ->
    // pairs won: (0.9>0.5), (0.9>0.1), (0.3>0.1) = 3 of 4 -> 0.75
    val hand = Seq((1L, 1.0, 0.9), (2L, 0.0, 0.5), (3L, 1.0, 0.3), (4L, 0.0, 0.1))
    assert(run(hand) == 0.75)
  }

  // ---- q153 leakage-safe split --------------------------------------------

  test("q153: every near-dup cluster lands wholly in one split") {
    val out = graft.queries.TextDedup.leakageSplit(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.nonEmpty)
    // cluster -> distinct splits must be 1 for every cluster
    val bad = out.groupBy(_._2).filter(_._2.map(_._3).distinct.length > 1)
    assert(bad.isEmpty, s"clusters split across sets: ${bad.keys.take(3)}")
    // and there exist multi-doc clusters, so the invariant is non-vacuous
    assert(out.groupBy(_._2).exists(_._2.length > 1),
      "fixture must contain at least one near-dup family")
    // distribution sanity: all three splits appear
    assert(out.map(_._3).distinct.sorted.toSeq == Seq("test", "train", "val"))
  }

  // ---- q154 feature whitening ---------------------------------------------

  test("q154: whitened features have identity covariance") {
    val rows = graft.queries.TextDedup.featureWhiten(spark, sf001).collect()
      .map(r => Array(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val n = rows.length
    assert(n > 100)
    val mean = Array.tabulate(4)(j => rows.map(_(j)).sum / n)
    for (i <- 0 until 4; j <- 0 to i) {
      val c = rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
      if (i == j) assert(math.abs(c - 1.0) < 0.02, s"var z_$i = $c")
      else assert(math.abs(c) < 0.02, s"cov z_$i z_$j = $c")
    }
  }

  test("q187: distinct-n counts per (lang, n); gram-less combos emit no row") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (0L, "a a a a", "x"),   // n1: 4/1, n2: 3/1, n3: 2/1
      (1L, "a b c", "y"),     // fully diverse at every n
      (2L, "a b", "z"),       // no trigrams → no (z, 3) row
    ).toDF("doc_id", "text", "lang")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft-dn").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextDedup.distinctNgrams(s, dir)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(out(("x", 1L)) === ((4L, 1L, Some(0.25))))
    assert(out(("x", 2L)) === ((3L, 1L, Some(0.333333))))
    assert(out(("x", 3L)) === ((2L, 1L, Some(0.5))))
    assert(out(("y", 1L)) === ((3L, 3L, Some(1.0))))
    assert(out(("y", 2L)) === ((2L, 2L, Some(1.0))))
    assert(out(("y", 3L)) === ((1L, 1L, Some(1.0))))
    assert(out(("z", 2L)) === ((1L, 1L, Some(1.0))))
    assert(!out.contains(("z", 3L)), "a gram-less (lang, n) combo has no row")
  }

  test("q193: each Gopher rule fails on its designed violation, and only there") {
    val s = spark
    import s.implicits._
    def fill(n: Int) = (1 to n).map(i => s"wrd$i").mkString(" ") // 4-5 char fillers
    val corpus = Seq(
      (0L, s"the of ${fill(48)}"),                             // 50 words, all rules pass
      (1L, "the of too short"),                                // r_len fails
      (3L, ("extraordinarilylongword " * 48 + "the of").trim), // mean len > 10 → r_wordlen
      (4L, ("$$$ " * 10 + "the of " + fill(38)).trim),         // >10% symbol words
      (5L, ("12345 " * 20 + "the of " + fill(28)).trim),       // <80% alphabetic
      (6L, s"aaa bbb ${fill(48)}"),                            // no stopwords → r_stop
    ).toDF("doc_id", "text")
    val out = graft.queries.TextDedup.gopherGateCore(corpus)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))).toMap
    assert(out(0L) === ((1L, 1L, 1L, 1L, 1L, true)), s"${out(0L)}")
    assert(out(1L)._1 === 0L && !out(1L)._6, "short doc fails r_len")
    assert(out(3L)._2 === 0L && !out(3L)._6, "long-word doc fails r_wordlen")
    assert(out(4L)._3 === 0L && !out(4L)._6, "symbol-heavy doc fails r_symbol")
    assert(out(5L)._4 === 0L && !out(5L)._6, "numeric-heavy doc fails r_alpha")
    assert(out(6L)._5 === 0L && !out(6L)._6, "stopword-free doc fails r_stop")
  }

  test("q195: every stage fires once, later verdicts are NULL after a drop, survivor keeps") {
    val s = spark
    import s.implicits._
    def fill(n: Int) = (1 to n).map(i => s"wrd$i").mkString(" ")
    val evalText = "secret eval question answer tokens here now ok"
    val nearBase = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (0L, evalText),                                  // eval slice (0 % 97 == 0)
      (1L, nearBase), (2L, nearBase),                  // 2 = exact dup of 1
      (3L, nearBase.replace("kappa", "lambda")),       // near-dup of 1 (j >= 0.5)
      (4L, s"intro secret eval question answer tokens stolen ${fill(5)}"), // 5-gram leak
      (5L, "way too short"),                           // gopher r_len fail
      (6L, s"the of ${fill(48)}"),                     // clean survivor
    ).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val out = graft.queries.TextDedup.finewebLedgerCore(corpus)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        Option(r.get(6)).map(_.asInstanceOf[Long]), r.getBoolean(7)))).toMap
    assert(!out.contains(0L), "the eval slice is never ledgered")
    assert(out(2L) === ((true, None, None, None, false)),
      s"exact dup masks everything downstream: ${out(2L)}")
    assert(out(3L) === ((false, Some(1L), None, None, false)),
      s"near-dup dies at stage 2: ${out(3L)}")
    assert(out(4L) === ((false, Some(0L), Some(1L), None, false)),
      s"leaked doc dies at decontamination: ${out(4L)}")
    assert(out(5L) === ((false, Some(0L), Some(0L), Some(1L), false)),
      s"short doc dies at the gate: ${out(5L)}")
    assert(out(6L) === ((false, Some(0L), Some(0L), Some(0L), true)),
      s"clean doc survives all four: ${out(6L)}")
    assert(out(1L)._5 === false && out(1L)._4 === Some(1L),
      "the kept exact-original still faces the gate (word salad fails it)")
  }

  test("q188: banding recall/precision sweep is monotone; exact twins always collide") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"), // exact twin of 0
      (2L, "one two three four five six"),
      (3L, "one two three four five seven"),       // jaccard 0.6 vs 2
      (4L, "nothing shared here at all whatsoever"),
    ).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft-lshr").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.TextDedup.lshRecall(s, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    val (t1, c1, h1, r1) = rows(1L)
    val (t2, c2, h2, r2) = rows(2L)
    val (t4, c4, h4, r4) = rows(4L)
    assert(t1 === 2L && t2 === 2L && t4 === 2L, "truth: the twin pair + the 0.6 pair")
    // looser bands can only ADD candidates and hits
    assert(c1 >= c2 && c2 >= c4, s"candidates must shrink with rows/band: $c1 $c2 $c4")
    assert(h1 >= h2 && h2 >= h4 && r1 >= r2 && r2 >= r4)
    // an exact twin has an identical signature — every geometry finds it
    assert(h4 >= 1L, "exact twins must collide even at the strictest banding")
    rows.values.foreach { case (t, c, h, _) =>
      assert(h <= t && h <= c, "hits bounded by truth and candidates") }
  }

  test("q197: a sample covering the corpus reproduces the full q188 sweep; a binding sample shrinks the pair population") {
    val s = spark
    import s.implicits._
    val corpus = (0L until 40L).map { i =>
      val base = s"tok${i % 8} alpha beta gamma delta tok${(i * 3) % 8} epsilon"
      (i, if (i % 2 == 0) base else base + s" extra${i}")
    }.toDF("doc_id", "text")
    val full = graft.queries.TextDedup.lshRecallCore(corpus)
      .collect().toSeq
    val covered = graft.queries.TextDedup.lshRecallSampledCore(corpus, 1000)
      .drop("sample_mill").collect().toSeq
    assert(covered === full, "mill = 1000 must equal the full sweep exactly")
    val bound = graft.queries.TextDedup.lshRecallSampledCore(corpus, 500)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val fullTrue = full.map(r => r.getLong(0) -> r.getLong(1)).toMap
    bound.foreach { case (rpb, nTrue) =>
      assert(nTrue <= fullTrue(rpb), "a binding sample cannot add truth pairs") }
    assert(bound.values.exists(_ < fullTrue.values.max),
      "the half sample must actually bind on this corpus")
  }
}

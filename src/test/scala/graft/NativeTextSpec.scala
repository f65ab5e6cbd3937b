package graft

import org.apache.spark.sql.functions._
import graft.dedup.DedupOps
import graft.functions.{TextExprs, VectorExprs}
import graft.text.TextOps

/** Bit-equality of the one-pass native text/vector expressions against the
  * explode / higher-order-function formulations they replaced (the
  * executable spec the DuckDB oracle mirrors), on real corpus data plus
  * hand-built edge cases (empty tokens, < k tokens, ties).
  */
class NativeTextSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  import spark.implicits._

  test("simhash32 equals the 32-bit explode/groupBy spec on every document") {
    val native = DedupOps.simhash(docs)
    val spec = DedupOps.simhashViaExplode(docs)
    assert(native.exceptAll(spec).count() === 0L)
    assert(spec.exceptAll(native).count() === 0L)
    assert(native.count() > 0L)
  }

  test("simhash32 handles empty and multi-space edge docs like the spec") {
    val edge = Seq((1L, ""), (2L, "a  b "), (3L, " "), (4L, "x x x"))
      .toDF("doc_id", "text")
    val native = DedupOps.simhash(edge).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val spec = DedupOps.simhashViaExplode(edge).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === spec)
  }

  test("token_stats equals the explode/groupBy quality stats") {
    val stopList = Seq("the", "a")
    val native = TextOps.qualityStats(docs, stopList)
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val spec = tok
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"),
        sum(length(col("tok")).cast("long")).as("sumlen"),
        sum(expr("CASE WHEN tok IN ('the', 'a') THEN 1L ELSE 0L END")).as("nstop"),
      )
    val joined = native
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"))
      .join(spec.select(col("doc_id"), col("n_tokens").as("e_tokens"),
        col("n_distinct").as("e_distinct")), "doc_id")
      .filter(col("n_tokens") =!= col("e_tokens") ||
        col("n_distinct") =!= col("e_distinct"))
    assert(joined.count() === 0L)
  }

  test("marker_counts equals per-token IN-list sums, empty-token docs included") {
    val edge = Seq((1L, "the la der"), (2L, ""), (3L, "the the  la")).toDF("doc_id", "text")
    val sets = Seq(Seq("the", "a", "of"), Seq("der", "die", "das"), Seq("le", "la", "les"))
    val native = edge
      .select(col("doc_id"), TextExprs.marker_counts(col("text"), sets).as("mc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native(1L) === Seq(1L, 1L, 1L))
    assert(native(2L) === Seq(0L, 0L, 0L))
    assert(native(3L) === Seq(2L, 0L, 1L))
  }

  test("shingle_hash_set is the distinct set of the HOF two-level shingles") {
    val native = docs.select(col("doc_id"),
      explode(TextExprs.shingle_hash_set(col("text"), 3)).as("h"))
    val hof = docs
      .withColumn("__th", expr(TextOps.tokenHashArrayExpr))
      .select(col("doc_id"), explode(expr(TextOps.shingleHashExpr(3))).as("h"))
      .distinct()
    assert(native.exceptAll(hof).count() === 0L)
    assert(hof.exceptAll(native).count() === 0L)
  }

  test("shingle_hashes equals the positional HOF shingles, positions included") {
    val native = docs.select(col("doc_id"),
      posexplode(TextExprs.shingle_hashes(col("text"), 5)))
    val hof = docs
      .withColumn("__th", expr(TextOps.tokenHashArrayExpr))
      .select(col("doc_id"), posexplode(expr(TextOps.shingleHashExpr(5))))
    assert(native.exceptAll(hof).count() === 0L)
    assert(hof.exceptAll(native).count() === 0L)
    assert(native.count() > 0L)
    // duplicates kept in order: "a b a b" 2-grams = [ab, ba, ab]
    val edge = Seq((1L, "a b a b"), (2L, "x")).toDF("doc_id", "text")
    val rows = edge.select(col("doc_id"),
      posexplode(TextExprs.shingle_hashes(col("text"), 2)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.count(_._1 == 1L) === 3)
    assert(rows.filter(_._1 == 1L).map(_._3).distinct.length === 2)
    assert(rows.count(_._1 == 2L) === 0) // < k tokens → empty
  }

  test("term_counts equals the explode/groupBy term-frequency spec") {
    val native = docs.select(col("doc_id"),
      explode(TextExprs.term_counts(col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.c").as("tf"))
    val spec = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    assert(native.exceptAll(spec).count() === 0L)
    assert(spec.exceptAll(native).count() === 0L)
    assert(native.count() > 0L)
    // empty-token framing: "a  b" has an empty token with count 1
    val edge = Seq((1L, "a  b a")).toDF("doc_id", "text")
    val m = edge.select(explode(TextExprs.term_counts(col("text"))).as("tc"))
      .collect().map(r => r.getStruct(0).getString(0) -> r.getStruct(0).getLong(1)).toMap
    assert(m === Map("a" -> 2L, "" -> 1L, "b" -> 1L))
  }

  test("shingle_hash_set: fewer than k tokens yields an empty set") {
    val edge = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val n = edge.select(explode(TextExprs.shingle_hash_set(col("text"), 3))).count()
    assert(n === 0L)
  }

  test("min_hash_sig + lsh_band_keys equal the groupBy signature/band spec") {
    val sh = TextOps.shingleHashes(docs, 3)
    val specBands = DedupOps.lshBands(DedupOps.minhashSignatures(sh, 16), 4)
      .select(col("doc_id"), col("band"), col("bkey"))
    val nativeBands = docs
      .select(col("doc_id"), TextExprs.shingle_hash_set(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        posexplode(TextExprs.lsh_band_keys(TextExprs.min_hash_sig(col("sh"), 16), 4)))
      .select(col("doc_id"), col("pos").cast("long").as("band"), col("col").as("bkey"))
    assert(nativeBands.exceptAll(specBands).count() === 0L)
    assert(specBands.exceptAll(nativeBands).count() === 0L)
  }

  test("min_hash_sig + lsh_band_keys equal the spec at a PARTIAL-band width (14/4)") {
    val sh = TextOps.shingleHashes(docs, 3)
    val specBands = DedupOps.lshBands(DedupOps.minhashSignatures(sh, 14), 4)
      .select(col("doc_id"), col("band"), col("bkey"))
    val nativeBands = docs
      .select(col("doc_id"), TextExprs.shingle_hash_set(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        posexplode(TextExprs.lsh_band_keys(TextExprs.min_hash_sig(col("sh"), 14), 4)))
      .select(col("doc_id"), col("pos").cast("long").as("band"), col("col").as("bkey"))
    assert(nativeBands.exceptAll(specBands).count() === 0L)
    assert(specBands.exceptAll(nativeBands).count() === 0L)
  }

  test("min_hash_sig of an empty shingle set is null (no MaxValue sentinel bands)") {
    val edge = Seq((1L, "a b"), (2L, "one two three four")).toDF("doc_id", "text")
    val sigs = edge.select(col("doc_id"),
      TextExprs.min_hash_sig(TextExprs.shingle_hash_set(col("text"), 3), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(sigs(1L) === true, "sub-k doc must yield null signature")
    assert(sigs(2L) === false)
    // and lsh_band_keys propagates the null instead of colliding empties
    val bands = edge.select(
      TextExprs.lsh_band_keys(
        TextExprs.min_hash_sig(TextExprs.shingle_hash_set(col("text"), 3), 8), 4).as("b"))
      .collect().map(_.isNullAt(0))
    assert(bands.count(identity) === 1)
  }

  test("intersect_size equals the inverted-index common count on real pairs") {
    val withSh = docs
      .select(col("doc_id"), TextExprs.shingle_hash_set(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val sh = withSh.select(col("doc_id"), explode(col("sh")).as("h"))
    val specCommon = sh.select(col("doc_id").as("doc_a"), col("h"))
      .join(sh.select(col("doc_id").as("doc_b"), col("h")), "h")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
    val nativeCommon = withSh.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
      .crossJoin(withSh.select(col("doc_id").as("doc_b"), col("sh").as("shb")))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("common", TextExprs.intersect_size(col("sha"), col("shb")))
      .filter(col("common") > 0)
      .select("doc_a", "doc_b", "common")
    assert(nativeCommon.exceptAll(specCommon).count() === 0L)
    assert(specCommon.exceptAll(nativeCommon).count() === 0L)
  }

  test("prefix-filtered Jaccard equals the full inverted-index join at several thresholds") {
    for (mill <- Seq(300, 600, 800); rare <- Seq(true, false)) {
      val pruned = DedupOps.jaccardDupPairsPrefix(docs, 3, mill, rareFirst = rare)
      val full = DedupOps.jaccardDupPairs(docs, 3, mill / 1000.0)
      assert(pruned.exceptAll(full).count() === 0L, s"t=$mill rare=$rare extra pairs")
      assert(full.exceptAll(pruned).count() === 0L, s"t=$mill rare=$rare MISSED pairs")
    }
    // sanity: the 0.3 run actually finds pairs (non-vacuous equality)
    assert(DedupOps.jaccardDupPairsPrefix(docs, 3, 300).count() > 0L)
  }

  test("dot_fold equals the aggregate(zip_with) HOF fold bit-for-bit") {
    val pairs = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(200)
      .crossJoin(emb.select(col("embedding").cast("array<double>").as("w")).limit(5))
    val diff = pairs.select(
      VectorExprs.dot_fold(col("v"), col("w")).as("native"),
      expr("aggregate(zip_with(v, w, (x, y) -> x * y), 0D, (acc, p) -> acc + p)").as("hof"),
    ).filter(col("native") =!= col("hof")).count()
    assert(diff === 0L)
  }

  test("sign_bucket equals the aggregate(sequence) HOF bucket") {
    val v = emb.select(col("embedding").cast("array<double>").as("v"))
    val diff = v.select(
      VectorExprs.sign_bucket(col("v"), 8).as("native"),
      expr("aggregate(sequence(0, 7), 0L, (acc, k) -> acc + " +
        "(CASE WHEN element_at(v, k + 1) > 0D THEN shiftleft(1L, k) ELSE 0L END))").as("hof"),
    ).filter(col("native") =!= col("hof")).count()
    assert(diff === 0L)
  }

  test("dot_fold of mismatched lengths is null like the zip_with form") {
    val d = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val r = d.select(VectorExprs.dot_fold(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("gram_stats equals the explode/groupBy gram-count spec on every document") {
    // explode twin: token-hash bigrams via lead(), counted per (doc, gram)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val grams = docs
      .select(col("doc_id"), posexplode(expr("split(text, ' ', -1)")))
      .withColumnRenamed("pos", "pos")
      .withColumn("h", graft.functions.Hashing.poly_hash(col("col")))
      .withColumn("h2", lead(col("h"), 1).over(w))
      .filter(col("h2").isNotNull)
      .select(col("doc_id"), expr(s"(h * 31 + h2) % ${TextExprs.P}").as("g"))
    val spec = grams.groupBy("doc_id", "g").count()
      .groupBy("doc_id")
      .agg(sum("count").as("total"), count(lit(1)).as("uniq"), max("count").as("top_freq"))
    val native = docs.select(col("doc_id"),
      TextExprs.gram_stats(col("text"), 2).as("gs"))
      .select(col("doc_id"), col("gs.total"), col("gs.uniq"), col("gs.top_freq"))
      .filter(col("total") > 0)
    assert(native.exceptAll(spec).count() === 0L)
    assert(spec.exceptAll(native).count() === 0L)
    assert(native.count() > 0L)
  }
}

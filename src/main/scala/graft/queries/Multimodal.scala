package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.multimodal.MultimodalOps

/** Multimodal-column queries: binary payload plumbing over `documents`
  * stand-in media. q42 (stub decode via mapPartitions) has no SQL oracle —
  * the driver records a rows-only check; q43 (frame sampling) is pure
  * relational algebra over binary columns and is oracle-checked including
  * the binary frame values.
  */
object Multimodal extends QueryModule {

  /** q42: partition-batched stub decode → fixed-width features. The first
    * two feature stripes are projected out so the output is flat doubles.
    * The mapPartitions plumbing is the point; the stub's arithmetic (radix-
    * 31 fold over every 8th payload byte, scaled to [0,1)) is nevertheless
    * oracle-checkable — the SQL mirrors it in the char domain (ASCII
    * corpus: char ops == byte ops). */
  def mediaFeatures(s: SparkSession, d: String): DataFrame =
    MultimodalOps
      .extractFeatures(s, MultimodalOps.mediaFromDocuments(documents(s, d)))
      .select(
        col("doc_id"), col("n_bytes"),
        round(element_at(col("features"), 1), 6).as("f0"),
        round(element_at(col("features"), 2), 6).as("f1"),
      )
      .orderBy("doc_id")

  private def stripeHash(j: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(list_filter(range(length(text)), i -> i % ${MultimodalOps.FeatureDim} = $j),
       |    i -> CAST(ord(substring(text, CAST(i + 1 AS INT), 1)) AS BIGINT))),
       |  (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin.replace("\n", " ")

  private val mediaFeaturesSql =
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_bytes,
       |  round(CAST(${stripeHash(0)} AS DOUBLE) / 1000000007.0, 6) AS f0,
       |  round(CAST(${stripeHash(1)} AS DOUBLE) / 1000000007.0, 6) AS f1
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  /** q43: every 4th 64-byte frame of each payload, with the frame bytes. */
  def frameSample(s: SparkSession, d: String): DataFrame =
    MultimodalOps
      .sampleFrames(MultimodalOps.mediaFromDocuments(documents(s, d)),
        frameBytes = 64, stride = 4)
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        // payloads are ASCII stand-ins → decode for the oracle compare
        // (DuckDB 1.0 can't slice BLOBs; the op itself keeps binary frames)
        decode(col("frame"), "UTF-8").as("frame_text"))
      .orderBy("doc_id", "frame_idx")

  private val frameSampleSql =
    """WITH media AS (
      |  SELECT doc_id, text AS payload,
      |    octet_length(encode(text)) // 64 AS n_frames
      |  FROM documents
      |)
      |SELECT doc_id, n_frames, r.f AS frame_idx,
      |  substring(payload, CAST(r.f * 64 + 1 AS INTEGER), 64) AS frame_text
      |FROM media, unnest(range(0, n_frames, 4)) AS r(f)
      |WHERE n_frames > 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** q56: block-stride payload resize (the image/audio downsample slot of
    * the decode → extract → resize → frame-sample chain): keep the first 4
    * bytes of every 8-byte block, binary→binary in the scan stage. Output
    * is summarized (byte counts + content hash) because DuckDB 1.0 cannot
    * slice BLOBs — the oracle mirrors the op on the ASCII text stand-in
    * where char ops == byte ops. */
  def mediaResize(s: SparkSession, d: String): DataFrame = {
    import graft.functions.{BinaryExprs, Hashing}
    MultimodalOps.mediaFromDocuments(documents(s, d))
      .select(col("doc_id"), col("payload"),
        BinaryExprs.block_resize(col("payload"), 8, 4).as("resized"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes_in"),
        length(col("resized")).cast("long").as("n_bytes_out"),
        Hashing.poly_hash(col("resized").cast("string")).as("content_hash"),
      )
      .orderBy("doc_id")
  }

  private val mediaResizeSql =
    """WITH resized AS (
      |  SELECT doc_id, length(text) AS n_in,
      |    array_to_string(list_transform(range((length(text) + 7) // 8),
      |      i -> substring(text, CAST(8 * i + 1 AS INT), 4)), '') AS r
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(n_in AS BIGINT) AS n_bytes_in,
      |  CAST(length(r) AS BIGINT) AS n_bytes_out,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(r, ''), c -> CAST(ord(c) AS BIGINT))), (acc, x) -> (acc * 31 + x) % 1000000007) AS content_hash
      |FROM resized
      |ORDER BY doc_id""".stripMargin

  // ---- q114/q115: perceptual near-dup + cross-modal manifest -------------

  import graft.functions.{BinaryExprs, Phash}

  /** Per-payload 32-bit blocked-DCT perceptual hash (BinaryExprs.phash32)
    * plus its 4×8-bit Hamming bands — the media analog of q23's simhash:
    * payloads never shuffle, only 8-byte fingerprints and band keys do. */
  private def phashBands(s: SparkSession, d: String): DataFrame = {
    val ph = MultimodalOps.mediaFromDocuments(documents(s, d))
      .select(col("doc_id"), BinaryExprs.phash32(col("payload")).as("ph"))
    ph.select(col("doc_id"), col("ph"),
      explode(array((0 until 4).map(r =>
        struct(lit(r).as("r"),
          shiftright(col("ph"), 8 * r).bitwiseAND(lit(255L)).as("bv"))): _*)).as("bd"))
      .select(col("doc_id"), col("ph"), col("bd.r").as("r"), col("bd.bv").as("bv"))
  }

  /** The verified perceptual near-dup PAIR relation at Hamming ≤ τ. */
  private def phashPairRelation(s: SparkSession, d: String, tau: Int): DataFrame = {
    val bands = phashBands(s, d)
    bands.select(col("doc_id").as("doc_a"), col("ph").as("__pha"), col("r"), col("bv"))
      .join(bands.select(col("doc_id").as("doc_b"), col("ph").as("__phb"),
        col("r"), col("bv")), Seq("r", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "__pha", "__phb").distinct()
      .withColumn("dist", expr("CAST(bit_count(__pha ^ __phb) AS BIGINT)"))
      .filter(col("dist") <= tau)
  }

  /** q114: perceptual near-dup pairs over binary payloads — pHash
    * fingerprints, bucketed by 4 disjoint 8-bit bands, verified by exact
    * Hamming distance ≤ 3. By pigeonhole the banding is EXACT at this
    * radius (a pair differing in ≤ 3 bits cannot differ in all 4 bands),
    * so unlike MinHash banding there is no recall luck: the bucket join is
    * pure pruning. Scale shape: candidates are bounded by the band-value
    * histogram (256 values × 4 bands) and payload bytes stay in the scan
    * stage — but 8-bit bands pool candidates as ~n²/256 per band, so past
    * ~10⁶ payloads widen the fingerprint (phash64 from the same kernel,
    * 16-bit bands → 65k values, still pigeonhole-exact at radius 3) — the
    * machinery is width-agnostic; 32/8 is proportioned to this corpus. */
  def phashPairs(s: SparkSession, d: String): DataFrame =
    phashPairRelation(s, d, tau = 3)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .orderBy("doc_a", "doc_b")

  /** The kernel literal + per-doc phash CTE chain shared by both oracles:
    * block means and DCT signs replayed in exact int64 over the ASCII
    * stand-in payloads (char ops == byte ops), with the ×1e6 cosine kernel
    * emitted from [[Phash.kernel]] so no libm call crosses the engine
    * boundary. */
  private def phashCtes: String = {
    val kern = (for {
      k <- 1 to Phash.Bits
      b <- 0 until Phash.Grid
    } yield s"($k,$b,${Phash.kernel(k - 1)(b)})").mkString(", ")
    s"""kern(k, b, w) AS (VALUES $kern),
       |media AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n FROM documents),
       |grid AS (
       |  SELECT doc_id, text, n, g.b AS b,
       |    (g.b * n) // ${Phash.Grid} AS lo, ((g.b + 1) * n) // ${Phash.Grid} AS hi
       |  FROM media, unnest(range(${Phash.Grid})) AS g(b)
       |),
       |blocks AS (
       |  SELECT doc_id, b,
       |    CASE WHEN hi > lo THEN
       |      (list_reduce(list_prepend(CAST(0 AS BIGINT),
       |         list_transform(range(lo, hi),
       |           i -> CAST(ord(substring(text, CAST(i + 1 AS INT), 1)) AS BIGINT))),
       |         (a, x) -> a + x) * ${Phash.MeanScale}) // (hi - lo)
       |    ELSE 0 END AS m
       |  FROM grid
       |),
       |coef AS (
       |  SELECT doc_id, k.k AS k, sum(k.w * bl.m) AS c
       |  FROM blocks bl JOIN kern k ON k.b = bl.b
       |  GROUP BY doc_id, k.k
       |),
       |ph AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << (k - 1)) ELSE 0 END) AS BIGINT) AS ph
       |  FROM coef GROUP BY doc_id
       |),
       |bands AS (
       |  SELECT doc_id, ph, r.r AS r, (ph >> (8 * r.r)) & 255 AS bv
       |  FROM ph, unnest(range(4)) AS r(r)
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, a.ph AS pha, b.doc_id AS doc_b, b.ph AS phb
       |  FROM bands a JOIN bands b ON a.r = b.r AND a.bv = b.bv AND a.doc_id < b.doc_id
       |)""".stripMargin
  }

  private def phashPairsSql: String =
    s"""WITH $phashCtes
       |SELECT doc_a, doc_b, CAST(bit_count(xor(pha, phb)) AS BIGINT) AS dist
       |FROM cand
       |WHERE bit_count(xor(pha, phb)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q115: the CROSS-MODAL manifest — each document's text verdict (exact
    * dedup: lowest doc_id of its text group) joined with its media verdict
    * (lowest perceptual near-dup at Hamming ≤ 3) into one keep decision,
    * the shape a multimodal training-data pipeline gates on: a sample
    * survives only if BOTH modalities are novel. */
  def crossmodalManifest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = documents(s, d)
    val textV = docs
      .select(col("doc_id"),
        min("doc_id").over(Window.partitionBy("text")).as("__tm"))
      .select(col("doc_id"),
        when(col("doc_id") > col("__tm"), col("__tm")).as("text_dup_of"))
    val imgV = phashPairRelation(s, d, tau = 3)
      .groupBy(col("doc_b").as("doc_id"))
      .agg(min("doc_a").as("image_dup_of"))
    textV.join(imgV, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text_dup_of"), col("image_dup_of"),
        (col("text_dup_of").isNull && col("image_dup_of").isNull).as("keep"))
      .orderBy("doc_id")
  }

  private def crossmodalManifestSql: String =
    s"""WITH $phashCtes,
       |tv AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id > min(doc_id) OVER (PARTITION BY text)
       |         THEN min(doc_id) OVER (PARTITION BY text) END AS text_dup_of
       |  FROM documents
       |),
       |iv AS (
       |  SELECT doc_b AS doc_id, min(doc_a) AS image_dup_of
       |  FROM cand WHERE bit_count(xor(pha, phb)) <= 3
       |  GROUP BY doc_b
       |)
       |SELECT t.doc_id, t.text_dup_of, iv.image_dup_of,
       |  (t.text_dup_of IS NULL AND iv.image_dup_of IS NULL) AS keep
       |FROM tv t LEFT JOIN iv ON iv.doc_id = t.doc_id
       |ORDER BY t.doc_id""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q42_media_features", mediaFeatures, Some(mediaFeaturesSql)),
    Q("q43_frame_sample", frameSample, Some(frameSampleSql)),
    Q("q56_media_resize", mediaResize, Some(mediaResizeSql)),
    Q("q114_phash_pairs", phashPairs, Some(phashPairsSql)),
    Q("q115_crossmodal_manifest", crossmodalManifest, Some(crossmodalManifestSql)),
  )
}

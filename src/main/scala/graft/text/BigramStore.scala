package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standing bigram language model — the q143 road applied to q165's
  * Kneser–Ney family (the wall SCALE.md named: at ~10⁹ bigram TYPES the
  * model-sized pin becomes a stored standing model).
  *
  * State is ADDITIVE count deltas, the aggregating member of the
  * standing-store family: `name_bigrams` holds per-batch (w1, w2, bf)
  * deltas and `name_grams` per-batch (w, cf) unigram deltas (the exact
  * vocabulary-size source — bigrams alone cannot see a one-token
  * document), each row carrying its batch fingerprint; `name_docs` is
  * the cheap replay guard; `name_meta` records the dataset tag. Batch
  * admission appends batch-sized deltas — the corpus is never
  * re-counted. KN's type-count statistics (n1l, n1r, T) are NOT additive
  * across batches, so they are never stored: the serve derives them from
  * the exactly re-aggregated live bf relation, which IS additive.
  *
  * Serving caps the model at the top-V bigram types by (bf DESC, w1, w2)
  * — q161's frozen-serving discipline at the bigram grain: a serving
  * tier holds a bounded model, and the cut is a TOTAL order so the
  * capped model is engine- and partitioning-independent. Dropped types
  * fall through KN's own unseen-context/continuation branches.
  *
  * Scale shape: admission is one batch-sized aggregate per table;
  * probe-side dedup is (batch_fp, key)-grained max-then-sum (the q143
  * idempotence argument — a crash-replayed identical delta collapses);
  * the serve reads the model store only, ZERO corpus-side exchange. The
  * cap is a TakeOrdered over the model relation, never a global sort.
  * The delta-compaction fold (q143's `compactDsirStore` sibling-swap) is
  * the documented next step of this family when admission cadence makes
  * O(batches) delta rows the probe bottleneck.
  */
object BigramStore {

  private val P = TextOps.P

  /** Content-derived batch fingerprint (order-free, mod-P sums of id and
    * text hashes — the CurationOps construction, sans target predicate). */
  private def batchFingerprint(docs: DataFrame): Long = {
    val r = docs.agg(
      sum(pmod(col("doc_id"), lit(P)) * lit(31L) % lit(P)).as("s1"),
      sum(pmod(col("doc_id"), lit(P)) * pmod(col("doc_id"), lit(P)) % lit(P)).as("s2"),
      sum(pmod(graft.functions.Hashing.poly_hash(col("text")), lit(P))).as("s3"),
      count(lit(1)).as("n")).head()
    if (r.isNullAt(0)) 0L
    else Seq(r.getLong(0) % P, r.getLong(1) % P, r.getLong(2) % P)
      .foldLeft(0L)((acc, x) => (acc * 31 + x) % P) * 1000003 + r.getLong(3)
  }

  private def bigramDelta(docs: DataFrame, fp: Long): DataFrame =
    RetrievalOps.knPairs(docs)
      .groupBy("w1", "w2").agg(count(lit(1)).as("bf"))
      .select(lit(fp).as("batch_fp"), col("w1"), col("w2"), col("bf"))

  private def unigramDelta(docs: DataFrame, fp: Long): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cf"))
      .select(lit(fp).as("batch_fp"), col("w"), col("cf"))

  def build(spark: SparkSession, docs: DataFrame, name: String,
      location: String, datasetTag: String = ""): Unit = {
    import spark.implicits._
    val fp = batchFingerprint(docs)
    bigramDelta(docs, fp)
      .write.mode("overwrite").option("path", s"$location/bigrams")
      .saveAsTable(s"${name}_bigrams")
    unigramDelta(docs, fp)
      .write.mode("overwrite").option("path", s"$location/grams")
      .saveAsTable(s"${name}_grams")
    docs.select("doc_id")
      .write.mode("overwrite").option("path", s"$location/docs")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable(s"${name}_docs")
    Seq(Tuple1(datasetTag)).toDF("dataset_tag")
      .write.mode("overwrite").option("path", s"$location/meta")
      .saveAsTable(s"${name}_meta")
  }

  /** Whether store `name` exists AND was built from `datasetTag`. */
  def matches(spark: SparkSession, name: String, datasetTag: String): Boolean =
    Seq("bigrams", "grams", "docs", "meta")
      .forall(t => spark.catalog.tableExists(s"${name}_$t")) &&
      (try {
        spark.table(s"${name}_meta").head()
          .getAs[String]("dataset_tag") == datasetTag
      } catch { case scala.util.control.NonFatal(_) => false })

  /** Admit a batch: append its bigram/unigram count deltas — batch-sized
    * work. `idempotent` anti-joins the doc guard to skip replays; even an
    * unguarded replay of an identical delta is collapsed probe-side by
    * the (batch_fp, key) max-dedup. */
  def append(spark: SparkSession, newDocs0: DataFrame, name: String,
      idempotent: Boolean = false): Unit = {
    val newDocs = if (!idempotent) newDocs0 else newDocs0.join(
      spark.table(s"${name}_docs"), Seq("doc_id"), "left_anti").localCheckpoint()
    val fp = batchFingerprint(newDocs)
    bigramDelta(newDocs, fp).write.mode("append").saveAsTable(s"${name}_bigrams")
    unigramDelta(newDocs, fp).write.mode("append").saveAsTable(s"${name}_grams")
    newDocs.select("doc_id")
      .write.mode("append")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable(s"${name}_docs")
  }

  /** The store's exact (w1, w2, bf) counts as it stands: dedupe replayed
    * identical deltas on (batch_fp, key), then sum. */
  private def liveBigrams(spark: SparkSession, name: String): DataFrame = {
    spark.catalog.refreshTable(s"${name}_bigrams")
    spark.table(s"${name}_bigrams")
      .groupBy("batch_fp", "w1", "w2").agg(max("bf").as("bf"))
      .groupBy("w1", "w2").agg(sum("bf").as("bf"))
  }

  private def liveVSize(spark: SparkSession, name: String): DataFrame = {
    spark.catalog.refreshTable(s"${name}_grams")
    spark.table(s"${name}_grams")
      .select("w").distinct()
      .agg(count(lit(1)).as("v_size"))
  }

  /** Serve KN scoring of arrivals from the standing model, capped at the
    * top-V bigram types — identical verdict to fitting q165's model on
    * the admitted corpus, capping, and scoring (the oracle's form). */
  def serveKn(spark: SparkSession, arrivals: DataFrame, name: String,
      topV: Int): DataFrame = {
    val capped = liveBigrams(spark, name)
      .orderBy(col("bf").desc, col("w1"), col("w2"))
      .limit(topV)
      .localCheckpoint() // model-sized pin: 4 aggregate consumers
    RetrievalOps.knScore(RetrievalOps.knPairs(arrivals), capped,
      liveVSize(spark, name))
  }
}

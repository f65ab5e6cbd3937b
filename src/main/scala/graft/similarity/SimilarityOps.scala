package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** Approximate-nearest-neighbor / similarity-search operators over an
  * embedding column (`Array[Float]`).
  *
  * Numerics: embeddings are cast element-wise to double (exact widening),
  * dot products are a left fold in array order (`aggregate`) — the same
  * sequential order the DuckDB oracle uses, so cosines are bit-identical
  * and the 6-decimal rounding in query outputs is purely defensive.
  *
  * Scale notes (100 TB): brute force broadcasts the (small) query set and
  * streams the corpus once — no corpus shuffle; top-k per query is a
  * partial-aggregate-friendly window over |queries|·k rows. The LSH variant
  * prunes candidates by bucket equality: at scale, bucket the corpus once
  * (write bucketed/partitioned by `bucket`) and each query probes one
  * partition — the join below is exactly that partition-pruned probe.
  */
object SimilarityOps {

  /** Left-fold dot product of two array<double> columns, in array order. */
  def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  /** vec_id, v (array<double>), norm — the prepared corpus relation. */
  def prepared(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(VectorExprs.dot_fold(col("v"), col("v"))))

  /** Brute-force cosine top-k: for each query vector (a subset of the
    * corpus), the k nearest other vectors by cosine similarity,
    * deterministic tie-break (cosine desc, neighbor id asc).
    */
  def cosineTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val corpus = prepared(emb)
    val queries = corpus
      .filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    val scored = corpus
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", VectorExprs.dot_fold(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** Sign-LSH bucket id: bits 0..nBits-1 are the signs of the first nBits
    * coordinates (axis-aligned random-projection LSH; a production variant
    * swaps in seeded hyperplanes — same plan shape, the projection becomes
    * a dot with a broadcast constant matrix). */
  def signBucketExpr(v: String, nBits: Int): String =
    s"aggregate(sequence(0, ${nBits - 1}), 0L, (acc, k) -> acc + " +
      s"(CASE WHEN element_at($v, k + 1) > 0D THEN shiftleft(1L, k) ELSE 0L END))"

  /** LSH-bucketed ANN: candidates limited to the query's sign bucket, then
    * exact cosine top-k within the bucket. Recall < 1 by construction (the
    * scale path); fully deterministic. */
  def lshTopK(emb: DataFrame, queryPred: Column, k: Int, nBits: Int): DataFrame = {
    val corpus = prepared(emb).withColumn("bucket", VectorExprs.sign_bucket(col("v"), nBits))
    val queries = corpus
      .filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"), col("bucket"))
    val scored = corpus
      .join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", VectorExprs.dot_fold(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** IVF (inverted-file) ANN: assign every vector to its nearest of
    * `nCentroids` coarse centroids (deterministic pick: the lowest-id
    * vectors act as centroids — a production build runs k-means once and
    * broadcasts the trained centroids; the plan is identical), then probe
    * only the query's cell. One broadcast join for assignment, one
    * cell-equi-join for probing — the corpus is scanned once and, when the
    * assignment is persisted partitioned by cell, a probe touches one
    * partition.
    */
  def ivfTopK(emb: DataFrame, queryPred: Column, k: Int, nCentroids: Int): DataFrame = {
    val corpus = prepared(emb)
    val centroids = corpus
      .orderBy("vec_id").limit(nCentroids)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("norm").as("cnorm"))
    // assignment: argmax cosine to a centroid, ties → lowest centroid id
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("__cs").desc, col("cent_id").asc)
    val assigned = corpus
      .join(broadcast(centroids), expr("true"))
      .withColumn("__cs", VectorExprs.dot_fold(col("v"), col("cv")) / (col("norm") * col("cnorm")))
      .withColumn("__rn", row_number().over(wAssign))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("v"), col("norm"), col("cent_id").as("cell"))
    val queries = assigned
      .filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"), col("cell"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    assigned
      .join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", VectorExprs.dot_fold(col("qv"), col("v")) / (col("qnorm") * col("norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** Exact cosine near-duplicate pairs: all (a < b) pairs with cosine ≥
    * threshold, candidates pruned to shared sign buckets ∪ brute force when
    * `bucketed` is false. Embedding-space analog of DedupOps near-dup. */
  def cosineDupPairs(emb: DataFrame, threshold: Double, nBits: Int): DataFrame = {
    val corpus = prepared(emb).withColumn("bucket", VectorExprs.sign_bucket(col("v"), nBits))
    val a = corpus.select(col("bucket"), col("vec_id").as("id_a"),
      col("v").as("va"), col("norm").as("na"))
    val b = corpus.select(col("bucket"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("norm").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorExprs.dot_fold(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}

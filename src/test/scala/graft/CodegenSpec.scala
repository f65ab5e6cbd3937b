package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.debug._
import org.apache.spark.sql.functions._
import graft.functions.{Hashing, TextExprs, VectorExprs}

/** Whole-stage-codegen health of every native expression: runs each under
  * `spark.sql.codegen.fallback=false` (a Janino compile error in generated
  * code then THROWS instead of silently falling back to interpreted eval —
  * the failure mode that would quietly erase the perf win) and asserts the
  * generated source actually contains the static helper call, proving the
  * expression sits inside a WholeStageCodegen span rather than being
  * evaluated via a fallback path.
  */
class CodegenSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  /** Runs `df` with codegen fallback disabled, then asserts the generated
    * code of some codegen subtree mentions `helper`. */
  private def checkCodegen(df: DataFrame, helper: String): Unit = {
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      assert(df.count() > 0L)
      val generated = df.queryExecution.debug.codegenToSeq().map(_._2).mkString("\n")
      assert(generated.contains(helper), s"$helper not found in generated code")
    } finally prev match {
      case Some(v) => conf.set("spark.sql.codegen.fallback", v)
      case None => conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("poly_hash generates and compiles") {
    checkCodegen(docs.select(Hashing.poly_hash(col("text"))), "foldString")
  }

  test("min_gram_hash generates and compiles") {
    checkCodegen(docs.select(Hashing.min_gram_hash(col("text"), lit(8))), "minGram")
  }

  test("simhash32 generates and compiles") {
    checkCodegen(docs.select(TextExprs.simhash32(col("text"))), "simHash")
  }

  test("token_stats generates and compiles (reference-object stop set)") {
    checkCodegen(docs.select(TextExprs.token_stats(col("text"), Seq("the", "a"))),
      "tokenStats")
  }

  test("marker_counts generates and compiles (reference-object set array)") {
    checkCodegen(
      docs.select(TextExprs.marker_counts(col("text"), Seq(Seq("the"), Seq("der")))),
      "markerCounts")
  }

  test("shingle_hash_set / min_hash_sig / lsh_band_keys generate and compile") {
    val df = docs.select(
      TextExprs.lsh_band_keys(
        TextExprs.min_hash_sig(TextExprs.shingle_hash_set(col("text"), 3), 16), 4))
    checkCodegen(df, "shingleHashSet")
    checkCodegen(df, "minHashSig")
    checkCodegen(df, "lshBandKeys")
  }

  test("shingle_hashes generates and compiles") {
    checkCodegen(docs.select(TextExprs.shingle_hashes(col("text"), 5)),
      "shingleHashes")
  }

  test("intersect_size generates and compiles") {
    val df = docs.select(TextExprs.intersect_size(
      TextExprs.shingle_hash_set(col("text"), 3),
      TextExprs.shingle_hash_set(col("text"), 4)))
    checkCodegen(df, "intersectSize")
  }

  test("dot_fold and sign_bucket generate and compile") {
    val v = emb.select(col("embedding").cast("array<double>").as("v"))
    checkCodegen(v.select(VectorExprs.dot_fold(col("v"), col("v"))), "VectorExprs.dot")
    checkCodegen(v.select(VectorExprs.sign_bucket(col("v"), 8)), "signBucket")
  }

  test("block_resize generates and compiles") {
    checkCodegen(docs.select(graft.functions.BinaryExprs.block_resize(
      encode(col("text"), "UTF-8"), 8, 4)), "blockResize")
  }

  test("gram_stats generates and compiles") {
    checkCodegen(docs.select(TextExprs.gram_stats(col("text"), 2)), "gramStats")
  }

  test("seg_dedup generates and compiles") {
    checkCodegen(docs.select(TextExprs.seg_dedup(col("text"), 2)), "segDedup")
  }

  test("term_counts generates and compiles") {
    checkCodegen(docs.select(TextExprs.term_counts(col("text"))), "termCounts")
  }

  test("seg_structs / chunk_structs generate and compile") {
    checkCodegen(docs.select(TextExprs.seg_structs(col("text"), 6)), "segStructs")
    checkCodegen(docs.select(TextExprs.chunk_structs(col("text"), 32, 24)), "chunkStructs")
  }

  test("t_pvalue generates and compiles") {
    val df = docs.select(graft.functions.TCdf.t_pvalue(
      (col("doc_id") % 7).cast("double"), lit(10.0)))
    checkCodegen(df, "pTwoSided")
  }
}

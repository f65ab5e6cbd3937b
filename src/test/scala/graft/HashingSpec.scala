package graft

import org.apache.spark.sql.functions._
import graft.functions.Hashing
import graft.text.TextOps

/** Bit-equality of the native hash expressions against the interpreted
  * higher-order-function forms (the executable spec the DuckDB oracle
  * mirrors), on real corpus data. */
class HashingSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("poly_hash equals the HOF char fold on every document") {
    val diff = docs.select(
      Hashing.poly_hash(col("text")).as("native"),
      expr(TextOps.polyHash("text")).as("hof"),
    ).filter(col("native") =!= col("hof")).count()
    assert(diff === 0L)
  }

  test("min_gram_hash equals the HOF window-min on every document") {
    val hof = expr(
      s"""CASE WHEN length(text) >= 8 THEN
         | array_min(transform(sequence(1, length(text) - 7),
         |   i -> aggregate(split(substring(text, i, 8), ''), 0L,
         |        (acc, c) -> (acc * 31 + ascii(c)) % ${TextOps.P}L)))
         | ELSE ${TextOps.polyHash("text")} END""".stripMargin.replace("\n", ""))
    val diff = docs.select(
      Hashing.min_gram_hash(col("text"), lit(8)).as("native"),
      hof.as("hof"),
    ).filter(col("native") =!= col("hof")).count()
    assert(diff === 0L)
  }

  test("shingleHashes (native two-level) equals the HOF formulation") {
    val native = TextOps.shingleHashes(docs, 3)
    val hof = docs
      .withColumn("__th", expr(TextOps.tokenHashArrayExpr))
      .select(col("doc_id"), explode(expr(TextOps.shingleHashExpr(3))).as("h"))
      .distinct()
    assert(native.exceptAll(hof).count() === 0L)
    assert(hof.exceptAll(native).count() === 0L)
    assert(native.count() > 0L)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.{BinaryExprs, GraftFunctions}

/** block_resize semantics on edge payloads, the SQL function registry, and
  * the partitioned-sink → partition-pruned-scan round trip. */
class BinarySqlSpec extends SparkSpec {

  import spark.implicits._

  test("block_resize keeps first-keep-of-each-block incl. short tails") {
    def rs(s: String): String = new String(
      BinaryExprs.blockResize(s.getBytes("UTF-8"), 8, 4), "UTF-8")
    assert(rs("") === "")
    assert(rs("abc") === "abc") // shorter than keep: whole tail kept
    assert(rs("abcdef") === "abcd") // tail longer than keep, shorter than block
    assert(rs("abcdefgh") === "abcd") // exactly one block
    assert(rs("abcdefghijklmnop") === "abcdijkl") // two full blocks
    assert(rs("abcdefghXY") === "abcdXY") // full block + 2-byte tail
  }

  test("block_resize column expression matches the static helper") {
    val df = Seq((1L, "the quick brown fox jumps"), (2L, "ab")).toDF("id", "t")
    val got = df.select(col("id"),
      BinaryExprs.block_resize(encode(col("t"), "UTF-8"), 8, 4).cast("string").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === new String(
      BinaryExprs.blockResize("the quick brown fox jumps".getBytes, 8, 4)))
    assert(got(2L) === "ab")
  }

  test("registerAll exposes every native expression to spark.sql") {
    GraftFunctions.registerAll(spark)
    spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
      .createOrReplaceTempView("__docs")
    val r = spark.sql(
      """SELECT doc_id,
        |  poly_hash(text) AS h,
        |  simhash32(text) AS sh,
        |  min_gram_hash(text, 8) AS mg,
        |  token_stats(text, 'the', 'a').n_tokens AS nt,
        |  size(shingle_hash_set(text, 3)) AS nsh,
        |  size(min_hash_sig(shingle_hash_set(text, 3), 16)) AS sig,
        |  size(lsh_band_keys(min_hash_sig(shingle_hash_set(text, 3), 16), 4)) AS nb,
        |  intersect_size(shingle_hash_set(text, 3), shingle_hash_set(text, 3)) AS self_common,
        |  length(block_resize(encode(text, 'UTF-8'), 8, 4)) AS nr,
        |  t_pvalue(2.0D, 10.0D) AS p,
        |  gram_stats(text, 2).total AS ng2
        |FROM __docs""".stripMargin)
    val rows = r.collect()
    assert(rows.length === 50)
    // self-intersection equals the set size; signatures have the asked width
    rows.foreach { row =>
      assert(row.getLong(row.fieldIndex("self_common")) ===
        row.getInt(row.fieldIndex("nsh")).toLong)
      assert(row.getInt(row.fieldIndex("sig")) === 16)
      assert(row.getInt(row.fieldIndex("nb")) === 4)
    }
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(5)
    e.createOrReplaceTempView("__emb")
    val d = spark.sql(
      """SELECT dot_fold(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS d,
        |       sign_bucket(CAST(embedding AS ARRAY<DOUBLE>), 8) AS b
        |FROM __emb""".stripMargin).collect()
    assert(d.length === 5)
    assert(d.forall(_.getDouble(0) >= 0.0))
  }

  test("partitioned sink -> scan prunes partitions in the plan") {
    val dir = "/tmp/graft_partitioned/events_by_type"
    spark.read.parquet(s"$sf0001/events.parquet")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("event_type") === "click")
      .select("event_id", "user_id")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      plan.take(900))
    // only the click partition is read, and it round-trips exactly
    val expect = spark.read.parquet(s"$sf0001/events.parquet")
      .filter(col("event_type") === "click").count()
    assert(back.count() === expect)
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
/** A/B the bm25PerQuery TF shapes: explode+groupBy aggregate (old) vs the
  * term_counts kernel (new). */
object ProbeBm25 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val toks = split(col("text"), " ")
    val (k1, b, k) = (1.2, 0.75, 10)
    def score(tf: org.apache.spark.sql.DataFrame,
        sized: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val stats = sized.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      val qterms = docs.filter(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), explode(array_distinct(toks)).as("term"))
      val avgdl = col("sum_dl").cast("double") / col("n_docs")
      val contrib =
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
      val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id").asc)
      tf.join(broadcast(qterms), "term")
        .filter(col("doc_id") =!= col("query_id"))
        .join(broadcast(df), "term")
        .crossJoin(broadcast(stats))
        .withColumn("c_fp", round(contrib * 1e9, 0).cast("long"))
        .groupBy("query_id", "doc_id")
        .agg(round(sum(col("c_fp")).cast("double") / 1e9, 6).as("score"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
    }
    def time(label: String, mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.queryExecution.toRdd.count()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); mk.queryExecution.toRdd.count(); (System.nanoTime() - t0) / 1e9 }
      println(f"$label: min=${ts.min}%.2f  ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val sizedOld = docs.select(col("doc_id"), toks.as("tk"), size(toks).cast("long").as("dl"))
    val tfOld = sizedOld.select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val tfNew = docs.select(col("doc_id"), size(toks).cast("long").as("dl"),
        explode(graft.functions.TextExprs.term_counts(col("text"))).as("tc"))
      .select(col("doc_id"), col("dl"), col("tc.term").as("term"), col("tc.c").as("tf"))
    val sizedNew = docs.select(col("doc_id"), size(toks).cast("long").as("dl"))
    time("old-aggregate", score(tfOld, sizedOld.select("doc_id", "dl")))
    time("new-kernel   ", score(tfNew, sizedNew))
    time("new-repart   ", score(tfNew.repartition(col("doc_id")), sizedNew))
    spark.stop()
  }
}

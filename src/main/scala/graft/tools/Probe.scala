package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch main: measure WindowExec vs TopKPerKey on a synthetic top-k
  * workload (many keys, big candidate sets). Not part of the driver
  * contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // 20M rows, 2000 keys, ~10k candidates per key, k=5
    val df = spark.range(0, 20000000L).select(
      (col("id") % 2000).as("g"),
      (col("id") * 2654435761L % 1000003L).cast("double").as("score"),
      col("id").as("tid"))
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("tid").asc)
    def q = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
    def time(label: String): Unit = {
      q.count() // warm
      val t0 = System.nanoTime()
      var rows = 0L
      var i = 0
      while (i < 3) { rows = q.count(); i += 1 }
      println(f"$label%-12s ${(System.nanoTime() - t0) / 3e9}%.3f s/run  ($rows rows)")
    }
    time("window")
    graft.plans.TopKPerKey.install(spark)
    time("topk")
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** DECIMAL vs fixed-point int64 aggregation cost on the shared voxel-grid
  * ingest and the corr cross-moments — backs the SCALE.md round-14 row. */
object ProbeDecimal {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def time(label: String, mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.queryExecution.toRdd.count()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); mk.queryExecution.toRdd.count(); (System.nanoTime() - t0) / 1e9 }
      println(f"$label: min=${ts.min}%.2f")
    }
    val keys = Seq((col("l_orderkey") % 16).cast("int").as("x"),
      (col("l_partkey") % 16).cast("int").as("y"),
      (col("l_suppkey") % 16).cast("int").as("z"))
    time("grid-decimal", li.groupBy(keys: _*)
      .agg(min(((col("l_partkey") * 7 + col("l_suppkey")) % 60).cast("int")).as("label"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("value_dec")))
    time("grid-fixed  ", li.groupBy(keys: _*)
      .agg(min(((col("l_partkey") * 7 + col("l_suppkey")) % 60).cast("int")).as("label"),
        (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).cast("decimal(18,2)").as("value_dec")))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for interactive plan/schema probes via `sbt runMain`.
  * Not part of the driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      df.printSchema()
      df.show(3, false)
      df.selectExpr("timestamp_micros(ts div 1000) AS t", "ts div 1000 as us").show(3, false)
    } catch { case e: Throwable => println("EVENTS READ FAILED: " + e.toString.take(600)) }
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Does rebalancing the single-row-group documents scan pay before the
  * expensive per-row phash kernel? (Fixture files are one row group, so
  * the scan stage is ONE task — kernels in it run serially.) */
object ProbeScanPar {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val media = graft.multimodal.MultimodalOps.mediaFromDocuments(docs)
    def time(label: String, mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.queryExecution.toRdd.count()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); mk.queryExecution.toRdd.count(); (System.nanoTime() - t0) / 1e9 }
      println(f"$label: min=${ts.min}%.2f")
    }
    time("phash-1task ", graft.multimodal.PhashOps.fingerprints(media))
    time("phash-rebal ", graft.multimodal.PhashOps.fingerprints(media.repartition(32)))
    spark.stop()
  }
}

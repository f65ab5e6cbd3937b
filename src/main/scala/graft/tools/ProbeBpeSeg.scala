package graft.tools
import org.apache.spark.sql.SparkSession
/** Attribute q94's cost: merge-table training (driver loop over word
  * counts) vs the frozen-table segmentation projection. */
object ProbeBpeSeg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ms = t("train (driver)") {
      graft.text.BpeOps.mergesDriver(docs, 12).orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
    }
    t("segment (warm1)") {
      graft.text.BpeOps.segmentCountsWith(docs, ms).queryExecution.toRdd.count() }
    t("segment (warm2)") {
      graft.text.BpeOps.segmentCountsWith(docs, ms).queryExecution.toRdd.count() }
    spark.stop()
  }
}

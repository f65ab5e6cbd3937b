package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: where does a graph-kernel round's ~40-70 ms go?
  * Times (a) a bare 1-task main-session job, (b) a Loops.pin of a trivial
  * LocalRelation-derived plan, (c) a pin of a one-join round-shaped plan,
  * (d) a main-session collect of the same round plan — 50 reps each,
  * reporting ms/op. Measurement tool only. */
object ProbePin {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 100
    def time(label: String)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      for (_ <- 0 until n) body
      println(f"[pin] $label%-40s ${(System.nanoTime() - t0) / 1e6 / n}%8.2f ms/op")
    }
    val pre = spark.sparkContext.parallelize(Seq(1), 1)
    time("runJob on pre-created 1-part RDD") {
      spark.sparkContext.runJob(pre, (it: Iterator[Int]) => it.size): Unit
    }
    val base = graft.util.Loops.pin(
      spark.range(100).select(col("id").as("p"), (col("id") % 7).as("c")))
    val edges = graft.util.Loops.pin(
      spark.range(300).select((col("id") % 100).as("p"), ((col("id") * 13) % 100).as("q")))
    time("bare 1-task job (parallelize.count)") {
      spark.sparkContext.parallelize(Seq(1), 1).count(): Unit
    }
    time("pin: trivial filter over LocalRelation") {
      graft.util.Loops.pin(base.filter(col("p") >= 0)): Unit
    }
    time("pin: round-shaped join+agg plan") {
      graft.util.Loops.pin(
        edges.join(broadcast(base.selectExpr("p AS q", "c")), Seq("q"))
          .groupBy("p", "c").agg(count(lit(1)).as("kin"))): Unit
    }
    time("main-session collect of same plan") {
      edges.join(broadcast(base.selectExpr("p AS q", "c")), Seq("q"))
        .groupBy("p", "c").agg(count(lit(1)).as("kin")).collect(): Unit
    }
    spark.stop()
  }
}

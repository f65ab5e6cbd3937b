package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Partial-failure-proofing (round 9): CORRECTNESS_r08 came back `{}`
  * because this main wrote oracle_sql.json LAST after ~90 serial
  * coalesce(1) writes — a slow or killed run left the driver nothing to
  * check. Now: (a) oracle_sql.json is written FIRST, so any prefix of the
  * dump is checkable; (b) queries run on a small thread pool (Spark's
  * scheduler interleaves concurrent jobs fine in local mode) instead of
  * serially; (c) each query carries a wall budget enforced via job-group
  * cancellation, so one pathological plan cannot eat the driver's whole
  * window; (d) the coalesce(1) single-threaded write is gone — DuckDB
  * reads a multi-part parquet directory just as well via glob. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // see Bench: keep CPU-dense byte-light shuffle stages parallel
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "512k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS), which Spark otherwise
      // rejects (PARQUET_TYPE_ILLEGAL); read as epoch-nanos LongType.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopKPerKey.install(spark)
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // Per-query wall budget (seconds). 120 s is ~100× any query's sf0.01
    // steady-state time — this trips only on a hung plan, never on a slow
    // box, and guarantees forward progress through the whole suite.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_VERIFY_BUDGET", "120").toLong
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val t0 = System.nanoTime()
    // Local-iteration filter (NOT used by the driver): run only queries
    // whose name starts with one of the comma-separated prefixes.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val futures = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .map { case (name, fn) =>
      val f = scala.concurrent.Future {
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        try fn(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
        finally spark.sparkContext.clearJobGroup()
      }
      (name, f)
    }
    // A timed-out or failed query must leave NO output dir: a partial
    // parquet directory reads as a wrong answer in the driver compare,
    // where a missing dump reads (correctly) as a missing dump.
    def deleteRecursively(p: java.nio.file.Path): Unit = {
      if (Files.exists(p)) {
        val s = Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => Files.deleteIfExists(q))
        finally s.close()
      }
    }
    // Cancellation is asynchronous: the future's thread may still be
    // mid-write when Await.result times out. Deleting while the writer
    // races re-creates the dir (a partial dump then reads as a WRONG
    // answer downstream) and a file landing between Files.walk and
    // deleteIfExists throws DirectoryNotEmptyException. So: wait for the
    // future to settle (bounded grace), swallow delete errors, and retry
    // once if the dir reappears.
    def purgeOutput(name: String, f: scala.concurrent.Future[Unit]): Unit = {
      try scala.concurrent.Await.ready(
        f, scala.concurrent.duration.Duration(30, "s"))
      catch { case _: Throwable => () } // still running: delete best-effort
      val p = Paths.get(s"$outDir/$name")
      var attempts = 0
      while (attempts < 2 && Files.exists(p)) {
        attempts += 1
        try deleteRecursively(p)
        catch {
          case e: Throwable =>
            System.err.println(s"[verify] $name cleanup attempt $attempts: ${e.getMessage}")
            Thread.sleep(1000)
        }
      }
      if (Files.exists(p))
        System.err.println(s"[verify] WARNING: $name output dir survived cleanup; driver compare may see a partial dump")
    }
    futures.foreach { case (name, f) =>
      // Budget is per-query but the deadline is shared: queries run 8-wide,
      // so awaiting each in submission order still bounds total wall time.
      try scala.concurrent.Await.result(
        f, scala.concurrent.duration.Duration(budgetSec, "s"))
      catch {
        case _: java.util.concurrent.TimeoutException =>
          System.err.println(s"[verify] $name exceeded ${budgetSec}s budget; cancelling")
          // ...AndFutureJobs: a driver-loop query (e.g. BPE merge rounds)
          // submits fresh jobs into the same group after a plain cancel
          // and would keep holding its pool slot past the budget
          spark.sparkContext.cancelJobGroupAndFutureJobs(name)
          purgeOutput(name, f)
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          purgeOutput(name, f)
      }
    }
    System.err.println(f"[verify] dump completed in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    pool.shutdownNow()
    spark.stop()
  }
}

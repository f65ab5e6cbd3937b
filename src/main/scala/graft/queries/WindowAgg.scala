package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.stats.StatsOps

/** Window-frame, cube, global-zscore, and VIF queries — the generalized
  * window/aggregation surface SURVEY.md §2.4-2.5 notes as "free from Spark
  * built-ins" (ranking, running frames, grouping sets beyond rollup, the
  * whole-partition W8 frame).
  */
object WindowAgg extends QueryModule {

  /** q44: running exact-decimal sum + deterministic rank per user. */
  def windowFrames(s: SparkSession, d: String): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byValue = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id").asc)
    events(s, d)
      .filter(col("user_id") < 40)
      .select(
        col("event_id"), col("user_id"), col("value"),
        sum(col("value").cast("decimal(18,2)")).over(byTime)
          .cast("double").as("running_sum"),
        row_number().over(byValue).cast("long").as("value_rank"),
      )
      .orderBy("event_id")
  }

  private val windowFramesSql =
    """SELECT event_id, user_id, value,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
      |  CAST(ROW_NUMBER() OVER (
      |    PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS BIGINT) AS value_rank
      |FROM events
      |WHERE user_id < 40
      |ORDER BY event_id""".stripMargin

  /** q45: full cube over (returnflag, linestatus) — grouping sets beyond
    * q10's rollup. */
  def cubePricing(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"),
      )
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  private val cubePricingSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** q46: whole-table (W8 empty-window) population zscore — two-pass exact
    * moments broadcast back, never a single-partition window. */
  def zscoreGlobal(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).filter(col("o_orderkey") <= 2000)
    val m = o.agg(
      sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("__s"),
      sum(col("o_totalprice").cast("decimal(18,2)") * col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").as("__sq"),
      count(lit(1)).cast("double").as("__n"),
    )
    o.crossJoin(broadcast(m))
      .withColumn("__mean", col("__s") / col("__n"))
      .withColumn("__var", col("__sq") / col("__n") - col("__mean") * col("__mean"))
      .select(col("o_orderkey"),
        ((col("o_totalprice") - col("__mean")) / sqrt(expr("nullif(__var, 0.0D)"))).as("z"))
      .orderBy("o_orderkey")
  }

  private val zscoreGlobalSql =
    """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 2000),
      |m AS (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sq,
      |    CAST(COUNT(*) AS DOUBLE) AS n
      |  FROM o
      |), mm AS (SELECT s/n AS mean, sq/n - (s/n)*(s/n) AS var FROM m)
      |SELECT o.o_orderkey, (o.o_totalprice - mm.mean) / sqrt(nullif(mm.var, 0.0)) AS z
      |FROM o CROSS JOIN mm
      |ORDER BY o.o_orderkey""".stripMargin

  /** q47: variance inflation factors over three lineitem regressors —
    * driver-side k×k inverse (A10); no SQL oracle (matrix inverse),
    * rows-only check + spec golden. */
  def vifRegressors(s: SparkSession, d: String): DataFrame =
    StatsOps
      .vif(s, lineitem(s, d), Seq("l_quantity", "l_discount", "l_tax"))
      .withColumn("vif", round(col("vif"), 6))
      .orderBy("regressor")

  /** q55: sketch-based approximate aggregates — the 100 TB substitutes for
    * exact distinct/percentile (HyperLogLog++ and t-digest merge
    * commutatively, so results are partition-order independent). No DuckDB
    * oracle: sketch implementations differ across engines by design —
    * rows-only check plus exact-counterpart sanity bounds in the spec. */
  def approxStats(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        count_distinct(col("l_orderkey")).as("exact_orders"),
        round(expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 6).as("approx_p50"),
      )
      .orderBy("l_returnflag")

  override def queries: Seq[Q] = Seq(
    Q("q44_window_frames", windowFrames, Some(windowFramesSql)),
    Q("q45_cube_pricing", cubePricing, Some(cubePricingSql)),
    Q("q46_zscore_global", zscoreGlobal, Some(zscoreGlobalSql)),
    Q("q47_vif", vifRegressors, None),
    Q("q55_approx_stats", approxStats, None),
  )
}

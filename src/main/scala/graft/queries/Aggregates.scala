package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.stats.StatsOps

/** Aggregation-family queries (SURVEY.md §2.4): histogram, deterministic
  * mode, rollup/grouping sets, top-k, exact correlation.
  */
object Aggregates extends QueryModule {

  /** A1-A3: the reference's only cross-subject query (fmriprep_motion_hist.R)
    * re-expressed — count "error" events per user (outlier count analog),
    * then histogram the counts with binwidth 5. */
  def outlierHistogram(s: SparkSession, d: String): DataFrame = {
    val perUser = events(s, d)
      .groupBy("user_id")
      .agg(count(when(col("event_type") === "error", 1)).as("outliers"))
    StatsOps.histogram(perUser, "outliers", 5L).orderBy("bin")
  }

  private val outlierHistogramSql =
    """WITH per_user AS (
      |  SELECT user_id, COUNT(*) FILTER (WHERE event_type = 'error') AS outliers
      |  FROM events GROUP BY user_id
      |)
      |SELECT CAST(FLOOR(outliers / 5) * 5 AS BIGINT) AS bin, COUNT(*) AS n
      |FROM per_user
      |GROUP BY 1
      |ORDER BY bin""".stripMargin

  /** A8: deterministic mode of l_quantity per return flag — smallest value on
    * ties (AFNI hmode semantics, SURVEY.md §7.5.6). */
  def modeQuantity(s: SparkSession, d: String): DataFrame =
    StatsOps
      .modeDeterministic(lineitem(s, d), Seq("l_returnflag"), "l_quantity")
      .orderBy("l_returnflag")

  private val modeQuantitySql =
    """WITH counted AS (
      |  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2
      |), ranked AS (
      |  SELECT l_returnflag, l_quantity,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY cnt DESC, l_quantity ASC) AS rn
      |  FROM counted
      |)
      |SELECT l_returnflag, l_quantity AS mode_value FROM ranked WHERE rn = 1
      |ORDER BY l_returnflag""".stripMargin

  /** Rollup (grouping-sets surface, SURVEY.md §2.4 "free from Spark"). */
  def rollupPricing(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        // fixed-point int64, exact like DECIMAL — see q01's scaladoc
        (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("sum_qty"),
        count(lit(1)).as("n"),
      )
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  private val rollupPricingSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Top-k with deterministic tie-break (SURVEY.md §2.5 "sorts with limits"). */
  def topOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private val topOrdersSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  /** A7: Pearson correlation of quantity vs extended price per return flag,
    * exact decimal cross-moments (nb cell 19 corr-matrix analog). */
  def corrQtyPrice(s: SparkSession, d: String): DataFrame =
    StatsOps
      .corrExact(lineitem(s, d), Seq("l_returnflag"), "l_quantity", "l_extendedprice")
      .orderBy("l_returnflag")

  private val corrQtyPriceSql =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
      |    CAST(COUNT(*) AS DOUBLE) AS n
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag,
      |  (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr
      |FROM m
      |ORDER BY l_returnflag""".stripMargin

  /** q53: exact interpolated percentiles per group — Spark `percentile`
    * and DuckDB `quantile_cont` share the type-7 linear-interpolation
    * definition, so values match on identical sorted inputs (rounded 6
    * defensively). Exact percentiles sort per group; at scale swap in
    * `approx_percentile` (t-digest) when ±ε is acceptable. */
  def percentiles(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("qty_p50"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("qty_p90"),
        round(expr("percentile(l_extendedprice, 0.25)"), 6).as("price_p25"),
      )
      .orderBy("l_returnflag")

  private val percentilesSql =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
      |  round(quantile_cont(l_quantity, 0.9), 6) AS qty_p90,
      |  round(quantile_cont(l_extendedprice, 0.25), 6) AS price_p25
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q08_outlier_histogram", outlierHistogram, Some(outlierHistogramSql)),
    Q("q09_mode_quantity", modeQuantity, Some(modeQuantitySql)),
    Q("q10_rollup_pricing", rollupPricing, Some(rollupPricingSql)),
    Q("q11_top_orders", topOrders, Some(topOrdersSql)),
    Q("q18_corr_qty_price", corrQtyPrice, Some(corrQtyPriceSql)),
    Q("q53_percentiles", percentiles, Some(percentilesSql)),
  )
}

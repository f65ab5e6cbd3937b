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
        // fixed-point int64, exact like DECIMAL — see q01's scaladoc
        (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("sum_qty"),
        count(lit(1)).as("n"),
      )
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  private val cubePricingSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
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

  /** q62: the k×k correlation matrix itself as a checked relation (nb cell
    * 19 `dm_conv.corr()`) — the same single-pass cross-moment aggregation
    * q47 inverts, but surfaced as (var_a, var_b, corr) rows with no driver
    * collect. Oracle is generated from the same column list, so the pair
    * formulas and orderings match by construction. */
  private val corrCols = Seq("l_quantity", "l_discount", "l_tax")

  def corrMatrixQuery(s: SparkSession, d: String): DataFrame =
    StatsOps
      .corrMatrix(lineitem(s, d), corrCols)
      .withColumn("corr", round(col("corr"), 6))
      .orderBy("var_a", "var_b")

  private def corrMatrixSql: String = {
    val names = Seq("q", "d", "t")
    val k = corrCols.length
    val pairs = for { i <- 0 until k; j <- i until k } yield (i, j)
    val moments =
      (0 until k).map(i => s"CAST(SUM(${names(i)}) AS DOUBLE) AS s$i") ++
        pairs.map { case (i, j) => s"CAST(SUM(${names(i)} * ${names(j)}) AS DOUBLE) AS p${i}_$j" }
    val rows = pairs.map { case (i, j) =>
      val corr =
        if (i == j) "CAST(1.0 AS DOUBLE)"
        else s"round((n * p${i}_$j - s$i * s$j) / " +
          s"(sqrt(n * p${i}_$i - s$i * s$i) * sqrt(n * p${j}_$j - s$j * s$j)), 6)"
      s"SELECT '${corrCols(i)}' AS var_a, '${corrCols(j)}' AS var_b, $corr AS corr FROM m"
    }
    s"""WITH fp AS (
       |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS q,
       |    CAST(round(l_discount * 100) AS BIGINT) AS d,
       |    CAST(round(l_tax * 100) AS BIGINT) AS t
       |  FROM lineitem
       |), m AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${moments.mkString(",\n    ")}
       |  FROM fp
       |)
       |SELECT * FROM (
       |  ${rows.mkString("\n  UNION ALL ")}
       |) ORDER BY var_a, var_b""".stripMargin
  }

  /** q47: variance inflation factors over three lineitem regressors —
    * driver-side k×k inverse (A10). The oracle transcribes the EXACT
    * Gauss-Jordan operation sequence of LinAlg.inverse for k=3 into SQL
    * (same IEEE-754 op order on the same exact fixed-point ×100 moment
    * sums — correlations are scale-invariant so the moments are used
    * unscaled — so the diagonal matches bit-for-bit before the defensive
    * 6-decimal round).
    * Valid because no pivot swap fires: the correlation matrix has unit
    * diagonal and near-zero off-diagonals for these regressors, so partial
    * pivoting keeps the natural row order. */
  def vifRegressors(s: SparkSession, d: String): DataFrame =
    StatsOps
      .vif(s, lineitem(s, d), Seq("l_quantity", "l_discount", "l_tax"))
      .withColumn("vif", round(col("vif"), 6))
      .orderBy("regressor")

  /** Gauss-Jordan (no-pivot) 3×3 inverse diagonal, transcribed op-for-op:
    * with correlations b=r01, c=r02, d=r12 —
    * col 0 eliminates to e=1−b·b, g=(d−b·c)/e, u=(−b)/e, v=1/e;
    * col 1 to h=c−b·g, q=(1−c·c)−(d−c·b)·g and row-2 inverse entries;
    * col 2 divides and back-eliminates. vif0=(1−b·u)−h·w0, vif1=v−g·w1,
    * vif2=1/q. */
  private val vifSql =
    """WITH fp AS (
      |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS q,
      |    CAST(round(l_discount * 100) AS BIGINT) AS d,
      |    CAST(round(l_tax * 100) AS BIGINT) AS t
      |  FROM lineitem
      |), m AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(q) AS DOUBLE) AS s0,
      |    CAST(SUM(d) AS DOUBLE) AS s1,
      |    CAST(SUM(t) AS DOUBLE) AS s2,
      |    CAST(SUM(q * q) AS DOUBLE) AS p00,
      |    CAST(SUM(q * d) AS DOUBLE) AS p01,
      |    CAST(SUM(q * t) AS DOUBLE) AS p02,
      |    CAST(SUM(d * d) AS DOUBLE) AS p11,
      |    CAST(SUM(d * t) AS DOUBLE) AS p12,
      |    CAST(SUM(t * t) AS DOUBLE) AS p22
      |  FROM fp
      |), r AS (
      |  SELECT
      |    (n * p01 - s0 * s1) / (sqrt(n * p00 - s0 * s0) * sqrt(n * p11 - s1 * s1)) AS b,
      |    (n * p02 - s0 * s2) / (sqrt(n * p00 - s0 * s0) * sqrt(n * p22 - s2 * s2)) AS c,
      |    (n * p12 - s1 * s2) / (sqrt(n * p11 - s1 * s1) * sqrt(n * p22 - s2 * s2)) AS d
      |  FROM m
      |), g1 AS (
      |  SELECT b, c, d, 1 - b * b AS e, d - b * c AS m1, d - c * b AS m2,
      |    1 - c * c AS a22
      |  FROM r
      |), g2 AS (
      |  SELECT *, m1 / e AS g, (0 - b) / e AS u, 1 / e AS v FROM g1
      |), g3 AS (
      |  SELECT *, c - b * g AS h, a22 - m2 * g AS q,
      |    (0 - c) - m2 * u AS i20, 0 - m2 * v AS i21
      |  FROM g2
      |), g4 AS (
      |  SELECT *, i20 / q AS w0, i21 / q AS w1, 1 / q AS w2 FROM g3
      |)
      |SELECT regressor, vif FROM (
      |  SELECT 'l_quantity' AS regressor, round((1 - b * u) - h * w0, 6) AS vif FROM g4
      |  UNION ALL SELECT 'l_discount', round(v - g * w1, 6) FROM g4
      |  UNION ALL SELECT 'l_tax', round(w2, 6) FROM g4
      |) ORDER BY regressor""".stripMargin

  /** q55: sketch-based approximate aggregates — the 100 TB substitutes for
    * exact distinct/percentile (HyperLogLog++ and t-digest merge
    * commutatively, so results are partition-order independent). No DuckDB
    * oracle: sketch implementations differ across engines by design —
    * rows-only check plus exact-counterpart sanity bounds in the spec.
    *
    * The exact count(DISTINCT) runs as its OWN aggregation joined back on
    * the 3-row group key: mixing a distinct aggregate with the sketch
    * aggregates makes Spark's distinct rewrite carry the OTHER buffers
    * through the first-stage (group, orderkey) aggregate — a 10 000-entry
    * QuantileSummaries per DISTINCT ORDER KEY (measured: 19.8 s combined
    * vs ≤ 3.3 s for any pair at sf0.1; two scans + a 3-row join costs
    * ~2 s). At 100 TB the combined form is a per-distinct-value buffer
    * explosion, not a constant factor. */
  def approxStats(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val sketches = li
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        round(expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 6).as("approx_p50"))
    val exact = li
      .groupBy("l_returnflag")
      .agg(count_distinct(col("l_orderkey")).as("exact_orders"))
    sketches
      .join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("approx_orders"), col("exact_orders"),
        col("approx_p50"))
      .orderBy("l_returnflag")
  }

  override def queries: Seq[Q] = Seq(
    Q("q44_window_frames", windowFrames, Some(windowFramesSql)),
    Q("q45_cube_pricing", cubePricing, Some(cubePricingSql)),
    Q("q46_zscore_global", zscoreGlobal, Some(zscoreGlobalSql)),
    Q("q47_vif", vifRegressors, Some(vifSql)),
    Q("q62_corr_matrix", corrMatrixQuery, Some(corrMatrixSql)),
    Q("q55_approx_stats", approxStats, None),
  )
}

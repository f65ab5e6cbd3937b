package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Relational core: scans, projections, filters, equi/semi/anti joins,
  * exact-decimal aggregations (SURVEY.md §2.1-2.4 analogs on the driver
  * testdata; cf. ssm_loop.py:73,77 projections, fmriprep_motion_hist.R:33-38
  * aggregation shapes).
  */
object Relational extends QueryModule {

  /** TPC-H Q1-shaped pricing summary (per-group aggregation, SURVEY
    * A1-A3). The sums run in FIXED-POINT int64, not DECIMAL(18,2): both are exact
    * for 2-decimal inputs (bit-identical results, RelationalSpec pins it),
    * but long sums stay in primitive codegen while Decimal sums box —
    * measured 0.83 → 0.34 s at sf0.1 on the single-row-group scan. The
    * disc-price product is 1e-4-unit fixed point: p100·(100−d100) ≤ 1e9
    * per row, far under int64 overflow at any per-group cardinality the
    * 18-digit DECIMAL could have held either. */
  def pricingSummary(s: SparkSession, d: String): DataFrame = {
    val q100 = round(col("l_quantity") * 100).cast("long")
    val p100 = round(col("l_extendedprice") * 100).cast("long")
    val d100 = round(col("l_discount") * 100).cast("long")
    lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(q100) / 100.0).as("sum_qty"),
        (sum(p100) / 100.0).as("sum_base_price"),
        (sum(p100 * (lit(100L) - d100)) / 10000.0).as("sum_disc_price"),
        count(lit(1)).as("count_order"),
      )
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val pricingSummarySql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + predicate: pushed to the parquet scan (P1/P5 analogs). */
  def filterProject(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 100000.0)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")

  private val filterProjectSql =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
      |ORDER BY o_orderkey""".stripMargin

  /** Multi-way equi join + agg: revenue per nation (J5 generalization).
    * nation/customer are the small sides — broadcast them explicitly. */
  def joinRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        // fixed-point 1e-4 units, exact like DECIMAL — see pricingSummary
        (sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))) / 10000.0)
          .as("revenue"),
        count(lit(1)).as("n_items"),
      )
      .orderBy("n_name")

  private val joinRevenueSql =
    """SELECT n_name,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Left-semi join (the reference's mask semi-join shape, SURVEY P9). */
  def semiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(
        orders(s, d).filter(col("o_totalprice") > 200000.0),
        col("c_custkey") === col("o_custkey"),
        "left_semi",
      )
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  private val semiJoinSql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join (SURVEY §2.3 "missing from the reference" surface). */
  def antiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(
        orders(s, d).filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"),
        "left_anti",
      )
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  private val antiJoinSql =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Full outer join (SURVEY §2.3 "missing from the reference" surface):
    * per-nation supplier vs customer presence, nulls where one side is
    * absent. */
  def fullOuter(s: SparkSession, d: String): DataFrame = {
    val sup = supplier(s, d).filter(col("s_acctbal") > 9000.0)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_rich_suppliers"))
    val cust = customer(s, d).filter(col("c_acctbal") > 9900.0)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_rich_customers"))
    sup.join(cust, Seq("nationkey"), "full_outer")
      .orderBy("nationkey")
  }

  private val fullOuterSql =
    """WITH sup AS (
      |  SELECT s_nationkey AS nationkey, COUNT(*) AS n_rich_suppliers
      |  FROM supplier WHERE s_acctbal > 9000.0 GROUP BY 1
      |), cust AS (
      |  SELECT c_nationkey AS nationkey, COUNT(*) AS n_rich_customers
      |  FROM customer WHERE c_acctbal > 9900.0 GROUP BY 1
      |)
      |SELECT COALESCE(sup.nationkey, cust.nationkey) AS nationkey,
      |       sup.n_rich_suppliers, cust.n_rich_customers
      |FROM sup FULL OUTER JOIN cust ON sup.nationkey = cust.nationkey
      |ORDER BY nationkey""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q01_pricing_summary", pricingSummary, Some(pricingSummarySql)),
    Q("q02_filter_project", filterProject, Some(filterProjectSql)),
    Q("q03_join_revenue", joinRevenue, Some(joinRevenueSql)),
    Q("q04_semi_join", semiJoin, Some(semiJoinSql)),
    Q("q05_anti_join", antiJoin, Some(antiJoinSql)),
    Q("q50_full_outer", fullOuter, Some(fullOuterSql)),
  )
}

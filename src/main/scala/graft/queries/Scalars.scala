package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.catalog.RulesOps

/** Set operations, scalar string/JSON functions, and the glob-rules join
  * (SURVEY.md §2.2 P6, §2.8 F1-F9, §2.1 S5/S6).
  */
object Scalars extends QueryModule {

  /** Set ops: symmetric difference of two customer key sets —
    * (BUILDING ∖ rich) ∪ (rich ∖ BUILDING), exercising except + union. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d)
    val building = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val rich = cust.filter(col("c_acctbal") > 5000.0).select("c_custkey")
    building.except(rich).union(rich.except(building)).orderBy("c_custkey")
  }

  private val setOpsSql =
    """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |     rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
      |(SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM rich)
      |UNION
      |(SELECT c_custkey FROM rich EXCEPT SELECT c_custkey FROM building)
      |ORDER BY c_custkey""".stripMargin

  /** String functions over part (F1 substring, F2 concat, F3 suffix strip,
    * F4 digit strip, F6 prefix test). */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(
        col("p_partkey"),
        substring(col("p_name"), 1, 5).as("name_head"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_brand"), "[^0-9]", "").as("brand_digits"),
        expr("substring(p_type, 1, length(p_type) - 3)").as("type_stripped"),
        length(col("p_name")).cast("long").as("name_len"),
        when(col("p_type").startsWith("STAND"), 1L).otherwise(0L).as("is_standard"),
      )
      .orderBy("p_partkey")

  private val stringFuncsSql =
    """SELECT p_partkey,
      |  substring(p_name, 1, 5) AS name_head,
      |  concat_ws('/', p_brand, p_type) AS brand_type,
      |  regexp_replace(p_brand, '[^0-9]', '', 'g') AS brand_digits,
      |  substring(p_type, 1, length(p_type) - 3) AS type_stripped,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  CASE WHEN p_type LIKE 'STAND%' THEN 1 ELSE 0 END AS is_standard
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** JSON sidecar read (S5/F9): extract props.k per event, plus the grouped
    * exact sum per event_type — the `jq .TaskName` update analog reads the
    * sidecar, this reads + aggregates it. */
  def jsonSidecar(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  private val jsonSidecarSql =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** S6/J4: glob-rules routing join against part types — the four glob
    * shapes from config.json (contains/prefix/suffix/exact). */
  def globRules(s: SparkSession, d: String): DataFrame = {
    val rules = RulesOps.rulesTable(
      s,
      Seq(
        "has_an" -> "*AN*",      // contains, like *task* (config.json:16)
        "standard" -> "STAND*",  // prefix
        "large" -> "*GE",        // suffix, like *64dir (config.json:32)
        "promo" -> "PROMO",      // exact  (config.json:7)
      ),
    )
    RulesOps
      .applyRules(part(s, d), rules, "p_type")
      .groupBy("label")
      .agg(count(lit(1)).as("n_parts"), min("p_partkey").as("first_part"))
      .orderBy("label")
  }

  private val globRulesSql =
    """WITH rules(label, pattern) AS (
      |  VALUES ('has_an', '%AN%'), ('standard', 'STAND%'), ('large', '%GE'), ('promo', 'PROMO')
      |)
      |SELECT label, COUNT(*) AS n_parts, MIN(p_partkey) AS first_part
      |FROM part JOIN rules ON p_type LIKE pattern
      |GROUP BY label
      |ORDER BY label""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q12_set_ops", setOps, Some(setOpsSql)),
    Q("q13_string_funcs", stringFuncs, Some(stringFuncsSql)),
    Q("q14_json_sidecar", jsonSidecar, Some(jsonSidecarSql)),
    Q("q15_glob_rules", globRules, Some(globRulesSql)),
  )
}

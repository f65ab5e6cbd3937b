package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the §2 operator inventory, one named entry per operator;
  * `oracleSql` gives the DuckDB-equivalent SQL for each (omitted only for
  * ops whose semantics DuckDB cannot express — those get rows-only checks).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    Relational,
    TimeSeries,
    Aggregates,
    Scalars,
    TextDedup,
    Similarity,
    Glm,
    DesignImage,
    Multimodal,
    WindowAgg,
    Flagship,
    Training,
    Retrieval,
    Curation,
  )

  private lazy val all: Seq[Q] = modules.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The E1 pipeline (SURVEY.md §3): boxcar → HRF → DCT/poly → mass GLM. */
  def entry(spark: SparkSession): DataFrame = {
    // an external driver session may carry a non-UTC timezone; every ts
    // normalization in Tables.events assumes UTC wall-clock semantics
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    graft.plans.TopKPerKey.install(spark)
    Flagship.singleSubjectModel(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BIDS-layout file catalog (SURVEY.md §1.1, S3/S4): the reference's
  * "query language" is `BIDSLayout(...).get(subject=, task=, suffix=,
  * extension=, scope=, space=)` over a directory tree whose paths encode
  * entities (ssm_loop.py:34,40-41,60,72). Here the catalog is a DataFrame
  * of paths; entities are extracted with regexp projections (computed
  * once at ingest and ideally persisted partitioned by (subject, task) so
  * entity queries become partition pruning at scale), and entity queries
  * are plain filter chains — Catalyst pushes them into the scan.
  */
object BidsCatalog {

  /** Extract BIDS entities from a `path` column. Nullable where absent:
    * subject (sub-XXX), session (ses-X), task, run, space, suffix (last
    * `_`-token before extension), extension (first dot onward of basename),
    * scope (derivatives vs raw). */
  def fromPaths(paths: DataFrame, pathCol: String = "path"): DataFrame = {
    val p = col(pathCol)
    def ent(regex: String) = {
      val e = regexp_extract(p, regex, 1)
      when(e =!= "", e)
    }
    paths
      .withColumn("subject", ent("sub-([a-zA-Z0-9]+)"))
      .withColumn("session", ent("ses-([a-zA-Z0-9]+)"))
      .withColumn("task", ent("task-([a-zA-Z0-9]+)"))
      .withColumn("run", ent("run-([0-9]+)").cast("int"))
      .withColumn("space", ent("space-([a-zA-Z0-9]+)"))
      .withColumn("suffix", ent("_([a-zA-Z0-9]+)\\.[a-zA-Z0-9.]+$"))
      .withColumn("extension", ent("[^/]*?(\\.[a-zA-Z0-9.]+)$"))
      .withColumn("scope",
        when(p.contains("/derivatives/"), "derivatives").otherwise("raw"))
  }

  /** Entity query (BIDSLayout.get analog): AND of equality filters over
    * entity columns; None = unconstrained. Returns matching catalog rows
    * ordered by path (the reference's `[i]` picks become orderBy+limit).
    */
  def query(catalog: DataFrame, entities: Map[String, Any]): DataFrame =
    entities
      .foldLeft(catalog) { case (acc, (k, v)) =>
        acc.filter(col(k) === lit(v))
      }
      .orderBy("path")

  /** Regex-filtered variant (BIDSLayout regex queries). */
  def queryRegex(catalog: DataFrame, entity: String, regex: String): DataFrame =
    catalog.filter(col(entity).rlike(regex)).orderBy("path")
}

package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative criteria routing (SURVEY.md S6/J4): the reference's
  * config.json maps scans to labels by glob matches on metadata fields
  * (`*task*` config.json:16, `*64dir` :32, `*TRACEW` :40, plus exact
  * matches). Here: a rules table joined to a catalog with LIKE predicates.
  */
object RulesOps {

  /** dcm2bids-style glob → SQL LIKE: `*` → `%`, `?` → `_`; literal `%`/`_`
    * in the pattern are escaped so they match themselves. */
  def globToLike(glob: String): String =
    glob.flatMap {
      case '*'  => "%"
      case '?'  => "_"
      case '%'  => "\\%"
      case '_'  => "\\_"
      case '\\' => "\\\\"
      case c    => c.toString
    }

  /** Rules table from (label, glob) pairs, globs pre-translated to LIKE. */
  def rulesTable(spark: SparkSession, rules: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    rules.map { case (label, glob) => (label, globToLike(glob)) }.toDF("label", "pattern")
  }

  /** Non-equi join of a catalog to the rules: every (row, rule) pair where
    * `fieldCol LIKE pattern`. Rules are few → broadcast, so this is a
    * broadcast nested-loop whose cost is |catalog| × |rules| predicate
    * evaluations — no shuffle of the catalog. */
  def applyRules(catalog: DataFrame, rules: DataFrame, fieldCol: String): DataFrame =
    catalog.join(broadcast(rules), expr(s"$fieldCol LIKE pattern"))
}

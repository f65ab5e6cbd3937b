package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-contract query: a Spark plan plus (optionally) the equivalent
  * ANSI SQL the driver runs in DuckDB over the same parquet tables.
  *
  * Oracle-determinism rules used throughout (SURVEY.md §5.1, §7.5.2):
  *   - Aggregations over many doubles go through exact DECIMAL sums
  *     (bit-identical across engines), then a final CAST(.. AS DOUBLE).
  *   - Double math (cos/exp/sqrt) is confined to small, bounded-cardinality
  *     computations and rounded to >=6 decimals before hashing.
  *   - Every numeric output column is DOUBLE or BIGINT in both engines so
  *     the schema compare can't trip on decimal precision rules.
  *   - Every query ends in a total ORDER BY (unique key) on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

trait QueryModule {
  def queries: Seq[Q]
}

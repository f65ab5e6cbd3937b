package graft.timeseries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over explicit ordering columns (SURVEY.md §2.5).
  * The reference's implicit pandas RangeIndex becomes an explicit column in
  * every signature — Spark rows are unordered (SURVEY.md §7.5.1).
  */
object TimeOps {

  /** Lagged difference (ssm_loop.py:48 `z_mc.diff()`), leading null filled
    * with 0 (ssm_loop.py:49 `fillna(0)`). One shuffle by `partCols`, then a
    * sort-based window — the canonical Spark form of pandas `diff`.
    */
  def lagDiff(
      df: DataFrame,
      valueCol: String,
      partCols: Seq[String],
      orderCols: Seq[String],
      out: String = "diff",
  ): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols.map(col): _*)
    df.withColumn(out, coalesce(col(valueCol) - lag(valueCol, 1).over(w), lit(0.0)))
  }

  /** As-of join: for each left row, the most recent right row (by `tsCol`)
    * with right.ts <= left.ts within the same key.
    *
    * Distributed single-shuffle formulation: union both sides tagged, one
    * window per key ordered by (ts, tag) — right rows sort before left rows
    * at equal ts so ties are inclusive — then `last(..., ignoreNulls)` carries
    * the right payload forward. No per-row subquery, no skewed nested-loop
    * join; cost is one shuffle + sort on the union, which survives 100×
    * scale-up (SURVEY.md §2.3 "as-of joins" gap).
    *
    * Left/right must share the key column names; payload columns are carried
    * from the right side with an `asof_` prefix.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
  ): DataFrame = {
    val leftCols = left.columns
    val tagged =
      right
        .select((keyCols :+ tsCol).map(col) ++ payloadCols.map(c => col(c).as(s"asof_$c")): _*)
        .withColumn("__tag", lit(0))
        .unionByName(left.withColumn("__tag", lit(1)), allowMissingColumns = true)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(tagged) { (d, c) =>
      d.withColumn(s"asof_$c", last(s"asof_$c", ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1)
      .select((leftCols.map(col) ++ payloadCols.map(c => col(s"asof_$c"))).toSeq: _*)
  }

  /** Tumbling-window bucketing of an epoch-nanos long column: adds `bucket`
    * = floor(tsNanos / widthNanos). Pure projection — no shuffle. */
  def tumbling(df: DataFrame, tsNanosCol: String, widthNanos: Long): DataFrame =
    df.withColumn("bucket", expr(s"$tsNanosCol div ${widthNanos}L"))
}

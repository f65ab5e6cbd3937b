package graft.design

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Design-matrix construction operators (SURVEY.md §2.5, E1 lifecycle).
  * The reference builds a (time × regressor) Design_Matrix from trial events
  * (nltools `onsets_to_dm`, ssm_loop.py:43); here the timeline is an explicit
  * generated table and the boxcar is a range join.
  */
object DesignOps {

  /** TR-sampled timeline: one row per sample index 0..n-1, plus the sample
    * time in seconds. Generated with explode(sequence) on a 1-row relation —
    * single partition, trivially broadcastable (SURVEY.md §4 "timeline
    * generation").
    */
  def timeline(spark: SparkSession, n: Int, trSeconds: Double): DataFrame =
    spark
      .range(1)
      .select(explode(sequence(lit(0L), lit(n - 1L))).as("t"))
      .withColumn("sec", col("t") * trSeconds)

  /** Boxcar expansion (nltools onsets_to_dm semantics, ssm_loop.py:43):
    * indicator(t, c) = 1 iff some trial of condition c satisfies
    * onset <= t*TR < onset + duration. `events` must have columns
    * (onset: double seconds, duration: double seconds, trial_type: string).
    *
    * Implemented as a conditional aggregation over timeline × trials: the
    * timeline is tiny (hundreds of rows) and broadcast, so the "cross join"
    * is a broadcast nested loop whose output is immediately aggregated —
    * no shuffle of the trials table beyond the final groupBy(t).
    * `conditions` is passed explicitly so the output schema is static
    * (Spark `.pivot` without values would scan the data twice to infer it).
    */
  def boxcar(tl: DataFrame, trials: DataFrame, conditions: Seq[String]): DataFrame = {
    val covered = col("onset") <= col("sec") && col("sec") < col("onset") + col("duration")
    val indicators = conditions.map { c =>
      max(when(covered && col("trial_type") === c, 1L).otherwise(0L)).as(c)
    }
    broadcast(tl)
      .crossJoin(trials)
      .groupBy("t")
      .agg(indicators.head, indicators.tail: _*)
  }
}

package graft.tabular

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TSV readers with the reference's exact semantics (SURVEY.md §2.1 S1/S2)
  * and the motion-covariate expansion pipeline (§2.5 W1-W3, the
  * 6→24-parameter pattern of ssm_loop.py:46-50).
  */
object TsvOps {

  /** S1: tab-separated scan with header + schema inference
    * (pd.read_csv(sep='\t'), ssm_loop.py:41). */
  def readTsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  /** S2: same with the fMRIprep null token (na.strings='n/a',
    * fmriprep_motion_hist.R:29). */
  def readTsvNa(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("inferSchema", "true")
      .option("nullValue", "n/a")
      .csv(path)

  /** P2: dynamic column discovery by prefix — the motion_outlierNN set
    * varies per subject (ssm_loop.py:77; SURVEY.md §7.5.5). */
  def columnsByPrefix(df: DataFrame, prefix: String): Seq[String] =
    df.columns.filter(_.startsWith(prefix)).toSeq

  /** The 24-parameter motion-covariate expansion (ssm_loop.py:46-50):
    * per input column c (z-scored externally or raw): c, c², Δc, (Δc)²,
    * with the leading Δ null filled with 0. Requires an explicit ordering
    * column `t` (SURVEY.md §7.5.1 — no implicit row order in Spark).
    *
    * `partitionCols` names the unit of locality (subject/run — SURVEY
    * §2.5): the lag windows partition by it, so every stream's expansion
    * is independent and the plan never moves all data to one partition.
    * Empty means the caller REALLY has one global stream (a lone design
    * matrix); prefer passing the run key even when there is only one —
    * same result (spec-pinned), no single-partition WindowExec. */
  def motionCovariates(df: DataFrame, cols: Seq[String], tCol: String,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val w =
      (if (partitionCols.isEmpty) Window.partitionBy()
       else Window.partitionBy(partitionCols.map(col): _*))
        .orderBy(col(tCol))
    val expanded = cols.foldLeft(df) { (acc, c) =>
      acc
        .withColumn(s"${c}_sq", col(c) * col(c))
        .withColumn(s"${c}_d", col(c) - lag(col(c), 1).over(w))
        .withColumn(s"${c}_d_sq", (col(c) - lag(col(c), 1).over(w)) *
          (col(c) - lag(col(c), 1).over(w)))
    }
    val dCols = cols.flatMap(c => Seq(s"${c}_d", s"${c}_d_sq"))
    expanded.na.fill(0.0, dCols)
  }

  /** Partitioned variant: per-subject windows (the engine's generalization
    * of the reference's one-process-per-subject isolation, O2). */
  def motionCovariatesBySubject(df: DataFrame, cols: Seq[String],
      subjectCol: String, tCol: String): DataFrame =
    motionCovariates(df, cols, tCol, Seq(subjectCol))
}

package graft.glm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Linear-model operators — the reference's analytical core (SURVEY.md §2.6:
  * mass-univariate OLS `regress()`, ssm_loop.py:90-97).
  *
  * Two formulations:
  *  - `simpleOLS`: per-group y ~ 1 + x from exact DECIMAL moments; fully
  *    SQL-expressible, oracle-checked.
  *  - `massGLM`: per-group multi-regressor OLS against a SHARED design
  *    matrix X — the ssm_loop shape (one X, millions of voxels). The k×n
  *    pinv = (XᵀX)⁻¹Xᵀ is computed on the driver (LinAlg), scaled to
  *    integers (×1e9, round) and broadcast as a long-form literal table;
  *    betas are then one join + exact-DECIMAL groupBy sum — shuffle bounded
  *    by |groups|·k output rows, never materializing per-group dense
  *    vectors. The integer scaling makes the sum exact, so results are
  *    bit-identical across engines AND across Spark partition orders.
  *
  * Scale notes (100 TB): both forms are a single scan + one hash aggregate
  * keyed by group; the broadcast side is k×n ≤ a few thousand rows. At
  * 1.3M voxels × 296 TRs (the reference per-subject matrix) the beta
  * shuffle is 1.3M×k rows of 16 bytes — trivially within executor memory.
  */
object GlmOps {

  val Scale = 1000000000L // pinv fixed-point scale (1e9)

  /** Per-group simple linear regression y ~ 1 + x with exact-decimal moments.
    * Output: group cols + n, beta0, beta1, t1 (slope t-stat, df = n-2).
    * Formula order mirrors the oracle SQL exactly — all doubles derive from
    * the same exact integers/decimals.
    */
  def simpleOLS(df: DataFrame, groupCols: Seq[String], yCol: String, xCol: String): DataFrame = {
    val dec = "decimal(18,2)"
    val x = col(xCol).cast(dec)
    val y = col(yCol).cast(dec)
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast("double").as("__n"),
        sum(x).cast("double").as("__sx"),
        sum(y).cast("double").as("__sy"),
        sum(x * x).cast("double").as("__sxx"),
        sum(y * y).cast("double").as("__syy"),
        sum(x * y).cast("double").as("__sxy"),
      )
      // nullif: constant-x groups yield NULL coefficients, not ANSI errors
      .withColumn("beta1",
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          expr("nullif(__n * __sxx - __sx * __sx, 0.0D)"))
      .withColumn("beta0", (col("__sy") - col("beta1") * col("__sx")) / col("__n"))
      .withColumn("__sse",
        col("__syy") - col("beta0") * col("__sy") - col("beta1") * col("__sxy"))
      .withColumn("__se1",
        sqrt((col("__sse") / (col("__n") - 2)) * col("__n") /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx"))))
      // guard: perfectly-fit groups have se=0 (ANSI div-by-zero) → NULL t
      .withColumn("t1", when(col("__se1") > 0, col("beta1") / col("__se1")))
      .select(groupCols.map(col) ++ Seq(
        col("__n").cast("long").as("n"), col("beta0"), col("beta1"), col("t1")): _*)
  }

  /** simpleOLS plus two-sided p-value for the slope (Student-t, df = n-2) —
    * the M3 operator; p computed by the TDist UDF (no SQL-oracle form). */
  def simpleOLSWithP(df: DataFrame, groupCols: Seq[String], yCol: String, xCol: String): DataFrame =
    simpleOLS(df, groupCols, yCol, xCol)
      .withColumn("p1",
        graft.functions.TCdf.t_pvalue(col("t1"), col("n").cast("double") - 2))

  /** Per-row residuals of the per-group fit: y − (β0 + β1·x). Coefficients
    * join back via broadcast (|groups| rows). */
  def residuals(df: DataFrame, groupCols: Seq[String], yCol: String, xCol: String): DataFrame = {
    val coef = simpleOLS(df, groupCols, yCol, xCol)
      .select(groupCols.map(col) :+ col("beta0") :+ col("beta1"): _*)
    df.join(broadcast(coef), groupCols)
      .withColumn("resid", col(yCol) - (col("beta0") + col("beta1") * col(xCol)))
  }

  /** The long-form scaled pinv relation: rows (t, j, w) with
    * w = round(pinv(j)(t) · Scale). */
  def pinvTable(spark: SparkSession, x: LinAlg.Mat): DataFrame = {
    val p = LinAlg.pinv(x) // k × n
    val rows = for {
      j <- p.indices
      t <- p(j).indices
    } yield (t.toLong, j.toLong, math.rint(p(j)(t) * Scale).toLong)
    import spark.implicits._
    rows.toDF("t", "j", "w")
  }

  /** Mass-univariate OLS betas: `series` is the long relation
    * (group, t, y_dec) with y_dec exact DECIMAL; X is the shared n×k design.
    * β(g, j) = (Σ_t w(j,t)·y(g,t)) / Scale via broadcast join + exact sum.
    * Rows with t outside [0, n) are ignored; missing t contribute zero —
    * matching a zero-filled dense series.
    */
  def massBetas(spark: SparkSession, series: DataFrame, x: LinAlg.Mat,
      groupCol: String): DataFrame =
    series
      .join(broadcast(pinvTable(spark, x)), "t")
      .groupBy(col(groupCol), col("j"))
      .agg(sum(col("w") * col("y_dec")).as("__s"))
      .withColumn("beta", col("__s").cast("double") / Scale.toDouble)
      .select(col(groupCol), col("j"), col("beta"))

  /** Full mass-GLM bundle (M1/M2/M3 outputs, ssm_loop.py:91-97): betas,
    * per-group sigma, and per-regressor t and two-sided p. The residual
    * pass joins betas back through the broadcast design matrix.
    * Not oracle-checked (p needs the t CDF); golden-tested vs closed form.
    */
  def massGLM(spark: SparkSession, series: DataFrame, x: LinAlg.Mat,
      groupCol: String): DataFrame = {
    val n = x.length
    val k = x(0).length
    val df = (n - k).toDouble
    val betas = massBetas(spark, series, x, groupCol)

    // X in long form for the fitted-value join
    val xLong = {
      import spark.implicits._
      (for { t <- 0 until n; j <- 0 until k } yield (t.toLong, j.toLong, x(t)(j)))
        .toDF("t", "j", "xv")
    }
    // fitted(g, t) = Σ_j X(t,j)·β(g,j)
    val fitted = betas
      .join(broadcast(xLong), "j")
      .groupBy(col(groupCol), col("t"))
      .agg(sum(col("xv") * col("beta")).as("fit"))
    // SSE over the dense series: zero-filled t's contribute fit² — join
    // full timeline so missing observations count as y = 0.
    val timeline = spark.range(n).select(col("id").as("t"))
    val dense = timeline
      .crossJoin(series.select(col(groupCol)).distinct())
      .join(series.select(col(groupCol), col("t"), col("y_dec")), Seq(groupCol.toString, "t"), "left")
    val sse = dense
      .join(fitted, Seq(groupCol.toString, "t"), "left")
      // explicit zero-fill (na.fill semantics vary across column types)
      .withColumn("r", coalesce(col("y_dec").cast("double"), lit(0.0)) -
        coalesce(col("fit"), lit(0.0)))
      .groupBy(col(groupCol))
      .agg(sum(col("r") * col("r")).as("sse"))
      .withColumn("sigma", sqrt(col("sse") / df))

    val diag = LinAlg.xtxInvDiag(x)
    val diagDf = {
      import spark.implicits._
      diag.zipWithIndex.map { case (v, j) => (j.toLong, v) }.toSeq.toDF("j", "cjj")
    }
    betas
      .join(broadcast(sse.select(col(groupCol), col("sigma"))), groupCol)
      .join(broadcast(diagDf), "j")
      .withColumn("t_stat", col("beta") / (col("sigma") * sqrt(col("cjj"))))
      .withColumn("p", graft.functions.TCdf.t_pvalue(col("t_stat"), lit(df)))
      .withColumn("df", lit(df))
      .select(col(groupCol), col("j"), col("beta"), col("sigma"), col("t_stat"), col("p"), col("df"))
  }
}

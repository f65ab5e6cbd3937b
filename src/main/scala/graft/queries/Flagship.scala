package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.design.DesignOps
import graft.glm.GlmOps

/** The flagship E1 pipeline (SURVEY.md §3, ssm_loop.py end-to-end): trial
  * events → boxcar design → HRF convolution → DCT/poly nuisance columns →
  * mass-univariate GLM over every group's time series → per-regressor
  * beta/sigma/t/p table.
  *
  * The reference runs this once per subject-process over a 296×1.3M voxel
  * matrix; here "voxels" are event-user groups and the design covers the
  * first week of the events month at 300-second TR. The ONLY driver-side
  * compute is collecting the 2016x6 design matrix to form its pinv — the
  * same barrier ssm_loop has (`regress()` precomputes from X), and
  * constant-sized regardless of data scale. Everything else is one lazy
  * DataFrame DAG: the per-group betas are a broadcast join + exact
  * fixed-point aggregation (see GlmOps.massBetas).
  */
object Flagship extends QueryModule {

  private val N = 2016 // one week, 300-second TR
  private val baseUs = 1704067200000000L

  private def designFrame(s: SparkSession, d: String): DataFrame = {
    val trials = events(s, d).select(
      ((expr("ts div 1000") - baseUs) / 1000000.0).as("onset"),
      col("value").as("duration"),
      col("event_type").as("trial_type"),
    )
    val tl = DesignOps.timeline(s, N, 300.0)
    val box = DesignOps.boxcar(tl, trials, Seq("click", "purchase"), 300.0, N.toLong)
    val conv = DesignOps.convolve(box, s, DesignOps.hrfKernelInts(1.0, 24),
      Seq("click", "purchase"), N)
    DesignOps.dctBasis(DesignOps.polyTrend(tl.select("t"), N, 0), N, 3)
      .join(conv, "t")
  }

  val regressors: Seq[String] =
    Seq("conv_click", "conv_purchase", "dct1", "dct2", "dct3", "poly0")

  /** Full pipeline: returns (g, regressor, beta, sigma, t_stat, p, df). */
  def singleSubjectModel(s: SparkSession, d: String): DataFrame = {
    // design-matrix barrier: 168×6 doubles to the driver, like ssm_loop's
    // in-process X before regress() — scale-independent
    val xRows = designFrame(s, d)
      .select(col("t") +: regressors.map(col): _*)
      .orderBy("t")
      .collect()
    require(xRows.length == N, s"design matrix has ${xRows.length} rows, want $N")
    val x: Array[Array[Double]] = xRows.map { r =>
      regressors.indices.map(i => r.getDouble(i + 1)).toArray
    }
    val series = events(s, d)
      .select(
        (col("user_id") % 10).as("g"),
        expr(s"(ts div 1000 - $baseUs) div 300000000").as("t"),
        col("value").cast("decimal(18,2)").as("y_dec"),
      )
      .filter(col("t") >= 0 && col("t") < N)
      .groupBy("g", "t").agg(sum("y_dec").as("y_dec"))
    val names = {
      import s.implicits._
      regressors.zipWithIndex.map { case (nm, j) => (j.toLong, nm) }.toDF("j", "regressor")
    }
    GlmOps.massGLM(s, series, x, "g")
      .join(broadcast(names), "j")
      .select(col("g"), col("regressor"),
        round(col("beta"), 6).as("beta"), round(col("sigma"), 6).as("sigma"),
        round(col("t_stat"), 6).as("t_stat"), round(col("p"), 6).as("p"), col("df"))
      .orderBy("g", "regressor")
  }

  override def queries: Seq[Q] = Seq(
    // no DuckDB oracle: X is data-dependent and p needs the t CDF —
    // rows-only check here; numerics are golden-tested in GlmSpec/FlagshipSpec
    Q("q48_flagship_glm", singleSubjectModel, None),
  )
}

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
  def boxcar(tl: DataFrame, trials: DataFrame, conditions: Seq[String],
      trSeconds: Double, n: Long): DataFrame = {
    val indicators = conditions.map { c =>
      max(when(col("trial_type") === c, 1L).otherwise(0L)).as(c)
    }
    // Bucket expansion instead of a |t|×|trials| nested-loop: each trial
    // explodes only its candidate TR range (±1 bucket of slack so double
    // rounding can never DROP a predicate-true pair), then the exact
    // [onset, onset+duration) predicate filters the boundary. Cost is
    // O(|trials|·dur/TR) rows into a plain hash aggregate — the shape that
    // survives 100 TB of trials, unlike a nested-loop interval join.
    val cand = trials
      .withColumn("__t0", greatest(floor(col("onset") / trSeconds).cast("long"), lit(0L)))
      .withColumn("__t1",
        least(floor((col("onset") + col("duration")) / trSeconds).cast("long") + 1, lit(n - 1)))
      .filter(col("__t0") <= col("__t1"))
      .select(explode(sequence(col("__t0"), col("__t1"))).as("t"),
        col("onset"), col("duration"), col("trial_type"))
      .filter(col("onset") <= col("t") * trSeconds &&
        col("t") * trSeconds < col("onset") + col("duration"))
    val hits = cand.groupBy("t").agg(indicators.head, indicators.tail: _*)
    tl.select("t")
      .join(hits, Seq("t"), "left")
      .na.fill(0L, conditions)
  }

  /** DCT high-pass basis (nltools add_dct_basis, ssm_loop.py:55): appends
    * cosine regressors dct_k(t) = cos(π·k·(2t+1)/(2N)) for k = 1..K.
    * Pure projection — no shuffle (SURVEY.md W5). Values rounded to 6
    * decimals in query outputs only; the op itself keeps full precision.
    */
  def dctBasis(dm: DataFrame, n: Int, k: Int): DataFrame =
    (1 to k).foldLeft(dm) { (acc, kk) =>
      acc.withColumn(s"dct$kk",
        cos(lit(math.Pi * kk) * (col("t") * 2 + 1) / lit(2.0 * n)))
    }

  /** Polynomial trend columns (nltools add_poly, ssm_loop.py:56): poly_0
    * intercept plus centered powers up to `order`. */
  def polyTrend(dm: DataFrame, n: Int, order: Int): DataFrame =
    (0 to order).foldLeft(dm) { (acc, p) =>
      if (p == 0) acc.withColumn("poly0", lit(1.0))
      else acc.withColumn(s"poly$p",
        pow((col("t") - lit((n - 1) / 2.0)) / lit(n.toDouble), p))
    }

  /** Spike (one-hot) regressors from a flagged-TR list (SURVEY.md W7,
    * ssm_loop.py:77-84): one column per flagged TR, 1 at that sample and 0
    * elsewhere. The flag list is per-run metadata (≤ hundreds of entries),
    * so columns are generated driver-side — pure projections, no shuffle. */
  def spikeRegressors(dm: DataFrame, flaggedTrs: Seq[Long]): DataFrame =
    flaggedTrs.foldLeft(dm) { (acc, tr) =>
      acc.withColumn(s"spike_$tr",
        when(col("t") === tr, 1.0).otherwise(0.0))
    }

  /** SPM-canonical double-gamma HRF sampled at `tr`-second intervals,
    * `len` taps, scaled to integers (×1e6, rounded) so convolution sums
    * are exact int64 arithmetic (cross-engine determinism; ssm_loop.py:54
    * `dm.convolve()` semantics — peak Γ(6), undershoot Γ(16), ratio 1/6).
    * Gamma pdf computed via graft.glm.TDist.logGamma — no external dep.
    */
  def hrfKernelInts(tr: Double, len: Int): Array[Long] = {
    import graft.glm.TDist.logGamma
    def gammaPdf(x: Double, shape: Double): Double =
      if (x <= 0) 0.0
      else math.exp((shape - 1) * math.log(x) - x - logGamma(shape))
    val raw = Array.tabulate(len) { i =>
      val x = i * tr
      gammaPdf(x, 6.0) - gammaPdf(x, 16.0) / 6.0
    }
    val s = raw.sum
    raw.map(v => math.rint(v / s * 1e6).toLong) // normalized, fixed-point
  }

  /** Causal finite-kernel convolution of integer-valued indicator columns
    * with a fixed-point kernel: out(t) = (Σ_τ h_int(τ)·x(t−τ)) / 1e6.
    * Implemented as a broadcast kernel-table join + exact integer sum —
    * the SQL-expressible form of W4 (SURVEY.md §2.5), oracle-checkable.
    * At scale this shuffles |t|·len rows grouped back to |t| — with a
    * per-run partition key the groupBy stays partition-local.
    */
  def convolve(dm: DataFrame, spark: org.apache.spark.sql.SparkSession,
      kernel: Array[Long], cols: Seq[String], n: Int): DataFrame = {
    import spark.implicits._
    val kdf = kernel.zipWithIndex.map { case (h, tau) => (tau.toLong, h) }
      .toSeq.toDF("tau", "h")
    // scatter form: x(t) contributes h(τ) at out(t+τ); clip to [0, n)
    val taps = dm
      .join(broadcast(kdf), expr("true"))
      .withColumn("__tt", col("t") + col("tau"))
      .filter(col("__tt") < n)
    val sums = cols.map(c => sum(col("h") * col(c)).as(s"__conv_$c"))
    val out = taps.groupBy(col("__tt").as("t")).agg(sums.head, sums.tail: _*)
    cols.foldLeft(out) { (acc, c) =>
      acc.withColumn(s"conv_$c", col(s"__conv_$c").cast("double") / 1e6)
        .drop(s"__conv_$c")
    }
  }
}

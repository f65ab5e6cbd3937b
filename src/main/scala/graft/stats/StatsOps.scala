package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical operators (SURVEY.md §2.4: A1-A3 outlier histogram, A6 zscore,
  * A7 correlation, A8 deterministic mode).
  *
  * Numerical-determinism design: multi-row reductions run as exact DECIMAL
  * or fixed-point-integer sums (associative in exact arithmetic, so Spark's
  * partial/final aggregation
  * order cannot change the result), and the closing float math happens on the
  * already-exact scalars. This makes results bit-identical to any engine that
  * follows the same formula — the property the DuckDB oracle check relies on.
  */
object StatsOps {

  private val dec = "decimal(18,2)"

  /** Column-standardize `valueCol` within each partition-key group
    * (reference: nltools zscore over design-matrix columns, ssm_loop.py:47,
    * 81-82; population ddof=0 like scipy.stats.zscore).
    *
    * Two-pass: exact per-group moments, then a broadcast join back. At scale
    * the moments table is |groups| rows — tiny next to the fact table — so
    * the join is a broadcast, not a shuffle of the facts.
    */
  def zscore(df: DataFrame, valueCol: String, partCols: Seq[String]): DataFrame = {
    val v = col(valueCol)
    val moments = df
      .groupBy(partCols.map(col): _*)
      .agg(
        sum(v.cast(dec)).cast("double").as("__sum"),
        sum(v.cast(dec) * v.cast(dec)).cast("double").as("__sumsq"),
        count(lit(1)).cast("double").as("__n"),
      )
    // identical op order to the oracle SQL: mean = sum/n; var = sumsq/n - mean*mean.
    // nullif guards constant groups (var = 0): z is NULL there instead of an
    // ANSI divide-by-zero error — mirrored in every oracle SQL.
    df.join(broadcast(moments), partCols)
      .withColumn("__mean", col("__sum") / col("__n"))
      .withColumn("__var", col("__sumsq") / col("__n") - col("__mean") * col("__mean"))
      .withColumn("z", (v - col("__mean")) / sqrt(expr("nullif(__var, 0.0D)")))
      .drop("__sum", "__sumsq", "__n", "__mean", "__var")
  }

  /** Binned count histogram (fmriprep_motion_hist.R:42-44, binwidth=5 there).
    * Input: one row per entity with a numeric `countCol`. */
  def histogram(df: DataFrame, countCol: String, binWidth: Long): DataFrame =
    df.groupBy((floor(col(countCol) / binWidth) * binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))

  /** Deterministic mode: most frequent `valueCol` per group, smallest value
    * on ties — AFNI 3dcalc `hmode` tie-breaking (preprocess_parallel.sh:82;
    * SURVEY.md §7.5.6). Spark's built-in `mode()` is nondeterministic on
    * ties, so this is the count + row_number formulation.
    */
  def modeDeterministic(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val counted = df.groupBy((groupCols :+ valueCol).map(col): _*).agg(count(lit(1)).as("__cnt"))
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__cnt").desc, col(valueCol).asc)
    counted
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((groupCols.map(col) :+ col(valueCol).as("mode_value")): _*)
  }

  /** Variance inflation factors (nb cell 21 `dm.vif()`, SURVEY.md A10):
    * VIF_j = diag((R⁻¹))_j of the k×k correlation matrix R over `cols`.
    * The correlation matrix is one distributed aggregation (all pairwise
    * cross-moments in a single pass, exact fixed-point ×100 int64 products
    * accumulated in DECIMAL(38,0)); the k×k collect+invert is driver-side
    * by design — k ≈ regressor count, never data-sized.
    */
  /** All k sums + k(k+1)/2 cross-product sums of `cols` in ONE aggregation
    * pass, exact fixed-point (shared by [[vif]] and [[corrMatrix]]).
    * Values are 2-decimal by construction, so ×100 is integral (round()
    * before the cast — 0.29·100 is 28.999… in IEEE and a truncating cast
    * would be off by one). Per-row products stay cheap int64; the
    * ACCUMULATION is DECIMAL(38,0) because the int64 bound is only ~3.7e11
    * rows for q·q ≤ 2.5e7 — inside the project's 100 TB target — and a
    * non-ANSI long sum would wrap silently. (The DuckDB oracle's SUM over
    * BIGINT is already HUGEINT.) */
  private def crossMomentAggs(cols: Seq[String]): Seq[Column] = {
    val k = cols.length
    val pairs = for { i <- 0 until k; j <- i until k } yield (i, j)
    def fp(c: String) = round(col(c) * 100).cast("long")
    val dec38 = "decimal(38,0)"
    Seq(count(lit(1)).cast("double").as("__n")) ++
      cols.zipWithIndex.map { case (c, i) =>
        sum(fp(c).cast(dec38)).cast("double").as(s"__s$i")
      } ++
      pairs.map { case (i, j) =>
        sum((fp(cols(i)) * fp(cols(j))).cast(dec38)).cast("double").as(s"__p${i}_$j")
      }
  }

  def vif(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      cols: Seq[String]): DataFrame = {
    val k = cols.length
    val pairs = for { i <- 0 until k; j <- i until k } yield (i, j)
    val aggs = crossMomentAggs(cols)
    // correlations are scale-invariant, so the ×100 moments are used as-is
    // (no unscaling divisions to mirror in the oracle). The k×k
    // collect+invert is driver-side by design — k ≈ regressor count.
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Double]("__n")
    val s = Array.tabulate(k)(i => row.getAs[Double](s"__s$i"))
    val p = Array.ofDim[Double](k, k)
    pairs.foreach { case (i, j) =>
      val v = row.getAs[Double](s"__p${i}_$j"); p(i)(j) = v; p(j)(i) = v
    }
    // diagonal is EXACTLY 1.0 (y/(sqrt(y)·sqrt(y)) would be 1±ulp) — the
    // q47 oracle transcribes the Gauss-Jordan sequence assuming unit diag
    val r = Array.tabulate(k, k) { (i, j) =>
      if (i == j) 1.0
      else (n * p(i)(j) - s(i) * s(j)) /
        (math.sqrt(n * p(i)(i) - s(i) * s(i)) * math.sqrt(n * p(j)(j) - s(j) * s(j)))
    }
    val inv = graft.glm.LinAlg.inverse(r)
    import spark.implicits._
    cols.zipWithIndex.map { case (c, i) => (c, inv(i)(i)) }.toDF("regressor", "vif")
  }

  /** The full k×k Pearson correlation matrix of `cols` as a QUERYABLE
    * relation (nb cell 19 `dm_conv.corr()`): one row per unordered pair
    * (var_a, var_b, corr), i ≤ j, diagonal exactly 1.0. The same
    * single-pass exact-fixed-point cross-moment aggregation as [[vif]],
    * but the per-pair correlations are computed as a projection + explode
    * ON the one-row aggregate — no driver collect anywhere, so the matrix
    * composes into larger DataFrame pipelines. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val k = cols.length
    val pairs = for { i <- 0 until k; j <- i until k } yield (i, j)
    val aggs = crossMomentAggs(cols)
    val mom = df.agg(aggs.head, aggs.tail: _*)
    val pairStructs = pairs.map { case (i, j) =>
      // diagonal pinned to exactly 1.0 (y/(√y·√y) would be 1±ulp)
      val r =
        if (i == j) lit(1.0)
        else (col("__n") * col(s"__p${i}_$j") - col(s"__s$i") * col(s"__s$j")) /
          (sqrt(col("__n") * col(s"__p${i}_$i") - col(s"__s$i") * col(s"__s$i")) *
            sqrt(col("__n") * col(s"__p${j}_$j") - col(s"__s$j") * col(s"__s$j")))
      struct(lit(cols(i)).as("var_a"), lit(cols(j)).as("var_b"), r.as("corr"))
    }
    mom.select(explode(array(pairStructs: _*)).as("__pr"))
      .select(col("__pr.var_a").as("var_a"), col("__pr.var_b").as("var_b"),
        col("__pr.corr").as("corr"))
  }

  /** Pearson correlation of two 2-decimal columns per group, via exact
    * decimal cross-moments (nb cell 19 `dm_conv.corr()` analog). */
  def corrExact(df: DataFrame, groupCols: Seq[String], xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast(dec)
    val y = col(yCol).cast(dec)
    df.groupBy(groupCols.map(col): _*)
      .agg(
        sum(x).cast("double").as("__sx"),
        sum(y).cast("double").as("__sy"),
        sum(x * x).cast("double").as("__sxx"),
        sum(y * y).cast("double").as("__syy"),
        sum(x * y).cast("double").as("__sxy"),
        count(lit(1)).cast("double").as("__n"),
      )
      .withColumn(
        "corr",
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          (sqrt(col("__n") * col("__sxx") - col("__sx") * col("__sx")) *
            sqrt(col("__n") * col("__syy") - col("__sy") * col("__sy"))),
      )
      .select((groupCols.map(col) :+ col("corr")): _*)
  }
}

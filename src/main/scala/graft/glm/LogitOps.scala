package graft.glm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier: logistic regression by FIXED gradient
  * steps — the fastText-style learned filter real pipelines put where a
  * heuristic score (q24/q67/q82) is the proxy. Everything is engineered
  * for cross-engine determinism (the q82/q98 discipline):
  *
  *  - weights live in int64 FIXED POINT (×1e6); each step's gradient is
  *    a sum of per-document contributions each ROUNDED to the 1e6 grid
  *    BEFORE summing, so the aggregate is exact integer arithmetic —
  *    partition-order free, and bit-identical in any engine whose
  *    exp() agrees to ≲1e-10 relative (a rounding can only diverge if
  *    the true value sits within one double ulp of a grid boundary);
  *  - the weight update is w += floor(grad_sum / (2n)) — floor of an
  *    EXACT double quotient of integers (both < 2^53), identical
  *    everywhere; lr = 1/2 is baked into the divisor;
  *  - margins are the left-assoc chain Σ_j (w_j/1e6)·x_j in feature
  *    order, the same IEEE sequence the oracle SQL spells out.
  *
  * The model barrier is k integers per step (the kmeans/BPE pattern):
  * `steps` aggregations over the feature relation, each collecting one
  * k-sum row. 100 TB shape: one pass per step, map-side partial sums,
  * no shuffle beyond the 1-row aggregate; features are a pure
  * projection of the quality-stats pass.
  */
object LogitOps {

  val Scale = 1000000L // weight/gradient fixed-point grid (1e6)

  /** Margin column Σ_j (wFp_j/1e6)·x_j as a left-assoc chain in column
    * order — the exact IEEE sequence the oracle replays. */
  private def marginCol(xCols: Seq[String], wFp: Array[Long]): Column =
    xCols.zipWithIndex
      .map { case (c, j) => lit(wFp(j).toDouble / Scale) * col(c) }
      .reduce(_ + _)

  /** `steps` deterministic GD steps from w = 0 over `feats` (one row per
    * example; `yCol` ∈ {0.0, 1.0}; `xCols` SHOULD include a constant
    * 1.0 intercept column). Returns the fixed-point weight vector after
    * each step (step 1..steps). */
  def gdStepsFp(feats0: DataFrame, xCols: Seq[String], yCol: String,
      steps: Int): Seq[Array[Long]] = {
    require(steps >= 1, s"gdStepsFp: steps must be >= 1, got $steps")
    // materialize the feature relation ONCE: every step is an action, and
    // without the barrier each of the `steps` aggregations re-executes the
    // whole upstream derivation (for q108, the tokenize + per-doc quality
    // aggregation over the corpus — the dominant cost, paid 6×). The
    // checkpoint changes no value (bit-identity preserved); at scale this
    // is the standard iterate-over-cached-features shape.
    val feats = feats0.select((xCols :+ yCol).map(col): _*).localCheckpoint()
    var wFp = Array.fill(xCols.length)(0L)
    val out = Seq.newBuilder[Array[Long]]
    for (_ <- 1 to steps) {
      val sigma = lit(1.0) / (lit(1.0) + exp(-marginCol(xCols, wFp)))
      val aggs = xCols.map(c =>
        sum(round((col(yCol) - sigma) * col(c) * Scale).cast("long")).as(s"__g_$c")) :+
        count(lit(1)).as("__n")
      val row = feats.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(xCols.length)
      require(n > 0, "gdStepsFp: empty feature relation")
      wFp = wFp.zipWithIndex.map { case (w, j) =>
        // lr = 1/2: floor of an exact integer quotient, engine-identical
        w + math.floor(row.getLong(j).toDouble / (2.0 * n)).toLong
      }
      out += wFp.clone()
    }
    out.result()
  }

  /** The per-step weight relation (step, j, weight_fp, weight): the
    * hash-checkable training trace (weight_fp is the exact int64; weight
    * its /1e6 double rendering). */
  def trainTrace(feats: DataFrame, xCols: Seq[String], yCol: String,
      steps: Int): DataFrame = {
    val s = feats.sparkSession
    import s.implicits._
    val rows = for {
      (w, i) <- gdStepsFp(feats, xCols, yCol, steps).zipWithIndex
      j <- xCols.indices
    } yield ((i + 1).toLong, j.toLong, w(j), w(j).toDouble / Scale)
    rows.toDF("step", "j", "weight_fp", "weight")
  }

  /** Serving: score rows under a FROZEN fixed-point weight vector — a
    * pure projection (the streamingQualityScore frozen-model family).
    * Adds `margin` and the keep verdict margin ≥ 0. */
  def scoreWith(df: DataFrame, xCols: Seq[String],
      wFp: Array[Long]): DataFrame =
    df.withColumn("margin", marginCol(xCols, wFp))
      .withColumn("keep", col("margin") >= 0)
}

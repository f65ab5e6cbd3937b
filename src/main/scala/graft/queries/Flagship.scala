package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.design.DesignOps
import graft.glm.GlmOps
import graft.tabular.TsvOps

/** The flagship E1 pipeline (SURVEY.md §3, ssm_loop.py end-to-end): trial
  * events → boxcar design → HRF convolution → DCT/poly nuisance columns →
  * 24-parameter motion-covariate expansion → spike one-hots → z-scored
  * tissue-signal regressors → mass-univariate GLM over every group's time
  * series → per-regressor beta/sigma/t/p table.
  *
  * The design is FULL-WIDTH (k = 40), mirroring ssm_loop.py:72-85 / the
  * notebook's ~40-column X: 2 convolved task regressors, 3 DCT + intercept,
  * 24 motion covariates (6 z-scored bases × {c, c², Δc, Δc²},
  * ssm_loop.py:46-50), 2 z-scored tissue analogs (csf/wm,
  * ssm_loop.py:72-74), and 8 spike one-hots (motion_outlierNN,
  * ssm_loop.py:77-84). The events table plays both roles the reference
  * splits across files: trials (onset/duration/type) and the confounds TSV
  * (per-TR continuous signals, here per-TR aggregates of event activity).
  *
  * The reference runs this once per subject-process over a 296×1.3M voxel
  * matrix; here "voxels" are event-user groups and the design covers the
  * first week of the events month at 300-second TR. The ONLY driver-side
  * compute is collecting the 2016×40 design matrix (plus the 8-row spike
  * list) to form its pinv — the same barrier ssm_loop has (`regress()`
  * precomputes from X), and constant-sized regardless of data scale.
  * Everything else is one lazy DataFrame DAG: the per-group stats run
  * through the packed mass GLM — one series_slots aggregation per group,
  * then exact dot-product projections (see GlmOps.massGLMPacked).
  */
object Flagship extends QueryModule {

  private val N = 2016 // one week, 300-second TR
  private val baseUs = 1704067200000000L
  private val trUs = 300000000L

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val motionBases: Seq[String] = eventTypes.map(t => s"mo_$t") :+ "mo_n"

  /** Static regressor inventory (k = 40). Spike columns are named by rank
    * (spike_1..spike_8), not by TR, so the schema is data-independent even
    * though the flagged TRs are data-dependent (like the reference's
    * variable motion_outlierNN set). */
  val regressors: Seq[String] =
    Seq("conv_click", "conv_purchase", "dct1", "dct2", "dct3", "poly0") ++
      motionBases.flatMap(c => Seq(s"z_$c", s"z_${c}_sq", s"z_${c}_d", s"z_${c}_d_sq")) ++
      Seq("z_tissue_avg", "z_tissue_max") ++
      (1 to 8).map(i => s"spike_$i")

  /** Per-TR confound aggregates — the engine's analog of the fMRIprep
    * confounds TSV: per-type activity sums, event count, and two summary
    * signals (mean / max value) that become the tissue regressors. */
  private def confounds(ev0: DataFrame): DataFrame = {
    val ev = ev0
      // raw-difference guard BEFORE bucketing: Spark `div` truncates toward
      // zero (an event < 1 TR before baseUs would land in t = 0) while the
      // floor semantics the design assumes exclude it
      .filter(expr(s"ts div 1000 - $baseUs >= 0"))
      .select(
        expr(s"(ts div 1000 - $baseUs) div $trUs").as("t"),
        col("event_type"), col("value"))
      .filter(col("t") < N)
    val aggs =
      eventTypes.map(tp =>
        sum(when(col("event_type") === tp, col("value")).otherwise(0.0)).as(s"mo_$tp")) ++
        Seq(
          count(lit(1)).cast("double").as("mo_n"),
          avg(col("value")).as("tissue_avg_raw"),
          max(col("value")).as("tissue_max_raw"))
    ev.groupBy("t").agg(aggs.head, aggs.tail: _*)
  }

  /** The full 2016×40 design frame. Window functions here run over the
    * DESIGN FRAME only (N rows, constant-sized) — the single-partition sort
    * is the same driver-adjacent barrier as the pinv collect, never over
    * data-scaled relations. */
  private[graft] def designFrame(s: SparkSession, d: String): DataFrame =
    designFrameOf(s, events(s, d))

  private[graft] def designFrameOf(s: SparkSession, ev: DataFrame): DataFrame = {
    val trials = ev.select(
      ((expr("ts div 1000") - baseUs) / 1000000.0).as("onset"),
      col("value").as("duration"),
      col("event_type").as("trial_type"),
    )
    val tl = DesignOps.timeline(s, N, 300.0)
    val box = DesignOps.boxcar(tl, trials, Seq("click", "purchase"), 300.0, N.toLong)
    val conv = DesignOps.convolve(box, s, DesignOps.hrfKernelInts(1.0, 24),
      Seq("click", "purchase"), N)
    val taskCols = DesignOps.dctBasis(DesignOps.polyTrend(tl.select("t"), N, 0), N, 3)
      .join(conv, "t")

    // confounds joined to the dense timeline; empty TRs are quiet (0.0).
    // Materialized ONCE (N rows, constant-sized): both the spike-TR pick
    // and the design collect consume it, and without the barrier each
    // action would re-run the events scan + per-TR aggregation.
    val conf0 = tl.select("t").join(confounds(ev), Seq("t"), "left")
      .na.fill(0.0, motionBases ++ Seq("tissue_avg_raw", "tissue_max_raw"))
      // the partition key every window below runs under: this pipeline is
      // ONE subject's run by construction (SURVEY §7.5), so the key is a
      // constant — but declaring it keeps the WindowExecs partitioned (no
      // move-everything-to-one-partition plan shape), and a multi-subject
      // caller binds the same windows to real run ids
      .withColumn("run_id", lit(1L))
      .localCheckpoint()
    // tissue signals: 12-TR trailing mean (a smooth slow signal, like the
    // csf/wm averages), then z-scored like ssm_loop.py:72-74
    val wRoll = Window.partitionBy(col("run_id")).orderBy(col("t"))
      .rowsBetween(-11, 0)
    val conf = conf0
      .withColumn("tissue_avg", avg(col("tissue_avg_raw")).over(wRoll))
      .withColumn("tissue_max", avg(col("tissue_max_raw")).over(wRoll))

    // z-score the 6 motion bases + 2 tissue signals over the timeline
    // (population ddof, matching StatsOps.zscore): one agg row, broadcast
    val zCols = motionBases ++ Seq("tissue_avg", "tissue_max")
    val statAggs = zCols.flatMap(c =>
      Seq(avg(col(c)).as(s"__m_$c"), stddev_pop(col(c)).as(s"__s_$c")))
    val stats = conf.agg(statAggs.head, statAggs.tail: _*)
    val zed = zCols.foldLeft(conf.crossJoin(broadcast(stats))) { (acc, c) =>
      acc.withColumn(s"z_$c",
        when(col(s"__s_$c") > 0, (col(c) - col(s"__m_$c")) / col(s"__s_$c"))
          .otherwise(lit(0.0)))
    }.select(col("t") +: col("run_id") +: zCols.map(c => col(s"z_$c")): _*)

    // 6 → 24 motion covariates: c, c², Δc, (Δc)² per z-scored base,
    // lag windows partitioned by the run key
    val motion = TsvOps.motionCovariates(zed, motionBases.map(c => s"z_$c"),
      "t", partitionCols = Seq("run_id"))

    // spike one-hots: the 8 busiest TRs (count desc, t asc tie-break) —
    // the engine's analog of FD-flagged motion_outlier columns; the list is
    // 8 rows to the driver, constant-sized
    val spikeTs = conf0.select(col("t"), col("mo_n"))
      .orderBy(col("mo_n").desc, col("t").asc)
      .limit(8).collect().map(_.getLong(0)).sorted.toSeq
    val withSpikes = spikeTs.zipWithIndex.foldLeft(motion) { case (acc, (tr, i)) =>
      acc.withColumn(s"spike_${i + 1}", when(col("t") === tr, 1.0).otherwise(0.0))
    }

    taskCols.join(withSpikes.drop("run_id"), "t")
  }

  /** Full pipeline: returns (g, regressor, beta, sigma, t_stat, p, df). */
  def singleSubjectModel(s: SparkSession, d: String): DataFrame =
    singleSubjectModelOf(s, events(s, d))

  private[graft] def singleSubjectModelOf(s: SparkSession, ev: DataFrame): DataFrame = {
    // design-matrix barrier: 2016×40 doubles to the driver, like ssm_loop's
    // in-process X before regress() — scale-independent
    val xRows = designFrameOf(s, ev)
      .select(col("t") +: regressors.map(col): _*)
      .orderBy("t")
      .collect()
    require(xRows.length == N, s"design matrix has ${xRows.length} rows, want $N")
    val x: Array[Array[Double]] = xRows.map { r =>
      regressors.indices.map(i => r.getDouble(i + 1)).toArray
    }
    val series = ev
      .filter(expr(s"ts div 1000 - $baseUs >= 0")) // floor/trunc parity
      .select(
        (col("user_id") % 10).as("g"),
        expr(s"(ts div 1000 - $baseUs) div $trUs").as("t"),
        col("value").cast("decimal(18,2)").as("y_dec"),
      )
      .filter(col("t") < N)
      .groupBy("g", "t").agg(sum("y_dec").as("y_dec"))
    val names = {
      import s.implicits._
      regressors.zipWithIndex.map { case (nm, j) => (j.toLong, nm) }.toDF("j", "regressor")
    }
    GlmOps.massGLMPacked(s, series, x, "g")
      .join(broadcast(names), "j")
      .select(col("g"), col("regressor"),
        round(col("beta"), 6).as("beta"), round(col("sigma"), 6).as("sigma"),
        round(col("t_stat"), 6).as("t_stat"), round(col("p"), 6).as("p"), col("df"))
      .orderBy("g", "regressor")
  }

  // ---- multi-subject: the catalog-driven form of the same pipeline -------

  /** Per-KEY design frames in ONE relation (run_id, t, regressors...) —
    * the multi-subject generalization of [[designFrame]]: every stage that
    * was a global aggregate/window becomes a (run_id)-keyed one, so ALL
    * subjects' designs come out of one lazy DAG. `ev` must carry a
    * `run_id` column (the subject/run key); trials, confounds, rolling
    * tissue signals, z-scoring, motion expansion, and spike picks are all
    * computed per key, exactly as [[designFrame]] computes them for its
    * single pinned key — FlagshipSpec pins per-key equality with the
    * single-subject pipeline run on that key's events alone.
    *
    * Spike columns are built RELATIONALLY here (rank window + conditional
    * projection) where the single-subject path collects its 8-row list:
    * the multi-key spike relation is |keys|×8 — still catalog-sized, but
    * there is no reason to ship it through the driver. */
  private[graft] def designFrameKeyed(s: SparkSession, ev: DataFrame): DataFrame = {
    val keys = ev.select("run_id").distinct()
    val tl = DesignOps.timeline(s, N, 300.0).select("t")
    // dense (key × timeline) grid: |keys|·N rows, catalog-sized
    val tlK = keys.crossJoin(tl)

    val trials = ev.select(
      col("run_id"),
      ((expr("ts div 1000") - baseUs) / 1000000.0).as("onset"),
      col("value").as("duration"),
      col("event_type").as("trial_type"),
    )
    // keyed boxcar: same bucket expansion as DesignOps.boxcar, grouped by
    // (run_id, t) and densified against the key grid
    val conds = Seq("click", "purchase")
    val cand = trials
      .withColumn("__t0", greatest(floor(col("onset") / 300.0).cast("long"), lit(0L)))
      .withColumn("__t1",
        least(floor((col("onset") + col("duration")) / 300.0).cast("long") + 1, lit(N - 1L)))
      .filter(col("__t0") <= col("__t1"))
      .select(col("run_id"), explode(sequence(col("__t0"), col("__t1"))).as("t"),
        col("onset"), col("duration"), col("trial_type"))
      .filter(col("onset") <= col("t") * 300.0 &&
        col("t") * 300.0 < col("onset") + col("duration"))
    val boxAggs = conds.map(c =>
      max(when(col("trial_type") === c, 1L).otherwise(0L)).as(c))
    val box = tlK
      .join(cand.groupBy("run_id", "t").agg(boxAggs.head, boxAggs.tail: _*),
        Seq("run_id", "t"), "left")
      .na.fill(0L, conds)
    // keyed HRF convolution: scatter taps, group back per (run_id, t)
    val kernel = DesignOps.hrfKernelInts(1.0, 24)
    val kdf = {
      import s.implicits._
      kernel.zipWithIndex.map { case (h, tau) => (tau.toLong, h) }
        .toSeq.toDF("tau", "h")
    }
    val convSums = conds.map(c => sum(col("h") * col(c)).as(s"__conv_$c"))
    val conv0 = box
      .join(broadcast(kdf), expr("true"))
      .withColumn("__tt", col("t") + col("tau"))
      .filter(col("__tt") < N)
      .groupBy(col("run_id"), col("__tt").as("t"))
      .agg(convSums.head, convSums.tail: _*)
    val conv = conds.foldLeft(conv0) { (acc, c) =>
      acc.withColumn(s"conv_$c", col(s"__conv_$c").cast("double") / 1e6)
        .drop(s"__conv_$c")
    }
    val taskCols = DesignOps.dctBasis(DesignOps.polyTrend(tlK, N, 0), N, 3)
      .join(conv, Seq("run_id", "t"))

    // keyed confounds over the dense grid
    val confAggs =
      eventTypes.map(tp =>
        sum(when(col("event_type") === tp, col("value")).otherwise(0.0)).as(s"mo_$tp")) ++
        Seq(
          count(lit(1)).cast("double").as("mo_n"),
          avg(col("value")).as("tissue_avg_raw"),
          max(col("value")).as("tissue_max_raw"))
    val confK = ev
      .filter(expr(s"ts div 1000 - $baseUs >= 0")) // floor/trunc parity
      .select(col("run_id"),
        expr(s"(ts div 1000 - $baseUs) div $trUs").as("t"),
        col("event_type"), col("value"))
      .filter(col("t") < N)
      .groupBy("run_id", "t")
      .agg(confAggs.head, confAggs.tail: _*)
    val conf0 = tlK.join(confK, Seq("run_id", "t"), "left")
      .na.fill(0.0, motionBases ++ Seq("tissue_avg_raw", "tissue_max_raw"))
      .localCheckpoint()
    val wRoll = Window.partitionBy(col("run_id")).orderBy(col("t"))
      .rowsBetween(-11, 0)
    val conf = conf0
      .withColumn("tissue_avg", avg(col("tissue_avg_raw")).over(wRoll))
      .withColumn("tissue_max", avg(col("tissue_max_raw")).over(wRoll))

    // per-key z-scoring: one stats row per key, broadcast back
    val zCols = motionBases ++ Seq("tissue_avg", "tissue_max")
    val statAggs = zCols.flatMap(c =>
      Seq(avg(col(c)).as(s"__m_$c"), stddev_pop(col(c)).as(s"__s_$c")))
    val stats = conf.groupBy("run_id").agg(statAggs.head, statAggs.tail: _*)
    val zed = zCols.foldLeft(conf.join(broadcast(stats), "run_id")) { (acc, c) =>
      acc.withColumn(s"z_$c",
        when(col(s"__s_$c") > 0, (col(c) - col(s"__m_$c")) / col(s"__s_$c"))
          .otherwise(lit(0.0)))
    }.select(col("t") +: col("run_id") +: zCols.map(c => col(s"z_$c")): _*)

    val motion = TsvOps.motionCovariates(zed, motionBases.map(c => s"z_$c"),
      "t", partitionCols = Seq("run_id"))

    // per-key spike picks, relational: rank by (mo_n desc, t asc) per key,
    // number the 8 picks by ascending t (matching the single-subject
    // sorted-list numbering), then conditional-project the one-hots
    val wPick = Window.partitionBy("run_id").orderBy(col("mo_n").desc, col("t").asc)
    val picks = conf0.select(col("run_id"), col("t"), col("mo_n"))
      .withColumn("__rk", row_number().over(wPick))
      .filter(col("__rk") <= 8)
    val wNum = Window.partitionBy("run_id").orderBy(col("t").asc)
    val spikes = picks
      .withColumn("__si", row_number().over(wNum))
      .select(col("run_id"), col("t"), col("__si"))
    val withSpikes = (1 to 8).foldLeft(
      motion.join(spikes, Seq("run_id", "t"), "left")) { case (acc, i) =>
      acc.withColumn(s"spike_$i",
        when(col("__si") === i, 1.0).otherwise(0.0))
    }.drop("__si")

    taskCols.join(withSpikes, Seq("run_id", "t"))
  }

  /** The keyed (run_id, g, t, y_dec) series shared by both multi-subject
    * GLM paths. */
  private def seriesKeyed(ev: DataFrame): DataFrame = ev
    .filter(expr(s"ts div 1000 - $baseUs >= 0")) // floor/trunc parity
    .select(
      col("run_id"),
      (col("user_id") % 10).as("g"),
      expr(s"(ts div 1000 - $baseUs) div $trUs").as("t"),
      col("value").cast("decimal(18,2)").as("y_dec"),
    )
    .filter(col("t") < N)
    .groupBy("run_id", "g", "t").agg(sum("y_dec").as("y_dec"))

  private def finishMulti(s: SparkSession, raw: DataFrame): DataFrame = {
    val names = {
      import s.implicits._
      regressors.zipWithIndex.map { case (nm, j) => (j.toLong, nm) }.toDF("j", "regressor")
    }
    raw
      .join(broadcast(names), "j")
      .select(col("run_id"), col("g"), col("regressor"),
        round(col("beta"), 6).as("beta"), round(col("sigma"), 6).as("sigma"),
        round(col("t_stat"), 6).as("t_stat"), round(col("p"), 6).as("p"), col("df"))
      .orderBy("run_id", "g", "regressor")
  }

  /** The multi-subject flagship (SURVEY §2.9 O2 executed end-to-end,
    * vs ssm_loop.py:28's one process per `$sub`), FULLY DISTRIBUTED:
    * EVERY key's full-width design is built in one keyed DAG
    * ([[designFrameKeyed]]), each key's pinv runs as an independent
    * executor-side mapGroups job ([[GlmOps.designWeightsKeyed]] — no
    * O(catalog) driver collect), and the weight relation joins the packed
    * series BY KEY with no broadcast hint (AQE broadcasts while the
    * catalog is small, switches to a key-aligned shuffle join past its
    * threshold — at ~27k keys the weights are gigabytes: exactly the
    * broadcast this path avoids). All (key, group) series fit in ONE
    * packed mass-GLM query. Output: (run_id, g, regressor, beta, sigma,
    * t_stat, p, df). Spec-pinned bit-equal to
    * [[multiSubjectModelCollected]]. */
  def multiSubjectModel(s: SparkSession, ev: DataFrame): DataFrame = {
    import graft.glm.GlmOps
    val weights = GlmOps.designWeightsKeyed(
      designFrameKeyed(s, ev).select(col("run_id") +: col("t") +: regressors.map(col): _*),
      "run_id", "t", regressors, N)
    finishMulti(s, GlmOps.massGLMPackedPerKeyWeights(
      s, seriesKeyed(ev), weights, N, regressors.length, "run_id", "g"))
  }

  /** The pre-r11 driver-collected variant — the |keys|×N×k design block
    * crosses to the driver and the per-key weight tables ship as one
    * broadcast. Kept as the spec pin for the distributed path (bit-equal
    * by construction: same LinAlg on the same doubles) and as the
    * measured small-catalog reference point in Probe. */
  private[graft] def multiSubjectModelCollected(s: SparkSession, ev: DataFrame): DataFrame = {
    import graft.glm.{GlmOps, LinAlg}
    val dRows = designFrameKeyed(s, ev)
      .select(col("run_id") +: col("t") +: regressors.map(col): _*)
      .orderBy("run_id", "t")
      .collect()
    val designs: Seq[(Long, LinAlg.Mat)] = dRows
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map { case (key, rows) =>
        require(rows.length == N, s"key $key design has ${rows.length} rows, want $N")
        (key, rows.sortBy(_.getLong(1)).map { r =>
          regressors.indices.map(i => r.getDouble(i + 2)).toArray
        })
      }
    finishMulti(s,
      GlmOps.massGLMPackedPerKey(s, seriesKeyed(ev), designs, "run_id", "g"))
  }

  /** q104: the reference's actual workload shape — a catalog of
    * (subject, run) pairs (here subject = user_id mod 4), each with its
    * OWN data-dependent design, modeled in ONE query. */
  def multiSubjectQuery(s: SparkSession, d: String): DataFrame =
    multiSubjectModel(s, events(s, d).withColumn("run_id", col("user_id") % 4))

  override def queries: Seq[Q] = Seq(
    // no DuckDB oracle: X is data-dependent and p needs the t CDF —
    // rows-only check here; numerics are golden-tested in GlmSpec/FlagshipSpec
    Q("q48_flagship_glm", singleSubjectModel, None),
    // no oracle for the same reason (per-key pinv of data-dependent X);
    // FlagshipSpec pins each key's results to the single-subject pipeline
    // run on that key's events alone
    Q("q104_multi_subject_glm", multiSubjectQuery, None),
  )
}

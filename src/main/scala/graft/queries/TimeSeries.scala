package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.stats.StatsOps
import graft.timeseries.TimeOps
import graft.design.DesignOps

/** Time-series / window queries on the `events` table (SURVEY.md §2.5).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS); Spark reads it as epoch-nanos
  * LongType under spark.sql.legacy.parquet.nanosAsLong=true (set in every
  * session builder). DuckDB reads it as TIMESTAMP_NS, so oracle SQL converts
  * with epoch_us(ts); timestamps in outputs are always epoch microseconds
  * cast to BIGINT/DOUBLE so schemas agree across engines.
  */
object TimeSeries extends QueryModule {

  /** W1+W3: lagged difference of value per user, ordered by (ts, event_id),
    * leading null → 0 (ssm_loop.py:48-49 motion-derivative analog). */
  def windowLagDiff(s: SparkSession, d: String): DataFrame =
    TimeOps
      .lagDiff(events(s, d), "value", Seq("user_id"), Seq("ts", "event_id"))
      .select(col("event_id"), col("user_id"), col("value"), col("diff"))
      .orderBy("event_id")

  private val windowLagDiffSql =
    """SELECT event_id, user_id, value,
      |  COALESCE(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0) AS diff
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** A6: per-user z-score of value, population ddof (scipy zscore semantics,
    * ssm_loop.py:81-82). Exact-decimal moments; see StatsOps.zscore. */
  def zscoreByUser(s: SparkSession, d: String): DataFrame =
    StatsOps
      .zscore(events(s, d), "value", Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("z"))
      .orderBy("event_id")

  private val zscoreByUserSql =
    """WITH m AS (
      |  SELECT user_id,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sq,
      |    CAST(COUNT(*) AS DOUBLE) AS n
      |  FROM events GROUP BY user_id
      |), mm AS (
      |  SELECT user_id, s/n AS mean, sq/n - (s/n)*(s/n) AS var FROM m
      |)
      |SELECT e.event_id, e.user_id, (e.value - mm.mean) / sqrt(nullif(mm.var, 0.0)) AS z
      |FROM events e JOIN mm ON e.user_id = mm.user_id
      |ORDER BY e.event_id""".stripMargin

  /** J2: boxcar design expansion — hourly timeline vs event intervals
    * [onset, onset+value sec), one indicator column per event_type
    * (onsets_to_dm, ssm_loop.py:43). */
  def boxcarDesign(s: SparkSession, d: String): DataFrame = {
    val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z
    val trials = events(s, d).select(
      ((expr("ts div 1000") - baseUs) / 1000000.0).as("onset"),
      col("value").as("duration"),
      col("event_type").as("trial_type"),
    )
    val tl = DesignOps.timeline(s, 168, 3600.0)
    DesignOps
      .boxcar(tl, trials, Seq("click", "error", "purchase", "signup", "view"), 3600.0, 168L)
      .orderBy("t")
  }

  private val boxcarDesignSql =
    """WITH tl AS (
      |  SELECT CAST(g AS BIGINT) AS t, CAST(g AS BIGINT) * 3600.0 AS sec
      |  FROM generate_series(0, 167) AS gs(g)
      |), tr AS (
      |  SELECT (epoch_us(ts) - 1704067200000000) / 1000000.0 AS onset,
      |         value AS duration, event_type AS trial_type
      |  FROM events
      |)
      |SELECT t,
      |  MAX(CASE WHEN onset <= sec AND sec < onset + duration AND trial_type = 'click'    THEN 1 ELSE 0 END) AS click,
      |  MAX(CASE WHEN onset <= sec AND sec < onset + duration AND trial_type = 'error'    THEN 1 ELSE 0 END) AS error,
      |  MAX(CASE WHEN onset <= sec AND sec < onset + duration AND trial_type = 'purchase' THEN 1 ELSE 0 END) AS purchase,
      |  MAX(CASE WHEN onset <= sec AND sec < onset + duration AND trial_type = 'signup'   THEN 1 ELSE 0 END) AS signup,
      |  MAX(CASE WHEN onset <= sec AND sec < onset + duration AND trial_type = 'view'     THEN 1 ELSE 0 END) AS view
      |FROM tl CROSS JOIN tr
      |GROUP BY t
      |ORDER BY t""".stripMargin

  /** As-of join: for each purchase, the most recent prior (or simultaneous)
    * click of the same user. Distributed union+window form — see
    * TimeOps.asofJoin. */
  def asofPurchaseClick(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"))
    TimeOps
      .asofJoin(purchases, clicks, Seq("user_id"), "ts", Seq("click_ts"))
      .select(
        col("event_id"),
        col("user_id"),
        expr("ts div 1000").cast("double").as("ts_us"),
        expr("asof_click_ts div 1000").cast("double").as("last_click_us"),
      )
      .orderBy("event_id")
  }

  private val asofPurchaseClickSql =
    """SELECT p.event_id, p.user_id,
      |  CAST(epoch_us(p.ts) AS DOUBLE) AS ts_us,
      |  CAST((SELECT max(epoch_us(c.ts)) FROM events c
      |        WHERE c.user_id = p.user_id AND c.event_type = 'click'
      |          AND c.ts <= p.ts) AS DOUBLE) AS last_click_us
      |FROM events p
      |WHERE p.event_type = 'purchase'
      |ORDER BY p.event_id""".stripMargin

  /** Tumbling hourly window aggregate (SURVEY.md §2.10 extension): per
    * (hour, event_type) counts and exact value sums. */
  def tumblingHourly(s: SparkSession, d: String): DataFrame =
    TimeOps
      .tumbling(events(s, d), "ts", 3600L * 1000000000L)
      .groupBy(col("bucket").cast("long").as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
      )
      .orderBy("hour", "event_type")

  private val tumblingHourlySql =
    """SELECT epoch_us(ts) // 3600000000 AS hour, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  /** q52: per-user session windows, 30-minute inactivity gap — Spark's
    * session_window vs DuckDB gaps-and-islands (lag + running break sum).
    * Session end = last event + gap in both formulations. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .filter(col("user_id") < 30)
      .select(expr("timestamp_micros(ts div 1000)").as("ts"),
        col("user_id"), col("value"))
    graft.streaming.StreamOps.sessionize(ev, "ts", "user_id", "30 minutes")
      .select(
        expr("unix_micros(session_start)").as("start_us"),
        expr("unix_micros(session_end)").as("end_us"),
        col("user_id"), col("n_events"), col("sum_value"),
      )
      .orderBy("user_id", "start_us")
  }

  private val sessionizeSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, value FROM events WHERE user_id < 30
      |), brks AS (
      |  SELECT user_id, us, value,
      |    CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
      |         OR LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
      |      THEN 1 ELSE 0 END AS brk
      |  FROM e
      |), sess AS (
      |  SELECT user_id, us, value,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM brks
      |)
      |SELECT MIN(us) AS start_us, MAX(us) + 1800000000 AS end_us,
      |  user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, start_us""".stripMargin

  // ---- q159: framewise displacement + motion scrubbing (W1-W3 + QC) ------
  // The motion-QC step between the reference's confound extraction
  // (ssm_loop.py:46-50 pulls trans/rot columns; fmriprep_motion_hist.R
  // plots them) and the GLM: Power-style framewise displacement
  // FD_t = Σ|Δtrans| + 50·Σ|Δrot| per run, spike flagging, and the
  // standard censor augmentation (a spike at f censors frames f-1..f+2).
  //
  // Six synthetic motion params per (run, TR): exact cent sums split by
  // event_id residue (3 "translations", 3 "rotations"), grid-filled dense.
  // FD stays in INTEGER cents (|Δ| of exact sums, the ×50 rotation radius
  // integer) until the final /100 display divide, so flagging compares
  // integers-cast-to-double on both engines. The spike threshold is
  // RELATIVE (2.5× the run’s FD median — exact half-integers under the
  // shared type-7 percentile/quantile_cont), because an absolute
  // millimeter threshold is meaningless for synthetic magnitudes that
  // scale with data volume.
  //
  // Scale shape: one data-sized exchange (events → per-(run,TR) partial
  // aggregate); everything after is bounded at R·N rows. All windows
  // partition by run — no global window, no driver state.

  private val fdRuns = 8
  private val fdN = 168
  private val fdBaseUs = 1704067200000000L
  private val fdTrUs = 3600000000L

  private[graft] val fdStr =
    "abs(d_0) + abs(d_1) + abs(d_2) + 50 * (abs(d_3) + abs(d_4) + abs(d_5))"
  private[graft] val fdSpikeStr = "CAST(fd_c AS DOUBLE) > 2.5 * med"

  def fdScrub(s: SparkSession, d: String): DataFrame = {
    val pCols = (0 until 6).map(j => s"p_$j")
    val aggs = (0 until 6).map(j =>
      sum(when(col("j") === j, col("c")).otherwise(0L)).as(s"p_$j"))
    val raw = events(s, d)
      .filter(expr(s"ts div 1000 - $fdBaseUs >= 0"))
      .select((col("user_id") % fdRuns).as("run"),
        expr(s"(ts div 1000 - $fdBaseUs) div $fdTrUs").as("t"),
        (col("event_id") % 6).as("j"),
        expr("cast(floor(value * 100 + 0.5D) as bigint)").as("c"))
      .filter(col("t") < fdN)
      .groupBy("run", "t")
      .agg(aggs.head, aggs.tail: _*)
    val grid = s.range(fdRuns).select(col("id").as("run"))
      .crossJoin(s.range(fdN).select(col("id").as("t")))
    fdScrubCore(grid.join(raw, Seq("run", "t"), "left")
      .na.fill(0L, pCols))
  }

  /** The q159 body from a grid-filled (run, t, p_0..p_5) params relation —
    * split out so specs can plant motion traces. */
  private[graft] def fdScrubCore(filled: DataFrame): DataFrame = {
    val diffs = filled.selectExpr(Seq("run", "t") ++ (0 until 6).map(j =>
      s"COALESCE(p_$j - lag(p_$j) OVER (PARTITION BY run ORDER BY t), 0) AS d_$j"): _*)
    val fd = diffs.selectExpr("run", "t", s"$fdStr AS fd_c")
    val med = fd.groupBy("run").agg(expr("percentile(fd_c, 0.5)").as("med"))
    fd.join(broadcast(med), Seq("run"))
      .selectExpr("run", "t", "fd_c",
        s"CASE WHEN $fdSpikeStr THEN 1 ELSE 0 END AS spike")
      .selectExpr("run", "t", "fd_c", "spike",
        "MAX(spike) OVER (PARTITION BY run ORDER BY t " +
          "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS censored")
      .selectExpr("run", "t", "CAST(fd_c AS DOUBLE) / 100.0 AS fd",
        "CAST(spike AS BIGINT) AS spike", "CAST(censored AS BIGINT) AS censored")
      .orderBy("run", "t")
  }

  private val fdScrubSql = {
    val pSel = (0 until 6).map(j =>
      s"SUM(CASE WHEN j = $j THEN c ELSE 0 END) AS p_$j").mkString(",\n|    ")
    val dSel = (0 until 6).map(j =>
      s"COALESCE(p_$j - LAG(p_$j) OVER (PARTITION BY run ORDER BY t), 0) AS d_$j")
      .mkString(",\n|    ")
    s"""WITH raw AS (
       |  SELECT user_id % $fdRuns AS run,
       |    (epoch_us(ts) - $fdBaseUs) // $fdTrUs AS t,
       |    event_id % 6 AS j,
       |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
       |  FROM events
       |  WHERE epoch_us(ts) - $fdBaseUs >= 0
       |), agg AS (
       |  SELECT run, t,
       |    $pSel
       |  FROM raw WHERE t < $fdN GROUP BY run, t
       |), grid AS (
       |  SELECT rs.r AS run, gs.g AS t
       |  FROM generate_series(0, ${fdRuns - 1}) AS rs(r),
       |       generate_series(0, ${fdN - 1}) AS gs(g)
       |), filled AS (
       |  SELECT grid.run, grid.t,
       |    ${(0 until 6).map(j => s"COALESCE(p_$j, 0) AS p_$j").mkString(", ")}
       |  FROM grid LEFT JOIN agg ON agg.run = grid.run AND agg.t = grid.t
       |), diffs AS (
       |  SELECT run, t,
       |    $dSel
       |  FROM filled
       |), fd AS (
       |  SELECT run, t, $fdStr AS fd_c FROM diffs
       |), med AS (
       |  SELECT run, quantile_cont(fd_c, 0.5) AS med FROM fd GROUP BY run
       |), flagged AS (
       |  SELECT fd.run, fd.t, fd_c,
       |    CASE WHEN $fdSpikeStr THEN 1 ELSE 0 END AS spike
       |  FROM fd JOIN med ON med.run = fd.run
       |)
       |SELECT run, t, CAST(fd_c AS DOUBLE) / 100.0 AS fd,
       |  CAST(spike AS BIGINT) AS spike,
       |  CAST(MAX(spike) OVER (PARTITION BY run ORDER BY t
       |    ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS censored
       |FROM flagged
       |ORDER BY run, t""".stripMargin
  }

  override def queries: Seq[Q] = Seq(
    Q("q06_window_lag_diff", windowLagDiff, Some(windowLagDiffSql)),
    Q("q07_zscore_by_user", zscoreByUser, Some(zscoreByUserSql)),
    Q("q16_boxcar_design", boxcarDesign, Some(boxcarDesignSql)),
    Q("q17_asof_join", asofPurchaseClick, Some(asofPurchaseClickSql)),
    Q("q19_tumbling_hourly", tumblingHourly, Some(tumblingHourlySql)),
    Q("q52_sessionize", sessionize, Some(sessionizeSql)),
    Q("q159_fd_scrub", fdScrub, Some(fdScrubSql)),
  )
}

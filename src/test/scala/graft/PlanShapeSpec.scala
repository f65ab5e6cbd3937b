package graft

import org.apache.spark.sql.functions._

/** Physical-plan shape assertions: the performance claims in SCALE.md,
  * locked in as tests so a refactor that silently loses pushdown or a
  * broadcast fails CI, not the bench.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001).queryExecution.executedPlan.toString

  test("q02: filter and projection are pushed into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderstatus), IsNotNull(o_totalprice), EqualTo(o_orderstatus,O)")
      || p.contains("EqualTo(o_orderstatus,O)"), p.take(800))
    // scan reads only the needed columns, not the full orders schema
    assert(p.contains("o_orderpriority") && !p.contains("o_comment"))
  }

  test("q03: dimension joins are broadcast, not shuffled") {
    val p = plan("q03_join_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to SMJ")
  }

  test("q33: mass GLM betas use a broadcast pinv and hash aggregation") {
    val p = plan("q33_mass_glm_betas")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("HashAggregate"))
  }

  test("q16: boxcar has no nested-loop over the timeline×trials product") {
    val p = plan("q16_boxcar_design")
    // bucket expansion: Generate (explode) + hash agg; the only BNLJ-free
    // requirement is that the TRIALS side is never cross-joined in full
    assert(p.contains("Generate"))
    assert(p.contains("HashAggregate"))
  }

  test("asofJoin: simultaneous right row counts (ties at equal ts)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "u", 100L)).toDF("event_id", "user_id", "ts")
    val right = Seq(("u", 100L, 100L), ("u", 90L, 90L))
      .toDF("user_id", "ts", "click_ts")
    val out = graft.timeseries.TimeOps
      .asofJoin(left, right, Seq("user_id"), "ts", Seq("click_ts"))
      .head()
    // at-or-before semantics: the simultaneous row (ts=100) wins
    assert(out.getAs[Long]("asof_click_ts") === 100L)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Library entry point for embedding sessions: one call wires everything a
  * user of the reference pipeline needs to run its workloads here —
  *
  *   - the TopKPerKey logical plan + strategy (sort-free bounded-heap
  *     per-key top-k; rank-window queries rewrite automatically),
  *   - every native expression under `spark.sql` names (poly_hash,
  *     simhash32, seg_dedup, chunk_structs, phash64, dot_fold, t_pvalue,
  *     …) via [[graft.functions.GraftFunctions.registerAll]].
  *
  * Deliberately NOT set here: session-wide configs (timezone, shuffle
  * partitions) — an embedding session owns those; the driver mains
  * (Verify/Bench) set their own. Tables.events normalizes timestamps
  * without touching session state, so nothing below depends on a
  * particular timezone setting.
  *
  * Idempotent: both registrations overwrite prior ones, so calling this
  * per-notebook-cell is safe.
  */
object Graft {
  def install(spark: SparkSession): Unit = {
    graft.plans.TopKPerKey.install(spark)
    graft.functions.GraftFunctions.registerAll(spark)
  }
}

package graft.util

import org.apache.spark.sql.DataFrame

/** Loop-state checkpointing for iterative kernels.
  *
  * `Dataset.localCheckpoint` truncates LINEAGE but carries the ORIGIN
  * plan's statistics onto the resulting LogicalRDD — and Catalyst's
  * size-only stats visitor estimates most multi-child nodes as the
  * PRODUCT of their children's sizeInBytes. An iterative plan that
  * references its own previous state k times per round therefore grows
  * its carried sizeInBytes estimate like k^rounds in DIGIT COUNT — a
  * pure driver-side BigInteger blowup, measured at 9.6 MILLION digits
  * after q239's two Louvain levels (12 rows of data!), where every
  * downstream stats visit then burns tens of seconds inside
  * BigInteger.multiply (jstack-confirmed: ToomCook3 on the Catalyst
  * size visitor's product fold).
  *
  * [[fresh]] rebases the checkpointed RDD through createDataFrame,
  * which resets the estimate to the default constant: stats stay
  * bounded at every round and planning time stays flat across
  * arbitrarily many rounds. The rows pass one Row↔InternalRow
  * conversion — use ONLY for bounded (atlas-class) loop-state
  * relations, which is what the iterative kernels checkpoint anyway.
  * Explicit broadcast() hints at the consumers are unaffected (hints
  * never read the estimate); implicit broadcast decisions were already
  * off for checkpointed state (default-size = above threshold), so
  * physical plans are unchanged — only planning-time arithmetic.
  */
object Loops {
  /** localCheckpoint + stats rebase — see the object scaladoc. */
  def fresh(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Hard ceiling on [[pin]]/[[pinRows]] state size: these are for
    * atlas-class loop state (parcels, modules, BFS layers — ≤ 10⁵-10⁶
    * rows by construction at any data scale), and a loud failure beats a
    * silent driver OOM if a future caller ever hands them something
    * data-sized. */
  val PinMaxRows = 8 * 1000 * 1000

  /** Collect a BOUNDED loop-state relation to the driver and rebuild it
    * as a driver-local relation (LocalRelation), returning the rows too.
    *
    * Why, vs [[fresh]] (r20 optimization round, measured on the graph
    * kernels): an iterative kernel pays per ROUND a fixed driver cost
    * that dwarfs its bounded data — localCheckpoint is one job, the
    * convergence probe (`isEmpty`) a second, and every downstream
    * consumer of the checkpointed RDD schedules scan tasks; under AQE
    * each materialized exchange is its own job. ProbeJobs measured
    * 73-140 single-task jobs per graph query at sf0.1 with task time
    * less than half the wall — the queries were DRIVER-bound. Pinning
    * the round state instead:
    *   - costs the same one job (the collect — and a `broadcast()` of
    *     NP-row state was ALREADY collecting those rows to the driver
    *     to build the broadcast relation, so no new data crosses);
    *   - makes every downstream read plan-local: a LocalRelation
    *     broadcasts with ZERO jobs (LocalTableScan.executeCollect is
    *     driver-local), joins against it need no scan stage, and
    *     `.count()`-style cap derivations become `rows.length`;
    *   - makes the fixed-point probe FREE: callers check the collected
    *     array instead of scheduling an `isEmpty` job per round;
    *   - carries EXACT (tiny) stats, so the sizeInBytes blowup [[fresh]]
    *     exists to stop cannot occur in the first place.
    *
    * At 100 TB nothing changes: loop state stays atlas-bounded (never
    * data-sized — the data-sized prefix is checkpointed BEFORE these
    * loops), and one driver round-trip per round replaces a driver
    * round-trip (broadcast build) plus 2-3 scheduled jobs per round.
    * Contract: bounded relations ONLY — enforced by [[PinMaxRows]]. */
  def pinRows(df: DataFrame): (DataFrame, Array[org.apache.spark.sql.Row]) = {
    // A LocalRelation leaf executes as parallelize(rows, min(rows,
    // defaultParallelism)) — a 12-row loop-state scan would schedule 12
    // trivial tasks (measured: q208 tasks 95 → 267 on the first pin
    // attempt). Inside a pin's own execution (the loop body — the only
    // place pinned state is scanned repeatedly) force single-partition
    // leaves; restore after so data-sized Range leaves elsewhere (the
    // resample output grids) keep their parallelism.
    // Also: everything inside a pin's execution is bounded by this
    // contract, so AQE buys nothing and costs one scheduled job + a
    // logical re-optimization per exchange (measured: 3-4 jobs per loop
    // round where one suffices), and 32-wide shuffles of NP-row state
    // are 31 empty tasks. Run the collect single-partition, non-
    // adaptive; restore the session conf after (data-sized plans
    // outside pins are untouched).
    val sess = df.sparkSession
    val scoped = Seq(
      "spark.sql.leafNodeDefaultParallelism" -> "1",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "1")
    val olds = scoped.map { case (k, _) => k -> sess.conf.getOption(k) }
    scoped.foreach { case (k, v) => sess.conf.set(k, v) }
    val rows =
      try df.collect()
      finally olds.foreach {
        case (k, Some(v)) => sess.conf.set(k, v)
        case (k, None)    => sess.conf.unset(k)
      }
    require(rows.length <= PinMaxRows,
      s"Loops.pin got ${rows.length} rows — not atlas-class loop state")
    val local = sess.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
    (local, rows)
  }

  /** [[pinRows]] when the caller only needs the relation. */
  def pin(df: DataFrame): DataFrame = pinRows(df)._1
}

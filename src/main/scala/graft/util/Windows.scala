package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** The single choke point for UNPARTITIONED windows (r19 advisory).
  *
  * An `orderBy`-only window moves its whole input to ONE partition and
  * sorts it there — the right tool ONLY when the relation is provably
  * BOUNDED (edge lists ≤ NP², calendar hours, observed lifetimes, dFC
  * windows |W|), and a silent scale-killer the moment a data-sized
  * relation reaches one. Every global window in the engine routes
  * through [[boundedGlobalWindow]] so (a) the invariant is stated at
  * the call site in the mandatory `boundedBy` justification, and (b) a
  * grep for `Window.orderBy` outside this file flags any future caller
  * that skipped the proof. Data-sized rankings belong on a partitioned
  * window (`Window.partitionBy(...)`) or the TopKPerKey heap plan.
  */
object Windows {

  /** An unpartitioned, ordered window over a BOUNDED relation.
    * `boundedBy` must state why the input can never be data-sized
    * (e.g. "NP²-bounded edge list", "one row per calendar hour") — it
    * is required, not decorative; an empty proof throws. Chain
    * `.rowsBetween`/`.rangeBetween` on the result as usual. */
  def boundedGlobalWindow(boundedBy: String, orderCols: Column*): WindowSpec = {
    require(boundedBy.trim.length >= 8,
      "state why this relation is bounded (not data-sized) — an " +
        "unpartitioned window single-partitions and sorts its whole input")
    Window.orderBy(orderCols: _*)
  }
}

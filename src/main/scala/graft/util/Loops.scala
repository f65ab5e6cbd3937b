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
}

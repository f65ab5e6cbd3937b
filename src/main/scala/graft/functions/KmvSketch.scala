package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k minimum values) distinct-count sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002; the
  * bottom-k form) over an already-hashed LONG column in [0, P):
  * aggregation state is the k SMALLEST DISTINCT hash values — O(k)
  * forever — and the estimate is (k−1)·P / (h_k + 1) once the sketch is
  * full (exact count while it isn't). The +1 guards the measure-zero
  * h_k = 0 case and keeps the arithmetic pure int64 ((k−1)·P < 2⁶³ for
  * the radix-31 P = 1e9+7 and any practical k).
  *
  * Why it's here: exact `count(DISTINCT x)` shuffles every distinct key
  * — at URL/n-gram cardinality that is a corpus-sized exchange to learn
  * ONE number. KMV's partials are fixed k-longs buffers merged by
  * Spark's partial aggregation: communication O(k × partitions), one
  * job, no key-keyed exchange (the Space-Saving argument, for
  * cardinality instead of frequency).
  *
  * The estimator assumes the hash is ~uniform over [0, p). Feed it a
  * hash that natively lives in [0, p) (the radix-31 polyHash) or a
  * ≥63-bit hash reduced mod p (bias ~p/2⁶³, negligible) — reducing a
  * 32-bit hash mod p ≈ 2³¹/2.15 is visibly non-uniform and skews the
  * estimate by tens of percent (ProbeSpaceSaving demonstrates both).
  *
  * DETERMINISM — the property the frequency sketch can't have: the k
  * smallest distinct values of a SET are partition- and order-free, so
  * the sketch (and its estimate) is bit-identical under ANY partitioning
  * in BOTH regimes, and the DuckDB oracle replays it exactly
  * (ROW_NUMBER over distinct hashes). The error bound (~1/√k relative)
  * applies to the estimate vs the TRUE count, not between runs. */
case class KmvDistinct(
    child: Expression,
    k: Int,
    p: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_distinct: k must be >= 2, got $k")
  require(p > 0 && (k - 1).toLong <= Long.MaxValue / p,
    s"kmv_distinct: (k-1)*p must fit int64, got k=$k p=$p")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) buf.remove(buf.last())
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  /** Exact size while under k; (k−1)·P / (h_k + 1) once full. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else (k - 1).toLong * p / (buf.last() + 1L)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new java.util.TreeSet[java.lang.Long]()
    while (bb.hasRemaining) out.add(bb.getLong)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
  override def prettyName: String = "kmv_distinct"
}

object KmvDistinct {
  /** `kmv_distinct(hashCol, k, p)`: bottom-k distinct-count estimate of a
    * long hash column uniform in [0, p). */
  def kmv_distinct(c: Column, k: Int, p: Long): Column =
    ColumnBridge.column(
      KmvDistinct(ColumnBridge.expression(c), k, p).toAggregateExpression())
}

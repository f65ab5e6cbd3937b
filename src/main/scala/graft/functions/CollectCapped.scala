package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded collect: gathers at most `cap + 1` non-null LONG values per
  * group and then stops accepting — aggregation state is O(cap) no matter
  * how many rows the group has. A result array of size > cap means the
  * group OVERFLOWED (its true cardinality exceeds the cap); callers filter
  * those out with `size(...) <= cap`.
  *
  * Built for the capped inverted-index join (DedupOps.jaccardDupPairs):
  * a boilerplate shingle appearing in 100M documents must not materialize a
  * 100M-element posting list in one aggregation buffer — with the cap the
  * buffer tops out at cap+1 longs, map-side partial aggregation truncates
  * early, and shuffled partial buffers are ≤ 8·(cap+1) bytes. This is the
  * §2.11 "native aggregate" tier: the df-count + anti-join formulation
  * (two extra exchanges) collapses into the one groupBy.
  *
  * Element ORDER is aggregation-order dependent (like collect_list);
  * callers must not depend on it — the dedup path explodes to pairs and
  * aggregates per-pair counts, which is order-free.
  */
case class CollectCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] with UnaryLike[Expression] {

  require(cap >= 1 && cap < Int.MaxValue,
    s"collect_capped cap must be in [1, Int.MaxValue), got $cap (cap + 1 must not overflow)")

  private val limit = cap + 1

  override def createAggregationBuffer(): ArrayBuffer[Long] = new ArrayBuffer[Long]

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    if (buf.length < limit) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (b1.length < limit && i < b2.length) { b1 += b2(i); i += 1 }
    b1
  }

  override def eval(buf: ArrayBuffer[Long]): Any = new GenericArrayData(buf.toArray)

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new ArrayBuffer[Long](bytes.length / 8)
    while (bb.hasRemaining) out += bb.getLong
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): CollectCapped =
    copy(child = newChild)
  override def prettyName: String = "collect_capped"
}

object CollectCapped {
  /** `collect_capped(col, cap)`: array of up to cap+1 longs; size > cap
    * signals overflow (true group cardinality exceeds cap). */
  def collect_capped(c: Column, cap: Int): Column =
    ColumnBridge.column(
      CollectCapped(ColumnBridge.expression(c), cap).toAggregateExpression())
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Element-wise EXACT fixed-point sum of an `array<double>` column: each
  * coordinate is scaled by `scale`, rounded half-away-from-zero to a long
  * (DuckDB `round` semantics), and summed per element in int64 — integer
  * addition commutes, so the result is independent of partitioning and
  * aggregation order, unlike a double sum. Aggregation state is one long
  * per dimension (d longs total) regardless of group size; partial
  * buffers partial-combine map-side like any hash aggregate.
  *
  * Built for distributed k-means (SimilarityOps.kmeansCentroids): the
  * per-cluster coordinate sums are the whole reduce step of a Lloyd
  * iteration, and exactness makes the trained centroids reproducible in
  * any engine — the DuckDB oracle mirrors the same round+sum integers.
  * Null or length-mismatched input arrays are rejected (a corpus with
  * ragged embeddings is a data error, not a numeric one).
  */
case class VecSumFixed(
    child: Expression,
    scale: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(scale >= 1, s"vec_sum_fixed scale must be >= 1, got $scale")

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def fixed(x: Double): Long = {
    val a = x * scale
    // half away from zero, matching DuckDB round() (Math.round is half
    // toward +inf, which differs for negative .5 ties)
    math.copySign(math.floor(math.abs(a) + 0.5), a).toLong
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      // a zero-length vector would be indistinguishable from the empty
      // buffer sentinel and silently vanish from the sum — reject it like
      // any other ragged input
      require(n > 0, "vec_sum_fixed: empty input array")
      val out = if (buf.isEmpty) new Array[Long](n) else buf
      require(out.length == n,
        s"vec_sum_fixed: ragged input (expected ${out.length} elements, got $n)")
      var j = 0
      while (j < n) { out(j) += fixed(arr.getDouble(j)); j += 1 }
      out
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      require(b1.length == b2.length,
        s"vec_sum_fixed: merging buffers of ${b1.length} and ${b2.length} elements")
      var j = 0
      while (j < b1.length) { b1(j) += b2(j); j += 1 }
      b1
    }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var j = 0
    while (bb.hasRemaining) { out(j) = bb.getLong; j += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumFixed =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumFixed =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(newChild: Expression): VecSumFixed =
    copy(child = newChild)
  override def prettyName: String = "vec_sum_fixed"
}

object VecSumFixed {
  /** `vec_sum_fixed(col, scale)`: array<long> of per-element sums of
    * round(x·scale), exact and aggregation-order-free. */
  def vec_sum_fixed(c: Column, scale: Long): Column =
    ColumnBridge.column(
      VecSumFixed(ColumnBridge.expression(c), scale).toAggregateExpression())
}

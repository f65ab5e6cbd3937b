package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Packs a long (t, y) series into a FIXED n-slot long array per group:
  * slot t accumulates Σy of that timepoint, absent timepoints stay 0 —
  * the dense zero-filled series the mass GLM is defined over, in one
  * aggregation whose state is n longs regardless of row count or order
  * (integer addition commutes). Rows with t outside [0, n) are ignored,
  * matching the join-on-design behavior of the classic path.
  *
  * This is the shuffle-shape fix for mass regression at scale: the classic
  * per-(group, j) formulation materializes k rows per observation through
  * the aggregate (k× the data), while the packed form shuffles each
  * series ONCE and computes all k regressors' sums as projections
  * ([[DotSlots]]) on the packed array.
  */
case class SeriesSlots(
    left: Expression,
    right: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  require(n >= 1, s"series_slots n must be >= 1, got $n")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val tv = left.eval(input)
    val yv = right.eval(input)
    if (tv != null && yv != null) {
      val t = tv.asInstanceOf[Long]
      if (t >= 0 && t < n)
        buf(t.toInt) = Math.addExact(buf(t.toInt), yv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { b1(i) = Math.addExact(b1(i), b2(i)); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): SeriesSlots =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SeriesSlots =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SeriesSlots =
    copy(left = l, right = r)
  override def prettyName: String = "series_slots"
}

/** Exact int64 dot product of two long arrays (Math.multiplyExact /
  * addExact — overflow is a LOUD error, never a silent wrap, mirroring
  * ANSI decimal behavior). Used with a packed series on one side and a
  * driver-literal fixed-point weight row on the other: every per-regressor
  * sum of the mass GLM becomes one codegen'd projection. */
case class DotSlots(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_slots"
  override def nullSafeEval(a: Any, b: Any): Any =
    DotSlots.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotSlots.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DotSlots {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"dot_slots length mismatch: $n vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    acc
  }

  /** All k dots of `ys` against the rows of a nested k×n long array, as one
    * array<long>. Same exact (Math.*Exact) arithmetic as [[dot]] per row. */
  def dotRows(ys: ArrayData, rows: ArrayData): ArrayData = {
    val k = rows.numElements()
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      out(j) = dot(ys, rows.getArray(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** All k exact int64 dot products of one packed series against a k×n nested
  * weight array, in ONE expression whose generated code is a single helper
  * call — O(1) code size in k. The unrolled form (k separate [[DotSlots]] +
  * `element_at` + decimal-rescale chains in one projection) grows the
  * whole-stage-codegen `processNext()` past the JVM's 64 KB method limit at
  * k = 40, silently dropping the flagship GLM stage to interpreted eval;
  * this collapses the k-fan-out into a loop (FlagshipCodegenSpec pins the
  * stage compiling under `spark.sql.codegen.fallback=false`). */
case class DotSlotsRows(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dot_slots_rows"
  override def nullSafeEval(a: Any, b: Any): Any =
    DotSlots.dotRows(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotSlots.dotRows($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SeriesSlots {
  /** `series_slots(t, y, n)`: n-slot exact long accumulation by t. */
  def series_slots(t: Column, y: Column, n: Int): Column =
    ColumnBridge.column(
      SeriesSlots(ColumnBridge.expression(t), ColumnBridge.expression(y), n)
        .toAggregateExpression())

  /** `dot_slots(a, b)`: exact int64 dot of two long arrays. */
  def dot_slots(a: Column, b: Column): Column =
    ColumnBridge.column(DotSlots(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `dot_slots_rows(ys, rows)`: all k exact int64 dots of `ys` against the
    * rows of a k×n nested long array, as array<long>. */
  def dot_slots_rows(ys: Column, rows: Column): Column =
    ColumnBridge.column(DotSlotsRows(ColumnBridge.expression(ys), ColumnBridge.expression(rows)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expressions for the embedding hot path (q27/q28/q29/q49):
  * the left-fold dot product and the sign-LSH bucket id.
  *
  * The interpreted higher-order-function forms in SimilarityOps
  * (`aggregate(zip_with(...))`) remain the executable spec the DuckDB oracle
  * mirrors — these expressions produce the SAME IEEE-754 double sequence
  * (acc = (acc + a_i·b_i) in array order), pinned by NativeTextSpec's
  * dot_fold/sign_bucket tests, while
  * staying inside whole-stage codegen and allocating nothing per row (the
  * HOF form materializes a zipped array per evaluated pair — ruinous on a
  * |queries|×|corpus| broadcast join).
  */
object VectorExprs {

  /** Left-fold dot product in array order — ((0 + a0·b0) + a1·b1) + …,
    * exactly the `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)` sequence.
    * Public static so generated code can call it. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Sign bucket: bit k set iff v[k] > 0, for k < nBits. */
  def signBucket(v: ArrayData, nBits: Int): Long = {
    var acc = 0L
    var i = 0
    val n = math.min(nBits, v.numElements())
    while (i < n) { if (v.getDouble(i) > 0.0) acc |= (1L << i); i += 1 }
    acc
  }

  private val V = "graft.functions.VectorExprs"

  /** dot_fold(a, b): null when lengths differ (the zip_with form yields null
    * there via null-padding); otherwise the in-order fold. */
  case class DotFold(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "dot_fold"
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      if (x.numElements() != y.numElements()) null else dot(x, y)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $V.dot($a, $b);
        }""")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** sign_bucket(v): int64 whose low bits are the signs of the leading
    * coordinates (axis-aligned random-projection LSH). */
  case class SignBucket(child: Expression, nBits: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "sign_bucket"
    override def nullSafeEval(v: Any): Any = signBucket(v.asInstanceOf[ArrayData], nBits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$V.signBucket($c, $nBits)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def dot_fold(a: Column, b: Column): Column =
    ColumnBridge.column(DotFold(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sign_bucket(v: Column, nBits: Int): Column =
    ColumnBridge.column(SignBucket(ColumnBridge.expression(v), nBits))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Native expressions over opaque `binary` media payloads (SURVEY.md §8b
  * multimodal plumbing): the resize step of the decode → feature-extract →
  * resize → frame-sample chain, as a binary → binary per-row projection
  * that never leaves the scan stage.
  *
  * `blockResize` is the deterministic stand-in for an image/audio
  * downsampler: keep the first `keep` bytes of every `block`-byte block
  * (a stride-decimation — the real decoder swap point, same
  * signature/schema). One pass, one output allocation, codegen'd.
  */
object BinaryExprs {

  /** Stride decimation: first `keep` bytes of each `block`-byte block,
    * including a short tail block. */
  def blockResize(b: Array[Byte], block: Int, keep: Int): Array[Byte] = {
    val n = b.length
    val full = n / block
    val rem = n % block
    val tail = math.min(rem, keep)
    val out = new Array[Byte](full * keep + tail)
    var i = 0
    var o = 0
    while (i < full) {
      System.arraycopy(b, i * block, out, o, keep)
      o += keep
      i += 1
    }
    if (tail > 0) System.arraycopy(b, full * block, out, o, tail)
    out
  }

  case class BlockResize(child: Expression, block: Int, keep: Int)
      extends UnaryExpression {
    require(block >= 1 && keep >= 1 && keep <= block,
      s"need 1 <= keep <= block, got block=$block keep=$keep")
    override def dataType: DataType = BinaryType
    override def prettyName: String = "block_resize"
    override def nullSafeEval(v: Any): Any =
      blockResize(v.asInstanceOf[Array[Byte]], block, keep)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.BinaryExprs.blockResize($c, $block, $keep)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def block_resize(c: Column, block: Int, keep: Int): Column =
    ColumnBridge.column(BlockResize(ColumnBridge.expression(c), block, keep))
}

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

  // ---- perceptual hash ----------------------------------------------------

  case class Phash32(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def prettyName: String = "phash32"
    override def nullSafeEval(v: Any): Any =
      Phash.phash32(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Phash.phash32($c)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** `phash32(payload)`: 32-bit blocked-DCT perceptual hash of a binary
    * column. */
  def phash32(c: Column): Column =
    ColumnBridge.column(Phash32(ColumnBridge.expression(c)))

  case class Phash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def prettyName: String = "phash64"
    override def nullSafeEval(v: Any): Any =
      Phash.phash64(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Phash.phash64($c)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** `phash64(payload)`: 64-bit blocked-DCT perceptual hash of a binary
    * column — the production width (16-bit Hamming bands → 65k bucket
    * values, vs phash32's 256). */
  def phash64(c: Column): Column =
    ColumnBridge.column(Phash64(ColumnBridge.expression(c)))
}

/** 1-D pHash over a binary payload (the blocked-DCT sign hash of Zauner's
  * pHash, in the byte-stream domain): average-pool the payload onto a
  * fixed 64-block grid (the "resize to canonical size" step — this is what
  * buys robustness to re-encoding/decimation that an exact content hash
  * lacks), take a 64-point DCT-II, and keep the SIGNS of the 32 lowest
  * non-DC coefficients as a 32-bit fingerprint. The invariance is a
  * property of signals WITH low-frequency structure (images, audio
  * envelopes): PhashSpec demonstrates survival of block_resize decimation
  * on smooth payloads, and near-total sign scrambling on ASCII text, whose
  * block means are noise — exactly the content pHash is designed to look
  * through.
  *
  * Every step is exact int64 arithmetic so the DuckDB oracle replays it
  * bit for bit: block means are floor((Σ bytes)·1e6 / width), and the
  * cosine kernel is quantized once to ×1e6 integers ([[kernel]], emitted
  * into the oracle SQL as literals — no libm call crosses an engine
  * boundary, the q51/W4 fixed-point discipline). |K·m| ≤ 1e6·255e6·64 ≈
  * 1.6e16, well inside int64.
  *
  * Scale shape: a per-row projection in the scan stage, payloads never
  * shuffle; downstream near-dup machinery moves 8-byte fingerprints only.
  * Top-level object so generated code can call
  * `graft.functions.Phash.phash32` (Janino cannot resolve a nested Scala
  * object through the Java-style path). */
object Phash {
  val Grid = 64
  val Bits = 32
  val MeanScale = 1000000L

  /** 64-bit production geometry: 128 pooling blocks so all 64 kept
    * coefficients are non-degenerate (at Grid = Bits the k = Bits DCT row
    * is cos((2b+1)π/2) = 0 identically — the highest bit would never
    * fire). |K·m| ≤ 1e6 · 255e6 · 128 ≈ 3.3e16, still well inside int64. */
  val Grid64 = 128
  val Bits64 = 64

  private def mkKernel(bits: Int, grid: Int): Array[Array[Long]] =
    Array.tabulate(bits, grid)((k, b) =>
      math.rint(math.cos(math.Pi * (k + 1) * (2 * b + 1) / (2.0 * grid)) * 1e6).toLong)

  /** K(k)(b) = round(cos(π·(k+1)·(2b+1)/(2·Grid)) · 1e6). */
  lazy val kernel: Array[Array[Long]] = mkKernel(Bits, Grid)
  lazy val kernel64: Array[Array[Long]] = mkKernel(Bits64, Grid64)

  private def phashImpl(bytes: Array[Byte], bits: Int, grid: Int,
      kern: Array[Array[Long]]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val m = new Array[Long](grid)
    var b = 0
    while (b < grid) {
      val lo = (b.toLong * n / grid).toInt
      val hi = ((b + 1).toLong * n / grid).toInt
      if (hi > lo) {
        var s = 0L
        var i = lo
        while (i < hi) { s += bytes(i) & 0xff; i += 1 }
        m(b) = s * MeanScale / (hi - lo)
      }
      b += 1
    }
    var hash = 0L
    var k = 0
    while (k < bits) {
      val kr = kern(k)
      var c = 0L
      var bb = 0
      while (bb < grid) { c += kr(bb) * m(bb); bb += 1 }
      if (c > 0) hash |= (1L << k)
      k += 1
    }
    hash
  }

  def phash32(bytes: Array[Byte]): Long = phashImpl(bytes, Bits, Grid, kernel)

  /** 64-bit variant (sign bit = coefficient 64 — the Long wraps negative
    * when it fires; band extraction masks after the arithmetic shift so
    * signedness never leaks into bucket keys). */
  def phash64(bytes: Array[Byte]): Long = phashImpl(bytes, Bits64, Grid64, kernel64)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Audio fingerprint over a binary payload — the Haitsma–Kalker family
  * ("A highly robust audio fingerprint system", ISMIR 2002) in the
  * byte-stream domain, completing the modality set (text shingles, image
  * pHash, video keyframes → AUDIO): treat the payload as 8-bit PCM
  * samples, lay a FIXED grid of [[Afp.Frames]]+1 frames over it
  * (canonical-duration resample — the robustness-to-re-encoding step,
  * like pHash's 64-block pooling), split each frame into [[Afp.Bands]]
  * interleaved sample stripes (the deterministic integer stand-in for HK's
  * spectral bands), and keep the SIGN of the band-energy second
  * difference — bit(f,b) = [ (E(f,b)−E(f,b+1)) − (E(f−1,b)−E(f−1,b+1)) >
  * 0 ] — HK's actual sub-fingerprint rule. 8 frame deltas × 3 band deltas
  * = a 24-bit integer fingerprint.
  *
  * Every step is exact int64 arithmetic (energies are sums of byte², ≤
  * 255²·len — int64-safe to exabyte payloads), so the DuckDB oracle
  * replays it bit for bit in the char domain (ASCII stand-in guard, the
  * established media-oracle discipline). Scale shape: a per-row
  * projection in the scan stage — payloads never shuffle; downstream
  * dedup moves 8-byte fingerprints only.
  *
  * Top-level object so generated code can call
  * `graft.functions.Afp.afp24` (the Janino path rule). */
object Afp {
  /** Frame deltas in the fingerprint (grid has Frames+1 frames). */
  val Frames = 8
  /** Interleaved band stripes per frame (Bands−1 band deltas). */
  val Bands = 4
  /** Fingerprint width = Frames · (Bands − 1). */
  val FpBits: Int = Frames * (Bands - 1)

  def afp24(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val nf = Frames + 1
    val e = Array.ofDim[Long](nf, Bands)
    var i = 0
    while (i < n) {
      val v = (bytes(i) & 0xff).toLong
      e((i.toLong * nf / n).toInt)(i % Bands) += v * v
      i += 1
    }
    var h = 0L
    var f = 1
    while (f < nf) {
      var b = 0
      while (b < Bands - 1) {
        val d = (e(f)(b) - e(f)(b + 1)) - (e(f - 1)(b) - e(f - 1)(b + 1))
        if (d > 0) h |= 1L << ((f - 1) * (Bands - 1) + b)
        b += 1
      }
      f += 1
    }
    h
  }

  case class Afp24(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "afp24"
    override def nullSafeEval(v: Any): Any =
      Afp.afp24(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Afp.afp24($c)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** `afp24(payload)`: the 24-bit Haitsma–Kalker-style audio fingerprint
    * of a binary column. */
  def afp24(c: Column): Column =
    ColumnBridge.column(Afp24(ColumnBridge.expression(c)))
}

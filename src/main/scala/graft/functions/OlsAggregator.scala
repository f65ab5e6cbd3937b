package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass typed OLS aggregator (SURVEY.md §2.11, the M1 fallback
  * path): folds (x, y) pairs into exact running moments and emits
  * (n, beta0, beta1) — the Dataset-typed twin of GlmOps.simpleOLS for
  * callers that want `ds.groupByKey(...).agg(OlsAggregator.toColumn)`.
  *
  * The buffer is algebraic (sums only) so Spark's partial aggregation
  * merges are associative; double moments here mean the result can differ
  * from the DECIMAL-exact path in the last ulp across partitionings — use
  * simpleOLS where cross-engine bit-parity matters.
  */
object OlsAggregator extends Aggregator[(Double, Double), OlsBuffer, OlsFit] {

  override def zero: OlsBuffer = OlsBuffer(0L, 0.0, 0.0, 0.0, 0.0)

  override def reduce(b: OlsBuffer, xy: (Double, Double)): OlsBuffer = {
    val (x, y) = xy
    OlsBuffer(b.n + 1, b.sx + x, b.sy + y, b.sxx + x * x, b.sxy + x * y)
  }

  override def merge(a: OlsBuffer, b: OlsBuffer): OlsBuffer =
    OlsBuffer(a.n + b.n, a.sx + b.sx, a.sy + b.sy, a.sxx + b.sxx, a.sxy + b.sxy)

  override def finish(b: OlsBuffer): OlsFit = {
    val n = b.n.toDouble
    val den = n * b.sxx - b.sx * b.sx
    if (b.n < 2 || den == 0.0) OlsFit(b.n, Double.NaN, Double.NaN)
    else {
      val beta1 = (n * b.sxy - b.sx * b.sy) / den
      OlsFit(b.n, (b.sy - beta1 * b.sx) / n, beta1)
    }
  }

  override def bufferEncoder: Encoder[OlsBuffer] = Encoders.product[OlsBuffer]
  override def outputEncoder: Encoder[OlsFit] = Encoders.product[OlsFit]
}

final case class OlsBuffer(n: Long, sx: Double, sy: Double, sxx: Double, sxy: Double)
final case class OlsFit(n: Long, beta0: Double, beta1: Double)

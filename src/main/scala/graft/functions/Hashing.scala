package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's polynomial hashes — the
  * codegen-era answer to the interpreted higher-order-function folds in
  * TextOps (same values bit-for-bit; the HOF forms remain the executable
  * spec mirrored by the DuckDB oracle, and HashingSpec pins equality).
  *
  * All three run a tight JVM loop per row with no lambda dispatch or
  * per-element boxing — the hot path of shingling 10^9 documents.
  * Character semantics: per-char `codePointAt` (matches `ascii()` /
  * DuckDB `ord()` for BMP text; corpus contract is ASCII/BMP).
  */
object Hashing {

  val P = 1000000007L

  @inline private[functions] def foldString(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** fold(chars, 0, (acc, c) => (acc·31 + ord(c)) mod P) */
  case class PolyHashString(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "poly_hash"
    override def nullSafeEval(v: Any): Any = foldString(v.asInstanceOf[UTF8String])
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** fold(longs, 0, (acc, h) => (acc·31 + h) mod P) over array<long>. */
  case class PolyHashLongs(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "poly_hash_longs"
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      var acc = 0L
      var i = 0
      val n = arr.numElements()
      while (i < n) { acc = (acc * 31 + arr.getLong(i)) % P; i += 1 }
      acc
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** min over i of fold(substring(s, i, k)) — the winnowing-style minimum
    * k-gram hash, one pass, no per-window allocation. Returns fold(s) when
    * len(s) < k (mirrors TextOps.fingerprints). */
  case class MinGramHash(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "min_gram_hash"
    override def nullSafeEval(s: Any, kAny: Any): Any = {
      val str = s.asInstanceOf[UTF8String].toString
      val k = kAny.asInstanceOf[Int]
      val n = str.length
      if (n < k) foldString(UTF8String.fromString(str))
      else {
        var best = Long.MaxValue
        var i = 0
        while (i + k <= n) {
          var acc = 0L
          var j = i
          while (j < i + k) { acc = (acc * 31 + str.charAt(j)) % P; j += 1 }
          if (acc < best) best = acc
          i += 1
        }
        best
      }
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def poly_hash(c: Column): Column = ColumnBridge.column(PolyHashString(ColumnBridge.expression(c)))
  def poly_hash_longs(c: Column): Column = ColumnBridge.column(PolyHashLongs(ColumnBridge.expression(c)))
  def min_gram_hash(c: Column, k: Column): Column =
    ColumnBridge.column(MinGramHash(ColumnBridge.expression(c), ColumnBridge.expression(k)))
}

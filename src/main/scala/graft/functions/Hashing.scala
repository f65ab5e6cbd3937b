package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's polynomial hashes — the
  * codegen-era answer to the interpreted higher-order-function folds in
  * TextOps (same values bit-for-bit; the HOF forms remain the executable
  * spec mirrored by the DuckDB oracle, and HashingSpec pins equality).
  *
  * Each expression implements `doGenCode` by emitting a call to the static
  * fold helpers below, so the surrounding projection stays inside ONE
  * whole-stage-codegen span (no lambda dispatch, no interpreter
  * re-entry) — the preference order of SURVEY.md §2.11: native Expression
  * with codegen > UDF > anything else.
  *
  * Character semantics: per-char `codePointAt` (matches `ascii()` /
  * DuckDB `ord()` for BMP text; corpus contract is ASCII/BMP).
  */
object Hashing {

  val P = 1000000007L

  /** fold(chars, 0, (acc, c) => (acc·31 + ord(c)) mod P) — public static
    * so generated code can call it. */
  def foldString(s: UTF8String): Long = {
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

  /** fold(longs, 0, (acc, h) => (acc·31 + h) mod P). */
  def foldLongs(arr: ArrayData): Long = {
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) { acc = (acc * 31 + arr.getLong(i)) % P; i += 1 }
    acc
  }

  /** min over i of fold(substring(s, i, k)); fold(s) when len < k.
    * Windows and folds are over CODE POINTS (like foldString, Spark
    * `substring`/`length`, and DuckDB `substring`/`ord`) so the value is
    * well-defined beyond the BMP, not just on the ASCII corpus contract. */
  def minGram(s: UTF8String, k: Int): Long = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < k) foldString(s)
    else {
      var best = Long.MaxValue
      var i = 0
      while (i + k <= n) {
        var acc = 0L
        var j = i
        while (j < i + k) { acc = (acc * 31 + cps(j)) % P; j += 1 }
        if (acc < best) best = acc
        i += 1
      }
      best
    }
  }

  private val H = "graft.functions.Hashing"

  case class PolyHashString(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "poly_hash"
    override def nullSafeEval(v: Any): Any = foldString(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$H.foldString($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class PolyHashLongs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "poly_hash_longs"
    override def nullSafeEval(v: Any): Any = foldLongs(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$H.foldLongs($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  case class MinGramHash(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "min_gram_hash"
    override def nullSafeEval(s: Any, kAny: Any): Any =
      minGram(s.asInstanceOf[UTF8String], kAny.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (s, k) => s"$H.minGram($s, $k)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def poly_hash(c: Column): Column = ColumnBridge.column(PolyHashString(ColumnBridge.expression(c)))
  def poly_hash_longs(c: Column): Column = ColumnBridge.column(PolyHashLongs(ColumnBridge.expression(c)))
  def min_gram_hash(c: Column, k: Column): Column =
    ColumnBridge.column(MinGramHash(ColumnBridge.expression(c), ColumnBridge.expression(k)))
}

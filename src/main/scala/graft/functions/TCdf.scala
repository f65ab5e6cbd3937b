package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import graft.glm.TDist

/** Native Catalyst expression for the two-sided Student-t p-value
  * (SURVEY.md §2.6 M3, §4 "custom Catalyst work"): evaluated inside the
  * operator pipeline with no UDF serialization overhead; doGenCode emits a
  * direct static call into TDist, so the surrounding projection stays in
  * one whole-stage-codegen span.
  *
  * p = I_{df/(df+t²)}(df/2, 1/2); NULL propagates from either input.
  */
// inputs must already be DoubleType (the Column API and SQL registration
// sites guarantee it; Catalyst's implicit casts handle literals)
case class TPValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "t_pvalue"

  override def nullSafeEval(t: Any, df: Any): Any =
    TDist.pTwoSided(t.asInstanceOf[Double], df.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, df) => s"graft.glm.TDist.pTwoSided($t, $df)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TCdf {

  private val eu = org.apache.spark.sql.graft.ColumnBridge

  /** Column API: two-sided p-value of t with df degrees of freedom.
    * (Spark 4 Column wraps a ColumnNode; ExpressionUtils is the classic
    * bridge both ways.) */
  def t_pvalue(t: Column, df: Column): Column =
    eu.column(TPValue(eu.expression(t), eu.expression(df)))

  /** Register `t_pvalue(t, df)` for SQL use in a session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "t_pvalue", exprs => TPValue(exprs.head, exprs(1)), "scala_udf")
}

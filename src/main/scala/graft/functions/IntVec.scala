package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Fused integer vector arithmetic. The declarative form
  * (`zip_with` + `aggregate`, [[graft.similarity.Centroids]]) is
  * CodegenFallback in Spark — every row pays lambda interpretation and
  * a materialized intermediate array per evaluation, which dominates
  * all-pairs scans (millions of distance evaluations). This expression
  * accumulates the squared L2 distance in one generated-code loop per
  * row; arithmetic is identical long ops in identical order, so the
  * declarative twin and this one are value-equal (spec'd).
  */
object IntVec {

  /** Σ(a_i − b_i)² over the common prefix of two long arrays. */
  def sqDistLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

/** Long squared-L2 distance of two array<long> columns (codegen'd). */
case class SqDistLongExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntVec.sqDistLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.IntVec.sqDistLong($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLongExpr =
    copy(left = newLeft, right = newRight)
}

object SqDistLong {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      SqDistLongExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}

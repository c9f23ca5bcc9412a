package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused float/double vector cosine. The declarative formulation
  * ([[graft.similarity.Ann.cosineDeclarative]]) composes `zip_with` +
  * `aggregate` — higher-order functions are CodegenFallback in Spark:
  * every row pays interpreted lambda dispatch and per-element boxing
  * over every dimension, THREE times (dot, both self-norms). This
  * expression accumulates all three sums in one generated-code call
  * per row — the [[Int8CosineExpr]] treatment applied to the plain
  * float cosine, which is the verify arithmetic on EVERY pairwise
  * path in the similarity stack (knnJoin ground truth, semdedup cell
  * verify, LSH candidate scoring, hard negatives, recall curves).
  *
  * Arithmetic is bit-identical to the declarative twin: the dot and
  * both norms accumulate left-to-right in double from the same
  * element casts, the denominator is the same `sqrt(naa) * sqrt(nbb)`
  * product, and the `when(den === 0.0, 0.0)` zero-vector rule and
  * null semantics are replicated exactly (either side null → null;
  * a null ELEMENT nulls that side's norm and therefore the result;
  * unequal lengths null the zip_with dot, so the result is null
  * unless the denominator is zero first — the declarative order of
  * evaluation). Equivalence is spec'd (PipelineSpec), and every
  * cosine-bearing DuckDB oracle holds for either form.
  */
case class VecCosineExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_cosine needs array<float|double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.cosineOrNull(a.asInstanceOf[ArrayData], elemIsFloat(left),
      b.asInstanceOf[ArrayData], elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cos")
      s"""
         |java.lang.Double $tmp = graft.functions.VecMath.cosineOrNull(
         |  $a, ${elemIsFloat(left)}, $b, ${elemIsFloat(right)});
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosineExpr =
    copy(left = newLeft, right = newRight)
}

object VecMath {

  /** Column factory for [[VecCosineExpr]]. */
  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(VecCosineExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Self-dot Σ xᵢ², left to right in double; null when any element is
    * null (the zip_with(x, x) product-null propagation).
    */
  private def selfDot(x: ArrayData, isFloat: Boolean): java.lang.Double = {
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      acc += v * v
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Cosine with the exact declarative-twin semantics (see
    * [[VecCosineExpr]]); called from generated code. Boxed return is
    * one allocation per ROW vs the interpreted fold's per-ELEMENT
    * lambda boxing.
    */
  def cosineOrNull(a: ArrayData, aFloat: Boolean,
      b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val naa = selfDot(a, aFloat)
    val nbb = selfDot(b, bFloat)
    val den: java.lang.Double =
      if (naa == null || nbb == null) null
      else java.lang.Double.valueOf(
        math.sqrt(naa.doubleValue()) * math.sqrt(nbb.doubleValue()))
    // when(den === 0.0, 0.0): a null denominator falls through to the
    // otherwise branch (three-valued compare), so the order matters
    if (den != null && den.doubleValue() == 0.0)
      return java.lang.Double.valueOf(0.0)
    if (den == null) return null
    val n = a.numElements()
    if (n != b.numElements()) return null // zip_with pad → null product
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc / den.doubleValue())
  }
}

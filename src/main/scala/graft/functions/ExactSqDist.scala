package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, DoubleType, FloatType}

/** Native Catalyst expression for the exact (order-invariant) squared-L2
  * distance of two numeric arrays — the PQ encode/ADC hot scalar
  * ([[ExactDotProduct]]'s sibling).
  *
  * Unlike `exact_dot`, this RETURNS THE DECIMAL (scale-18 capture sum,
  * no final double rounding): PQ's encode argmin compares these values
  * and its ADC adds m of them per candidate, so exactness must survive
  * past this expression; callers snap once at the output edge.
  * Semantics match the declarative
  * `aggregate(zip_with(a,b,(x,y) => ((x-y)*(x-y)).cast(DECIMAL(28,18))), 0, +)`
  * and the ANSI `SUM(CAST((a[i]-b[i])*(a[i]-b[i]) AS DECIMAL(38,18)))`:
  * IEEE double subtraction and multiplication, shortest-repr HALF_UP
  * capture at scale 18, exact decimal sum.
  */
case class ExactSqDist(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DecimalType(38, 18)

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"exact_sqdist expects array<float|double> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ExactSqDist.compute(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ExactSqDist.compute($a, ${isFloat(left)}, $b, ${isFloat(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExactSqDist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "exact_sqdist"
}

object ExactSqDist {

  /** Null elements and length overhang are SKIPPED (the
    * [[ExactDotProduct.compute]] convention — see its scaladoc for the
    * deliberate divergence from the null-padding HOF on degenerate
    * inputs; every PQ input is a dense equal-length slice).
    */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Decimal = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        val d = x - y
        acc = acc.add(JBigDecimal.valueOf(d * d).setScale(18, RoundingMode.HALF_UP))
      }
      i += 1
    }
    Decimal(acc, 38, 18)
  }
}

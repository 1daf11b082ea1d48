package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the exact (order-invariant) dot product
  * of two numeric arrays — the hot scalar of every similarity query.
  *
  * Semantics are identical to the declarative form
  * `aggregate(zip_with(a, b, (x,y) => (x*y).cast(DECIMAL(28,18))), 0, +)`
  * and to the ANSI `SUM(CAST(a[i]*b[i] AS DECIMAL(38,18)))`: each IEEE
  * double product is captured at scale 18 (`BigDecimal.valueOf` =
  * shortest-repr conversion, HALF_UP — exactly Spark's double→decimal
  * cast), summed exactly, and rounded once to double. The higher-order-
  * function form evaluates an interpreted expression tree per element;
  * this expression compiles to one static call inside whole-stage
  * codegen, keeping the projection fused.
  */
case class ExactDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"exact_dot expects array<float|double> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  /** float/double array discrimination (types validated at analysis by
    * [[checkInputDataTypes]]).
    */
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ExactDotProduct.compute(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ExactDotProduct.compute($a, ${isFloat(left)}, $b, ${isFloat(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExactDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "exact_dot"
}

object ExactDotProduct {

  /** Exact decimal-captured dot product. Null elements and length overhang
    * are SKIPPED — note this deliberately diverges from the HOF form for
    * degenerate inputs: `zip_with` null-pads the shorter array, so the HOF
    * sum is NULL for ragged or null-element arrays where this returns the
    * finite sum over the min-length non-null pairs. Bit-parity with the HOF
    * form holds exactly for equal-length arrays with no null elements
    * (every embedding column in the data plane).
    */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        acc = acc.add(JBigDecimal.valueOf(x * y).setScale(18, RoundingMode.HALF_UP))
      }
      i += 1
    }
    acc.doubleValue()
  }
}

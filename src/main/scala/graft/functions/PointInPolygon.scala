package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** Ray-cast point-in-polygon as a native codegen'd expression — the
  * SURVEY §4.3 upgrade of the former Scala UDF (`Geo.inPolygon`): the
  * ring rides the plan as two double-array reference objects (a
  * 25-vertex polygon is bytes), the generated code calls one static
  * primitive-only method, and the predicate stays inside
  * WholeStageCodegen instead of breaking the scan stage at a ScalaUDF
  * boundary (boxing + null-wrapper per row).
  *
  * Semantics are IDENTICAL to `Geo.pointInPolygon` (reference
  * `ETL.py:154` station containment): on-vertex and on-edge points are
  * inside; crossing parity decides the rest. Null lon/lat yields null
  * (the UDF returned false) — indistinguishable under the filter
  * contexts this predicate serves, and null-intolerant is the correct
  * expression-level contract. GeoSpec pins expression ≡ driver-side
  * ray-cast on convex, concave, vertex and edge cases, codegen and
  * interpreted.
  */
case class PointInPolygon(lonExpr: Expression, latExpr: Expression,
                          ringX: Array[Double], ringY: Array[Double])
  extends BinaryExpression {

  override def left: Expression = lonExpr
  override def right: Expression = latExpr
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (lonExpr.dataType, latExpr.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"point_in_polygon expects (double, double), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def nullSafeEval(lon: Any, lat: Any): Any =
    PointInPolygon.contains(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      ringX, ringY)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rx = ctx.addReferenceObj("ringX", ringX, "double[]")
    val ry = ctx.addReferenceObj("ringY", ringY, "double[]")
    nullSafeCodeGen(ctx, ev, (lon, lat) =>
      s"${ev.value} = graft.functions.PointInPolygon.contains($lon, $lat, $rx, $ry);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PointInPolygon =
    copy(lonExpr = newLeft, latExpr = newRight)

  override def prettyName: String = "point_in_polygon"
}

object PointInPolygon {

  /** Static primitive ray-cast (called from generated code): identical
    * logic to `Geo.pointInPolygon` over parallel coordinate arrays.
    */
  def contains(lon: Double, lat: Double,
               xs: Array[Double], ys: Array[Double]): Boolean = {
    val n = xs.length
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = xs(i); val yi = ys(i)
      val xj = xs(j); val yj = ys(j)
      if (xi == lon && yi == lat) return true
      val minX = math.min(xi, xj); val maxX = math.max(xi, xj)
      val minY = math.min(yi, yj); val maxY = math.max(yi, yj)
      if (lat >= minY && lat <= maxY && lon >= minX && lon <= maxX) {
        val cross = (xj - xi) * (lat - yi) - (yj - yi) * (lon - xi)
        if (cross == 0.0) return true
      }
      if ((yi > lat) != (yj > lat)) {
        val xCross = (xj - xi) * (lat - yi) / (yj - yi) + xi
        if (lon < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }
}

package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact ridge-OLS via the normal equations, as ONE distributed aggregate:
  * decimal-exact sums of every moment (X'X upper triangle, X'y, column
  * sums, n) in a single pass over the data, then a d×d solve on the
  * driver (d = feature count, bounded by the model — never by rows).
  *
  * Compared to an iterative fit this is the scalable shape for small d:
  * one job, map-side partial aggregation, no per-iteration scheduling.
  * Decimal capture makes the moments — and therefore the coefficients —
  * bit-identical under any partitioning (MLlib's solvers sum doubles in
  * partition order and drift in the low bits).
  *
  * Mirrors the reference's statsmodels/sklearn linear stages (SURVEY §2.9
  * M11 Hannan–Rissanen regressions) without per-fit MLlib overhead.
  */
object Ols {

  final case class Model(coefs: Array[Double], intercept: Double) {
    def predictExpr(xCols: Seq[String]): org.apache.spark.sql.Column =
      xCols.zip(coefs).foldLeft(lit(intercept)) { case (acc, (c, b)) =>
        acc + col(c).cast("double") * lit(b)
      }
  }

  /** Fit y ~ xCols + intercept with L2 penalty `ridge` on the non-intercept
    * coefficients (matching a small LinearRegression regParam used purely
    * for numerical stability).
    */
  def fit(df: DataFrame, yCol: String, xCols: Seq[String],
          ridge: Double = 1e-6): Model = {
    val d = xCols.length
    require(d >= 1, "need at least one feature")
    val xs = xCols.map(c => col(c).cast("double"))
    val y = col(yCol).cast("double")
    // scale-12 capture (vs Exact's scale-6 reporting grid): moment sums
    // feed a linear solve, where grid error amplifies through the inverse
    val dsum = (c: org.apache.spark.sql.Column) =>
      sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 12))).cast("double")
    val aggs =
      (for (i <- 0 until d; j <- i until d) yield
        dsum(xs(i) * xs(j)).as(s"xx_${i}_$j")) ++
      (0 until d).map(i => dsum(xs(i) * y).as(s"xy_$i")) ++
      (0 until d).map(i => dsum(xs(i)).as(s"xs_$i")) :+
      dsum(y).as("ys") :+ count(lit(1)).as("n")
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    def g(name: String): Double = r.getDouble(r.fieldIndex(name))
    val n = r.getLong(r.fieldIndex("n")).toDouble
    // Augmented system over [x_1..x_d, 1]
    val m = d + 1
    val a = Array.ofDim[Double](m, m)
    val b = new Array[Double](m)
    for (i <- 0 until d; j <- i until d) {
      val v = g(s"xx_${i}_$j"); a(i)(j) = v; a(j)(i) = v
    }
    for (i <- 0 until d) {
      a(i)(d) = g(s"xs_$i"); a(d)(i) = a(i)(d)
      b(i) = g(s"xy_$i")
      a(i)(i) += ridge
    }
    a(d)(d) = n
    b(d) = g("ys")
    val sol = solve(a, b)
    Model(sol.take(d), sol(d))
  }

  /** Gaussian elimination with partial pivoting (driver-side, m ≤ ~100s). */
  private[ml] def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val m = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (k <- 0 until m) {
      var piv = k
      for (i <- k + 1 until m) if (math.abs(a(i)(k)) > math.abs(a(piv)(k))) piv = i
      if (piv != k) { val t = a(k); a(k) = a(piv); a(piv) = t
        val tb = b(k); b(k) = b(piv); b(piv) = tb }
      require(math.abs(a(k)(k)) > 1e-300, s"singular system at pivot $k")
      for (i <- k + 1 until m) {
        val f = a(i)(k) / a(k)(k)
        if (f != 0.0) {
          var j = k; while (j < m) { a(i)(j) -= f * a(k)(j); j += 1 }
          b(i) -= f * b(k)
        }
      }
    }
    val x = new Array[Double](m)
    for (k <- m - 1 to 0 by -1) {
      var s = b(k)
      var j = k + 1; while (j < m) { s -= a(k)(j) * x(j); j += 1 }
      x(k) = s / a(k)(k)
    }
    x
  }
}

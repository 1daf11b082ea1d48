package graft.ml

import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Factor analysis with varimax rotation (SURVEY.md M4, reference
  * `sklearn.decomposition.FactorAnalysis` + varimax comparison,
  * `unsupervised/ts_kmeans_base.ipynb#13`).
  *
  * The covariance/correlation matrix is computed DISTRIBUTED
  * (RowMatrix.computeCovariance over the full table); the d×d eigen
  * problem and the rotation are driver-side on [[Eigen]]'s deterministic
  * Jacobi solver (d = a few dozen feature columns). Extraction is
  * iterated principal-axis factoring — protocol-compatible with the
  * reference's comparison of unrotated vs varimax loadings (SURVEY §7.4:
  * match semantics, not sklearn's EM float trajectories). Final loadings
  * are sign-canonicalized (largest-|loading| variable per factor
  * positive) BEFORE rotation, making both outputs well-defined — the
  * iteration itself is sign-invariant (only squared loadings feed the
  * communality update).
  */
object Factor {

  /** (variables × factors) loadings, plus the varimax-rotated copy. */
  final case class FaResult(cols: Seq[String], loadings: Array[Array[Double]],
                            rotated: Array[Array[Double]])

  /** Distributed correlation matrix of `cols`. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): Array[Array[Double]] = {
    val rows = df.select(cols.map(c => col(c).cast("double")): _*)
      .na.drop(cols)
      .rdd.map(r => OldVectors.dense(cols.indices.map(r.getDouble).toArray))
    val cov = new RowMatrix(rows).computeCovariance()
    val d = cols.length
    val sd = Array.tabulate(d)(i => math.sqrt(math.max(cov(i, i), 1e-12)))
    Array.tabulate(d, d)((i, j) => cov(i, j) / (sd(i) * sd(j)))
  }

  def fit(df: DataFrame, cols: Seq[String], k: Int, iters: Int = 30): FaResult =
    fitCorr(correlationMatrix(df, cols), cols, k, iters)

  /** Iterated principal-axis factoring on a precomputed correlation
    * matrix: communalities start at the max-|off-diagonal| proxy, then
    * iterate reduced-matrix eigendecompositions. Driver math only — the
    * deterministic core behind both the distributed [[fit]] and the
    * pinned-fixture golden (q63).
    */
  def fitCorr(r: Array[Array[Double]], cols: Seq[String], k: Int,
              iters: Int = 30): FaResult = {
    val d = cols.length
    require(k >= 1 && k < d, s"need 1 <= k < $d factors")
    var h = Array.tabulate(d)(i =>
      (0 until d).filter(_ != i).map(j => math.abs(r(i)(j))).max)
    var loadings: Array[Array[Double]] = null
    var it = 0
    while (it < iters) {
      val reduced = r.map(_.clone())
      for (i <- 0 until d) reduced(i)(i) = h(i)
      val (evals, evecs) = Eigen.jacobiEigSym(reduced)
      loadings = Array.tabulate(d, k)((i, f) =>
        evecs(i)(f) * math.sqrt(math.max(evals(f), 0.0)))
      h = Array.tabulate(d)(i =>
        math.min((0 until k).map(f => loadings(i)(f) * loadings(i)(f)).sum, 0.999))
      it += 1
    }
    val raw = Eigen.canonicalizeSigns(loadings)
    FaResult(cols, raw, Eigen.canonicalizeSigns(varimax(raw)))
  }

  /** Varimax rotation (Kaiser): iterative pairwise planar rotations
    * maximizing the variance of squared loadings per factor.
    */
  def varimax(loadings: Array[Array[Double]], maxIter: Int = 100,
              tol: Double = 1e-8): Array[Array[Double]] = {
    val d = loadings.length
    val k = loadings(0).length
    val l = loadings.map(_.clone())
    if (k < 2) return l
    var it = 0
    var changed = true
    while (it < maxIter && changed) {
      changed = false
      for (p <- 0 until k; q <- (p + 1) until k) {
        var u = 0.0; var v = 0.0
        var a = 0.0; var b = 0.0
        for (i <- 0 until d) {
          val x = l(i)(p); val y = l(i)(q)
          val uu = x * x - y * y
          val vv = 2 * x * y
          u += uu; v += vv
          a += uu * uu - vv * vv
          b += 2 * uu * vv
        }
        val num = b - 2 * u * v / d
        val den = a - (u * u - v * v) / d
        val phi = 0.25 * math.atan2(num, den)
        if (math.abs(phi) > tol) {
          changed = true
          val c = math.cos(phi); val s = math.sin(phi)
          for (i <- 0 until d) {
            val x = l(i)(p); val y = l(i)(q)
            l(i)(p) = c * x + s * y
            l(i)(q) = -s * x + c * y
          }
        }
      }
      it += 1
    }
    l
  }
}

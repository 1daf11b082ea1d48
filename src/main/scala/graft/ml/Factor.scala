package graft.ml

import breeze.linalg.{eigSym, DenseMatrix, DenseVector}
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
  * problem and the rotation are driver-side breeze (d = a few dozen
  * feature columns). Extraction is iterated principal-axis factoring —
  * protocol-compatible with the reference's comparison of unrotated vs
  * varimax loadings (SURVEY §7.4: match semantics, not sklearn's EM float
  * trajectories).
  */
object Factor {

  /** (variables × factors) loadings, plus the varimax-rotated copy. */
  final case class FaResult(cols: Seq[String], loadings: Array[Array[Double]],
                            rotated: Array[Array[Double]])

  /** Distributed correlation matrix of `cols`. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DenseMatrix[Double] = {
    val rows = df.select(cols.map(c => col(c).cast("double")): _*)
      .na.drop(cols)
      .rdd.map(r => OldVectors.dense(cols.indices.map(r.getDouble).toArray))
    val cov = new RowMatrix(rows).computeCovariance()
    val d = cols.length
    val m = DenseMatrix.tabulate(d, d)((i, j) => cov(i, j))
    val sd = DenseVector.tabulate(d)(i => math.sqrt(math.max(m(i, i), 1e-12)))
    DenseMatrix.tabulate(d, d)((i, j) => m(i, j) / (sd(i) * sd(j)))
  }

  /** Iterated principal-axis factoring on the correlation matrix:
    * communalities start at squared multiple correlations' proxy (max
    * |off-diagonal|), then iterate reduced-matrix eigendecompositions.
    */
  def fit(df: DataFrame, cols: Seq[String], k: Int, iters: Int = 30): FaResult = {
    val d = cols.length
    require(k >= 1 && k < d, s"need 1 <= k < $d factors")
    val r = correlationMatrix(df, cols)
    var h = DenseVector.tabulate(d)(i =>
      (0 until d).filter(_ != i).map(j => math.abs(r(i, j))).max)
    var loadings: DenseMatrix[Double] = null
    var it = 0
    while (it < iters) {
      val reduced = r.copy
      for (i <- 0 until d) reduced(i, i) = h(i)
      val es = eigSym(reduced)
      // top-k eigenpairs (eigSym returns ascending)
      val order = (0 until d).sortBy(i => -es.eigenvalues(i)).take(k)
      loadings = DenseMatrix.tabulate(d, k)((i, f) => {
        val e = order(f)
        es.eigenvectors(i, e) * math.sqrt(math.max(es.eigenvalues(e), 0.0))
      })
      h = DenseVector.tabulate(d)(i =>
        math.min((0 until k).map(f => loadings(i, f) * loadings(i, f)).sum, 0.999))
      it += 1
    }
    val raw = Array.tabulate(d, k)((i, f) => loadings(i, f))
    FaResult(cols, raw, varimax(raw))
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

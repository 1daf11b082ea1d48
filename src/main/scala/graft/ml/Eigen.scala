package graft.ml

/** Deterministic driver-side symmetric eigendecomposition (cyclic Jacobi)
  * and the PCA/FA helpers built on it.
  *
  * Why not breeze/LAPACK here: the pinned-fixture golden queries (q54 PCA
  * loadings, q63 factor loadings) need BIT-DETERMINISTIC output that an
  * independent NumPy recomputation can match — a fixed-order Jacobi sweep
  * is reproducible arithmetic with no library/thread dependence, and for
  * the d ≤ a-few-dozen feature matrices these operators see, O(d³) per
  * sweep is driver-trivial. The DISTRIBUTED part of PCA/FA stays the
  * covariance/correlation pass over the data (one aggregate); only the
  * d×d solve lands here.
  *
  * Reference: PCA loadings inspection `unsupervised/ts_kmeans_base.ipynb#13`.
  */
object Eigen {

  /** Cyclic-Jacobi eigendecomposition of a symmetric d×d matrix.
    * Returns (eigenvalues, eigenvectors) sorted by eigenvalue DESCENDING;
    * eigenvectors(i)(f) is component f's weight on variable i.
    */
  def jacobiEigSym(m: Array[Array[Double]], maxSweeps: Int = 64,
                   tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offNorm(a)
    val scale = math.max(frobNorm(a), 1e-300)
    while (sweep < maxSweeps && off > tol * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(1.0 + theta * theta))
              else 1.0 / (theta - math.sqrt(1.0 + theta * theta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            var j = 0
            while (j < d) {
              val apj = a(p)(j); val aqj = a(q)(j)
              a(p)(j) = c * apj - s * aqj
              a(q)(j) = s * apj + c * aqj
              j += 1
            }
            a(p)(q) = 0.0; a(q)(p) = 0.0
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offNorm(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = Array.tabulate(d, d)((i, f) => v(i)(order(f)))
    (evals, evecs)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def frobNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** Sample covariance (n−1 divisor, matching sklearn/MLlib PCA) of a
    * row-major data matrix, summed in fixed row order — deterministic.
    */
  def covarianceOf(data: Array[Array[Double]]): Array[Array[Double]] = {
    val n = data.length
    val d = data(0).length
    val mean = new Array[Double](d)
    data.foreach(r => (0 until d).foreach(j => mean(j) += r(j)))
    (0 until d).foreach(j => mean(j) /= n)
    val cov = Array.ofDim[Double](d, d)
    data.foreach { r =>
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          cov(i)(j) += (r(i) - mean(i)) * (r(j) - mean(j))
          j += 1
        }
        i += 1
      }
    }
    for (i <- 0 until d; j <- i until d) {
      cov(i)(j) /= (n - 1)
      cov(j)(i) = cov(i)(j)
    }
    cov
  }

  /** Correlation matrix from [[covarianceOf]]. */
  def correlationOf(data: Array[Array[Double]]): Array[Array[Double]] = {
    val cov = covarianceOf(data)
    val d = cov.length
    val sd = Array.tabulate(d)(i => math.sqrt(math.max(cov(i)(i), 1e-12)))
    Array.tabulate(d, d)((i, j) => cov(i)(j) / (sd(i) * sd(j)))
  }

  /** Flip each column of a (variables × components) matrix so its
    * largest-|entry| variable (first on ties) is positive — the standard
    * sign canonicalization that makes eigenvector output well-defined.
    */
  def canonicalizeSigns(l: Array[Array[Double]]): Array[Array[Double]] = {
    val d = l.length
    val k = l(0).length
    val out = l.map(_.clone())
    for (f <- 0 until k) {
      var arg = 0
      for (i <- 1 until d) if (math.abs(out(i)(f)) > math.abs(out(arg)(f))) arg = i
      if (out(arg)(f) < 0) for (i <- 0 until d) out(i)(f) = -out(i)(f)
    }
    out
  }

  /** Top-k principal-component loadings (d×k, sign-canonicalized) of a
    * row-major data matrix: sample covariance + Jacobi.
    */
  def principalLoadings(data: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val (_, vecs) = jacobiEigSym(covarianceOf(data))
    canonicalizeSigns(vecs.map(_.take(k)))
  }
}

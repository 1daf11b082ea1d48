package graft.ts

/** Daubechies-4 discrete wavelet transform with periodization (SURVEY.md
  * M7, reference `pywt.dwt`/`waverec` on the demand series,
  * `unsupervised/ts_kmeans_base.ipynb#31-36`).
  *
  * Implemented as decimated circular correlation with the published db4
  * (8-tap) filters; the analysis matrix is orthogonal for Daubechies
  * filters, so the adjoint reconstructs exactly (the engine's contract is
  * perfect reconstruction under its own convention — pywt's phase
  * alignment differs, see SURVEY §7.4 on matching protocol not float
  * trajectories). Driver-side math over Array[Double]: series are
  * per-key collected vectors (T10); apply per series via a UDF for
  * many-series data.
  */
object Wavelet {

  /** db4 (4 vanishing moments, 8 taps) scaling filter — published
    * Daubechies constants.
    */
  val db4Lo: Array[Double] = Array(
    0.23037781330885523, 0.7148465705525415, 0.6308807679295904,
    -0.02798376941698385, -0.18703481171888114, 0.030841381835986965,
    0.032883011666982945, -0.010597401784997278)

  /** Quadrature-mirror high-pass: hi[k] = (-1)^k lo[N-1-k]. */
  val db4Hi: Array[Double] = db4Lo.indices.map(k =>
    (if (k % 2 == 0) 1.0 else -1.0) * db4Lo(db4Lo.length - 1 - k)).toArray

  /** One periodized DWT level: (approx, detail), each length n/2
    * (n must be even).
    */
  def dwt(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    require(n % 2 == 0 && n >= 2, s"periodized DWT needs even length, got $n")
    val half = n / 2
    val cA = new Array[Double](half)
    val cD = new Array[Double](half)
    var i = 0
    while (i < half) {
      var a = 0.0; var d = 0.0
      var k = 0
      while (k < db4Lo.length) {
        val xi = x((2 * i + k) % n)
        a += db4Lo(k) * xi
        d += db4Hi(k) * xi
        k += 1
      }
      cA(i) = a; cD(i) = d
      i += 1
    }
    (cA, cD)
  }

  /** Inverse of [[dwt]] (adjoint of the orthogonal analysis operator). */
  def idwt(cA: Array[Double], cD: Array[Double]): Array[Double] = {
    val half = cA.length
    val n = half * 2
    val x = new Array[Double](n)
    var i = 0
    while (i < half) {
      var k = 0
      while (k < db4Lo.length) {
        val j = (2 * i + k) % n
        x(j) += db4Lo(k) * cA(i) + db4Hi(k) * cD(i)
        k += 1
      }
      i += 1
    }
    x
  }

  /** Multi-level decomposition: returns (cA_L, Seq(cD_L, ..., cD_1)). */
  def wavedec(x: Array[Double], levels: Int): (Array[Double], Seq[Array[Double]]) = {
    var a = x
    val details = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var l = 0
    while (l < levels) {
      val (cA, cD) = dwt(a)
      details.prepend(cD)
      a = cA
      l += 1
    }
    (a, details.toSeq)
  }

  /** Inverse of [[wavedec]] (reference `pywt.waverec`). */
  def waverec(cA: Array[Double], details: Seq[Array[Double]]): Array[Double] =
    details.foldLeft(cA)((a, d) => idwt(a, d))

  /** Reference smoothing trick (`ts_kmeans_base.ipynb#34-36`): zero the
    * finest `dropLevels` detail bands and reconstruct.
    */
  def denoise(x: Array[Double], levels: Int, dropLevels: Int): Array[Double] = {
    val (cA, ds) = wavedec(x, levels)
    val kept = ds.zipWithIndex.map { case (d, i) =>
      // details are ordered coarsest..finest; drop the last `dropLevels`
      if (i >= ds.length - dropLevels) new Array[Double](d.length) else d
    }
    waverec(cA, kept)
  }
}

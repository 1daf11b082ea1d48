package graft.ts

/** Pinned deterministic fixture series for the golden-oracle driver-math
  * queries (q61 STL, q62 wavelet): scale-factor-independent, every value a
  * dyadic rational (integers + i/8), so the input is bit-identical in any
  * engine and the decompositions are reproducible run over run. The
  * shape mirrors the daily energy series the operators normally run on:
  * a slow ramp (i/8), a period-7 "weekly" pattern (3·(i mod 7)), and a
  * pseudo-irregular component ((37·i) mod 50).
  *
  * n = 112 = 16 whole periods of 7, and a multiple of 4 as the two-level
  * db4 wavelet transform requires.
  */
object Pinned {
  val n: Int = 112

  def series: Array[Double] =
    Array.tabulate(n)(i => 100.0 + (i * 37) % 50 + 3 * (i % 7) + i / 8.0)

  /** Longer fixture for the forecast-layer goldens (q49/q68/q81): 360
    * "days" with a weekly pattern, a slow ramp, and a deterministic
    * pseudo-irregular term — all dyadic-exact. The fit/forecast split at
    * [[splitLong]] mirrors the reference's 80/20 positional split.
    */
  val nLong: Int = 360
  val splitLong: Int = 288

  def arimaxSeries: Array[Double] =
    Array.tabulate(nLong)(i => 200.0 + 5 * (i % 7) + ((i * 73) % 97) / 4.0 + i / 16.0)

  /** Exogenous companion series for the ARIMAX-with-exog goldens. */
  def exogSeries: Array[Double] =
    Array.tabulate(nLong)(i => ((i * 41) % 61) / 8.0)

  /** Pinned 96×6 feature matrix for the PCA/FA goldens (q54/q63):
    * dyadic-exact rows with a PLANTED two-factor structure — x0..x2 load
    * on latent f1, x3..x4 on f2, x5 on both, each plus a small
    * deterministic pseudo-noise term. The planted structure keeps the
    * eigenvalue spectrum well separated, so eigenvectors are stable and
    * the sign-canonicalized loadings are comparable across independent
    * eigensolvers.
    */
  val nFeatRows: Int = 96

  def featureMatrix: Array[Array[Double]] =
    Array.tabulate(nFeatRows) { i =>
      val f1 = ((i * 29) % 31) / 8.0
      val f2 = ((i * 17) % 23) / 4.0
      Array(
        f1 + ((i * 13) % 17) / 16.0,
        2.0 * f1 + ((i * 7) % 13) / 16.0,
        -1.5 * f1 + ((i * 11) % 19) / 16.0,
        f2 + ((i * 5) % 11) / 16.0,
        2.5 * f2 + ((i * 3) % 7) / 16.0,
        f1 + f2 + ((i * 23) % 29) / 16.0)
    }

  /** Pinned set of 8 equal-length (31-point) series for the DTW-distance
    * golden (q101): dyadic-exact, pairwise-distinct shapes (different
    * pseudo-irregular cycles + different weekly amplitudes), mirroring
    * the per-month windows the reference clusters
    * (`ts_kmeans_base.ipynb#53`).
    */
  val dtwLen: Int = 31

  def dtwSeriesSet: Array[Array[Double]] = {
    val p = Array(3, 5, 7, 11, 13, 17, 19, 23)
    val m = Array(29, 31, 37, 41, 43, 47, 53, 59)
    Array.tabulate(8)(j =>
      Array.tabulate(dtwLen)(i =>
        ((i * p(j)) % m(j)) / 8.0 + ((i + j) % 7) * ((j % 3) + 1) / 4.0))
  }
}

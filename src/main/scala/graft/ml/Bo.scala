package graft.ml

/** Bayesian-optimization search driver (SURVEY.md M15-M18, reference
  * `src/scripts/optimization.py:79-174`): a driver-side RBF-kernel
  * Gaussian-process surrogate over the searched hyper-parameters, an LCB
  * acquisition (mu - 2.753*sigma) scored over a seeded uniform candidate
  * pool, and the reference's outer loop including its outlier-rejection
  * rule (an objective > 3.5x the worst recorded one is resampled, not
  * recorded).
  *
  * The search history is <= a few hundred points, so the GP math is plain
  * driver-side linear algebra (Cholesky); each OBJECTIVE evaluation is
  * where the cluster works (CV folds = Spark jobs). Per SURVEY §7.4 we
  * match the reference's search protocol — kernel family, kappa, seeding
  * discipline, rejection rule — not sklearn's float trajectories (it
  * restarts kernel hyper-optimization; we fix unit length-scale on
  * normalized inputs).
  */
object Bo {

  /** One searched hyper-parameter: inclusive range, integer or float. */
  final case class HpBound(name: String, low: Double, high: Double, isInt: Boolean)

  final case class BoResult(best: Map[String, Double], bestMean: Double,
                            bestStd: Double,
                            history: Seq[(Map[String, Double], Double, Double)])

  // ---------------------------------------------------------------- GP

  /** In-place Cholesky of a (small) SPD matrix; returns lower L. */
  def cholesky(a: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length
    val l = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        var s = 0.0
        var k = 0
        while (k < j) { s += l(i)(k) * l(j)(k); k += 1 }
        if (i == j) l(i)(j) = math.sqrt(math.max(a(i)(i) - s, 1e-12))
        else l(i)(j) = (a(i)(j) - s) / l(j)(j)
        j += 1
      }
      i += 1
    }
    l
  }

  private def solveLower(l: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = l.length
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s = b(i)
      var k = 0
      while (k < i) { s -= l(i)(k) * x(k); k += 1 }
      x(i) = s / l(i)(i)
      i += 1
    }
    x
  }

  private def solveUpper(l: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = l.length
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var k = i + 1
      while (k < n) { s -= l(k)(i) * x(k); k += 1 }
      x(i) = s / l(i)(i)
      i -= 1
    }
    x
  }

  /** RBF GP posterior over normalized inputs (unit length-scale,
    * `alpha` nugget, y-normalization like sklearn's `normalize_y`).
    */
  final class Gp(xs: Array[Array[Double]], ys: Array[Double], alpha: Double = 1e-3) {
    private val n = xs.length
    private val yMean = ys.sum / n
    private val yStd = {
      val v = ys.map(y => (y - yMean) * (y - yMean)).sum / n
      math.max(math.sqrt(v), 1e-12)
    }
    private val yn = ys.map(y => (y - yMean) / yStd)

    private def k(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      math.exp(-0.5 * s)
    }

    private val l = {
      val m = Array.tabulate(n, n)((i, j) =>
        k(xs(i), xs(j)) + (if (i == j) alpha else 0.0))
      cholesky(m)
    }
    private val alphaVec = solveUpper(l, solveLower(l, yn))

    /** (mu, sigma) at a query point. */
    def predict(x: Array[Double]): (Double, Double) = {
      val ks = Array.tabulate(n)(i => k(xs(i), x))
      var mu = 0.0
      var i = 0
      while (i < n) { mu += ks(i) * alphaVec(i); i += 1 }
      val v = solveLower(l, ks)
      var vv = 0.0
      i = 0
      while (i < n) { vv += v(i) * v(i); i += 1 }
      val varN = math.max(k(x, x) - vv, 0.0)
      (mu * yStd + yMean, math.sqrt(varN) * yStd)
    }
  }

  /** LCB acquisition (`optimization.py:84-91`): mu - kappa*sigma. */
  def lcb(gp: Gp, x: Array[Double], kappa: Double = 2.753): Double = {
    val (mu, sigma) = gp.predict(x)
    mu - kappa * sigma
  }

  // ------------------------------------------------------------ search

  /** Minimize `objective` (returning (mean, std), e.g. blocked-CV MAE)
    * over `bounds` with `nIters` BO steps (seeded; first point uniform,
    * later points argmin-LCB over a fresh uniform pool of `searchSize`).
    */
  def minimize(bounds: Seq[HpBound], nIters: Int,
               searchSize: Int = 256, seed: Long = 42L, kappa: Double = 2.753)(
      objective: Map[String, Double] => (Double, Double)): BoResult = {
    val rnd = new scala.util.Random(seed)

    def sample(): Array[Double] = bounds.map { b =>
      // +1: HpBound is an inclusive range, so the high endpoint must be reachable.
      if (b.isInt) (b.low + rnd.nextInt((b.high - b.low).toInt + 1)).toDouble
      else math.rint((b.low + rnd.nextDouble() * (b.high - b.low)) * 1000) / 1000
    }.toArray

    def norm(x: Array[Double]): Array[Double] =
      x.zip(bounds).map { case (v, b) =>
        if (b.high == b.low) 0.0 else (v - b.low) / (b.high - b.low)
      }

    def toMap(x: Array[Double]): Map[String, Double] =
      bounds.map(_.name).zip(x).toMap

    val xsRaw = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val means = scala.collection.mutable.ArrayBuffer.empty[Double]
    val stds = scala.collection.mutable.ArrayBuffer.empty[Double]

    var cand = sample()
    var it = 0
    while (it < nIters) {
      val (mean, std) = objective(toMap(cand))
      // reference outlier rule (`optimization.py:131-138`): a blow-up
      // objective is not recorded; the next candidate comes from the
      // current surrogate.
      val isOutlier = means.nonEmpty && mean > means.max * 3.5
      if (!isOutlier) {
        xsRaw += cand
        means += mean
        stds += std
      }
      cand =
        if (xsRaw.length < 2) sample()
        else {
          val gp = new Gp(xsRaw.map(norm).toArray, means.toArray)
          val pool = Array.fill(searchSize)(sample())
          pool.minBy(p => lcb(gp, norm(p), kappa))
        }
      it += 1
    }
    val bestIdx = means.indices.minBy(means)
    BoResult(toMap(xsRaw(bestIdx)), means(bestIdx), stds(bestIdx),
      xsRaw.indices.map(i => (toMap(xsRaw(i)), means(i), stds(i))))
  }

  /** Reference outer loop (`optimization.py:112-174`, M18): a BO run per
    * (lags, differentiation) grid cell; returns the per-cell results and
    * the global argmin (A13).
    */
  def searchLagDiffGrid(grid: Seq[(Seq[Int], Int)], bounds: Seq[HpBound],
                        nIters: Int, seed: Long = 42L)(
      objective: (Seq[Int], Int, Map[String, Double]) => (Double, Double))
    : (Map[(Seq[Int], Int), BoResult], ((Seq[Int], Int), BoResult)) = {
    val results = grid.map { case (lags, diff) =>
      (lags, diff) -> minimize(bounds, nIters, seed = seed)(p =>
        objective(lags, diff, p))
    }.toMap
    val best = results.minBy(_._2.bestMean)
    (results, best)
  }
}

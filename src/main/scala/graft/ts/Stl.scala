package graft.ts

/** LOESS smoothing and an STL-style robust seasonal-trend decomposition
  * (SURVEY.md M6, reference `statsmodels.tsa.seasonal.STL(tobs,
  * period=365, robust=True)`, `unsupervised/ts_kmeans_base.ipynb#29-30`).
  *
  * Driver-side math over one collected series (the reference series is
  * ~3.2k points; SURVEY §4.3 prescribes driver-side with distributed
  * pre-aggregation). The decomposition follows STL's structure —
  * cycle-subseries smoothing for the seasonal, LOESS for the trend,
  * bisquare robustness weights on the remainder — with fixed inner/outer
  * iteration counts rather than statsmodels' full parameterization
  * (protocol match, not float parity; SURVEY §7.4).
  */
object Stl {

  /** Tricube-weighted local LINEAR regression at every point (LOESS).
    *
    * @param bandwidth fraction of points in each local window (0, 1]
    * @param weights   optional per-point robustness weights
    */
  def loess(y: Array[Double], bandwidth: Double,
            weights: Array[Double] = null): Array[Double] = {
    val n = y.length
    val span = math.max(3, math.ceil(bandwidth * n).toInt)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val lo = math.max(0, math.min(i - span / 2, n - span))
      val hi = lo + span - 1
      val maxD = math.max(i - lo, hi - i).toDouble.max(1.0)
      // weighted least squares of y on x over [lo, hi]
      var sw = 0.0; var swx = 0.0; var swy = 0.0; var swxx = 0.0; var swxy = 0.0
      var j = lo
      while (j <= hi) {
        val u = math.abs(j - i) / maxD
        val t = 1.0 - u * u * u
        var w = t * t * t
        if (weights != null) w *= weights(j)
        val x = (j - i).toDouble
        sw += w; swx += w * x; swy += w * y(j)
        swxx += w * x * x; swxy += w * x * y(j)
        j += 1
      }
      val denom = sw * swxx - swx * swx
      out(i) =
        if (math.abs(denom) < 1e-12 || sw == 0.0) (if (sw == 0.0) y(i) else swy / sw)
        else {
          val b = (sw * swxy - swx * swy) / denom
          val a = (swy - b * swx) / sw
          a // evaluated at x = 0 (the point itself)
        }
      i += 1
    }
    out
  }

  final case class StlResult(trend: Array[Double], seasonal: Array[Double],
                             resid: Array[Double])

  /** STL-style decomposition with `period`, LOESS trend, cycle-subseries
    * seasonal, and (optionally) one robustness re-weighting pass.
    */
  def decompose(y: Array[Double], period: Int, robust: Boolean = true,
                trendBandwidth: Double = 0.25,
                innerIters: Int = 2): StlResult = {
    val n = y.length
    require(n >= 2 * period, s"need >= 2 periods of data ($n < ${2 * period})")
    var trend = new Array[Double](n)
    var seasonal = new Array[Double](n)
    var rw: Array[Double] = null

    // centered moving average (window w), edges use the available span
    def movAvg(a: Array[Double], w: Int): Array[Double] = {
      val half = w / 2
      Array.tabulate(a.length) { i =>
        val lo = math.max(0, i - half)
        val hi = math.min(a.length - 1, i + half)
        var s = 0.0
        var j = lo
        while (j <= hi) { s += a(j); j += 1 }
        s / (hi - lo + 1)
      }
    }

    def innerLoop(): Unit = {
      var it = 0
      while (it < innerIters) {
        // seasonal: smooth each cycle-subseries of (y - trend)
        val detr = Array.tabulate(n)(i => y(i) - trend(i))
        val s = new Array[Double](n)
        var ph = 0
        while (ph < period) {
          val idx = ph.until(n, period).toArray
          val sub = idx.map(detr)
          val subW = if (rw == null) null else idx.map(rw)
          val smooth = loess(sub, bandwidth = 0.75, weights = subW)
          var k = 0
          while (k < idx.length) { s(idx(k)) = smooth(k); k += 1 }
          ph += 1
        }
        // STL step 3: remove low-pass leakage (trend that survived into
        // the subseries) so the seasonal carries no slow component
        val lp = movAvg(movAvg(s, period), period)
        var i = 0
        while (i < n) { seasonal(i) = s(i) - lp(i); i += 1 }
        // trend: LOESS of the deseasonalized series
        val deseason = Array.tabulate(n)(i => y(i) - seasonal(i))
        trend = loess(deseason, trendBandwidth, rw)
        it += 1
      }
    }

    innerLoop()
    if (robust) {
      val resid = Array.tabulate(n)(i => math.abs(y(i) - trend(i) - seasonal(i)))
      val sorted = resid.sorted
      val h = 6.0 * math.max(sorted(n / 2), 1e-12)
      rw = resid.map { r =>
        val u = math.min(r / h, 1.0)
        val t = 1.0 - u * u
        t * t
      }
      innerLoop()
    }
    val res = Array.tabulate(n)(i => y(i) - trend(i) - seasonal(i))
    StlResult(trend, seasonal, res)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{Arimax, CvObjective, Forecast, RecursiveGbt}

/** Seeded fixture tests for the forecasting core. The reference's parity
  * contract (SURVEY.md §7.4): match forecast error within tolerance on
  * deterministic fixtures, not float trajectories of a foreign MLE.
  */
class MlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("Ols.fit recovers exact coefficients on noiseless data") {
    import graft.ml.Ols
    val rows = (1 to 50).map { i =>
      val x1 = i.toDouble; val x2 = math.sin(i * 0.3)
      (x1, x2, 2.5 * x1 - 4.0 * x2 + 7.0)
    }
    val df = rows.toDF("x1", "x2", "y")
    val m = Ols.fit(df, "y", Seq("x1", "x2"), ridge = 0.0)
    assert(math.abs(m.coefs(0) - 2.5) < 1e-9, m.coefs.mkString(","))
    assert(math.abs(m.coefs(1) + 4.0) < 1e-9)
    assert(math.abs(m.intercept - 7.0) < 1e-8)
    // partition-invariance of the exact moments
    val m2 = Ols.fit(df.repartition(7), "y", Seq("x1", "x2"), ridge = 0.0)
    assert(m.coefs.toSeq === m2.coefs.toSeq)
    assert(m.intercept === m2.intercept)
  }

  test("integrate() inverts differencing at d=1 and d=2") {
    // d=0: the prediction IS the level
    assert(Forecast.integrate(Array(0.0), 5.5) === 5.5)
    // d=1: next level = last level + predicted diff
    assert(Forecast.integrate(Array(21.0, 1.0), 4.0) === 25.0)
    // d=2 roundtrip: reconstruct the tail of a quadratic series
    val quad = (0 to 10).map(i => (i * i).toDouble).toArray
    val d1 = quad.sliding(2).map(p => p(1) - p(0)).toArray
    val d2 = d1.sliding(2).map(p => p(1) - p(0)).toArray
    val state = Array(quad.last, d1.last, d2.last)
    val next = Forecast.integrate(state, 2.0) // next 2nd diff of i^2 is constant 2
    assert(next === 121.0) // 11^2
  }

  test("ARIMAX recovers a noise-free AR(2)+exog process (M11)") {
    val n = 200
    val x = Array.tabulate(n + 10)(i => math.sin(i * 0.3) * 2.0)
    val y = new Array[Double](n + 10)
    y(0) = 10.0; y(1) = 10.5
    for (i <- 2 until n + 10)
      y(i) = 5.0 + 0.6 * y(i - 1) - 0.2 * y(i - 2) + 1.5 * x(i)
    val train = (0 until n).map(i => (i, y(i), x(i))).toDF("t", "y", "x")
    val model = Arimax.fit(train, "t", "y", Seq("x"), p = 2, d = 0, q = 0)
    val preds = model.forecast(10, (n until n + 10).map(i => Array(x(i))))
    val mae = preds.zip(y.slice(n, n + 10)).map { case (p, a) => math.abs(p - a) }.sum / 10
    assert(mae < 0.15, s"ARIMAX forecast MAE too high: $mae preds=${preds.toSeq}")
  }

  test("ARIMAX handles d=1 integration (M11)") {
    val n = 150
    // random-walk-with-drift-ish: first difference is AR(1), noise-free
    val diffs = new Array[Double](n + 8)
    diffs(0) = 1.0
    for (i <- 1 until n + 8) diffs(i) = 0.5 + 0.4 * diffs(i - 1)
    val y = diffs.scanLeft(100.0)(_ + _).drop(1)
    val train = (0 until n).map(i => (i, y(i))).toDF("t", "y")
    val model = Arimax.fit(train, "t", "y", Nil, p = 1, d = 1, q = 0)
    val preds = model.forecast(8, Nil)
    val mae = preds.zip(y.slice(n, n + 8)).map { case (p, a) => math.abs(p - a) }.sum / 8
    assert(mae < 0.5, s"ARIMAX d=1 forecast MAE too high: $mae")
  }

  test("ARIMAX at the reference's order (3,1,4)+exog on a 3.2k-point series (M11)") {
    // Reference fits statsmodels MLE at order (3,1,4) over ~3.2k points;
    // the engine fits Hannan-Rissanen + OLS (divergence pre-declared in
    // SURVEY §7.4.5). This fixture pins the gap to a number: on a planted
    // ARIMA(3,1,4)+exog process with noise σ = 2, the HR fit's blocked-CV
    // MAE must (a) stay in the planted-noise magnitude range and (b) beat
    // the naive flat-forecast baseline that ignores drift and structure.
    val n = 3200
    val sigma = 2.0
    val rnd = new scala.util.Random(414L)
    val e = Array.fill(n + 5)(rnd.nextGaussian() * sigma)
    val x = Array.tabulate(n)(i => ((i * 13) % 29) / 10.0)
    val d = new Array[Double](n)
    for (i <- 0 until n) {
      def dd(k: Int) = if (i - k >= 0) d(i - k) else 0.0
      d(i) = 0.5 + 0.45 * dd(1) - 0.15 * dd(2) + 0.1 * dd(3) +
        e(i + 4) + 0.3 * e(i + 3) - 0.2 * e(i + 2) + 0.1 * e(i + 1) +
        0.05 * e(i) + 0.8 * x(i)
    }
    val y = d.scanLeft(500.0)(_ + _).drop(1)
    val series = (0 until n).map(i => (i, y(i), x(i))).toDF("t", "y", "x")
    val maes = CvObjective.blockedCvMae(series, "t", "y", Seq("x"), 2, 0.15) {
      (train, steps, exogVal) =>
        Arimax.fit(train, "t", "y", Seq("x"), p = 3, d = 1, q = 4)
          .forecast(steps, exogVal)
    }
    val naive = CvObjective.blockedCvMae(series, "t", "y", Seq("x"), 2, 0.15) {
      (train, steps, _) =>
        val last = train.orderBy(org.apache.spark.sql.functions.col("t").desc)
          .select(org.apache.spark.sql.functions.col("y").cast("double"))
          .head.getDouble(0)
        Array.fill(steps)(last)
    }
    val (mean, _) = CvObjective.summary(maes)
    val (naiveMean, _) = CvObjective.summary(naive)
    assert(maes.forall(java.lang.Double.isFinite),
      s"non-finite fold MAE: $maes")
    // multi-step error on an integrated series grows ~σ·√h; h ≈ 240 here,
    // so σ·√h ≈ 31 — a broken fit (or a dropped drift term) lands far above
    assert(mean < sigma * math.sqrt(240) * 1.5,
      s"ARIMA(3,1,4) CV MAE out of planted-noise range: $mean")
    assert(mean < naiveMean,
      s"ARIMA(3,1,4) ($mean) should beat the flat baseline ($naiveMean)")
  }

  test("recursive GBT learns a periodic series (M12)") {
    val pattern = Array(10.0, 20.0, 30.0, 40.0)
    val n = 48
    val y = Array.tabulate(n + 8)(i => pattern(i % 4))
    val train = (0 until n).map(i => (i, y(i))).toDF("t", "y")
    val model = RecursiveGbt.fit(train, "t", "y", Nil, lags = Seq(4),
      d = 0, maxIter = 20, maxDepth = 3)
    val preds = model.forecast(8, Nil)
    val maxErr = preds.zip(y.slice(n, n + 8)).map { case (p, a) => math.abs(p - a) }.max
    assert(maxErr < 1.0, s"GBT periodic forecast off: ${preds.toSeq}")
  }

  test("blocked CV objective returns one finite MAE per fold (M19)") {
    val y = Array.tabulate(60)(i => 10.0 + (i % 4) * 5.0)
    val series = y.toSeq.zipWithIndex.map { case (v, i) => (i, v) }.toDF("t", "y")
    val maes = CvObjective.blockedCvMae(series, "t", "y", Nil, 3, 0.2) {
      (train, steps, _) =>
        RecursiveGbt.fit(train, "t", "y", Nil, Seq(4), 0, maxIter = 10, maxDepth = 3)
          .forecast(steps, Nil)
    }
    assert(maes.length === 3)
    assert(maes.forall(m => java.lang.Double.isFinite(m) && m >= 0))
    val (mean, std) = CvObjective.summary(maes)
    assert(java.lang.Double.isFinite(mean) && std >= 0)
  }
}

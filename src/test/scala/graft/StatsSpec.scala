package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Factor
import graft.ts.{Stl, Wavelet}

/** Tests for the driver-side statistical components (M4/M6/M7). */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("db4 DWT reconstructs perfectly and kills details on smooth input (M7)") {
    val rnd = new scala.util.Random(11)
    val x = Array.fill(64)(rnd.nextDouble() * 10)
    val (cA, cD) = Wavelet.dwt(x)
    assert(cA.length === 32 && cD.length === 32)
    val back = Wavelet.idwt(cA, cD)
    x.zip(back).foreach { case (a, b) => assert(math.abs(a - b) < 1e-10) }
    // multi-level round trip
    val (a3, d3) = Wavelet.wavedec(x, 3)
    val rec = Wavelet.waverec(a3, d3)
    x.zip(rec).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // constant signal: all detail energy ~ 0 (vanishing moments)
    val (_, cdFlat) = Wavelet.dwt(Array.fill(32)(5.0))
    assert(cdFlat.map(math.abs).max < 1e-10)
    // denoise returns same length, reduces high-freq energy
    val noisy = Array.tabulate(64)(i => math.sin(i * 0.2) * 5 + rnd.nextGaussian() * 0.5)
    val den = Wavelet.denoise(noisy, 3, 1)
    assert(den.length === 64)
  }

  test("LOESS tracks a smooth curve and resists an outlier with weights (M6)") {
    val y = Array.tabulate(60)(i => 0.5 * i + 3.0)
    val sm = Stl.loess(y, 0.3)
    y.zip(sm).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6,
      "local linear LOESS must reproduce a line exactly") }
    val y2 = y.clone(); y2(30) = 1000.0
    val w = Array.fill(60)(1.0); w(30) = 0.0
    val sm2 = Stl.loess(y2, 0.3, w)
    assert(math.abs(sm2(30) - y(30)) < 1.0, "zero-weighted outlier must be ignored")
  }

  test("STL recovers planted trend + seasonal structure (M6)") {
    val period = 12
    val n = 144
    val trueTrend = Array.tabulate(n)(i => 0.1 * i + 10)
    val trueSeason = Array.tabulate(n)(i => 4 * math.sin(2 * math.Pi * (i % period) / period))
    val y = Array.tabulate(n)(i => trueTrend(i) + trueSeason(i))
    val r = Stl.decompose(y, period, robust = false)
    // seasonal correlates strongly with the planted one
    def corr(a: Array[Double], b: Array[Double]): Double = {
      val ma = a.sum / a.length; val mb = b.sum / b.length
      val num = a.zip(b).map { case (x, z) => (x - ma) * (z - mb) }.sum
      val da = math.sqrt(a.map(x => (x - ma) * (x - ma)).sum)
      val db = math.sqrt(b.map(x => (x - mb) * (x - mb)).sum)
      num / (da * db)
    }
    assert(corr(r.seasonal, trueSeason) > 0.95, s"seasonal corr ${corr(r.seasonal, trueSeason)}")
    assert(corr(r.trend, trueTrend) > 0.99)
    val residRms = math.sqrt(r.resid.map(x => x * x).sum / n)
    assert(residRms < 1.0, s"resid RMS $residRms")
  }

  test("jacobiEigSym: eigen equation, orthonormal columns, descending order") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val d = 3 + rnd.nextInt(6)
      val b = Array.fill(d, d)(rnd.nextDouble() * 2 - 1)
      val a = Array.tabulate(d, d)((i, j) => (b(i)(j) + b(j)(i)) / 2)
      val (evals, evecs) = graft.ml.Eigen.jacobiEigSym(a)
      for (f <- 1 until d)
        assert(evals(f - 1) >= evals(f) - 1e-12, s"trial $trial: order")
      for (f <- 0 until d; i <- 0 until d) {
        val av = (0 until d).map(j => a(i)(j) * evecs(j)(f)).sum
        assert(math.abs(av - evals(f) * evecs(i)(f)) < 1e-9,
          s"trial $trial: A·v != λ·v at ($i,$f)")
      }
      for (f <- 0 until d; g <- f until d) {
        val dot = (0 until d).map(i => evecs(i)(f) * evecs(i)(g)).sum
        val want = if (f == g) 1.0 else 0.0
        assert(math.abs(dot - want) < 1e-9, s"trial $trial: orthonormality ($f,$g)")
      }
    }
  }

  test("factor analysis + varimax separates two planted factors (M4)") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 400).map { _ =>
      val f1 = rnd.nextGaussian(); val f2 = rnd.nextGaussian()
      def noise = rnd.nextGaussian() * 0.3
      (f1 + noise, f1 + noise, f1 + noise, f2 + noise, f2 + noise, f2 + noise)
    }
    val df = rows.toDF("a1", "a2", "a3", "b1", "b2", "b3")
    val res = Factor.fit(df, Seq("a1", "a2", "a3", "b1", "b2", "b3"), k = 2)
    // after varimax each variable loads dominantly on exactly one factor,
    // and the two planted groups land on different factors
    def domFactor(i: Int): Int =
      if (math.abs(res.rotated(i)(0)) > math.abs(res.rotated(i)(1))) 0 else 1
    val groupA = (0 to 2).map(domFactor).distinct
    val groupB = (3 to 5).map(domFactor).distinct
    assert(groupA.size === 1 && groupB.size === 1, "groups must load coherently")
    assert(groupA.head != groupB.head, "planted factors must separate")
    for (i <- 0 to 5) {
      val strong = math.abs(res.rotated(i)(domFactor(i)))
      val weak = math.abs(res.rotated(i)(1 - domFactor(i)))
      assert(strong > 0.7 && weak < 0.4, s"var $i loadings $strong/$weak")
    }
  }
}

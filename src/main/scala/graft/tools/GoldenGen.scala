package graft.tools

/** Regenerates the golden VALUES literals for the pinned-fixture
  * driver-math queries (q61 STL, q62 wavelet) — see
  * [[graft.queries.Golden]]. Run with
  * `sbt "runMain graft.tools.GoldenGen"` and paste the printed blocks.
  *
  * Values are emitted as scaled BIGINTs k = round(x·10⁹) using the same
  * scala BigDecimal HALF_UP path Spark's `CAST(double AS DECIMAL(18,9))`
  * takes, so `CAST(k AS DOUBLE)/1e9` in DuckDB lands on exactly the
  * double Spark outputs (k < 2⁵³ converts exactly; the division is one
  * correctly-rounded operation in both engines).
  */
object GoldenGen {

  def k(x: Double): Long =
    scala.math.BigDecimal(x)
      .setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact

  def main(args: Array[String]): Unit = {
    val y = graft.ts.Pinned.series
    val r = graft.ts.Stl.decompose(y, period = 7, robust = true)
    println("-- q61 (i, vk, tk, sk, rk):")
    println(y.indices.map(i =>
      s"(${i}, ${k(y(i))}, ${k(r.trend(i))}, ${k(r.seasonal(i))}, ${k(r.resid(i))})")
      .mkString(", "))
    val den = graft.ts.Wavelet.denoise(y, levels = 2, dropLevels = 1)
    println("-- q62 (i, vk, dk):")
    println(y.indices.map(i => s"(${i}, ${k(y(i))}, ${k(den(i))})").mkString(", "))
  }
}

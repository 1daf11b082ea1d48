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
}

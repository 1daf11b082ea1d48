package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-invariant (exact) floating aggregation.
  *
  * Distributed double summation is order-dependent: partial aggregation
  * across shuffle partitions makes `sum(double)` nondeterministic in the
  * low bits, which breaks bit-exact comparison against any single-threaded
  * oracle and makes repeated runs disagree. Summing in decimal is exact
  * (Spark decimals are 128-bit scaled integers), associative, and therefore
  * plan- and partitioning-independent; casting the exact decimal result to
  * double is a single IEEE-754 rounding, identical everywhere.
  *
  * The same trick in ANSI SQL: `CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)`.
  */
object Exact {
  /** Capture scale: 6 fractional digits is beyond the 2-decimal testdata
    * measures; 30 digits of precision leaves 14 integer digits of headroom
    * over a 10-digit row count — no overflow at 100 TB scale factors.
    */
  val CaptureType: DecimalType = DecimalType(30, 6)

  /** Exact sum of a double column, returned as a deterministic double. */
  def dsum(c: Column): Column = sum(c.cast(CaptureType)).cast("double")

  /** Deterministic mean: exact sum divided by non-null count (one double op). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Windowed variants (e.g. moving averages over ordered frames). */
  def dsumOver(c: Column, w: WindowSpec): Column =
    sum(c.cast(CaptureType)).over(w).cast("double")

  def davgOver(c: Column, w: WindowSpec): Column =
    sum(c.cast(CaptureType)).over(w).cast("double") / count(c).over(w)
}

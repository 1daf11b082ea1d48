package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Space-filling-curve data layout — the write-side optimization that
  * makes multi-dimensional data skipping work at 100 TB: rows sorted by
  * the interleaved bits of two dimension grids land in files whose
  * per-column min/max ranges are tight in BOTH dimensions, so a reader
  * filtering on either dimension (or both) prunes most files, where a
  * lexicographic sort only serves its leading column.
  *
  * [[morton16]] interleaves the low 16 bits of two non-negative grid
  * coordinates (caller maps raw values onto the grid — day numbers,
  * folded keys, rank buckets); the result fits 32 bits, so every shift
  * stays far from the sign bit in any engine. Pure bit arithmetic in
  * the scan projection: deterministic, codegen-friendly, and replayable
  * as the same 32-term expression in ANSI SQL.
  *
  * [[zorderBy]] is the write path: range-partition by the code, sort
  * within partitions — a total z-order across output files without a
  * single-task global sort.
  */
object Layout {

  /** Morton (Z) code of two 16-bit grid coordinates: bit i of `a` goes
    * to bit 2i, bit i of `b` to bit 2i+1.
    */
  def morton16(a: Column, b: Column): Column = {
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until 16).map { i =>
      shiftleft(shiftrightunsigned(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The matching ANSI fragment (for oracle replay): same 32 terms. */
  def morton16Sql(a: String, b: String): String =
    (0 until 16).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Total z-order for writing: range-partition by the code (sampled
    * bounds — parallel, no single-task sort), sort within partitions.
    */
  def zorderBy(df: DataFrame, a: Column, b: Column,
               numFiles: Int): DataFrame = {
    val coded = df.withColumn("__z", morton16(a, b))
    coded.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}

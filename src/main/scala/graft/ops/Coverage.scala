package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-coverage pruning (reference `src/scripts/ETL.py:91`,
  * `supervised/evaluation.ipynb#9`: drop columns whose non-null share is
  * below a threshold).
  *
  * pandas does this in one eager pass because the frame is in memory. A
  * data-dependent projection on Spark is necessarily a two-job plan:
  * (1) a single-pass aggregate computing every column's non-null count
  * (one reduce, no shuffle of the data itself), then (2) a driver-built
  * `select` over the surviving columns. The aggregate scans each column
  * once — Parquet column pruning means only the inspected columns are read.
  */
object Coverage {

  /** One row per column: (col_name, n_nonnull, n_rows, coverage). */
  def stats(df: DataFrame): DataFrame = {
    val aggs = count(lit(1)).cast("long").as("__total") +:
      df.columns.map(c => count(col(c)).cast("long").as(c))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val long = row.unpivot(
      Array(col("__total")), df.columns.map(col), "col_name", "n_nonnull")
    long.select(
      col("col_name"),
      col("n_nonnull"),
      col("__total").as("n_rows"),
      (col("n_nonnull").cast("double") / col("__total")).as("coverage"))
  }

  /** Drop columns with coverage < minCoverage (two-job plan; see scaladoc). */
  def dropBelow(df: DataFrame, minCoverage: Double): DataFrame = {
    val counts = df.agg(
      count(lit(1)).as("__total"),
      df.columns.map(c => count(col(c)).as(c)): _*)
    val row = counts.head()
    val total = row.getAs[Long]("__total").max(1L)
    val keep = df.columns.filter { c =>
      row.getAs[Long](c).toDouble / total >= minCoverage
    }
    df.select(keep.map(col).toSeq: _*)
  }

  /** Drop columns that are entirely null (`ETL.py:224`). */
  def dropAllNull(df: DataFrame): DataFrame = {
    val counts = df.agg(
      count(lit(1)).as("__total"),
      df.columns.map(c => count(col(c)).as(c)): _*)
    val row = counts.head()
    val keep = df.columns.filter(c => row.getAs[Long](c) > 0L)
    df.select(keep.map(col).toSeq: _*)
  }
}

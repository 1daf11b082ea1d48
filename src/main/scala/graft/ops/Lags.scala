package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lag / difference feature generation over an ordered series
  * (reference: skforecast lag grids `supervised/xgb.ipynb#10`,
  * `src/scripts/optimization.py:124-128`; ARIMA differencing
  * `supervised/evaluation.ipynb#9`).
  *
  * pandas relies on physical row order; here every lag is an explicit
  * window over a real ordering key. An empty `partition` means one global
  * ordered window — fine for a single modeling series (the reference's
  * ~3.2k-row daily table), but callers with many series (e.g. per station)
  * must pass the series key so Spark hash-partitions the work.
  */
object Lags {

  /** Add `<valueCol>_lag<k>` columns for each k. */
  def withLags(df: DataFrame, valueCol: String, order: Seq[String],
               ks: Seq[Int], partition: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    ks.foldLeft(df) { (d, k) =>
      d.withColumn(s"${valueCol}_lag$k", lag(col(valueCol), k).over(w))
    }
  }

  /** d-th order difference: applies (x - lag(x, 1)) d times. */
  def withDiff(df: DataFrame, valueCol: String, order: Seq[String],
               d: Int, outCol: String, partition: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    val expr = (1 to d).foldLeft(col(valueCol)) { (e, _) => e - lag(e, 1).over(w) }
    df.withColumn(outCol, expr)
  }

  /** Inverse of one differencing step given the previous level value. */
  def undiff(diffed: Column, prevLevel: Column): Column = diffed + prevLevel

  /** Sliding-window sequence extraction (SURVEY.md W7, reference LSTM
    * window builder `src/scripts/LSTM.py:138-148`): per row, the trailing
    * `seqLen` values of `valueCol` as an ordered array plus the
    * one-step-ahead target. Window frames collect in frame order, so the
    * sequence is deterministic given a unique ordering key.
    */
  def withSequences(df: DataFrame, valueCol: String, order: Seq[String],
                    seqLen: Int, partition: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    df.withColumn(s"${valueCol}_seq",
        collect_list(col(valueCol)).over(w.rowsBetween(-(seqLen - 1), 0)))
      .withColumn(s"${valueCol}_next", lead(col(valueCol), 1).over(w))
  }
}

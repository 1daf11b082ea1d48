package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Exact

/** Additive seasonal decomposition (reference
  * `unsupervised/ts_kmeans_base.ipynb#24-28`, statsmodels
  * `seasonal_decompose(model="additive")`):
  *
  *   trend    = centered moving average over the period
  *   seasonal = mean of (value - trend) grouped by position-in-cycle
  *   residual = value - trend - seasonal
  *
  * Expressed entirely as Spark window/group aggregates — no driver
  * materialization, scales to any number of series (add the series key to
  * every window's partitioning). All means use exact decimal summation
  * ([[Exact]]) so the decomposition is bit-deterministic under any
  * partitioning.
  */
object Decompose {

  /** Decompose `valueCol` ordered by date column `dateCol`.
    *
    * @param halfWindow  centered MA half-width in rows (trend window =
    *                    2*halfWindow+1; the reference uses period 365 →
    *                    halfWindow 182)
    * @param period      cycle length in days for the seasonal component
    *                    (position = days since epoch mod period)
    */
  def seasonalAdditive(df: DataFrame, dateCol: String, valueCol: String,
                       halfWindow: Int, period: Int): DataFrame = {
    val wc = Window.orderBy(col(dateCol)).rowsBetween(-halfWindow, halfWindow)
    val withTrend = df
      .withColumn("trend", Exact.davgOver(col(valueCol), wc))
      .withColumn("dow",
        (datediff(col(dateCol), lit("2024-01-01").cast("date")) % period).cast("long"))
    val detr = withTrend.withColumn("detr", col(valueCol) - col("trend"))
    val ws = Window.partitionBy(col("dow"))
    detr
      .withColumn("seasonal", Exact.davgOver(col("detr"), ws))
      .withColumn("resid", col(valueCol) - col("trend") - col("seasonal"))
      .drop("detr")
  }
}

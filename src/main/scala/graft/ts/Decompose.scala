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

  /** Decompose `valueCol` ordered by date column `dateCol`, independently
    * per series identified by `partition` (empty = one global series — a
    * single-partition window, acceptable only for one already-aggregated
    * series; many-series data MUST pass the key or the whole table
    * funnels through one task).
    *
    * @param halfWindow  centered MA half-width in rows (trend window =
    *                    2*halfWindow+1; the reference uses period 365 →
    *                    halfWindow 182)
    * @param period      cycle length in days for the seasonal component
    *                    (position = days since epoch mod period)
    */
  def seasonalAdditive(df: DataFrame, dateCol: String, valueCol: String,
                       halfWindow: Int, period: Int,
                       partition: Seq[String] = Nil): DataFrame = {
    val pcols = partition.map(col)
    val wc = Window.partitionBy(pcols: _*).orderBy(col(dateCol))
      .rowsBetween(-halfWindow, halfWindow)
    // gavgOver, not davgOver: the inputs here are COMPUTED doubles (daily
    // means, detrended values) whose decimal expansions tie exactly on
    // the capture grid — see Exact.gavgOver.
    val withTrend = df
      .withColumn("trend", Exact.gavgOver(col(valueCol), wc))
      .withColumn("dow",
        (datediff(col(dateCol), lit("2024-01-01").cast("date")) % period).cast("long"))
    val detr = withTrend.withColumn("detr", col(valueCol) - col("trend"))
    val ws = Window.partitionBy(pcols :+ col("dow"): _*)
    detr
      .withColumn("seasonal", Exact.gavgOver(col("detr"), ws))
      .withColumn("resid", col(valueCol) - col("trend") - col("seasonal"))
      .drop("detr")
  }
}

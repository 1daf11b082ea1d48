package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered train/validation splitting as pure column math.
  *
  * Reference: blocked time-series CV (`src/scripts/utils.py:8-23`) splits n
  * rows into `nSplits` contiguous blocks; within each block the first
  * (1 - valSize) fraction is train and the tail is validation. The pandas
  * version yields driver-side index arrays; here the fold id and val flag
  * are columns, so every fold's train/val frames are plain filters — no
  * driver materialization, and all folds can be computed in one pass.
  */
object Splits {

  /** Adds `fold` (0-based) and `is_val` over the given ordering.
    * Block f covers row numbers rn in [floor(f*n/k), floor((f+1)*n/k)),
    * and the last ceil(valSize * blockLen) rows of each block are val.
    */
  def blockedFolds(df: DataFrame, order: Seq[String], nSplits: Int,
                   valSize: Double = 0.2): DataFrame = {
    val w = Window.orderBy(order.map(col): _*)
    val n = Window.partitionBy()
    val withRn = df
      .withColumn("__rn", row_number().over(w) - 1)
      .withColumn("__n", count(lit(1)).over(n))
    val withFold = withRn
      .withColumn("fold", floor(col("__rn") * nSplits / col("__n")).cast("int"))
    val wf = Window.partitionBy(col("fold")).orderBy(order.map(col): _*)
    withFold
      .withColumn("__rnf", row_number().over(wf))
      .withColumn("__nf", count(lit(1)).over(Window.partitionBy(col("fold"))))
      .withColumn("is_val",
        col("__rnf") > (col("__nf") - ceil(col("__nf") * valSize)))
      .drop("__rn", "__n", "__rnf", "__nf")
  }

  /** Positional train/test split (reference 85/15 `evaluation.ipynb#9`):
    * adds `is_train` = row among the first floor(frac * n) in order.
    */
  def positionalSplit(df: DataFrame, order: Seq[String], frac: Double): DataFrame = {
    val w = Window.orderBy(order.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("is_train", col("__rn") <= floor(col("__n") * frac))
      .drop("__rn", "__n")
  }

  /** Growing-prefix learning-curve windows (`evaluation.ipynb#37-39`):
    * rows in the first floor(frac*n) of the ordering.
    */
  def prefix(df: DataFrame, order: Seq[String], frac: Double): DataFrame = {
    val w = Window.orderBy(order.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
      .filter(col("__rn") <= floor(col("__n") * frac))
      .drop("__rn", "__n")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe per-key top-k (SURVEY.md W13 at scale).
  *
  * A plain `row_number().over(partitionBy(key))` shuffles EVERY row of a
  * key into one task — with low-cardinality keys (the reference's 5 order
  * priorities) parallelism collapses to the key count. Two stages fix it
  * exactly: stage 1 ranks within (key, input-partition) — as many tasks
  * as partitions — and keeps k rows per pair; stage 2 ranks the surviving
  * ≤ k × partitions rows per key, which is tiny. The result is identical
  * to the single-window form for any deterministic ordering.
  */
object TopK {

  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                 k: Int, rankCol: String = "rnk"): DataFrame = {
    val local = Window
      .partitionBy((keys.map(col) :+ spark_partition_id()): _*)
      .orderBy(order: _*)
    val pruned = df
      .withColumn("__lrn", row_number().over(local))
      .filter(col("__lrn") <= k)
      .drop("__lrn")
    val global = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    pruned
      .withColumn(rankCol, row_number().over(global).cast("long"))
      .filter(col(rankCol) <= k)
  }
}

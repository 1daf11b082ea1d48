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

  /** Global top-k by `(scoreCol DESC, idCol ASC)` with the rank
    * appended — the corpus-sized-frame form of [[topKPerKey]]. When
    * `idCol` is a unique LongType key (every registered caller — BM25,
    * DSIR selection, priority sampling rank over `doc_id`), the rank
    * comes from the [[TopKAgg]] map-side-combined aggregate: each map
    * task ships one ≤ k-pair sorted buffer through the shuffle and the
    * ≤ k winners join back by id to re-attach the caller's columns (an
    * AQE-broadcast k-row side — the corpus streams, nothing exchanges).
    *
    * What the combiner actually buys over [[topKPerKey]] here was
    * re-measured in round 14 (SCALE.md `topk` decade): for a STRICT
    * rank ≤ k filter Spark's own InferWindowGroupLimit already prunes
    * map-side BEFORE the exchange, so the window form's shuffle is
    * k-sized too — but it still fully SORTS every input partition to
    * rank it (n·log n + spill per task), where the aggregate keeps an
    * O(k) insertion buffer per task. Measured at 100M rows: window
    * 76.0 s (max task 75.3 s — the per-partition sort) vs combiner
    * 5.7 s. (The 12 GB all-rows exchange SCALE.md round 13 recorded
    * was the MARGIN-retention window — `rank ≤ k OR score ≥ kth −
    * margin` defeats the WindowGroupLimit pushdown, so that form
    * really does exchange everything.) The price is a second scan of
    * `df` (the join probe) — visible as ~+0.4 s per query at sf0.1,
    * amortized to noise by 1M rows, dominated by the removed sort
    * beyond.
    *
    * Rank parity with the window form is exact: the aggregate orders
    * (score desc, id asc) with Spark's NaN-largest double semantics
    * (TopKAggSpec), and the score/attribute values come from the
    * original rows via the join-back, so hash-compared outputs are
    * bit-identical. Non-long id types (no join-back key contract)
    * fall back to the windowed form.
    */
  def globalTopKByScore(df: DataFrame, scoreCol: String, idCol: String,
                        k: Int, rankCol: String = "rnk"): DataFrame = {
    // the combiner is typed (Double score, Long id); any other types
    // (a >2⁵³ long score would round under a double cast, a string id
    // has no join-back contract) take the windowed form unchanged
    if (df.schema(idCol).dataType != org.apache.spark.sql.types.LongType ||
        df.schema(scoreCol).dataType != org.apache.spark.sql.types.DoubleType)
      return topKPerKey(df, Seq.empty,
        Seq(col(scoreCol).desc, col(idCol).asc), k, rankCol)
    val winners = df
      .agg(TopKAgg.topK(col(scoreCol), col(idCol), k)
        .as("__top"))
      .select(posexplode(col("__top")).as(Seq("__pos", "__t")))
      // the aggregate's margin-superset contract keeps score-TIES at
      // the k-th even at margin 0 (cosineTopK wants exactly that);
      // this operator promises the window form's strict k, so cut at
      // the buffer position — positions are the true row_number
      .filter(col("__pos") < k)
      .select(col("__t._2").as(idCol),
        (col("__pos") + 1).cast("long").as(rankCol))
    df.join(winners, Seq(idCol))
      .select(df.columns.map(col) :+ col(rankCol): _*)
  }
}

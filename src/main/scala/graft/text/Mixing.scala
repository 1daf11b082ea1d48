package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup.md5Hash64
import graft.ops.Splits

/** Deterministic data mixing — the "mixture weights" stage of a training
  * pipeline (the Pile / LLaMA-style source ratios): interleave documents
  * from weighted groups into ONE global reading order such that every
  * prefix of the stream holds each group at (nearly) its target ratio.
  *
  * Mechanics are stride scheduling: within each group, documents get a
  * deterministic shuffle order (md5 of id — reproducible, not
  * partition-dependent) and the i-th document of group g is keyed
  * (i + 0.5) / w_g; sorting by that key interleaves groups so a prefix
  * up to key T holds ⌊T·w_g + 0.5⌋ docs of each group — within one doc
  * of the target ratio at every point. The key is one IEEE double
  * division of exact inputs, so engines agree bit-for-bit.
  *
  * Scale shape: both the per-group index and the final mix position use
  * [[Splits.withGlobalRowNumberCols]] (range partition + per-partition
  * offsets — the zipWithIndex scheme), never an unpartitioned window and
  * never a per-group window (group cardinality is tiny, a window keyed
  * on it would collapse parallelism). Groups absent from `weights` are
  * excluded — the mixture definition IS the output contract.
  */
object Mixing {

  def interleave(df: DataFrame, groupCol: String, idCol: String,
                 weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0.0),
      "mixture weights must be positive")
    val kept = df.filter(col(groupCol).isin(weights.keys.toSeq: _*))
      .withColumn("__h", md5Hash64(col(idCol).cast("string")))
    // global order (group, h, id) gives each group a contiguous rank
    // range; subtracting the group's min yields its 0-based stream index
    val (ranked, _) = Splits.withGlobalRowNumberCols(kept,
      Seq(col(groupCol), col("__h"), col(idCol)), "__grn")
    val offsets = ranked.groupBy(groupCol).agg(min(col("__grn")).as("__off"))
    val wCol = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (g, w)) => when(col(groupCol) === g, lit(w)).otherwise(acc)
    }
    val keyed = ranked
      .join(broadcast(offsets), Seq(groupCol))
      .withColumn("src_rank", col("__grn") - col("__off"))
      .withColumn("mix_key",
        (col("src_rank").cast("double") + lit(0.5)) / wCol)
      .drop("__h", "__grn", "__off")
    val (mixed, _) = Splits.withGlobalRowNumberCols(keyed,
      Seq(col("mix_key"), col(groupCol), col(idCol)), "mix_pos")
    mixed
  }

  /** Deterministic epoch shuffle — the global reading order for one
    * training epoch. Position = rank of md5Hash64(salt#epoch#id) (ties
    * to the smaller id): a pure function of (corpus, epoch), so the
    * order is reproducible across reruns, resumable mid-epoch, and
    * independent of input partitioning — the properties an RNG-based
    * shuffle loses the moment the cluster layout changes. Different
    * epochs give independent permutations (the hash re-keys per epoch).
    *
    * Scale shape: ranks come from [[Splits.withGlobalRowNumberCols]]
    * (range partition on the hash + per-partition offsets — the
    * zipWithIndex scheme), never a single-partition window; the sort
    * key is 8 bytes regardless of row width. Output adds a 0-based
    * `pos` column.
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Long,
                   salt: String = "graft-epoch"): DataFrame = {
    val keyed = df.withColumn("__h",
      md5Hash64(concat(lit(s"$salt#$epoch#"), col(idCol).cast("string"))))
    val (ranked, _) = Splits.withGlobalRowNumberCols(keyed,
      Seq(col("__h"), col(idCol)), "__rn")
    ranked.withColumn("pos", col("__rn") - 1).drop("__h", "__rn")
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Ordered train/validation splitting as pure column math.
  *
  * Reference: blocked time-series CV (`src/scripts/utils.py:8-23`) splits n
  * rows into `nSplits` contiguous blocks; within each block the first
  * (1 - valSize) fraction is train and the tail is validation. The pandas
  * version yields driver-side index arrays; here the fold id and val flag
  * are columns, so every fold's train/val frames are plain filters — no
  * driver materialization, and all folds can be computed in one pass.
  *
  * Scale design: the global ordering these ops need is NOT a
  * `Window.orderBy(...)` with no partition — that funnels the whole table
  * through one task. [[withGlobalRowNumber]] instead range-partitions on
  * the sort key, sorts within partitions, takes one tiny action for the
  * per-partition counts (the range shuffle is materialized once and its
  * shuffle files are reused by the main query), and assigns ranks in a
  * narrow `mapPartitions` from broadcast offsets — the classic
  * zipWithIndex scheme: two waves over the shuffle output, never a
  * single-partition stage.
  */
object Splits {

  /** Adds a 1-based global row number `out` over `order` without any
    * unpartitioned window, plus returns the total row count (known from
    * the same pass). Ties on the sort key land in one range partition, so
    * rank sets per key group are stable under re-partitioning.
    */
  def withGlobalRowNumber(df: DataFrame, order: Seq[String],
                          out: String): (DataFrame, Long) =
    withGlobalRowNumberCols(df, order.map(col), out)

  /** Column-expression variant (supports e.g. `col("day").desc`). */
  def withGlobalRowNumberCols(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
                              out: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // One concrete RDD for both jobs below. Range-partition boundaries are
    // SAMPLED per physical planning, so two separate DataFrame actions over
    // the same logical plan may disagree on boundaries; pinning a single
    // RDD means the counts job materializes the shuffle and the rank job
    // reuses those exact shuffle files (its shuffle stage is skipped).
    val rdd = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .rdd
    // Small action: ≤ `parts` longs to the driver.
    val counts = rdd.mapPartitions(it => Iterator(it.size.toLong), preservesPartitioning = true)
      .collect()
    val n = counts.sum
    val offsets = counts.scanLeft(0L)(_ + _)
    val outSchema = df.schema.add(out, LongType, nullable = false)
    val rowRdd = rdd.mapPartitionsWithIndex { case (pid, rows) =>
      var i = offsets(pid)
      rows.map { r => i += 1; Row.fromSeq(r.toSeq :+ i) }
    }
    (spark.createDataFrame(rowRdd, outSchema), n)
  }

  /** The zipWithIndex scheme generalized from ranks to SUMS: adds an
    * EXCLUSIVE global prefix sum `out` of long column `valueCol` over
    * the given ordering (row's value excluded — its value starts at
    * `out`), plus returns the grand total from the same pass. Same
    * two-wave shape as [[withGlobalRowNumberCols]]: range partition +
    * in-partition sort materialized once, per-partition subtotals (≤
    * `parts` longs) to the driver, offsets broadcast back into a narrow
    * `mapPartitions` — never a single-partition running-sum window.
    * This is the global-offset primitive behind concat-and-cut example
    * packing (q169) and any byte/token-offset layout job.
    */
  def withGlobalPrefixSumCols(df: DataFrame,
                              sortCols: Seq[org.apache.spark.sql.Column],
                              valueCol: String, out: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val vIdx = df.schema.fieldIndex(valueCol)
    require(df.schema(vIdx).dataType == LongType,
      s"$valueCol must be LONG, got ${df.schema(vIdx).dataType.simpleString}")
    val rdd = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .rdd
    val subtotals = rdd.mapPartitions(it => {
      var s = 0L; it.foreach(r => s += r.getLong(vIdx)); Iterator(s)
    }, preservesPartitioning = true).collect()
    val total = subtotals.sum
    val offsets = subtotals.scanLeft(0L)(_ + _)
    val outSchema = df.schema.add(out, LongType, nullable = false)
    val rowRdd = rdd.mapPartitionsWithIndex { case (pid, rows) =>
      var acc = offsets(pid)
      rows.map { r =>
        val start = acc; acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ start)
      }
    }
    (spark.createDataFrame(rowRdd, outSchema), total)
  }

  /** Adds `fold` (0-based) and `is_val` over the given ordering.
    * Block f covers 0-based row numbers in [floor(f*n/k), floor((f+1)*n/k));
    * the last ceil(valSize * blockLen) rows of each block are val. Fold
    * boundaries are plain arithmetic on the global row number — no
    * per-fold window pass.
    */
  def blockedFolds(df: DataFrame, order: Seq[String], nSplits: Int,
                   valSize: Double = 0.2): DataFrame = {
    val (ranked, n) = withGlobalRowNumber(df, order, "__rn1")
    val rn0 = ranked("__rn1") - 1
    // fold(rn0) = floor(rn0*k/n), whose inverse block ranges are
    // [ceil(f*n/k), ceil((f+1)*n/k)) in 0-based row numbers.
    val fold = floor(rn0 * nSplits / lit(n)).cast("int")
    val blockStart = ceil(col("fold").cast("long") * n / nSplits)
    val blockEnd = ceil((col("fold") + 1).cast("long") * n / nSplits)
    ranked
      .withColumn("fold", fold)
      .withColumn("__rnf", col("__rn1") - blockStart)
      .withColumn("__nf", blockEnd - blockStart)
      .withColumn("is_val",
        col("__rnf") > (col("__nf") - ceil(col("__nf") * valSize)))
      .drop("__rn1", "__rnf", "__nf")
  }

  /** Positional train/test split (reference 85/15 `evaluation.ipynb#9`):
    * adds `is_train` = row among the first floor(frac * n) in order.
    */
  def positionalSplit(df: DataFrame, order: Seq[String], frac: Double): DataFrame = {
    val (ranked, n) = withGlobalRowNumber(df, order, "__rn1")
    ranked
      .withColumn("is_train", col("__rn1") <= math.floor(n * frac).toLong)
      .drop("__rn1")
  }

  /** Growing-prefix learning-curve windows (`evaluation.ipynb#37-39`):
    * rows in the first floor(frac*n) of the ordering.
    */
  def prefix(df: DataFrame, order: Seq[String], frac: Double): DataFrame = {
    val (ranked, n) = withGlobalRowNumber(df, order, "__rn1")
    ranked.filter(col("__rn1") <= math.floor(n * frac).toLong).drop("__rn1")
  }

  /** Positional (index) join (SURVEY.md J6, reference RangeIndex joins
    * `ts_kmeans_base.ipynb#79`, `evaluation.ipynb#13`): align the i-th row
    * of `left` in `leftOrder` with the i-th row of `right` in
    * `rightOrder`. pandas aligns on the implicit positional index; here
    * both sides get an explicit scale-safe global rank and equi-join on
    * it (inner: the shorter side bounds the result).
    */
  def positionalJoin(left: DataFrame, leftOrder: Seq[org.apache.spark.sql.Column],
                     right: DataFrame, rightOrder: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val (l, _) = withGlobalRowNumberCols(left, leftOrder, "__pos")
    val (r, _) = withGlobalRowNumberCols(right, rightOrder, "__pos")
    l.join(r, Seq("__pos")).drop("__pos")
  }

  /** Deterministic hash-based split assignment — the standard
    * train/val/test partition of a training corpus: u =
    * (md5Hash64(id ++ salt) + 2⁶³) / 2⁶⁴ ∈ [0,1) and the id lands in the
    * first split whose cumulative fraction exceeds u. Adds `u_unit`
    * (the unit-interval hash) and `split` (the assigned name).
    *
    * Properties a sampling-based split lacks: stable under reruns,
    * re-partitioning, corpus growth (a document's assignment never
    * changes when OTHER documents arrive — the property that keeps eval
    * sets fixed across crawl snapshots), and replayable by any engine
    * with md5 (the q140/q138 salted-hash family). Pure scan projection:
    * no shuffle, no state, no count() pre-pass. Cumulative thresholds
    * are accumulated in IEEE order on the driver and embedded as
    * literals, so the boundary doubles are engine-identical.
    */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
                fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty, "need at least one split")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val u = (graft.dedup.Dedup.md5Hash64(
        concat(col(idCol).cast("string"), lit(salt))).cast("double") +
      lit(9.223372036854776e18)) / lit(1.8446744073709552e19)
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val assign = fractions.init.zip(cum.init).foldRight(
        lit(fractions.last._1): org.apache.spark.sql.Column) {
      case (((name, _), c), acc) => when(u < lit(c), lit(name)).otherwise(acc)
    }
    // a NULL id hashes to NULL u: surface it as a NULL split rather than
    // silently landing in the last fraction (every `u < c` is null, so
    // the bare otherwise(...) chain would label it fractions.last)
    df.withColumn("u_unit", u)
      .withColumn("split", when(u.isNotNull, assign))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Partitioned forward/backward fill with optional row limits.
  *
  * Re-expresses the reference's per-station pandas
  * `ffill(limit=7)`/`bfill(limit=7)` loop (reference `src/scripts/ETL.py:228-242`)
  * and its global fills (`ETL.py:93`, `src/notebooks/normalization.ipynb#16`) as
  * Spark window expressions. The pandas per-group Python loop is exactly
  * `Window.partitionBy(group)` — hash-partitioned parallel execution, no
  * driver loop, scales with the number of groups.
  *
  * Scale note: an EMPTY `partitionBy` produces a single-partition window
  * (the whole dataset streams through one task). That is semantically
  * forced only for a truly global fill; callers should partition by a
  * coarse calendar bucket (e.g. month) whenever fills cannot cross that
  * boundary — see `Disaggregate` for the month-partitioned case.
  */
object Fills {

  /** Fill nulls in `c` from the most recent non-null value within the same
    * partition, looking back at most `limit` rows (None = unbounded).
    */
  def ffill(c: Column, partition: Seq[Column], order: Seq[Column],
            limit: Option[Int] = None): Column = {
    val base = Window.partitionBy(partition: _*).orderBy(order: _*)
    val w = limit match {
      case Some(l) => base.rowsBetween(-l.toLong, 0)
      case None    => base.rowsBetween(Window.unboundedPreceding, 0)
    }
    last(c, ignoreNulls = true).over(w)
  }

  /** Symmetric backward fill: next non-null within `limit` following rows. */
  def bfill(c: Column, partition: Seq[Column], order: Seq[Column],
            limit: Option[Int] = None): Column = {
    val base = Window.partitionBy(partition: _*).orderBy(order: _*)
    val w = limit match {
      case Some(l) => base.rowsBetween(0, l.toLong)
      case None    => base.rowsBetween(0, Window.unboundedFollowing)
    }
    first(c, ignoreNulls = true).over(w)
  }

  /** Apply ffill-then-bfill to a set of columns in one pass (the reference's
    * `df.ffill(limit=7); df.bfill(limit=7)` per station, `ETL.py:236-237`).
    */
  def fillBoth(df: DataFrame, cols: Seq[String], partition: Seq[String],
               order: Seq[String], limit: Option[Int]): DataFrame = {
    val p = partition.map(col)
    val o = order.map(col)
    val filled = cols.map { c =>
      coalesce(ffill(col(c), p, o, limit), bfill(col(c), p, o, limit)).as(c)
    }
    val passthrough = df.columns.filterNot(cols.contains).map(col)
    df.select(passthrough ++ filled: _*)
  }

  /** Scale-safe GLOBAL unbounded ffill/bfill (W4) — the case an empty
    * `partitionBy` would funnel through ONE task. Classic two-wave scan
    * instead: range-partition + sort on `order`, a tiny boundary job
    * collecting each partition's carry-out value per column (the last
    * non-null for forward, first non-null for backward; ≤ parts×cols
    * values to the driver), a driver prefix/suffix scan of those
    * carries, then one narrow `mapPartitions` that fills with the
    * broadcast carry-in — every wave parallel, no single-partition
    * stage. The backward pass materializes each partition to scan it in
    * reverse: the same memory class as the sort buffer that produced it.
    */
  def globalFill(df: DataFrame, cols: Seq[String],
                 order: Seq[Column], backward: Boolean): DataFrame = {
    import org.apache.spark.sql.Row
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // Total ordering: the two waves below are separate JOBS over the
    // same shuffle, and a reduce-side sort re-runs per job with
    // randomized block-fetch order — ties on the caller's sort key
    // could order differently between the carry-collect and the fill,
    // producing fills consistent with NO single ordering. A
    // deterministic input-position tiebreaker makes both sorts total —
    // and the keyed frame is PINNED (eagerly materialized, lineage
    // truncated) so the tie ids are assigned exactly once: without the
    // pin, a nondeterministic upstream (e.g. a shuffle recomputed on
    // stage retry) could hand wave 2 different ids than wave 1 and the
    // fills would disagree with the collected carries.
    val tie = "__gf_tie"
    val keyed = Pin.pin(df.withColumn(tie, monotonically_increasing_id()))
    val rdd = keyed.repartitionByRange(parts, order :+ col(tie): _*)
      .sortWithinPartitions(order :+ col(tie): _*).rdd
    val schema = keyed.schema
    val idxs = cols.map(schema.fieldIndex).toArray
    val nCols = idxs.length
    // wave 1: per-partition carry-out values
    val edges: Array[Array[Any]] = rdd.mapPartitions { it =>
      val edge = new Array[Any](nCols)
      if (backward) {
        var found = 0
        while (it.hasNext && found < nCols) {
          val r = it.next()
          var c = 0
          while (c < nCols) {
            if (edge(c) == null && !r.isNullAt(idxs(c))) {
              edge(c) = r.get(idxs(c)); found += 1
            }
            c += 1
          }
        }
      } else it.foreach { r =>
        var c = 0
        while (c < nCols) {
          if (!r.isNullAt(idxs(c))) edge(c) = r.get(idxs(c))
          c += 1
        }
      }
      Iterator.single(edge)
    }.collect()
    // driver scan: carry(p) = the value entering partition p
    val nP = edges.length
    val carry = Array.fill(nP)(new Array[Any](nCols))
    if (backward) {
      for (p <- nP - 2 to 0 by -1; c <- 0 until nCols)
        carry(p)(c) = if (edges(p + 1)(c) != null) edges(p + 1)(c) else carry(p + 1)(c)
    } else {
      for (p <- 1 until nP; c <- 0 until nCols)
        carry(p)(c) = if (edges(p - 1)(c) != null) edges(p - 1)(c) else carry(p - 1)(c)
    }
    val bc = spark.sparkContext.broadcast(carry)
    val filledRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val cur = bc.value(pid).clone()
      def fillRow(r: Row): Row = {
        val vals = r.toSeq.toArray
        var c = 0
        while (c < nCols) {
          if (vals(idxs(c)) == null) vals(idxs(c)) = cur(c)
          else cur(c) = vals(idxs(c))
          c += 1
        }
        Row.fromSeq(vals.toSeq)
      }
      if (!backward) it.map(fillRow)
      else {
        val rows = it.toArray
        val out = new Array[Row](rows.length)
        var i = rows.length - 1
        while (i >= 0) { out(i) = fillRow(rows(i)); i -= 1 }
        out.iterator
      }
    }
    spark.createDataFrame(filledRdd, schema).drop(tie)
  }
}

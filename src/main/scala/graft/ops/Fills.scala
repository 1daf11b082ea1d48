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
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins/windows beyond the reference's inventory (SURVEY
  * §2.4 notes them absent; any time-series engine user expects them):
  *
  *  - [[asofJoin]]: for every left row, the latest right row with
  *    `rightTime <= leftTime` within the same key — composed from a
  *    union + per-key ordered ffill window, so it scales as one shuffle
  *    on (key) with no custom physical operator.
  *  - [[sessionize]]: gap-based session ids per key (the standard
  *    sessionization idiom: lag → gap flag → running sum).
  */
object AsOf {

  /** Backward as-of join. `valueCols` are the right-side columns carried
    * to the left rows (null when no right row precedes). Both inputs
    * shuffle once on `key`; within each key the union is ordered by
    * (time, right-first tie-break: at equal timestamps the right row is
    * visible to the left row — DuckDB ASOF `>=` semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               valueCols: Seq[String]): DataFrame = {
    val clash = valueCols.filter(left.columns.contains)
    require(clash.isEmpty,
      s"left side already has value column(s) ${clash.mkString(", ")} — rename before the as-of join")
    val l = left.withColumn("__t", col(leftTime)).withColumn("__src", lit(1))
    val r = right.select((key +: rightTime +: valueCols).map(col): _*)
      .withColumn("__t", col(rightTime)).withColumn("__src", lit(0))
      .drop(rightTime)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = valueCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__src") === 1).drop("__t", "__src")
  }

  /** Gap-based sessionization: a new session starts when the time since
    * the key's previous event exceeds `gap` (in the time column's own
    * unit after a long cast — seconds for timestamps, raw ticks for
    * numeric time columns). Adds `session_id` (0-based per key, in
    * (time, tieBreak) order — pass a unique tie-break column when
    * timestamps can collide, or lag order is nondeterministic).
    */
  def sessionize(df: DataFrame, key: String, timeCol: String, gap: Long,
                 tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (timeCol +: tieBreak).map(col)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    val prev = lag(col(timeCol), 1).over(w)
    val isNew = when(prev.isNull, 0)
      .when(col(timeCol).cast("long") - prev.cast("long") > gap, 1)
      .otherwise(0)
    df.withColumn("__new", isNew)
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .drop("__new")
  }
}

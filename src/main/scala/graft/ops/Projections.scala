package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Name-driven projections (SURVEY.md P1/P2): schemas are metadata, so
  * these are driver-side filters over `df.columns` compiled into one
  * `select` — Catalyst sees a plain projection and prunes the scan.
  */
object Projections {

  /** Keep columns matching `pred` plus `always` (reference "Adjusted"
    * not "Imputed" + first 4 + Region, `ETL.py:71-72`), in original order.
    */
  def selectByName(df: DataFrame, pred: String => Boolean,
                   always: Seq[String] = Nil): DataFrame = {
    val keep = df.columns.filter(c => always.contains(c) || pred(c))
    df.select(keep.map(col).toSeq: _*)
  }

  /** Drop columns whose name contains `word` (reference FLAG-column drop,
    * `ETL.py:186-195`).
    */
  def dropByContains(df: DataFrame, word: String): DataFrame =
    df.select(df.columns.filterNot(_.contains(word)).map(col).toSeq: _*)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over a testdata scale-factor directory; SQL-expressible
  * queries carry an equivalent DuckDB oracle for the driver's hash compare.
  */
object SparkEntry {

  /** All registered queries, in registration order. */
  def registry: Seq[Q] =
    queries_relational ++ queries_series ++ queries_text ++ queries_ml ++
      graft.queries.Capstones.all

  private def queries_relational = graft.queries.Relational.all
  private def queries_series     = graft.queries.Series.all
  private def queries_text       = graft.queries.Text.all
  private def queries_ml         = graft.queries.Ml.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The proportional-disaggregation pipeline (SURVEY.md §7.1 / M24).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Disaggregate.query(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.impl).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation over a testdata
  * scale-factor directory, plus (when SQL-expressible) an equivalent ANSI
  * SQL string the driver runs in DuckDB over the same parquet tables.
  *
  * Oracle-parity rules (see repo prompt + SURVEY.md §5):
  *  - result column names must match the SQL aliases exactly;
  *  - no raw event timestamps in outputs (testdata `events.ts` carries
  *    nanoseconds; Spark truncates to microseconds, DuckDB does not) —
  *    always reduce to DATE or coarser;
  *  - derived integers cast to BIGINT (DuckDB's extract/len return BIGINT);
  *  - double aggregation goes through [[graft.ops.Exact]] so results are
  *    bit-identical regardless of partitioning.
  */
final case class Q(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(impl: (SparkSession, String) => DataFrame): Q =
    Q(name, impl, Some(sql))
  def noOracle(name: String)(impl: (SparkSession, String) => DataFrame): Q =
    Q(name, impl, None)
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * Each table is a single parquet file under the scale-factor dir.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4 cannot
  * represent (TimestampType is microseconds) and rejects at scan time. We
  * read it as a raw nanosecond LONG (`spark.sql.legacy.parquet.nanosAsLong`
  * — a dynamic SQL conf, safe to set per-session here) and convert
  * explicitly where needed. Day-level truncation is unaffected by the
  * ns→µs difference, so date-grain results agree bit-for-bit with engines
  * that keep full nanosecond precision.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Calendar day of the ns-long `ts` column (UTC). */
  def eventDay: Column = to_date(timestamp_micros(expr("ts div 1000")))

  /** Calendar month start of the ns-long `ts` column (UTC). */
  def eventMonth: Column = trunc(eventDay, "month")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "region")
  /** Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the session
    * (set at construction in Verify/Bench/TestSession) — mutating the conf
    * here as a loader side effect would make scan behavior depend on call
    * order.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}

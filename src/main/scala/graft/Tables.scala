package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * Each table is a single parquet file under the scale-factor dir.
  *
  * `events.ts` has been observed under two physical parquet types across
  * testdata regenerations: TIMESTAMP(NANOS) — which Spark 4 cannot
  * represent natively (TimestampType is microseconds) and surfaces as a
  * raw nanosecond LONG under `spark.sql.legacy.parquet.nanosAsLong=true`
  * — and TIMESTAMP_MICROS, which surfaces as TIMESTAMP / TIMESTAMP_NTZ.
  * [[events]] dispatches on the scanned type and normalizes `ts` to one
  * canonical contract, an epoch-nanosecond LONG, so every downstream
  * consumer ([[eventDay]], gap sessionization's ns arithmetic, ts-ordered
  * windows) sees a single stable type regardless of which physical form
  * the generator wrote. Day-level truncation is unaffected by the ns→µs
  * difference, so date-grain results agree bit-for-bit with engines that
  * keep full precision, and `epoch_ns(ts)` in DuckDB matches the LONG
  * exactly under either physical type.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Calendar day of the canonical ns-long `ts` column (UTC). */
  def eventDay: Column = to_date(timestamp_micros(expr("ts div 1000")))

  /** Calendar month start of the canonical ns-long `ts` column (UTC). */
  def eventMonth: Column = trunc(eventDay, "month")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "region")
  /** Loads `events` and normalizes `ts` to an epoch-nanosecond LONG,
    * whichever physical type the parquet carries (see class doc). The
    * NANOS-as-LONG path additionally requires
    * `spark.sql.legacy.parquet.nanosAsLong=true` on the session (set at
    * construction in Verify/Bench/TestSession) — mutating the conf here as
    * a loader side effect would make scan behavior depend on call order.
    *
    * Scale note: the normalization is a plain projection over the scan —
    * filters on other columns still push down past it, and `ts` itself is
    * never a pushable predicate in this suite (queries filter on ids and
    * derived days, not raw timestamps).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw // TIMESTAMP(NANOS) read as ns-long: already canonical
      case TimestampType =>
        raw.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        // Session timezone is pinned to UTC (Verify/Bench/TestSession), so
        // the NTZ→TZ cast is the identity on the underlying micros value.
        raw.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other (expected ns-LONG or TIMESTAMP[_NTZ])")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}

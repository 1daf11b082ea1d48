package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Geo
import graft.pipelines.Pipelines
import graft.sources.FixedWidth

/** End-to-end seeded pipeline tests over FIXTURES.md §A-shaped data
  * (SURVEY.md §5.4): the three reference lifecycles composed from engine
  * combinators must reproduce the reference's output shapes and
  * hand-computable values.
  */
class PipelinesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("balance pipeline: project, filter, align, rename, prune, bfill (§3.1)") {
    val y2023 = Seq(
      ("MISO", "2023-01-01", 1, "2023-01-01 01:00:00", Some(100.0), Some(90.0), 5.0, "MIDW"),
      ("MISO", "2023-01-01", 2, "2023-01-01 02:00:00", None, Some(91.0), 5.0, "MIDW"),
      ("PJM", "2023-01-01", 1, "2023-01-01 01:00:00", Some(500.0), Some(480.0), 5.0, "MIDA"))
      .toDF("Balancing Authority", "Data Date", "Hour Number", "Local Time at End of Hour",
        "Demand (MW) (Adjusted)", "Net Generation (MW) (Adjusted)",
        "Demand (MW) (Imputed)", "Region")
    // ragged second year: no net generation column
    val y2024 = Seq(
      ("MISO", "2024-01-01", 1, "2024-01-01 01:00:00", Some(110.0), 6.0, "MIDW"))
      .toDF("Balancing Authority", "Data Date", "Hour Number", "Local Time at End of Hour",
        "Demand (MW) (Adjusted)", "Demand (MW) (Imputed)", "Region")

    val out = Pipelines.balanceSheet(Seq(y2023, y2024), coverage = 0.5, minNonNulls = 3)
    assert(out.columns.toSeq === Seq("balancing_authority", "data_date", "hour_number",
      "local_time_end_hour", "demand", "net_generation", "region"))
    val rows = out.orderBy("local_time_end_hour").collect()
    assert(rows.length === 3, "non-MISO row must be filtered out")
    // bfill filled the null demand at hour 2 of 2023? No: null was hour 2 demand
    val h2 = rows(1)
    assert(h2.getAs[Double]("demand") === 110.0, "bfill must pull the next non-null demand")
    // net_generation missing for 2024 row (ragged union) stays null at the tail
    assert(rows(2).isNullAt(rows(2).fieldIndex("net_generation")))
  }

  test("weather pipeline end-to-end from .dly + stations + polygon (§3.2)") {
    def grp(v: String) = f"${v}%5s" + "   "
    def dlyLine(id: String, year: Int, month: Int, elem: String, vals: Int => String) =
      id + f"$year%4d" + f"$month%02d" + elem + (1 to 31).map(d => grp(vals(d))).mkString
    // in-polygon US station: TMAX with a short -9999 run (fillable) and Feb 30/31 slots
    val inUs = "US00INPOLY1"
    val outUs = "US00OUTSIDE"   // outside polygon
    val inCa = "CA00INPOLY2"    // inside but not US
    val lines = Seq(
      dlyLine(inUs, 2023, 2, "TMAX", d => if (d == 3 || d == 4) "-9999" else (d * 10).toString),
      dlyLine(inUs, 2023, 2, "PRCP", d => "7"),
      dlyLine(outUs, 2023, 2, "TMAX", d => "1"),
      dlyLine(inCa, 2023, 2, "TMAX", d => "2"))
    val dir = Files.createTempDirectory("graft_wx").toFile
    Files.writeString(new java.io.File(dir, "wx.dly").toPath, lines.mkString("", "\n", "\n"))

    val stations = Seq(
      (inUs, 1.0, 1.0, 10.0, "IN TOWN"),
      (outUs, 50.0, 50.0, 20.0, "FAR TOWN"),
      (inCa, 2.0, 2.0, 30.0, "CA TOWN"))
      .toDF("ID", "lat", "long", "elev", "city")
    val square: Geo.Ring = Array((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))

    val dly = FixedWidth.readDly(spark, dir.getAbsolutePath + "/*.dly")
    val out = Pipelines.weatherReport(dly, stations, square, 2020, 2024, fillLimit = 7)

    assert(out.columns.take(6).toSeq ===
      Seq("ID", "DATE", "city", "latitude", "longitude", "elev"))
    assert(out.columns.toSet.intersect(Set("TMAX", "PRCP")) === Set("TMAX", "PRCP"))
    val rows = out.collect()
    assert(rows.map(_.getString(0)).distinct.toSeq === Seq(inUs),
      "only the in-polygon US station survives")
    // Feb 2023 (non-leap): 28 days — the 29/30/31 slots must be dropped by calendar validity
    assert(rows.length === 28)
    // -9999 run (days 3,4) filled from neighbors within limit
    val d3 = rows.find(_.getDate(1).toString == "2023-02-03").get
    assert(!d3.isNullAt(d3.fieldIndex("TMAX")), "sentinel slot must be filled")
    assert(d3.getAs[String]("city") === "IN TOWN")
    assert(rows.forall(_.getAs[Double]("PRCP") === 7.0))
  }

  test("dataset assembly: daily features + proportional disaggregation (§3.3)") {
    // two months of hourly balance, 2 hours/day, 2 days/month (tiny)
    val hours = for {
      (mon, d0) <- Seq(("2023-01", 1), ("2023-02", 1))
      day <- Seq(d0, d0 + 1)
      h <- Seq(1, 2)
    } yield (s"$mon-0$day $h:00:00", if (mon == "2023-01") 100.0 * day else 200.0 * day)
    val balance = hours.toDF("local_time_end_hour", "demand")
      .withColumn("local_time_end_hour", to_timestamp(col("local_time_end_hour")))
    val weather = Seq(
      ("2023-01-01", 5.0), ("2023-01-02", 7.0), ("2023-02-01", 9.0), ("2023-02-02", 11.0))
      .toDF("DATE", "TMAX").withColumn("DATE", to_date(col("DATE")))
    val targets = Seq(("2023-01-01", 3000.0), ("2023-02-01", 6000.0))
      .toDF("date", "total_consumption").withColumn("date", to_date(col("date")))

    val ds = Pipelines.assembleDataset(balance, Seq("demand"), weather, Seq("TMAX"), targets)
    val rows = ds.collect()
    assert(rows.length === 4)
    // January: daily demands 100, 200 -> shares 1/3, 2/3 of 3000 -> 1000, 2000
    val jan = rows.filter(_.getDate(0).toString.startsWith("2023-01"))
      .map(_.getAs[Double]("consumption"))
    assert(jan.toSeq === Seq(1000.0, 2000.0))
    // disaggregated consumption sums back to the monthly target
    val feb = rows.filter(_.getDate(0).toString.startsWith("2023-02"))
      .map(_.getAs[Double]("consumption"))
    assert(feb.sum === 6000.0)
  }
}

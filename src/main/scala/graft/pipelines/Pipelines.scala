package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.geo.Geo
import graft.ops.{Coverage, Fills, Projections, Reshape}

/** The reference's three end-to-end lifecycles (SURVEY.md §3) as composed
  * library pipelines over the engine's combinators. Each stage is a pure
  * `DataFrame => DataFrame` so Catalyst plans the whole flow at once
  * (filter/projection pushdown through every stage); data-dependent
  * schema steps (coverage prune) are the documented two-job exceptions.
  */
object Pipelines {

  /** Reference snake_case rename (`ETL.py:81-87`): strip parenthesized
    * units and from/at/of, lowercase, join words with underscores.
    */
  private[pipelines] def snakeCase(name: String): String =
    name.replaceAll("""\([^()]*\)|\b(from|at|of)\b""", "")
      .toLowerCase.trim.split("\\s+").mkString("_")

  /** §3.1 balance pipeline (`ETL.py:79-95`): per-source name-pattern
    * projection + MIDW/MISO filter → schema-aligning union → snake_case
    * rename → timestamp cast → coverage-based column prune → row prune →
    * global bfill ordered by hour.
    *
    * The final bfill is the reference's arbitrary-gap backfill over the
    * full hourly table — served by [[Fills.globalFill]]'s two-wave scan,
    * so the global ordering costs a range shuffle, never a
    * single-partition window.
    */
  def balanceSheet(raw: Seq[DataFrame], coverage: Double = 0.8,
                   minNonNulls: Int = 7): DataFrame = {
    val projected = raw.map { df =>
      val first4 = df.columns.take(4).toSeq
      val kept = Projections.selectByName(
        df.filter(col("Region") === "MIDW" && col("Balancing Authority") === "MISO"),
        c => c.contains("Adjusted") && !c.contains("Imputed"),
        always = first4 :+ "Region")
      kept
    }
    val unioned = Reshape.unionAligned(projected)
    val renamed = unioned.toDF(unioned.columns.map(snakeCase).toSeq: _*)
    val cast = renamed.withColumn("local_time_end_hour",
      to_timestamp(col("local_time_end_hour")))
    // no pre-sort: globalFill's own range partition + in-partition sort
    // IS the ordering — an orderBy here would shuffle+sort the same key
    // twice for an identically-ordered result
    val pruned = Coverage.dropBelow(cast, coverage)
      .na.drop(minNonNulls)
    val fillCols = pruned.columns.filterNot(Seq("balancing_authority", "data_date",
      "hour_number", "local_time_end_hour", "region").contains).toSeq
    Fills.globalFill(pruned, fillCols,
      Seq(col("local_time_end_hour")), backward = true)
  }

  /** §3.2 weather pipeline (`ETL.py:317-330`): polygon+US station filter →
    * semi-join the long .dly table → FLAG-column drop → year range → melt
    * VALUE1..31 → pivot ELEMENT (deterministic first) → day extract →
    * sentinel→null → all-null row/column drop → per-station limited
    * ffill/bfill → calendar-valid DATE synthesis → broadcast location join
    * → ordered output.
    *
    * Date validity uses real calendar logic (`make_date` returns null for
    * impossible dates) rather than the reference's hard-coded leap-year
    * lists — a documented, strictly-more-correct divergence (SURVEY §7.4).
    */
  def weatherReport(dlyLong: DataFrame, stations: DataFrame, ring: Geo.Ring,
                    startYear: Int, endYear: Int,
                    fillLimit: Int = 7): DataFrame = {
    val miso = Geo.filterInPolygon(stations, "long", "lat", ring)
      .filter(col("ID").contains("US"))
    val scoped = dlyLong
      .join(broadcast(miso.select("ID")), Seq("ID"), "left_semi")
      .filter(col("YEAR").between(startYear, endYear))
    val noFlags = Projections.dropByContains(scoped, "FLAG")

    val valueCols = noFlags.columns.filter(_.startsWith("VALUE")).toSeq
    val melted = Reshape.melt(noFlags, Seq("ID", "YEAR", "MONTH", "ELEMENT"),
      valueCols, "DAY", "value")
    val pivoted = Reshape.pivotFirst(melted,
      Seq("ID", "YEAR", "MONTH", "DAY"), "ELEMENT", "value", orderCol = "value")
      .withColumn("DAY", regexp_replace(col("DAY"), "\\D", "").cast("int"))

    val elements = pivoted.columns.filterNot(
      Seq("ID", "YEAR", "MONTH", "DAY").contains).toSeq
    val unsentineled = elements.foldLeft(pivoted) { (d, c) =>
      d.withColumn(c, when(col(c) === -9999, lit(null)).otherwise(col(c)).cast("double"))
    }
    val rowPruned = unsentineled.na.drop("all", elements)
    val colPruned = Coverage.dropAllNull(rowPruned)
    val kept = colPruned.columns.filterNot(
      Seq("ID", "YEAR", "MONTH", "DAY").contains).toSeq

    val filled = Fills.fillBoth(colPruned, kept,
      partition = Seq("ID"), order = Seq("YEAR", "MONTH", "DAY"),
      limit = Some(fillLimit))

    // ANSI make_date THROWS on impossible dates; validate against the
    // month's real length first (day-1 construction is always valid).
    val daysInMonth = dayofmonth(last_day(make_date(col("YEAR"), col("MONTH"), lit(1))))
    val dated = filled
      .filter(col("MONTH").between(1, 12) && col("DAY") >= 1 &&
        col("DAY") <= daysInMonth)
      .withColumn("DATE", make_date(col("YEAR"), col("MONTH"), col("DAY")))
      .select((Seq("ID", "DATE") ++ kept).map(col): _*)

    val loc = broadcast(stations.select(col("ID"), col("city"),
      col("lat").as("latitude"), col("long").as("longitude"), col("elev")))
    dated.join(loc, Seq("ID"))
      .select((Seq("ID", "DATE", "city", "latitude", "longitude", "elev") ++ kept)
        .map(col): _*)
      .orderBy("ID", "DATE")
  }

  /** §3.3 dataset assembly (`normalization.ipynb#5-18`): hourly balance →
    * daily means; station weather → daily means across stations; join on
    * date → features; monthly demand totals → demand share → proportional
    * disaggregation of the monthly consumption target (M24).
    *
    * The reference attaches monthly values via a right-outer join on the
    * month-START date plus an ffill down the month
    * (`normalization.ipynb#16`); an equi-join on the month KEY is the
    * same function computed without an ordered window — the scale-safe
    * form (see `Disaggregate` for the literal ffill variant).
    *
    * @param balance  hourly frame with `local_time_end_hour` + measure cols
    * @param weather  daily per-station frame with `DATE` + element cols
    * @param targets  monthly frame (date = month start) with `total_consumption`
    */
  def assembleDataset(balance: DataFrame, balanceMeasures: Seq[String],
                      weather: DataFrame, weatherElements: Seq[String],
                      targets: DataFrame): DataFrame = {
    val dailyBalance = balance
      .groupBy(to_date(col("local_time_end_hour")).as("date"))
      .agg(balanceMeasures.map(c => round(avg(col(c)), 0).as(c)).head,
        balanceMeasures.map(c => round(avg(col(c)), 0).as(c)).tail: _*)
    val dailyWeather = weather
      .groupBy(to_date(col("DATE")).as("date"))
      .agg(weatherElements.map(c => round(avg(col(c)), 0).as(c)).head,
        weatherElements.map(c => round(avg(col(c)), 0).as(c)).tail: _*)
    val features = dailyBalance.join(dailyWeather, Seq("date"))

    val withMonth = features.withColumn("__mon", trunc(col("date"), "month"))
    val monthly = withMonth.groupBy(col("__mon"))
      .agg(sum(col("demand")).as("__mon_demand"))
    val joined = withMonth
      .join(broadcast(monthly), Seq("__mon"), "left")
      .join(broadcast(targets.select(trunc(col("date"), "month").as("__mon"),
        col("total_consumption").as("__mon_consumption"))), Seq("__mon"), "left")
    joined
      .withColumn("__share", col("demand") / col("__mon_demand"))
      .withColumn("consumption",
        round(col("__mon_consumption") * col("__share"), 0))
      .drop("__mon", "__mon_demand", "__mon_consumption", "__share")
      .orderBy("date")
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.ml.{Arimax, CvObjective, RecursiveGbt}

/** Model-layer queries (SURVEY.md §2.9 M11/M12/M19): forecasts are not
  * ANSI-SQL-expressible, so these register oracle-less (driver checks
  * rows>0) and the numeric contracts live in MlSpec's seeded fixture
  * tests. Each query fits on the leading 80% of the daily series and
  * forecasts the tail, mirroring the reference's positional split.
  */
object Ml {

  val all: Seq[Q] = Seq(

    // ---- recursive GBT autoregression (M12) ----
    Q.noOracle("q48_gbt_forecast") { (s, dir) =>
      import s.implicits._
      val daily = Series.dailySeries(s, dir).drop("n_events")
      val days = daily.select("day").orderBy("day").collect().map(_.getDate(0))
      val split = (days.length * 0.8).toInt
      val train = daily.filter(col("day") <= lit(days(split - 1)))
      val model = RecursiveGbt.fit(train, "day", "val", Nil, Seq(1, 2, 3),
        d = 0, maxIter = 10, maxDepth = 3)
      model.forecast(days.length - split, Nil).zipWithIndex
        .map { case (p, i) => (i + 1, p) }.toSeq.toDF("step", "pred")
    },

    // ---- ARIMAX via Hannan-Rissanen (M11) ----
    Q.noOracle("q49_arimax_forecast") { (s, dir) =>
      import s.implicits._
      val daily = Series.dailySeries(s, dir).drop("n_events")
      val days = daily.select("day").orderBy("day").collect().map(_.getDate(0))
      val split = (days.length * 0.8).toInt
      val train = daily.filter(col("day") <= lit(days(split - 1)))
      val model = Arimax.fit(train, "day", "val", Nil, p = 2, d = 1, q = 1)
      model.forecast(days.length - split, Nil).zipWithIndex
        .map { case (p, i) => (i + 1, p) }.toSeq.toDF("step", "pred")
    },

    // ---- blocked-CV forecast objective (M19 + A12 fold summary) ----
    Q.noOracle("q50_cv_objective") { (s, dir) =>
      import s.implicits._
      val daily = Series.dailySeries(s, dir).drop("n_events")
      val maes = CvObjective.blockedCvMae(daily, "day", "val", Nil, 3, 0.2) {
        (train, steps, _) =>
          RecursiveGbt.fit(train, "day", "val", Nil, Seq(1, 2),
            d = 0, maxIter = 10, maxDepth = 3).forecast(steps, Nil)
      }
      val (mean, std) = CvObjective.summary(maes)
      maes.zipWithIndex.map { case (m, f) => (f, m, mean, std) }
        .toDF("fold", "mae", "mean_mae", "std_mae")
    })
}

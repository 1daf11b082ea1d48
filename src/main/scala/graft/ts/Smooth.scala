package graft.ts

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exponential smoothing as codegen'd array folds — the per-series
  * recursion runs inside one `aggregate()` higher-order function over
  * the series array (bounded by the calendar), so a million series
  * smooth in parallel with no UDF, no driver loop, and no per-step
  * Catalyst replanning. Every step is a fixed association of
  * correctly-rounded double ops — bit-replayable by any engine's
  * recursive CTE (q145's oracle does exactly that).
  */
object Smooth {

  /** Holt linear-trend state (Holt 1957) over a series array column:
    * l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1}),
    * b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},
    * init l₁ = y₁, b₁ = y₂ − y₁. Returns struct(l, b) — the final
    * level/trend; forecast h steps ahead as l + h·b. Requires
    * size(vs) >= 2 (filter shorter series upstream).
    */
  /** Two-sided CUSUM changepoint monitor (Page 1954) over a
    * STANDARDIZED series array: hi_t = max(0, hi_{t−1} + z_t − k),
    * lo_t = max(0, lo_{t−1} − z_t − k); a step alarms when either side
    * exceeds h (textbook k=0.5, h=4 in allowance/threshold units of
    * σ). Statistics keep accumulating after an alarm (no reset) — the
    * variant that makes the fold state a pure function of the prefix.
    * Returns struct(hi, lo, n_alarms, first_alarm — 1-based index or
    * −1 —, max_stat, i).
    */
  def cusum(zs: Column, k: Double, h: Double): Column = {
    val init = struct(lit(0.0).as("hi"), lit(0.0).as("lo"),
      lit(0L).as("n_alarms"), lit(-1L).as("first_alarm"),
      lit(0.0).as("max_stat"), lit(0L).as("i"))
    aggregate(zs, init, (acc, z) => {
      val hiNew = greatest(lit(0.0), acc.getField("hi") + z - lit(k))
      val loNew = greatest(lit(0.0), acc.getField("lo") - z - lit(k))
      val alarm = hiNew > lit(h) || loNew > lit(h)
      struct(hiNew.as("hi"), loNew.as("lo"),
        (acc.getField("n_alarms")
          + when(alarm, lit(1L)).otherwise(lit(0L))).as("n_alarms"),
        when(alarm && acc.getField("first_alarm") === lit(-1L),
            acc.getField("i") + lit(1L))
          .otherwise(acc.getField("first_alarm")).as("first_alarm"),
        greatest(acc.getField("max_stat"), hiNew, loNew).as("max_stat"),
        (acc.getField("i") + lit(1L)).as("i"))
    })
  }

  def holt(vs: Column, alpha: Double, beta: Double): Column = {
    val y1 = element_at(vs, 1)
    val y2 = element_at(vs, 2)
    val init = struct(y1.as("l"), (y2 - y1).as("b"))
    aggregate(slice(vs, lit(2), size(vs) - 1), init, (acc, y) => {
      val lNew = lit(alpha) * y +
        lit(1.0 - alpha) * (acc.getField("l") + acc.getField("b"))
      struct(lNew.as("l"),
        (lit(beta) * (lNew - acc.getField("l"))
          + lit(1.0 - beta) * acc.getField("b")).as("b"))
    })
  }
}

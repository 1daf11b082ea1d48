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

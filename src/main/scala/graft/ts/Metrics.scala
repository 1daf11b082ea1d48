package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Exact.gavg

/** Regression error metrics as single-pass aggregates (reference
  * `sklearn.mean_absolute_error` & co., `supervised/evaluation.ipynb#2,#13`,
  * `src/scripts/optimization.py:76-77`). Null predictions (e.g. the first
  * lag row) are excluded, matching sklearn's behavior on aligned arrays.
  */
object Metrics {

  /** One-row frame: n, mae, mse, mape of `predCol` against `actualCol`.
    * MAPE explicitly excludes zero-actual rows from BOTH numerator and
    * denominator (the standard convention); leaving the zero rows to
    * null-division would make the term set engine-dependent (null vs inf).
    */
  def regressionMetrics(df: DataFrame, actualCol: String, predCol: String): DataFrame = {
    val err = col(actualCol) - col(predCol)
    val mapeTerm = when(col(actualCol) =!= 0, abs(err / col(actualCol)))
    // gavg: error terms are COMPUTED doubles (differences of decimal-ish
    // values), whose direct decimal capture is engine-dependent on exact
    // .5 ties — see Exact.gavgOver.
    df.agg(
      count(col(predCol)).as("n"),
      gavg(abs(err)).as("mae"),
      gavg(err * err).as("mse"),
      gavg(mapeTerm).as("mape"))
  }
}

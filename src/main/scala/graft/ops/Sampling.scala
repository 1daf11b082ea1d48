package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted sampling for corpus curation — pick a k-document subset
  * whose weights (token counts, quality scores) still estimate corpus
  * totals unbiasedly.
  *
  * [[prioritySample]] is priority sampling (Duffield, Lund & Thorup,
  * JACM 2007): each item draws u_i uniform in (0,1] from its salted
  * md5 hash, gets priority q_i = w_i / u_i, and the k highest
  * priorities win. With τ = the (k+1)-th priority, ŵ_i = max(w_i, τ)
  * is an unbiased estimator of any subset sum — the property that lets
  * a 100 TB pipeline audit token budgets from a fixed-size sample.
  *
  * Determinism is the oracle contract: u_i derives from
  * [[graft.dedup.Dedup.md5Hash64]], and every floating-point step is a
  * fixed association of correctly-rounded IEEE ops over exactly-
  * representable constants (2^63, 2^64), so any engine replays the
  * identical priorities bit-for-bit; ties (astronomically rare double
  * collisions) break on the id.
  *
  * Scale shape: the priority is a scan projection; selection is the
  * two-stage [[TopK]] (partition-local rank, then a ≤ (k+1)×partitions
  * global stage); τ re-attaches by broadcast of a 1-row aggregate. No
  * full sort, no driver state, nothing but (id, weight, priority) in
  * flight.
  */
object Sampling {

  /** Sample k rows with probability increasing in `weightCol`, returning
    * (smp_rank, idCol, weightCol, w_hat). Rows with weight <= 0 are
    * excluded (DLT assumes positive weights). If the input has <= k
    * qualifying rows, all are returned with ŵ = w (τ = 0).
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String = "#ps"): DataFrame = {
    val two63 = 9.223372036854775808e18  // 2^63, exact as a double
    val two64 = 1.8446744073709551616e19 // 2^64, exact as a double
    // u in (0,1]: the +1.0 only registers when h ≈ -2^63 (it lifts u off
    // exactly 0, keeping the division finite); elsewhere it rounds away
    // identically in any IEEE engine
    val pri = df
      .filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol),
        (col(weightCol).cast("double") /
          (((graft.dedup.Dedup.md5Hash64(
              concat(col(idCol).cast("string"), lit(salt))).cast("double")
            + lit(two63)) + lit(1.0)) / lit(two64))).as("pri"))
    // corpus-sized priority frame: the combiner form ships (k+1)-pair
    // buffers per map task instead of exchanging every prioritized row
    val top = TopK.globalTopKByScore(pri, "pri", idCol, k + 1,
      rankCol = "smp_rank")
    val tau = top.agg(
      max(when(col("smp_rank") === (k + 1), col("pri"))).as("tau"))
    top.filter(col("smp_rank") <= k)
      .crossJoin(broadcast(tau))
      .select(col("smp_rank"), col(idCol), col(weightCol),
        greatest(col(weightCol).cast("double"),
          coalesce(col("tau"), lit(0.0))).as("w_hat"))
  }
}

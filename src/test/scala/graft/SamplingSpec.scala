package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sampling

/** Priority-sampling semantics: the DLT estimator contract, the k >= n
  * degenerate case, and determinism under repartition.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("prioritySample: k >= n returns every positive-weight row with w_hat = w") {
    val df = Seq(("a", 5L), ("b", 3L), ("c", 0L), ("d", 7L)).toDF("id", "w")
    val got = Sampling.prioritySample(df, "id", "w", k = 10)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 3)                       // weight-0 row excluded
    assert(got.forall { case (_, w, wh) => wh === w.toDouble })
  }

  test("prioritySample: unbiased-ish subset-sum estimate on a skewed population") {
    // weights 1..1000 (sum 500500); k = 200. DLT guarantees E[Σ ŵ] =
    // Σ w exactly; a single draw concentrates well at this k, so a
    // loose 15% band is a real (non-flaky) check of the estimator
    // plumbing — a missing τ floor or wrong threshold rank lands far
    // outside it.
    val df = (1 to 1000).map(i => (s"id$i", i.toLong)).toDF("id", "w")
    val s = Sampling.prioritySample(df, "id", "w", k = 200)
    assert(s.count() === 200)
    val est = s.agg(sum("w_hat")).collect()(0).getDouble(0)
    assert(math.abs(est - 500500.0) / 500500.0 < 0.15,
      s"estimate $est too far from 500500")
    // heavier rows must be over-represented: the top-decile weight band
    // (901..1000) survives at a higher rate than the bottom half
    val heavy = s.filter(col("w") > 900).count()
    val light = s.filter(col("w") <= 500).count()
    assert(heavy.toDouble / 100.0 > light.toDouble / 500.0)
  }

  test("prioritySample is deterministic under repartition") {
    val df = (1 to 500).map(i => (s"d$i", (i % 37 + 1).toLong)).toDF("id", "w")
    def key(d: org.apache.spark.sql.DataFrame) =
      Sampling.prioritySample(d, "id", "w", k = 50)
        .orderBy("smp_rank")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3))).toSeq
    assert(key(df.repartition(13)) === key(df.repartition(3)))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sketch.Sketch

/** Property tests for the mergeable sketches: the estimator guarantees
  * that hold by construction (KMV accuracy on uniform hashes, bottom-k
  * mergeability, count-min's never-underestimate bias) plus partition
  * invariance — the determinism the oracle compare relies on.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("kmvDistinct: exact below k, close above k, deterministic under repartition") {
    // group "small" has 100 distinct keys (< k): exact fallback.
    // group "big" has 20000 distinct keys (>> k): estimate within 20%
    // (k=256 gives ~1/sqrt(254) ~ 6.3% relative std error).
    val rows = (1 to 100).map(i => ("small", s"s$i")) ++
      (1 to 20000).map(i => ("big", s"b$i"))
    val df = rows.toDF("g", "key")
    val out = Sketch.kmvDistinct(df, "g", "key", k = 256)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("small").getDouble(4) === 100.0)
    assert(out("small").getLong(3) === 100L)
    val est = out("big").getDouble(4)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.2, s"est=$est")
    // duplicates must not change the sketch: union the same keys again
    val dup = Sketch.kmvDistinct(df.union(df.repartition(17)), "g", "key", k = 256)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(dup("big") === est && dup("small") === 100.0)
  }

  test("kmvDistinct merge law: bottom-k of a union = bottom-k of shard bottom-ks") {
    import graft.dedup.Dedup
    val a = (1 to 3000).map(i => ("g", s"x$i")).toDF("g", "key")
    val b = (2000 to 5000).map(i => ("g", s"x$i")).toDF("g", "key")
    val k = 64
    def bottomK(df: org.apache.spark.sql.DataFrame) = df
      .select(Dedup.md5Hash64(col("key")).as("h")).distinct()
      .orderBy("h").limit(k).as[Long].collect().toSeq
    val merged = (bottomK(a) ++ bottomK(b)).distinct.sorted.take(k)
    val direct = bottomK(a.union(b))
    assert(merged === direct)
    // and the operator's kth_min on the union equals the merged kth value
    val kth = Sketch.kmvDistinct(a.union(b), "g", "key", k = k)
      .select("kth_min").as[Long].head()
    assert(kth === merged.last)
  }

  test("cmsHeavyHitters: never underestimates, exact on planted counts") {
    val stream = Seq.fill(500)("hot") ++ (1 to 2000).map(i => s"t$i") ++
      Seq.fill(37)("mid")
    val df = stream.toDF("key")
    val probes = Seq("hot", "mid", "t1", "neverseen").toDF("key")
    val out = Sketch.cmsHeavyHitters(df, "key", probes, depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("hot")._2 === 500L && out("mid")._2 === 37L &&
      out("t1")._2 === 1L && out("neverseen")._2 === 0L)
    // CMS estimate is biased up, never down
    out.foreach { case (key, (est, exact)) =>
      assert(est >= exact, s"$key: est=$est < exact=$exact")
    }
    // with 2537 tokens in 1024-wide rows the min-of-4 stays close:
    // collision mass per row averages ~2.5; assert a loose sanity bound
    assert(out("hot")._1 <= 500L + 50L)
    // deterministic under repartition
    val again = Sketch.cmsHeavyHitters(df.repartition(13), "key", probes,
      depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === out.view.mapValues(_._1).toMap)
  }
}

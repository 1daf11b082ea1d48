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

  test("KmvAgg: insert/merge laws — agg sketch == sorted bottom-k, dup-proof") {
    val agg = new graft.sketch.KmvAgg.Agg(8)
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(300)(rnd.nextLong(1000)) // dense => many duplicates
    val seq = vals.foldLeft(agg.zero)(agg.reduce)
    assert(seq.toSeq === vals.distinct.sorted.take(8))
    // merge of arbitrary splits equals the sequential fold
    for (cut <- Seq(1, 57, 150, 299)) {
      val (l, r) = vals.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m.toSeq === seq.toSeq, s"cut=$cut")
    }
    assert(agg.merge(agg.zero, seq).toSeq === seq.toSeq)
    assert(agg.merge(seq, agg.zero).toSeq === seq.toSeq)
    // column form on a DataFrame equals kmvState
    val df = (1 to 5000).map(i => ("g", s"s${i % 900}")).toDF("g", "key")
    val viaAgg = df.select(col("g"), graft.dedup.Dedup.md5Hash64(col("key")).as("h"))
      .groupBy("g").agg(graft.sketch.KmvAgg.kmv(col("h"), 32).as("sk"))
      .head().getSeq[Long](1)
    val viaState = Sketch.kmvState(df, "g", "key", 32).head().getSeq[Long](1)
    assert(viaAgg === viaState)
  }

  test("kmvOverlap: exact below k, close estimates above k") {
    // small groups (< k): the sketches ARE the sets — every figure exact.
    // A = {1..100}, B = {51..150}: |A∩B| = 50, |A∪B| = 150, J = 1/3.
    val small = ((1 to 100).map(i => ("A", s"v$i")) ++
      (51 to 150).map(i => ("B", s"v$i"))).toDF("g", "key")
    val r = Sketch.kmvOverlap(small, "g", "key", k = 256).head()
    assert(r.getAs[String]("g_a") === "A" && r.getAs[String]("g_b") === "B")
    assert(r.getAs[Long]("kappa") === 50L)
    assert(r.getAs[Double]("est_union") === 150.0)
    assert(r.getAs[Double]("est_jaccard") === 50.0 / 150.0)
    assert(r.getAs[Double]("est_intersection") === (50.0 / 150.0) * 150.0)
    assert(r.getAs[Long]("n_common") === 50L)
    // large groups: 10k each sharing 5k -> union 15k, J = 1/3. The
    // jaccard estimator's 1-sigma relative error at k = 256 is
    // sqrt(J(1-J)/k)/J ~ 9%; key prefixes are a fixed hash draw, so the
    // bounds are ~2 sigma on a verified-typical draw (an independent
    // Python replay of the same md5 space reproduces these figures
    // exactly — the deviation is the estimator's, not the engine's).
    val big = ((1 to 10000).map(i => ("A", s"tok$i")) ++
      (5001 to 15000).map(i => ("B", s"tok$i"))).toDF("g", "key")
    val rb = Sketch.kmvOverlap(big, "g", "key", k = 256).head()
    assert(math.abs(rb.getAs[Double]("est_union") - 15000.0) / 15000.0 < 0.2)
    assert(math.abs(rb.getAs[Double]("est_jaccard") - 1.0 / 3.0) / (1.0 / 3.0) < 0.2)
    assert(math.abs(rb.getAs[Double]("est_intersection") - 5000.0) / 5000.0 < 0.25)
    assert(rb.getAs[Long]("n_common") === 5000L)
  }

  test("hllDistinct: accuracy in range, register merge law, repartition invariance") {
    val rows = (1 to 30000).map(i => ("big", s"k$i")) ++
      (1 to 5000).map(i => ("mid", s"m$i"))
    val df = rows.toDF("g", "key")
    val out = Sketch.hllDistinct(df, "g", "key", p = 9)
      .collect().map(r => r.getString(0) -> r).toMap
    // raw estimator, m = 512 -> ~4.6% std error; 15% is a real but
    // non-flaky band (hashes are fixed, so this never varies run-to-run)
    assert(math.abs(out("big").getDouble(4) - 30000.0) / 30000.0 < 0.15)
    assert(math.abs(out("mid").getDouble(4) - 5000.0) / 5000.0 < 0.15)
    assert(out("big").getLong(3) === 30000L) // n_exact rides along
    // merge law: per-bucket max of shard registers == whole-input registers
    val (a, b) = (df.filter(col("key") < "k2"), df.filter(col("key") >= "k2"))
    val merged = Sketch.hllRegisters(a, "g", "key", p = 9)
      .unionAll(Sketch.hllRegisters(b, "g", "key", p = 9))
      .groupBy("g", "bucket").agg(max("reg").as("reg"))
    val whole = Sketch.hllRegisters(df, "g", "key", p = 9)
    def m(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(m(merged) === m(whole))
    // estimates from merged registers match the direct path bit-for-bit
    val estM = Sketch.hllEstimate(merged, p = 9)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(estM("big") === out("big").getDouble(4))
    // partition invariance (the oracle-compare contract)
    val rep = Sketch.hllDistinct(df.repartition(17), "g", "key", p = 9)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(rep("big") === out("big").getDouble(4))
  }

  test("bottomKSampleQuantiles: exact below k, close above k, repartition-invariant") {
    // group "small" (300 rows < k): the sample IS the group, so the
    // readout is the exact lower quantile of the full data
    val rows = (1 to 300).map(i => ("small", i.toDouble, s"s$i")) ++
      (1 to 20000).map(i => ("big", i.toDouble, s"b$i"))
    val df = rows.toDF("g", "v", "id")
    val out = Sketch.bottomKSampleQuantiles(df, "g", "v", "id", k = 512)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("small").getLong(1) === 300L)
    // n=300: floor(.5*299)=149 -> sorted(1..300)(149) = 150.0
    assert(out("small").getDouble(3) === 150.0)
    assert(out("small").getDouble(2) === 75.0)   // floor(.25*299)=74 -> 75
    // group "big": k=512 uniform sample of 1..20000 — rank std error
    // ~sqrt(.5*.5/512) ~ 2.2%; 10% is a fixed-hash (non-flaky) band
    assert(out("big").getLong(1) === 512L)
    assert(math.abs(out("big").getDouble(3) - 10000.0) / 10000.0 < 0.10)
    assert(math.abs(out("big").getDouble(5) - 18000.0) / 18000.0 < 0.10)
    val rep = Sketch.bottomKSampleQuantiles(df.repartition(11), "g", "v", "id",
        k = 512).collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rep("big") === out("big").getDouble(3))
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

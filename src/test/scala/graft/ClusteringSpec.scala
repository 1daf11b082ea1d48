package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Clustering

/** Seeded fixture tests for DTW, DTW k-means, scaling, PCA, silhouette. */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("dtw: identity is zero, alignment beats euclidean on shifted series") {
    val a = Array(0.0, 1.0, 2.0, 3.0, 2.0, 1.0, 0.0)
    val b = Array(0.0, 0.0, 1.0, 2.0, 3.0, 2.0, 1.0) // a shifted right by 1
    assert(Clustering.dtw(a, a) === 0.0)
    val euclid = math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    assert(Clustering.dtw(a, b) < euclid, "DTW must absorb the shift")
    // hand-computed tiny case: [1,2] vs [1,2,2] aligns with zero cost
    assert(Clustering.dtw(Array(1.0, 2.0), Array(1.0, 2.0, 2.0)) === 0.0)
    assert(Clustering.dtw(Array(1.0), Array(2.0)) === 1.0)
  }

  test("dtw k-means recovers three planted series groups (M8, permutation-invariant)") {
    def noisy(base: Array[Double], seed: Int): Array[Double] = {
      val r = new scala.util.Random(seed)
      base.map(_ + r.nextDouble() * 0.1)
    }
    val flat = Array.fill(12)(0.0)
    val ramp = Array.tabulate(12)(_.toDouble)
    val sine = Array.tabulate(12)(i => 5 * math.sin(i * 0.7))
    val rows = (0 until 5).flatMap { i =>
      Seq((s"flat$i", noisy(flat, i).toSeq),
        (s"ramp$i", noisy(ramp, 100 + i).toSeq),
        (s"sine$i", noisy(sine, 200 + i).toSeq))
    }
    val df = rows.toDF("id", "vec")
    val res = Clustering.dtwKMeans(df, "id", "vec", k = 3, maxIter = 10, seed = 42L)
    val got = res.assignments.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    for (g <- Seq("flat", "ramp", "sine")) {
      val cs = (0 until 5).map(i => got(s"$g$i")).distinct
      assert(cs.size === 1, s"group $g split across clusters: $cs")
    }
    assert(Seq("flat0", "ramp0", "sine0").map(got).distinct.size === 3,
      "different groups merged into one cluster")
  }

  test("dtwKMeansExact: partition-invariant, groups recovered, winner distance exact") {
    def noisy(base: Array[Double], seed: Int): Array[Double] = {
      val r = new scala.util.Random(seed)
      base.map(_ + r.nextDouble() * 0.1)
    }
    val flat = Array.fill(12)(0.0)
    val ramp = Array.tabulate(12)(_.toDouble)
    val sine = Array.tabulate(12)(i => 5 * math.sin(i * 0.7))
    val rows = (0 until 5).flatMap { i =>
      Seq((s"flat$i", noisy(flat, i).toSeq),
        (s"ramp$i", noisy(ramp, 100 + i).toSeq),
        (s"sine$i", noisy(sine, 200 + i).toSeq))
    }
    val df = rows.toDF("id", "vec")
    def run(d: org.apache.spark.sql.DataFrame) = {
      val res = Clustering.dtwKMeansExact(d, "id", "vec", k = 3, maxIter = 5)
      (res.assignments.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq,
        res.centroids)
    }
    val (a, cents) = run(df)
    // the decimal-exact centroid updates make the WHOLE protocol
    // partition-order-invariant: a reshuffled input must reproduce every
    // assignment and distance bit-for-bit
    val (b, _) = run(df.repartition(7))
    assert(a === b, "exact twin changed under repartitioning")
    // planted groups recovered, as in the production variant
    val got = a.map(t => t._1 -> t._2).toMap
    for (g <- Seq("flat", "ramp", "sine"))
      assert((0 until 5).map(i => got(s"$g$i")).distinct.size === 1, s"group $g split")
    // each reported distance is the true DTW to the assigned centroid
    val vecs = rows.toMap
    a.foreach { case (id, c, dist) =>
      assert(dist === Clustering.dtw(vecs(id).toArray, cents(c)),
        s"$id: reported distance is not the winner's exact DTW")
    }
  }

  test("minMaxScale maps min->0, max->1; constant column -> 0 (M1)") {
    val df = Seq((1, 10.0, 7.0), (2, 20.0, 7.0), (3, 15.0, 7.0)).toDF("id", "a", "c")
    val out = Clustering.minMaxScale(df, Seq("a", "c")).orderBy("id").collect()
    assert(out.map(_.getAs[Double]("a_mm")).toSeq === Seq(0.0, 1.0, 0.5))
    assert(out.map(_.getAs[Double]("c_mm")).toSeq === Seq(0.0, 0.0, 0.0))
  }

  test("standardScale produces ~zero mean and unit variance (M2)") {
    val df = (1 to 100).map(i => (i, i.toDouble)).toDF("id", "x")
    val out = Clustering.standardScale(df, Seq("x"))
    val stats = out.agg(avg("x_std"), stddev_pop("x_std")).head()
    assert(math.abs(stats.getDouble(0)) < 1e-9)
    assert(math.abs(stats.getDouble(1) - 1.0) < 1e-9)
  }

  test("minMaxScaleArray scales per position (reference matrix scaling)") {
    val df = Seq(("a", Seq(0.0, 100.0)), ("b", Seq(10.0, 200.0))).toDF("id", "vec")
    val out = Clustering.minMaxScaleArray(df, "vec", "s").orderBy("id").collect()
    assert(out(0).getSeq[Double](2) === Seq(0.0, 0.0))
    assert(out(1).getSeq[Double](2) === Seq(1.0, 1.0))
  }

  test("pcaLoadings: k x dim rows, first component captures the spread axis (M3)") {
    val r = new scala.util.Random(7)
    // points spread along (1,1,0): PC1 must weight dims 0 and 1 equally
    val df = (1 to 200).map { _ =>
      val t = r.nextGaussian() * 10
      Seq(t + r.nextGaussian() * 0.1, t + r.nextGaussian() * 0.1, r.nextGaussian() * 0.1)
    }.map(Tuple1(_)).toDF("v")
    val load = Clustering.pcaLoadings(df, "v", 2).collect()
    assert(load.length === 6)
    val pc1 = load.filter(_.getInt(0) == 0).sortBy(_.getInt(1)).map(_.getDouble(2))
    assert(math.abs(math.abs(pc1(0)) - math.abs(pc1(1))) < 0.05)
    assert(math.abs(pc1(2)) < 0.1)
  }

  test("silhouette near 1 for well-separated clusters (M9)") {
    val df = ((1 to 20).map(i => (Seq(0.0 + i * 0.01, 0.0), 0)) ++
      (1 to 20).map(i => (Seq(100.0 + i * 0.01, 0.0), 1))).toDF("v", "label")
    val s = Clustering.silhouette(df, "v", "label")
    assert(s > 0.95, s"silhouette $s")
  }

  test("silhouetteExact agrees with the MLlib evaluator (M9)") {
    val r = new scala.util.Random(7)
    val df = ((1 to 30).map(_ => (Seq(r.nextDouble(), r.nextDouble() + 2.0), 0)) ++
      (1 to 25).map(_ => (Seq(3.0 + r.nextDouble(), r.nextDouble()), 1)) ++
      (1 to 20).map(_ => (Seq(r.nextDouble() - 3.0, -2.0 + r.nextDouble()), 2)))
      .toDF("v", "label")
    val ml = Clustering.silhouette(df, "v", "label")
    val row = Clustering.silhouetteExact(df, "v", "label").head()
    assert(row.getLong(0) === 75L)
    assert(row.getLong(1) === 3L)
    // identical statistic up to the 1e-6 capture grid (75 points -> ~1e-8)
    assert(math.abs(row.getDouble(2) - ml) < 1e-4,
      s"exact ${row.getDouble(2)} vs mllib $ml")
  }

  test("completeSeries densifies sparse keys onto the spine with fills") {
    val df = Seq(("u1", 1, 10.0), ("u1", 3, 30.0), ("u2", 2, 5.0))
      .toDF("u", "t", "v")
    val dense = Clustering.completeSeries(df, Seq("u"), "t", "v")
      .orderBy("u", "t").collect()
    assert(dense.length === 6) // 2 keys x 3 spine points
    val u1 = dense.filter(_.getString(0) == "u1").map(_.getAs[Double]("v"))
    assert(u1.toSeq === Seq(10.0, 10.0, 30.0)) // t=2 ffilled from t=1
    val u2 = dense.filter(_.getString(0) == "u2").map(_.getAs[Double]("v"))
    assert(u2.toSeq === Seq(5.0, 5.0, 5.0)) // t=1 bfilled, t=3 ffilled
  }

  test("seriesMatrix collects values in order (T10/W10)") {
    val df = Seq(("u1", 3, 30.0), ("u1", 1, 10.0), ("u1", 2, 20.0), ("u2", 1, 5.0))
      .toDF("u", "t", "v")
    val m = Clustering.seriesMatrix(df, Seq("u"), "t", "v").orderBy("u").collect()
    assert(m(0).getSeq[Double](1) === Seq(10.0, 20.0, 30.0))
    assert(m(1).getSeq[Double](1) === Seq(5.0))
  }

  test("corrMatrix: diag 1, symmetry-by-construction, perfect and bounded corr") {
    val df = (1 to 50).map { i =>
      (i.toDouble, 2.0 * i, 51.0 - i, (i * 37 % 11).toDouble)
    }.toDF("x", "y2x", "neg", "noise")
    val m = Clustering.corrMatrix(df, Seq("x", "y2x", "neg", "noise"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(m(("x", "x")) - 1.0) < 1e-12)
    assert(math.abs(m(("x", "y2x")) - 1.0) < 1e-12)  // exact linear
    assert(math.abs(m(("x", "neg")) + 1.0) < 1e-12)  // exact anti-linear
    assert(m.values.forall(v => v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12))
    // long form carries each unordered pair once, var_a <= var_b in input order
    assert(m.size === 10)
  }

  test("corrMatrixGrid agrees with corrMatrix on decimal-grained data") {
    // 2-dp-grained columns: the grid snap is lossless, so the long-sum
    // moments are the same rationals the decimal capture produces and
    // the correlations agree to reconstruction rounding.
    val df = (1 to 200).map { i =>
      (i.toDouble, (i * 37 % 113) / 100.0 * 25, ((i * 91) % 47) / 4.0)
    }.toDF("a", "b", "c")
    def toMap(m: org.apache.spark.sql.DataFrame) =
      m.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val exact = toMap(Clustering.corrMatrix(df, Seq("a", "b", "c")))
    val grid = toMap(Clustering.corrMatrixGrid(df, Seq("a", "b", "c"), decimals = 2))
    assert(exact.keySet === grid.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(v - grid(k)) < 1e-12, s"$k: $v vs ${grid(k)}")
    }
  }

  test("corrMatrixGrid handles negative-valued columns (arithmetic shift path)") {
    // The hi/lo split must reconstruct NEGATIVE products exactly:
    // shiftright is an arithmetic shift, so k = (k>>26)*2^26 + (k&mask)
    // holds in two's complement for any sign (DuckDB's `>>`/`&` share
    // these semantics — verified: -5000000001 >> 26 = -75 and the
    // reconstruction round-trips there too, so the q88 oracle twin stays
    // valid if a measure ever goes negative).
    val df = (1 to 200).map { i =>
      (i - 100.5, -((i * 37 % 113) / 100.0 * 25), ((i * 91) % 47) / 4.0 - 5.0)
    }.toDF("a", "b", "c")
    def toMap(m: org.apache.spark.sql.DataFrame) =
      m.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val exact = toMap(Clustering.corrMatrix(df, Seq("a", "b", "c")))
    val grid = toMap(Clustering.corrMatrixGrid(df, Seq("a", "b", "c"), decimals = 2))
    assert(exact.keySet === grid.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(v - grid(k)) < 1e-12, s"$k: $v vs ${grid(k)}")
    }
    // negative products actually exercised: mixed-sign columns guarantee
    // at least one cross moment with negative per-row products
    assert(exact.exists { case (_, v) => v != 0.0 })
  }

  test("MLlib pcaLoadings agrees with the Jacobi eigensolver (sign-canonicalized)") {
    // Ties the DISTRIBUTED PCA operator to the independently-validated
    // pinned eigen path: same fixture, same top-3 loadings up to the
    // largest-|loading|-positive sign convention.
    val X = graft.ts.Pinned.featureMatrix
    val df = X.toSeq.map(r => Tuple1(r.toSeq)).toDF("v")
    val ml = Clustering.pcaLoadings(df, "v", k = 3).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val mlMat = Array.tabulate(X(0).length, 3)((i, f) => ml((f, i)))
    val jac = graft.ml.Eigen.principalLoadings(X, 3)
    val mlCanon = graft.ml.Eigen.canonicalizeSigns(mlMat)
    for (i <- X(0).indices; f <- 0 until 3)
      assert(math.abs(mlCanon(i)(f) - jac(i)(f)) < 1e-6,
        s"loading($i,$f): MLlib ${mlCanon(i)(f)} vs Jacobi ${jac(i)(f)}")
  }

  test("corrMatrix: (near-)constant column yields corr 0, never NaN") {
    // A constant column's variance term can round slightly negative
    // (sqrt → NaN); the engine must clamp and report 0, and a tiny
    // near-constant jitter must stay finite too.
    val df = (1 to 40).map { i =>
      (i.toDouble, 7.0, 3.0 + (if (i == 1) 1e-13 else 0.0))
    }.toDF("x", "const", "nearConst")
    val m = Clustering.corrMatrix(df, Seq("x", "const", "nearConst"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m.values.forall(v => !v.isNaN), s"NaN leaked: $m")
    assert(m(("x", "const")) === 0.0)
    assert(m(("const", "const")) === 0.0 || m(("const", "const")) === 1.0)
  }
}

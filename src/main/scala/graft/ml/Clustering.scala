package graft.ml

import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.feature.{PCA => MlPca}
import org.apache.spark.ml.linalg.{Vectors => MlVectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering / scaling layer (SURVEY.md §2.9 M1-M3, M8-M10, T10/W10).
  *
  * Reference: `unsupervised/ts_kmeans_base.ipynb` — monthly series matrix
  * (#22,#39), MinMax scaling (#53), `TimeSeriesKMeans(n_clusters=12,
  * metric="dtw", random_state=42)` (#53), euclidean silhouette (#53),
  * cluster→label mapping (#51), PCA loadings (#13).
  *
  * Scale design: assignment steps broadcast the k×len centroid matrix and
  * stream the series table through one projection (no shuffle); centroid
  * updates are a (cluster, position) grouped mean — one shuffle of k×len
  * partial sums. Equal-length series use pointwise-mean centroids (the
  * reference's tslearn uses DBA barycenters; per SURVEY §7.4 we match the
  * clustering protocol — k, metric, seed — not tslearn's float
  * trajectories, and validate permutation-invariantly).
  */
object Clustering {

  // ------------------------------------------------------------------ DTW

  /** Classic O(n·m) dynamic-time-warping distance (euclidean point cost,
    * full window) between two series.
    */
  def dtw(a: Array[Double], b: Array[Double]): Double =
    dtwBounded(a, b, Double.PositiveInfinity)

  /** [[dtw]] with an exact early-abandon cutoff (UCR-suite style): DP
    * row minima only grow, so once a full row exceeds `cutoff`² no
    * alignment path can come back under it and the true distance is
    * ≥ `cutoff` — return +∞ without finishing the matrix. Callers that
    * only compare against a best-so-far (argmin assignment, min-distance
    * folds) get identical results with most non-winning matrices
    * abandoned after a few rows.
    */
  def dtwBounded(a: Array[Double], b: Array[Double], cutoff: Double): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return if (n == m) 0.0 else Double.PositiveInfinity
    val cutoffSq =
      if (cutoff == Double.PositiveInfinity) Double.PositiveInfinity
      else cutoff * cutoff
    val prev = new Array[Double](m + 1)
    val cur = new Array[Double](m + 1)
    java.util.Arrays.fill(prev, Double.PositiveInfinity)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      cur(0) = Double.PositiveInfinity
      var rowMin = Double.PositiveInfinity
      var j = 1
      while (j <= m) {
        val d = a(i - 1) - b(j - 1)
        val v = d * d + math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > cutoffSq) return Double.PositiveInfinity
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    math.sqrt(prev(m))
  }

  // --------------------------------------------------------- DTW k-means

  /** (seriesId, cluster) assignment plus final centroids. */
  final case class KMeansResult(assignments: DataFrame,
                                centroids: Array[Array[Double]], iterations: Int)

  /** Lloyd's iterations with DTW assignment over a (id, vec) frame of
    * equal-length series. Init is deterministic farthest-first traversal
    * (k-means++ without sampling): seeded pick of the first centroid, then
    * k-1 distributed max-min-distance scans — robust to planted-group
    * splits that plain random init falls into, and reproducible.
    */
  /** Shared deterministic init: the first centroid is the series
    * minimizing `firstPick` (a per-sid hash expression), the remaining
    * k-1 come from incremental farthest-first traversal — carry each
    * series' min-distance-so-far and fold in ONLY the newest centroid
    * per step, k-1 DTW scans total instead of the 1+2+…+(k-1) quadratic
    * rescan. The loop is k-1 SEQUENTIAL argmax passes over one bounded
    * (sid, vec, d) state, i.e. genuine per-partition imperative
    * iteration: an RDD map/max avoids Catalyst re-planning + codegen
    * compiling a fresh plan per step, which dominated the DataFrame
    * form's wall time. Tie-break: max distance, then SMALLEST sid.
    */
  private def farthestFirstInit(data: DataFrame, firstPick: org.apache.spark.sql.Column,
                                kEff: Int, statePartitions: Int): Array[Array[Double]] = {
    val firstId = data
      .select(min_by(col("sid"), firstPick).as("s"))
      .head().getString(0)
    val init = scala.collection.mutable.ArrayBuffer(
      data.filter(col("sid") === firstId).head().getSeq[Double](1).toArray)
    val farthestOrd = new Ordering[(String, Array[Double], Double)] {
      def compare(a: (String, Array[Double], Double),
                  b: (String, Array[Double], Double)): Int = {
        val c = java.lang.Double.compare(a._3, b._3)
        if (c != 0) c else b._1.compareTo(a._1)
      }
    }
    var stateRdd = data.rdd
      .map(r => (r.getString(0), r.getSeq[Double](1).toArray,
        Double.PositiveInfinity))
      .coalesce(statePartitions)
      .persist()
    while (init.length < kEff) {
      val newest = init.last
      val prev = stateRdd
      stateRdd = prev
        .map { case (sid, v, d) => (sid, v, math.min(d, dtwBounded(v, newest, d))) }
        .persist()
      val far = stateRdd.max()(farthestOrd)
      init += far._2
      prev.unpersist(false)
    }
    stateRdd.unpersist(false)
    init.toArray
  }

  /** Partition sizing for the bounded iterative k-means state: the
    * init/Lloyd loops run ~k + iters sequential jobs over it, and at 32
    * near-empty partitions per job the task-launch overhead dwarfs the
    * DTW math. ~512 series per partition keeps tasks meaningfully sized;
    * large series counts still spread to full parallelism.
    */
  private def kmeansStatePartitions(spark: org.apache.spark.sql.SparkSession,
                                    n: Long): Int =
    math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (n / 512 + 1).toInt))

  def dtwKMeans(series: DataFrame, idCol: String, vecCol: String, k: Int,
                maxIter: Int = 10, seed: Long = 42L): KMeansResult = {
    val spark = series.sparkSession
    val data = series.select(col(idCol).cast("string").as("sid"),
      col(vecCol).cast("array<double>").as("vec")).cache()
    try {
      val n = data.count()
      require(k >= 1 && n >= 1, s"need k >= 1 and data, got k=$k n=$n")
      // Clamp k to the series count (callers previously ran an extra
      // count() job over the full input DAG just to pre-clamp).
      val kEff = math.min(k.toLong, n).toInt
      // Seeded first-centroid pick as a distributed argmin over a salted
      // hash — uniform like a shuffle-and-take-head, but no O(#series)
      // driver collect (the previous init materialized every id on the
      // driver just to pick one).
      val statePartitions = kmeansStatePartitions(spark, n)
      var centroids: Array[Array[Double]] = farthestFirstInit(
        data, xxhash64(col("sid"), lit(seed)), kEff, statePartitions)

      // Lloyd's iterations as ONE job each: assignment + per-partition
      // (cluster → sum, count) partials fused in a mapPartitions, merged
      // on the driver (k×len state). The DataFrame form compiled a fresh
      // plan + codegen per iteration and ran two jobs (assign, pointwise
      // mean) — plan overhead exceeded the DTW math itself.
      val vecs = data.rdd
        .map(r => (r.getString(0), r.getSeq[Double](1).toArray))
        .coalesce(statePartitions)
        .persist()
      var it = 0
      var changed = true
      while (it < maxIter && changed) {
        val bc = spark.sparkContext.broadcast(centroids)
        val partials = vecs.mapPartitions { rows =>
          val kk = bc.value.length
          val sums = new Array[Array[Double]](kk)
          val counts = new Array[Long](kk)
          rows.foreach { case (_, v) =>
            var best = 0; var bestD = Double.PositiveInfinity; var c = 0
            while (c < kk) {
              val d = dtwBounded(v, bc.value(c), bestD)
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            if (sums(best) == null) sums(best) = new Array[Double](v.length)
            var i = 0
            while (i < v.length) { sums(best)(i) += v(i); i += 1 }
            counts(best) += 1
          }
          Iterator.single((sums, counts))
        }.collect()
        val next = centroids.indices.map { c =>
          var cnt = 0L
          var sum: Array[Double] = null
          partials.foreach { case (sums, counts) =>
            if (sums(c) != null) {
              if (sum == null) sum = new Array[Double](sums(c).length)
              var i = 0
              while (i < sum.length) { sum(i) += sums(c)(i); i += 1 }
              cnt += counts(c)
            }
          }
          if (cnt == 0) centroids(c) // empty cluster keeps its centroid
          else sum.map(_ / cnt)
        }.toArray
        changed = !next.indices.forall(c => next(c).sameElements(centroids(c)))
        centroids = next
        it += 1
      }
      // Final assignment on the already-persisted vecs RDD, materialized
      // EAGERLY (localCheckpoint) while the cache is still alive: the
      // returned frame used to carry the full upstream lineage, so
      // consuming it after the `finally` unpersist recomputed the whole
      // input DAG a second time — at sf0.1 the input prep cost ~2× the
      // clustering itself. The checkpointed result is 2 small columns per
      // series (bounded pin), and the assignment stays distributed.
      val bcF = spark.sparkContext.broadcast(centroids)
      import spark.implicits._
      val assigned = vecs.map { case (sid, v) =>
        var best = 0; var bestD = Double.PositiveInfinity; var c = 0
        while (c < bcF.value.length) {
          val d = dtwBounded(v, bcF.value(c), bestD)
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        (sid, best)
      }.toDF("series", "cluster")
        .orderBy("cluster", "series")
      val out = graft.ops.Pin.pin(assigned)
      vecs.unpersist(blocking = true)
      KMeansResult(out, centroids, it)
    } finally data.unpersist(blocking = true)
  }

  /** Oracle twin of [[dtwKMeans]]: the same Lloyd-with-DTW protocol with
    * every arithmetic step made cross-engine replayable, so the full
    * clustering hash-checks against a DuckDB transcript of the protocol
    * (q109) on real SF data — the q44/q80-style exact twin of the q53
    * production path.
    *
    * Differences from the production variant, each forced by
    * replayability:
    *  - first-centroid pick hashes with md5 (DuckDB has no xxhash64);
    *    farthest-first traversal and tie-breaks are otherwise identical;
    *  - centroid updates capture members at DECIMAL(38,9) and divide the
    *    exact sum by the count — partition-order-invariant (the exact
    *    decimal sum is associative) and bit-reproducible in any engine,
    *    where the production path's streamed double sums are fast but
    *    partition-order-sensitive (COVERAGE.md documents that trade);
    *  - exactly `maxIter` Lloyd rounds (no converged-early stop), so the
    *    oracle can unroll the same fixed number of stages.
    *
    * Scale shape matches the production path: assignments broadcast the
    * k×len centroids and stream series through one projection; the
    * update is a (cluster, position) grouped decimal sum — one shuffle
    * of k×len partials with map-side combine; k×len values collect to
    * the driver per round.
    */
  def dtwKMeansExact(series: DataFrame, idCol: String, vecCol: String, k: Int,
                     maxIter: Int = 5): KMeansResult = {
    import org.apache.spark.sql.types.DecimalType
    val spark = series.sparkSession
    val data = series.select(col(idCol).cast("string").as("sid"),
      col(vecCol).cast("array<double>").as("vec")).cache()
    try {
      val n = data.count()
      require(k >= 1 && n >= 1, s"need k >= 1 and data, got k=$k n=$n")
      val kEff = math.min(k.toLong, n).toInt
      val statePartitions = kmeansStatePartitions(spark, n)
      var centroids: Array[Array[Double]] =
        farthestFirstInit(data, md5(col("sid")), kEff, statePartitions)
      var it = 0
      while (it < maxIter) {
        val bc = spark.sparkContext.broadcast(centroids)
        val assign = udf { (v: Seq[Double]) =>
          val arr = v.toArray
          var best = 0; var bestD = Double.PositiveInfinity; var c = 0
          while (c < bc.value.length) {
            val d = dtwBounded(arr, bc.value(c), bestD)
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          best
        }
        // decimal-exact pointwise mean per (cluster, position): the same
        // CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE)/COUNT shape as every
        // Exact-captured aggregate, so DuckDB reproduces each centroid
        // coordinate bit-for-bit; k×len rows collect per round.
        val stats = data
          .select(assign(col("vec")).as("cl"),
            posexplode(col("vec")).as(Seq("pos", "v")))
          .groupBy("cl", "pos")
          .agg((sum(col("v").cast(DecimalType(38, 9))).cast("double") /
            count(lit(1))).as("m"))
          .collect()
        val byCl = stats.groupBy(_.getInt(0))
        centroids = centroids.indices.map { c =>
          byCl.get(c) match {
            case Some(rows) =>
              val m = new Array[Double](rows.length)
              rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
              m
            case None => centroids(c) // empty cluster keeps its centroid
          }
        }.toArray
        it += 1
      }
      val bcF = spark.sparkContext.broadcast(centroids)
      val assignDist = udf { (v: Seq[Double]) =>
        val arr = v.toArray
        var best = 0; var bestD = Double.PositiveInfinity; var c = 0
        while (c < bcF.value.length) {
          val d = dtwBounded(arr, bcF.value(c), bestD)
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        (best, bestD) // early abandon is exact for the winner's distance
      }
      val out = graft.ops.Pin.pin(
        data.select(col("sid").as("series"), assignDist(col("vec")).as("a"))
          .select(col("series"), col("a._1").as("cluster"), col("a._2").as("dist"))
          .orderBy("series"))
      KMeansResult(out, centroids, it)
    } finally data.unpersist(blocking = true)
  }

  // ------------------------------------------------- scaling (M1/M2)

  /** Min-max scale `cols` to [0,1] (M1): one aggregate job for the
    * min/max row, broadcast back as literals via crossJoin — no
    * single-partition window. Constant columns map to 0.
    */
  def minMaxScale(df: DataFrame, cols: Seq[String], suffix: String = "_mm"): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val scaled = cols.foldLeft(joined) { (d, c) =>
      val rng = col(s"__max_$c") - col(s"__min_$c")
      d.withColumn(c + suffix,
        when(rng =!= 0, (col(c) - col(s"__min_$c")) / rng).otherwise(lit(0.0)))
    }
    scaled.drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Standard-scale `cols` (M2) with deterministic decimal moments:
    * mean = dsum(x)/n, var = dsum(x²)/n − mean² (population, matching
    * sklearn's StandardScaler).
    */
  def standardScale(df: DataFrame, cols: Seq[String], suffix: String = "_std"): DataFrame = {
    import graft.ops.Exact.dsum
    val aggs = cols.flatMap(c => Seq(
      (dsum(col(c)) / count(col(c))).as(s"__mu_$c"),
      (dsum(col(c) * col(c)) / count(col(c))).as(s"__m2_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val scaled = cols.foldLeft(joined) { (d, c) =>
      val sd = sqrt(col(s"__m2_$c") - col(s"__mu_$c") * col(s"__mu_$c"))
      d.withColumn(c + suffix,
        when(sd =!= 0, (col(c) - col(s"__mu_$c")) / sd).otherwise(lit(0.0)))
    }
    scaled.drop(cols.flatMap(c => Seq(s"__mu_$c", s"__m2_$c")): _*)
  }

  /** Pearson correlation matrix of `cols` in long form (var_a ≤ var_b,
    * corr), from decimal-exact moment sums — ONE aggregate job over the
    * data, k² bounded driver rows out. The reference inspects feature
    * correlations before factor analysis / feature pruning
    * (`ts_kmeans_base.ipynb`). The combination arithmetic runs in doubles
    * with a fixed expression shape so an oracle reproduces it exactly.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    import graft.ops.Exact.dsum
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = (cols.map(c => dsum(col(c)).as(s"s_$c")) ++
      (for (i <- cols.indices; j <- i until cols.length)
        yield dsum(col(cols(i)) * col(cols(j))).as(s"p_${i}_$j")) :+
      count(lit(1)).as("n")).toSeq
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getLong(r.fieldIndex("n")).toDouble
    def s(c: String) = r.getDouble(r.fieldIndex(s"s_$c"))
    def p(i: Int, j: Int) = r.getDouble(r.fieldIndex(s"p_${i}_$j"))
    val rows = for (i <- cols.indices; j <- i until cols.length) yield {
      val num = n * p(i, j) - s(cols(i)) * s(cols(j))
      // Clamp at 0: for a (near-)constant column the rounded variance
      // term can land slightly negative, and sqrt(negative) = NaN would
      // slip past a `den == 0` guard. NaN/0 denominator → corr 0.
      val den = math.sqrt(math.max(0.0, n * p(i, i) - s(cols(i)) * s(cols(i)))) *
        math.sqrt(math.max(0.0, n * p(j, j) - s(cols(j)) * s(cols(j))))
      (cols(i), cols(j), if (den == 0 || den.isNaN) 0.0 else num / den)
    }
    rows.toDF("var_a", "var_b", "corr")
  }

  /** [[corrMatrix]] for decimal-grained columns (fixed `decimals` digits,
    * e.g. 2-dp money/quantity measures): snaps each value to its integer
    * grid (`floor(x·10^d + 0.5)` — the same IEEE double ops in any
    * engine, so the longs are identical by construction) and sums the
    * O(k²) product moments as LONGS with a hi/lo 2²⁶ split. All codegen'd
    * integer arithmetic — no per-row BigDecimal conversion, which made
    * the general decimal-capture variant ~5× slower at sf0.1 — while
    * staying exact and partition-order-invariant. Bounds (documented, not
    * silent): |x|·10^d < 1e8 and n < ~6e10 rows keep every partial sum in
    * range; ANSI mode turns an overflow into an error, never a wrong sum.
    * The driver reconstructs each moment with a fixed expression shape
    * (`hi·2²⁶ + lo, then one divide`) that an oracle replays bit-for-bit.
    * Negative values are fine: shiftright is an ARITHMETIC shift, so
    * `k = (k>>26)·2²⁶ + (k & mask)` holds in two's complement for any
    * sign — and DuckDB's `>>`/`&` share those semantics, keeping the
    * oracle twin valid (negative-column agreement is spec-covered).
    */
  def corrMatrixGrid(df: DataFrame, cols: Seq[String], decimals: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val scale = math.pow(10.0, decimals)
    val ks = cols.map(c => floor(col(c) * lit(scale) + lit(0.5)).cast("long"))
    val Shift = 26
    val Mask = (1L << Shift) - 1
    val loAggs = (cols.indices.map(i => sum(ks(i)).as(s"s_$i")) ++
      (for (i <- cols.indices; j <- i until cols.length) yield Seq(
        sum(shiftright(ks(i) * ks(j), Shift)).as(s"hi_${i}_$j"),
        sum((ks(i) * ks(j)).bitwiseAND(lit(Mask))).as(s"lo_${i}_$j"))).flatten :+
      count(lit(1)).as("n")).toSeq
    val r = df.agg(loAggs.head, loAggs.tail: _*).head()
    val n = r.getLong(r.fieldIndex("n")).toDouble
    def s(i: Int) = r.getLong(r.fieldIndex(s"s_$i")).toDouble / scale
    def p(i: Int, j: Int) = {
      val hi = r.getLong(r.fieldIndex(s"hi_${i}_$j")).toDouble
      val lo = r.getLong(r.fieldIndex(s"lo_${i}_$j")).toDouble
      (hi * (1L << Shift).toDouble + lo) / (scale * scale)
    }
    val rows = for (i <- cols.indices; j <- i until cols.length) yield {
      val num = n * p(i, j) - s(i) * s(j)
      val den = math.sqrt(math.max(0.0, n * p(i, i) - s(i) * s(i))) *
        math.sqrt(math.max(0.0, n * p(j, j) - s(j) * s(j)))
      (cols(i), cols(j), if (den == 0 || den.isNaN) 0.0 else num / den)
    }
    rows.toDF("var_a", "var_b", "corr")
  }

  /** Min-max scale an array column per POSITION (the reference scales the
    * series matrix column-wise before DTW k-means, `ts_kmeans_base.ipynb#53`).
    */
  def minMaxScaleArray(df: DataFrame, vecCol: String, outCol: String): DataFrame = {
    val stats = df.select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("pos").agg(min("v").as("lo"), max("v").as("hi"))
      .orderBy("pos").collect()
    val lo = typedLit(stats.map(_.getDouble(1)).toSeq)
    val hi = typedLit(stats.map(_.getDouble(2)).toSeq)
    // transform() keeps the per-position rescale inside whole-stage
    // codegen (a Scala UDF here forced a serialize/deserialize per row);
    // the bounded lo/hi vectors ride along as array literals.
    df.withColumn(outCol,
      transform(col(vecCol).cast("array<double>"), (x, i) => {
        val l = element_at(lo, i + 1)
        val r = element_at(hi, i + 1) - l
        when(r === lit(0.0), lit(0.0)).otherwise((x - l) / r)
      }))
  }

  // ----------------------------------------------------------- PCA (M3)

  /** Principal-component loadings of an array column: returns
    * (component, pos, loading) long-form (k×dim rows). MLlib PCA over a
    * dense-vector projection of the arrays.
    */
  def pcaLoadings(df: DataFrame, vecCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val feat = df.select(org.apache.spark.ml.functions
      .array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new MlPca().setInputCol("features").setOutputCol("pca")
      .setK(k).fit(feat)
    val pc = model.pc // dim x k, column-major
    val dim = pc.numRows
    (0 until k).flatMap(c => (0 until dim).map(p =>
      (c, p, pc(p, c)))).toDF("component", "pos", "loading")
  }

  // ---------------------------------------------------- silhouette (M9)

  /** Euclidean silhouette of a clustering over an array column (MLlib
    * ClusteringEvaluator, squaredEuclidean — the reference's
    * `silhouette_score(metric='euclidean')`).
    */
  def silhouette(df: DataFrame, vecCol: String, clusterCol: String): Double = {
    val feat = df.select(org.apache.spark.ml.functions
      .array_to_vector(col(vecCol).cast("array<double>")).as("features"),
      col(clusterCol).cast("double").as("prediction"))
    new ClusteringEvaluator().setFeaturesCol("features")
      .setPredictionCol("prediction")
      .setMetricName("silhouette")
      .setDistanceMeasure("squaredEuclidean")
      .evaluate(feat)
  }

  /** Decimal-exact squared-euclidean silhouette — the same statistic as
    * [[silhouette]] (MLlib's `SquaredEuclideanSilhouette` formulation:
    * per-cluster feature sums + squared-norm sums, a(i) excludes the
    * point, b(i) = min over other clusters, s = (b-a)/max(a,b), overall
    * mean) but with every order-dependent double sum captured in decimal
    * and every computed double snapped to the 1e-6 grid, so the score is
    * partition-invariant and reproducible in ANSI SQL (the q57 oracle).
    *
    * Scale shape: one (cluster,pos) grouped aggregate for the k×dim
    * stats (collected — bounded by k×dim, never by rows), then a single
    * stateless projection over the points with k codegen'd exact dot
    * products against literal cluster-sum arrays — no shuffle after the
    * stats job. Returns one row: (n_points, k, silhouette).
    */
  def silhouetteExact(df: DataFrame, vecCol: String, clusterCol: String): DataFrame = {
    import graft.sim.Similarity.dotExact
    import org.apache.spark.sql.types.DecimalType
    val snap = (c: org.apache.spark.sql.Column) => round(c * 1e6, 0) / 1e6
    val dec = (c: org.apache.spark.sql.Column) =>
      sum(round(c * 1e6, 0).cast(DecimalType(30, 0))).cast("double") / 1e6
    val base = df.select(col(clusterCol).cast("string").as("__lbl"),
      col(vecCol).cast("array<double>").as("__v"))
    val withSq = base.withColumn("__sq", snap(dotExact(col("__v"), col("__v"))))
    val nsq = withSq.groupBy("__lbl")
      .agg(count(lit(1)).as("n"), dec(col("__sq")).as("sqsum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val fsums = base
      .select(col("__lbl"), posexplode(col("__v")).as(Seq("pos", "x")))
      .groupBy("__lbl", "pos").agg(dec(col("x")).as("s"))
      .collect().groupBy(_.getString(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      }
    val labels = nsq.keys.toSeq.sorted
    require(labels.nonEmpty, "silhouette needs at least one cluster")
    // dist to cluster c: n_c*||x||^2 - 2 x.S_c + sqsum_c (self term is 0)
    val withDists = labels.zipWithIndex.foldLeft(withSq) { case (d, (l, i)) =>
      val (n, sqsum) = nsq(l)
      d.withColumn(s"__d$i",
        lit(n.toDouble) * col("__sq") -
          lit(2.0) * snap(dotExact(col("__v"), lit(fsums(l)))) + lit(sqsum))
    }
    val aCol = labels.zipWithIndex.foldLeft(lit(null).cast("double")) {
      case (acc, (l, i)) =>
        val n = nsq(l)._1
        when(col("__lbl") === l,
          if (n > 1) col(s"__d$i") / lit((n - 1).toDouble) else lit(0.0))
          .otherwise(acc)
    }
    val bCol = labels.zipWithIndex.foldLeft(lit(null).cast("double")) {
      case (acc, (l, _)) =>
        val others = labels.zipWithIndex.filter(_._1 != l)
          .map { case (o, j) => col(s"__d$j") / lit(nsq(o)._1.toDouble) }
        val b = if (others.isEmpty) lit(0.0)
          else if (others.size == 1) others.head
          else least(others: _*)
        when(col("__lbl") === l, b).otherwise(acc)
    }
    val nOwn = labels.foldLeft(lit(null).cast("long")) { (acc, l) =>
      when(col("__lbl") === l, lit(nsq(l)._1)).otherwise(acc)
    }
    val scored = withDists.withColumn("__a", aCol).withColumn("__b", bCol)
      .withColumn("__s",
        when(nOwn === 1L || lit(labels.size) === 1, lit(0.0))
          .when(greatest(col("__a"), col("__b")) === 0.0, lit(0.0))
          .otherwise((col("__b") - col("__a")) / greatest(col("__a"), col("__b"))))
    scored.agg(count(lit(1)).as("n_points"), lit(labels.size.toLong).as("k"),
      (dec(col("__s")) / count(col("__s"))).as("silhouette"))
  }

  // --------------------------------- series-matrix assembly (T10/W10)

  /** Per-key ordered series vectors: (keyCols..., vec) where vec is the
    * values of `valueCol` sorted by `orderCol` (the reference's monthly
    * series matrix, `ts_kmeans_base.ipynb#22,#39`; `sort_array` over
    * collected (order, value) structs pins determinism).
    */
  def seriesMatrix(df: DataFrame, keyCols: Seq[String], orderCol: String,
                   valueCol: String, outCol: String = "vec"): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(transform(
        sort_array(collect_list(struct(col(orderCol), col(valueCol).as("v")))),
        s => s.getField("v")).as(outCol))

  /** Densify a sparse (key, order, value) frame onto the full order spine
    * (distinct `orderCol` values across ALL keys), filling holes per key
    * by ffill-then-bfill — the reference's `ffill().bfill()` matrix
    * completion (`ts_kmeans_base.ipynb#39`). The spine is
    * calendar-bounded (days/months), so the broadcast cross join adds
    * |keys| × |spine| rows, each filled inside the key's hash partition.
    */
  def completeSeries(df: DataFrame, keyCols: Seq[String], orderCol: String,
                     valueCol: String): DataFrame = {
    val spine = broadcast(df.select(col(orderCol)).distinct())
    val keys = df.select(keyCols.map(col): _*).distinct()
    val dense = keys.crossJoin(spine)
      .join(df, keyCols :+ orderCol, "left")
    graft.ops.Fills.fillBoth(dense, Seq(valueCol), keyCols, Seq(orderCol),
      limit = None)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Similarity

/** IVFPQ (VERDICT r17 item 1; RESIDUAL-encoded since round 19 — VERDICT
  * r18 item 1) and the persisted PQ index (item 3): the native ADC
  * lookup table, the fused assign+residual-encode index scan, the
  * composed probe→residual-ADC-prefilter→exact-re-rank operator, the
  * stream's direct residual score, and the from-index PQ query path.
  */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val dim = 16
  private def corpus = (0L until 60L).map { i =>
    (i, Array.tabulate(dim)(d =>
      (math.sin(i * 31 + d * 7) * 10 + d * 0.01 * i).toFloat))
  }.toDF("vec_id", "embedding")
  private def queries = corpus.filter(col("vec_id") < 3)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("query_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3))))

  /** the ExactSqDist capture rule, replayed independently on the driver:
    * IEEE double subtract/multiply, shortest-repr HALF_UP capture at
    * scale 18, exact sum.
    */
  private def exactSq(a: Array[Double], b: Array[Double]): BigDecimal =
    (0 until math.min(a.length, b.length)).map { i =>
      val d = a(i) - b(i)
      BigDecimal(java.math.BigDecimal.valueOf(d * d)
        .setScale(18, java.math.RoundingMode.HALF_UP))
    }.foldLeft(BigDecimal(0))(_ + _)

  private def corpusVecs: Map[Long, Array[Double]] =
    corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  test("PqAdcTable entries equal the exact-decimal sub-distances within double rounding") {
    val m = 4; val kCodes = 8; val dsub = dim / m
    val cb = Similarity.pqCodebook(corpus, "vec_id", "embedding", m, kCodes, dim)
    val cbRows = cb.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Float](2))).toMap
    val (nCodes, qt) = Similarity.adcTableCol(cb, m, dim, col("embedding"))
    assert(nCodes === kCodes)
    val got = queries.select(col("vec_id"), qt.as("qt")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    queries.collect().foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1)
      for (j <- 0 until m; c <- 0 until kCodes) {
        // reference: the ExactSqDist decimal capture (order-free sums)
        val cen = cbRows((j, c))
        val exact = (0 until dsub).map { d =>
          val diff = BigDecimal(v(j * dsub + d).toDouble) -
            BigDecimal(cen(d).toDouble)
          diff * diff
        }.sum.toDouble
        val dbl = got(id)(j * kCodes + c)
        assert(math.abs(dbl - exact) <= 1e-9 * math.max(1.0, exact.abs),
          s"table entry ($j,$c) for query $id: $dbl vs exact $exact")
      }
    }
  }

  test("PqAdcTable ragged rows drop missing terms (the ExactSqDist convention)") {
    val m = 2; val kCodes = 2; val dsub = 2
    val cents: IndexedSeq[IndexedSeq[Double]] = IndexedSeq(
      IndexedSeq(1.0, 2.0), IndexedSeq(3.0, 4.0),   // j=0 codes 0,1
      IndexedSeq(5.0, 6.0), IndexedSeq(7.0, 8.0))   // j=1 codes 0,1
    val expr = org.apache.spark.sql.graft.Bridge.column(
      graft.functions.PqAdcTable(
        org.apache.spark.sql.graft.Bridge.expression(col("v")),
        cents, m, kCodes, dsub))
    // 3-element row: subspace 1's second component is missing — its
    // (x−c)² term drops entirely; subspace 0 is dense
    val got = Seq(Tuple1(Seq(0.0, 0.0, 0.0)))
      .toDF("v").select(expr.as("qt")).head.getSeq[Double](0)
    assert(got(0) === 1.0 + 4.0)    // (0-1)² + (0-2)²
    assert(got(1) === 9.0 + 16.0)
    assert(got(2) === 25.0)         // (0-5)² only; 6² term dropped
    assert(got(3) === 49.0)
  }

  test("PqAdcScore (direct, the plain-PQ form) ≡ summed PqAdcTable lookups, bit-for-bit") {
    // the batch path scores candidates via m lookups into the per-query
    // table (broadcast build side); the direct form scores per
    // (qv, codes) pair — same inner (x−c)² loop, same j-order sum, so
    // the doubles must be IDENTICAL or retention rules drift
    val m = 4; val kCodes = 8
    val cb = Similarity.pqCodebook(corpus, "vec_id", "embedding", m, kCodes, dim)
    val codes = Similarity.pqIndex(corpus, "vec_id", "embedding",
      m = m, k = kCodes, dim = dim).codes
    val paired = corpus.join(
      codes.withColumnRenamed("neighbor_id", "vec_id"), "vec_id")
    val (nCodes, qt) = Similarity.adcTableCol(cb, m, dim, col("embedding"))
    val viaTable = paired.select(col("vec_id"),
        Similarity.adcLookupSum(qt, col("codes"), m, nCodes).as("s"))
      .orderBy("vec_id").collect()
      .map(r => java.lang.Double.doubleToLongBits(r.getDouble(1)))
    val direct = paired.select(col("vec_id"),
        Similarity.adcScoreCol(cb, m, dim, col("embedding"), col("codes")).as("s"))
      .orderBy("vec_id").collect()
      .map(r => java.lang.Double.doubleToLongBits(r.getDouble(1)))
    assert(direct === viaTable)
  }

  test("IvfPqAdcScore (stream's residual form) ≡ PqAdcScore over the zip_with residual ≡ residual table lookups, bit-for-bit") {
    // the batch path re-bases the query into each probed cell and
    // builds a per-(query, cell) lookup table from that residual; the
    // stream scores each candidate directly from (qv, codes, cell).
    // All three must produce IDENTICAL doubles or the stream≡batch
    // retention drifts. Pair every corpus row (as its own query) with
    // its index row so every cell and code path is exercised.
    val m = 4; val kCodes = 8; val nCells = 4
    val idx = Similarity.ivfPqIndex(corpus, "vec_id", "embedding",
      nCells = nCells, m = m, k = kCodes, dim = dim)
    val centFrame = broadcast(idx.centroids.select(
      col("cell").cast("int").as("cell"),
      col("cvec").cast("array<double>").as("__cc")))
    val withR = corpus
      .join(idx.cells.withColumnRenamed("neighbor_id", "vec_id"), "vec_id")
      .join(centFrame, "cell")
      .select(col("vec_id"), col("cell"), col("codes"), col("embedding"),
        zip_with(col("embedding").cast("array<double>"), col("__cc"),
          (x, c) => x - c).as("__rq"))
    def bits(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id").collect()
        .map(r => java.lang.Double.doubleToLongBits(r.getDouble(1)))
    val direct = bits(withR.select(col("vec_id"),
      Similarity.ivfPqAdcScoreCol(idx.centroids, idx.codebook, m, dim,
        col("embedding"), col("codes"), col("cell")).as("s")))
    val viaScore = bits(withR.select(col("vec_id"),
      Similarity.adcScoreCol(idx.codebook, m, dim,
        col("__rq"), col("codes")).as("s")))
    val (nCodes, qt) = Similarity.adcTableCol(idx.codebook, m, dim, col("__rq"))
    val viaTable = bits(withR.select(col("vec_id"),
      Similarity.adcLookupSum(qt, col("codes"), m, nCodes).as("s")))
    assert(direct === viaScore)
    assert(direct === viaTable)
  }

  test("IVFPQ at full coverage (nProbe = nCells, rerank ≥ n) equals exact search") {
    val idx = Similarity.ivfPqIndex(corpus, "vec_id", "embedding",
      nCells = 4, m = 4, k = 8, dim = dim)
    val exact = rows(Similarity.cosineTopK(corpus, queries,
      "vec_id", "embedding", k = 5))
    val got = rows(Similarity.ivfPqTopKFromIndex(idx.cells, idx.centroids,
      idx.codebook, corpus, queries, "vec_id", "embedding",
      k = 5, m = 4, dim = dim, nProbe = 4, rerank = 1000))
    assert(got === exact)
  }

  test("exact-ADC audit variant: strict top-rerank by exact residual ADC, then exact cosine") {
    // Independent driver replay of the whole audit rule (the q209
    // protocol): deterministic centroids, exact-decimal assignment,
    // exact residual codes, per-(query, cell) residual ADC, strict
    // (adc asc, id) top-rerank, exact cosine over the survivors. (The
    // production DOUBLE path is deliberately a SUPERSET at the
    // boundary: same-cell code-identical candidates tie exactly in
    // ADC, the margin retention keeps the whole tie group, the strict
    // replayable rule cuts inside it by id; full-coverage equality is
    // the previous test's pin.)
    val rerank = 12
    val m = 4; val kCodes = 8; val nCells = 4
    val cents = Similarity.deterministicCentroids(corpus, "vec_id",
      "embedding", nCells)
    val idx = Similarity.ivfPqIndexWith(corpus, "vec_id", "embedding",
      cents, m = m, k = kCodes, dim = dim, exactEncode = true)
    val got = rows(Similarity.ivfPqTopKFromIndex(idx.cells, idx.centroids,
      idx.codebook, corpus, queries, "vec_id", "embedding",
      k = 5, m = m, dim = dim, nProbe = nCells, rerank = rerank,
      exactAdc = true))
    val dsub = dim / m
    val centArr = idx.centroids.orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)
    val cellsMap = idx.cells.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2)))).toMap
    val cbMap = idx.codebook.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray)).toMap
    val vecs = corpusVecs
    val want = queries.collect().map(_.getLong(0)).sorted.flatMap { qid =>
      val qv = vecs(qid)
      val adcByN = cellsMap.toSeq.filter(_._1 != qid)
        .map { case (nid, (cell, codes)) =>
          val rq = Array.tabulate(dim)(d => qv(d) - centArr(cell)(d))
          val adc = (0 until m).map { j =>
            exactSq(rq.slice(j * dsub, (j + 1) * dsub), cbMap((j, codes(j))))
          }.foldLeft(BigDecimal(0))(_ + _)
          (nid, adc)
        }
      val surv = adcByN.sortBy { case (nid, adc) => (adc, nid) }
        .take(rerank).map(_._1)
      rows(Similarity.cosineTopK(
        corpus.filter(col("vec_id").isin(surv: _*)),
        queries.filter(col("vec_id") === qid),
        "vec_id", "embedding", k = 5))
    }
    assert(got === want)
  }

  test("fused index: cells ≡ flat ivfIndex assignment; residual codes ≡ the exact-decimal argmin replay") {
    val m = 4; val kCodes = 8; val nCells = 4
    val fast = Similarity.ivfPqIndex(corpus, "vec_id", "embedding",
      nCells = nCells, m = m, k = kCodes, dim = dim)
    // the fused production scan assigns the SAME cells as the flat
    // ivfIndex (the frozen-quantizer append contract depends on it)
    val flat = Similarity.ivfIndex(corpus, "vec_id", "embedding",
        nCells = nCells)
      .cells.orderBy("neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val gotCells = fast.cells.select("neighbor_id", "cell")
      .orderBy("neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(gotCells === flat)
    // the fused scan's codes agree with a driver replay of the
    // exact-decimal residual argmin UNDER THE SAME cells (true gaps on
    // this corpus ≫ double rounding — the PqSpec fast≡exact relation)
    val dsub = dim / m
    val centArr = fast.centroids.orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)
    val cbMap = fast.codebook.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray)).toMap
    val vecs = corpusVecs
    fast.cells.collect().foreach { r =>
      val nid = r.getLong(0); val cell = r.getInt(1)
      val codes = r.getSeq[Int](2)
      val rq = Array.tabulate(dim)(d => vecs(nid)(d) - centArr(cell)(d))
      (0 until m).foreach { j =>
        val want = (0 until kCodes).minBy(c =>
          (exactSq(rq.slice(j * dsub, (j + 1) * dsub), cbMap((j, c))), c))
        assert(codes(j) === want, s"row $nid subspace $j")
      }
    }
    // the exactEncode form under deterministic centroids: assignment
    // replays the exact-decimal argmin (ties to the lower cell)
    val cents = Similarity.deterministicCentroids(corpus, "vec_id",
      "embedding", nCells)
    val exact = Similarity.ivfPqIndexWith(corpus, "vec_id", "embedding",
      cents, m = m, k = kCodes, dim = dim, exactEncode = true)
    val dCentArr = cents.orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)
    exact.cells.select("neighbor_id", "cell").collect().foreach { r =>
      val nid = r.getLong(0)
      val want = (0 until nCells).minBy(c => (exactSq(vecs(nid), dCentArr(c)), c))
      assert(r.getInt(1) === want, s"exact assignment for row $nid")
    }
    // and the residual codebook rows ARE the md5-sample residuals
    assert(exact.codebook.count() === m.toLong * kCodes)
    assert(exact.codebook.select("cvec").head.getSeq[Double](0).length === dsub)
  }

  test("residual codebook training sample is DECORRELATED from the centroid pick (the zero-codebook regression)") {
    // Both orderings once shared the unsalted md5 rule, so with
    // nCells ≥ k every codebook sample row WAS a centroid, every
    // training residual was x − x = 0, and the codebook collapsed to
    // m×k zero vectors — every same-cell candidate tied exactly in ADC
    // and no recall knob moved (measured: recall frozen at 0.48 with
    // identical survivor sets across m and rerank, SCALE.md round 19).
    // The salt (Similarity.IvfPqCbSalt) fixes it; this pins that a
    // deterministic quantizer with MORE cells than codebook samples
    // still trains on substantially NON-ZERO residuals.
    val m = 4; val kCodes = 8; val nCells = 16 // nCells ≥ k: the trap regime
    val cents = Similarity.deterministicCentroids(corpus, "vec_id",
      "embedding", nCells)
    val cb = Similarity.ivfPqCodebook(corpus, "vec_id", "embedding",
      cents, m, kCodes, dim)
    val rows = cb.collect().map(_.getSeq[Double](2))
    val nonZero = rows.count(_.exists(math.abs(_) > 1e-12))
    // a sampled row CAN legitimately be a centroid (its residual IS
    // zero) — the degeneracy is ALL of them being centroids
    assert(nonZero > rows.length / 2,
      s"only $nonZero of ${rows.length} codebook residuals are non-zero — " +
        "the training sample has re-collapsed onto the centroid pick")
  }

  test("exactArgminCell matches the all-exact argmin at large magnitudes (the relative-margin fix)") {
    // ADVICE r19 (medium): the old ABSOLUTE 1e-6 prefilter margin held
    // only for unit-scale embeddings — at sq-dists ≳1e6 the double-pass
    // rounding exceeds it and the true exact argmin can be silently
    // excluded from the exact re-check. The margin is now
    // minD·1e-9 + 1e-6; pin bit-identity to a driver all-exact replay
    // across magnitudes 1, 1e3, and 1e6 (sq-dists up to ~1e14).
    val base = corpusVecs
    for (scale <- Seq(1.0, 1e3, 1e6)) {
      val centers = (0L until 8L).map(i => base(i).map(_ * scale)).toArray
      (8L until 40L).foreach { i =>
        val v = base(i).map(_ * scale)
        val got = Similarity.exactArgminCell(v, centers)
        val want = (0 until centers.length).minBy(c =>
          (exactSq(v, centers(c)), c))
        assert(got === want, s"vector $i at scale $scale")
      }
    }
    // the adversarial case the absolute margin could break: two centers
    // whose diffs-to-v are PERMUTATIONS of each other — exact sq-dists
    // tie precisely (same multiset of terms), while the large-magnitude
    // double sums can differ by several ulps (≈2e-6 per term at 1e10)
    // in either direction. The exact tie must resolve to the LOWER
    // index no matter which center the double pass happens to favor.
    val big = Array.tabulate(dim)(d => 1e5 + d * 137.0 + 0.123 * d * d)
    val perturb = Array.tabulate(dim)(d => if (d % 2 == 0) 1.75 else -2.25)
    val cA = Array.tabulate(dim)(d => big(d) + perturb(d))
    val cB = Array.tabulate(dim)(d => big(d) + perturb(dim - 1 - d))
    assert(exactSq(big, cA) === exactSq(big, cB))
    assert(Similarity.exactArgminCell(big, Array(cA, cB)) === 0)
    assert(Similarity.exactArgminCell(big, Array(cB, cA)) === 0)
  }

  test("exactAdc throws LOUDLY on a null code slot instead of under-summing the candidate") {
    // ADVICE r19: the audit path's inner join silently dropped a null
    // slot's j term, UNDER-summing that candidate's ADC and wrongly
    // promoting it into the strict top-rerank; production paths
    // (PqAdcScore / IvfPqAdcScore) already throw. Pin the audit parity.
    val m = 4; val kCodes = 8; val nCells = 4
    val idx = Similarity.ivfPqIndex(corpus, "vec_id", "embedding",
      nCells = nCells, m = m, k = kCodes, dim = dim)
    val holed = idx.cells.withColumn("codes",
      when(col("neighbor_id") === 7L,
        array(col("codes")(0), lit(null).cast("int"),
          col("codes")(2), col("codes")(3)))
        .otherwise(col("codes")))
    val e = intercept[Exception] {
      Similarity.ivfPqTopKFromIndex(holed, idx.centroids, idx.codebook,
        corpus, queries, "vec_id", "embedding", k = 5, m = m, dim = dim,
        nProbe = nCells, rerank = 1000, exactAdc = true).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("ADC terms")),
      s"expected the exactAdc m-terms guard, got: ${msgs(e).mkString(" | ")}")
  }

  test("builderTable rethrows a missing warehouse table naming the builder query") {
    // ADVICE r19: a name-filtered run (or any consumer iterating the
    // unordered queries Map) naming only a read-only twin used to fail
    // with a generic TABLE_OR_VIEW_NOT_FOUND.
    val e = intercept[IllegalStateException] {
      graft.queries.Text.builderTable(spark,
        "graft_no_such_table_xyz", "q999_builder")
    }
    assert(e.getMessage.contains("q999_builder"))
    assert(e.getMessage.contains("graft_no_such_table_xyz"))
  }

  test("filtered ANN: full-coverage filtered top-k ≡ exact search over the pre-filtered corpus (IVF and IVFPQ)") {
    // VERDICT r19 item 5: the allowed-id restriction lands on the cells
    // scan BEFORE candidate generation, so at full coverage the result
    // must be bit-equal to exact search over the filtered corpus.
    val allowedPred = col("vec_id") % 3 === 0
    val allowed = corpus.filter(allowedPred).select(col("vec_id"))
    val exact = rows(Similarity.cosineTopK(corpus.filter(allowedPred),
      queries, "vec_id", "embedding", k = 5))
    val ivf = Similarity.ivfIndex(corpus, "vec_id", "embedding", nCells = 4)
    val gotIvf = rows(Similarity.ivfTopKFromIndex(ivf.cells, ivf.centroids,
      corpus, queries, "vec_id", "embedding", k = 5, nProbe = 4,
      allowed = Some(allowed)))
    assert(gotIvf === exact)
    val pq = Similarity.ivfPqIndex(corpus, "vec_id", "embedding",
      nCells = 4, m = 4, k = 8, dim = dim)
    val gotPq = rows(Similarity.ivfPqTopKFromIndex(pq.cells, pq.centroids,
      pq.codebook, corpus, queries, "vec_id", "embedding", k = 5, m = 4,
      dim = dim, nProbe = 4, rerank = 1000, allowed = Some(allowed)))
    assert(gotPq === exact)
    // LSH at bits = 0 (every row in every bucket) is also full coverage
    val lshIdx = Similarity.signLshIndex(corpus, "vec_id", "embedding",
      dim = dim, bits = 0, tables = 2)
    val gotLsh = rows(Similarity.signLshTopKFromIndex(lshIdx, corpus,
      queries, "vec_id", "embedding", k = 5, dim = dim, bits = 0,
      tables = 2, allowed = Some(allowed)))
    assert(gotLsh === exact)
  }

  test("filtered ANN: partial probes return ONLY allowed neighbors, and a multi-column allowed frame is rejected") {
    val allowed = corpus.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
    val okIds = allowed.collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfIndex(corpus, "vec_id", "embedding", nCells = 4)
    val got = Similarity.ivfTopKFromIndex(ivf.cells, ivf.centroids,
      corpus, queries, "vec_id", "embedding", k = 5, nProbe = 1,
      allowed = Some(allowed)).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(okIds.contains(r.getLong(2)),
      s"disallowed neighbor ${r.getLong(2)} survived the restriction"))
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopKFromIndex(ivf.cells, ivf.centroids, corpus,
        queries, "vec_id", "embedding", k = 5, nProbe = 1,
        allowed = Some(corpus.select("vec_id", "embedding")))
    }
    assert(e.getMessage.contains("one id column"))
  }

  test("pqTopKFromIndex over the built index equals the in-query pqTopK") {
    val m = 4; val kCodes = 8
    val idx = Similarity.pqIndex(corpus, "vec_id", "embedding",
      m = m, k = kCodes, dim = dim)
    def adcRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3))))
    val direct = adcRows(Similarity.pqTopK(corpus, queries,
      "vec_id", "embedding", m = m, k = kCodes, dim = dim, topK = 7,
      exactEncode = false))
    val fromIndex = adcRows(Similarity.pqTopKFromIndex(idx.codes,
      idx.codebook, queries, "vec_id", "embedding", m = m, dim = dim,
      topK = 7))
    assert(fromIndex === direct)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Similarity

/** IVFPQ (VERDICT r17 item 1) and the persisted PQ index (item 3):
  * the native ADC lookup table, the composed probe→ADC-prefilter→
  * exact-re-rank operator, and the from-index PQ query path.
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

  test("PqAdcScore (direct, the stream's form) ≡ summed PqAdcTable lookups, bit-for-bit") {
    // the batch path scores candidates via m lookups into the per-query
    // table (broadcast build side); the stream scores directly per
    // (qv, codes) pair — same inner (x−c)² loop, same j-order sum, so
    // the doubles must be IDENTICAL or the stream≡batch retention drifts
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

  test("exact-ADC audit variant: strict top-rerank by exact ADC, then exact cosine") {
    // Engine-twin reference: at FULL probe the exactAdc survivor rule —
    // strict top-rerank by (exact decimal ADC, id) over all candidates —
    // is exactly pqTopK's output contract at topK = rerank under the
    // same (md5-sampled, therefore identical) codebook; the final stage
    // is the exact cosine top-k among those survivors, i.e. cosineTopK
    // over the survivor-restricted corpus. (The production DOUBLE path
    // is deliberately a SUPERSET at the boundary: its margin retention
    // keeps whole ADC-tie groups — code-identical candidates tie
    // exactly — where the strict replayable rule cuts inside them by
    // id; full-coverage equality is the previous test's pin, and q209's
    // oracle replays this strict rule in SQL.)
    val rerank = 12
    val idx = Similarity.ivfPqIndex(corpus, "vec_id", "embedding",
      nCells = 4, m = 4, k = 8, dim = dim, exactEncode = true)
    val got = rows(Similarity.ivfPqTopKFromIndex(idx.cells, idx.centroids,
      idx.codebook, corpus, queries, "vec_id", "embedding",
      k = 5, m = 4, dim = dim, nProbe = 4, rerank = rerank, exactAdc = true))
    val survByQuery = Similarity.pqTopK(corpus, queries,
        "vec_id", "embedding", m = 4, k = 8, dim = dim, topK = rerank,
        exactEncode = true)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val want = survByQuery.toSeq.sortBy(_._1).flatMap { case (qid, surv) =>
      rows(Similarity.cosineTopK(
        corpus.filter(col("vec_id").isin(surv.toSeq: _*)),
        queries.filter(col("vec_id") === qid),
        "vec_id", "embedding", k = 5))
    }.toArray
    assert(got === want)
  }

  test("exactEncode index carries the pqEncode codes; fast index the fast codes") {
    val fast = Similarity.ivfPqIndex(corpus, "vec_id", "embedding",
      nCells = 4, m = 4, k = 8, dim = dim)
    val cb = fast.codebook
    val wantFast = Similarity.pqIndex(corpus, "vec_id", "embedding",
      m = 4, k = 8, dim = dim).codes.orderBy("neighbor_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1)))
    val gotFast = fast.cells.select("neighbor_id", "codes")
      .orderBy("neighbor_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(gotFast === wantFast)
    val exact = Similarity.ivfPqIndex(corpus, "vec_id", "embedding",
      nCells = 4, m = 4, k = 8, dim = dim, exactEncode = true)
    val wantExact = Similarity.pqEncode(corpus, "vec_id", "embedding",
        cb, m = 4, dim = dim)
      .groupBy(col("vec_id")).agg(transform(
        array_sort(collect_list(struct(col("j"), col("code")))),
        g => g.getField("code")).as("codes"))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1)))
    val gotExact = exact.cells.select("neighbor_id", "codes")
      .orderBy("neighbor_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(gotExact === wantExact)
    // and both index forms assign the SAME cells as the flat ivfIndex
    val flat = Similarity.ivfIndex(corpus, "vec_id", "embedding", nCells = 4)
      .cells.orderBy("neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val gotCells = fast.cells.select("neighbor_id", "cell")
      .orderBy("neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(gotCells === flat)
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

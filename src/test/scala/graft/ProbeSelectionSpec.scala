package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Similarity

/** The IVF probe rule's k-smallest selection (VERDICT r16 item 6): the
  * old form ranked ALL cells with `indices.sortBy(dist).take(nProbe)` —
  * a full O(nCells log nCells) boxed sort per query row. The
  * replacement is an insertion-buffer selection with an early-abandoned
  * distance loop; this spec pins its ONE contract: identical output to
  * the stable-sort reference, including the tie-to-lower-cell-index
  * rule, across probe widths and tie-dense centroid sets.
  */
class ProbeSelectionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def referenceProbe(centers: Array[Array[Double]], v: Array[Double],
                             nProbe: Int): Seq[Int] =
    centers.indices.sortBy { c =>
      val cen = centers(c)
      var s = 0.0; var i = 0
      while (i < v.length) { val d = v(i) - cen(i); s += d * d; i += 1 }
      s
    }.take(nProbe)

  test("selection ≡ stable sort across widths, including tie-dense cells") {
    val dim = 6
    // centroid set with deliberate exact duplicates (ties) and near-ties
    val centers: Array[Array[Double]] = Array(
      Array(1.0, 0, 0, 0, 0, 0),
      Array(0.0, 1, 0, 0, 0, 0),
      Array(1.0, 0, 0, 0, 0, 0),   // exact duplicate of cell 0
      Array(0.0, 0, 1, 0, 0, 0),
      Array(0.0, 1, 0, 0, 0, 0),   // exact duplicate of cell 1
      Array(2.0, 2, 2, 2, 2, 2),
      Array(-1.0, -1, 0, 0, 0, 0),
      Array(0.5, 0.5, 0, 0, 0, 0))
    val centroids = centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "cvec")
    val queries = (0 until 40).map { i =>
      (i.toLong, (0 until dim).map(j => (((i * 13 + j * 7) % 9) - 4) / 2.0))
    }.toDF("id", "v")
    for (nProbe <- Seq(1, 2, 3, 8, 12)) {
      val probe = Similarity.nearestCellsUdf(centroids, nProbe)
      val got = queries.select(col("id"), probe(col("v")).as("cells"))
        .orderBy("id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      queries.collect().foreach { r =>
        val id = r.getLong(0)
        val v = r.getSeq[Double](1).toArray
        assert(got(id) === referenceProbe(centers, v, nProbe),
          s"probe mismatch at id=$id nProbe=$nProbe")
      }
    }
  }

  test("degenerate distances (NaN/overflow) fall back to the sort — no duplicate cells") {
    // ADVICE r17: non-finite squared distances never pass `s < worst`,
    // so the insertion buffer under-fills and the unfilled slots used
    // to emit spurious duplicate cell-0 ids. The fallback must return
    // the stable-sort reference order: finite cells first, then +Inf,
    // then NaN, index order within each class — and never a duplicate.
    val big = Double.MaxValue
    val centers: Array[Array[Double]] = Array(
      Array(Double.NaN, 0.0),    // NaN distance to every query
      Array(0.0, 0.0),           // finite
      Array(big, big),           // overflows to +Inf vs a finite query
      Array(1.0, 1.0),           // finite
      Array(Double.NaN, 1.0))    // NaN
    val centroids = centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "cvec")
    val queries = Seq((0L, Seq(0.5, 0.5)), (1L, Seq(-2.0, 3.0))).toDF("id", "v")
    for (nProbe <- Seq(2, 3, 4, 5)) {
      val probe = Similarity.nearestCellsUdf(centroids, nProbe)
      val got = queries.select(col("id"), probe(col("v")).as("cells"))
        .orderBy("id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      queries.collect().foreach { r =>
        val id = r.getLong(0)
        val v = r.getSeq[Double](1).toArray
        val want = referenceProbe(centers, v, nProbe)
        assert(got(id) === want, s"fallback mismatch at id=$id nProbe=$nProbe")
        assert(got(id).distinct.size === got(id).size,
          s"duplicate cell ids at id=$id nProbe=$nProbe: ${got(id)}")
      }
    }
  }

  test("reordered/gapped centroid frames are still rejected") {
    val bad = Seq((1, Seq(1.0, 0.0)), (2, Seq(0.0, 1.0)))
      .toDF("cell", "cvec")
    val e = intercept[IllegalArgumentException] {
      Similarity.nearestCellsUdf(bad, 1)
    }
    assert(e.getMessage.contains("contiguous"))
  }
}

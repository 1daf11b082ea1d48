package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass per-group top-k of (score, id) pairs as a typed
  * [[Aggregator]] — the [[graft.sketch.KmvAgg]] shape pointed at
  * ranking instead of sketching: the buffer is the sorted array of the
  * best (score DESC, id ASC) pairs seen, `reduce` inserts, `merge`
  * merges two sorted buffers — associative and commutative, so Spark
  * runs it MAP-SIDE COMBINED: each partition ships a ~k-pair buffer
  * per group through the shuffle, however many rows it held.
  *
  * That is the property the window forms cannot give. The MARGIN
  * retention the ANN prefilter needs (`rank ≤ k OR score ≥ kth −
  * margin`) defeats Spark's InferWindowGroupLimit pushdown, so the
  * windowed form of that filter exchanges every input row — measured
  * at 12 GB for the 640M-row exact ANN stage (SCALE.md round-13
  * decade). A STRICT rank ≤ k window does get the map-side
  * WindowGroupLimit prune (its exchange stays k-sized), but it still
  * fully SORTS every input partition to rank it — measured 76.0 s vs
  * the combiner's 5.7 s at 100M rows (SCALE.md round-14 `topk`
  * decade): this aggregate keeps an O(k) insertion buffer per task
  * instead of an n·log n sort, and ships k rows per (group, map task)
  * through the shuffle in both cases.
  *
  * `margin` widens the retention rule to "rank ≤ k OR score ≥ (k-th
  * score − margin)" — the near-tie superset the exact-re-rank pattern
  * needs ([[graft.sim.Similarity]]'s double-prefilter contract: every
  * row whose EXACT score could still reach the top-k survives the
  * double stage). Eviction is monotone-safe: the k-th score only
  * improves as rows arrive, so anything dropped against an
  * intermediate cutoff is also below the final one — the finished
  * buffer is exactly { rank ≤ k } ∪ { score ≥ kth − margin }, the same
  * set the windowed filter kept. Degenerate all-tied groups keep every
  * tie (as the windowed form did); margin = 0 is plain top-k.
  *
  * Ordering matches Spark SQL's descending-double sort exactly:
  * `java.lang.Double.compare` places NaN above every value and equal
  * to itself, which is Spark's NaN semantics — so callers replaying a
  * `row_number over (order by score desc, id)` window get the
  * identical ranking, and the margin comparison against a NaN cutoff
  * keeps NaN-scored rows exactly as the SQL filter did. A deliberate
  * non-codegen aggregation (the repo's documented exception class —
  * it REPLACES a corpus-sized exchange; the JVM insert is O(k) per
  * row on small arrays).
  */
object TopKAgg {

  /** (score, id) ordering: score descending with Spark's NaN-largest
    * semantics, id ascending as the tie-break. True when a ranks
    * strictly before b.
    */
  private def before(sa: Double, na: Long, sb: Double, nb: Long): Boolean = {
    val c = java.lang.Double.compare(sb, sa)
    c < 0 || (c == 0 && na < nb)
  }

  final class Agg(k: Int, margin: Double)
      extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {
    require(k > 0, s"top-k needs k > 0, got $k")

    /** Drop trailing entries below (k-th score − margin); no-op while
      * the buffer holds ≤ k entries. Double.compare keeps NaN rows
      * against a NaN cutoff (Spark's `>=` on NaN).
      */
    private def trim(buf: Array[(Double, Long)]): Array[(Double, Long)] = {
      if (buf.length <= k) return buf
      val cutoff = buf(k - 1)._1 - margin
      var n = buf.length
      while (n > k && java.lang.Double.compare(buf(n - 1)._1, cutoff) < 0)
        n -= 1
      if (n == buf.length) buf else java.util.Arrays.copyOf(buf, n)
    }

    override def zero: Array[(Double, Long)] = Array.empty

    override def reduce(buf: Array[(Double, Long)],
                        x: (Double, Long)): Array[(Double, Long)] = {
      if (buf.length >= k) {
        // cheap reject against the current cutoff before any copying
        val cutoff = buf(k - 1)._1 - margin
        if (java.lang.Double.compare(x._1, cutoff) < 0) return buf
      }
      var ins = buf.length
      var i = 0
      while (i < buf.length) {
        if (before(x._1, x._2, buf(i)._1, buf(i)._2)) { ins = i; i = buf.length }
        else i += 1
      }
      val out = new Array[(Double, Long)](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = x
      System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
      trim(out)
    }

    override def merge(a: Array[(Double, Long)],
                       b: Array[(Double, Long)]): Array[(Double, Long)] = {
      val tmp = new Array[(Double, Long)](a.length + b.length)
      var i = 0; var j = 0; var n = 0
      while (i < a.length || j < b.length) {
        tmp(n) =
          if (j >= b.length) { val x = a(i); i += 1; x }
          else if (i >= a.length) { val x = b(j); j += 1; x }
          else if (before(a(i)._1, a(i)._2, b(j)._1, b(j)._2)) {
            val x = a(i); i += 1; x
          } else { val x = b(j); j += 1; x }
        n += 1
      }
      trim(tmp)
    }

    override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
  }

  /** Column form: array of the retained (score, id) structs (fields
    * `_1` = score, `_2` = id), sorted (score desc, id asc) — the k
    * best plus, with a nonzero `margin`, every near-tie within margin
    * of the k-th. Usable in any `groupBy(...).agg(...)`.
    */
  def topK(score: Column, id: Column, k: Int, margin: Double = 0.0): Column =
    udaf(new Agg(k, margin)).apply(score, id)
}

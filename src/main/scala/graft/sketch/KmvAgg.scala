package graft.sketch

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass KMV bottom-k as a typed [[Aggregator]]: the buffer is the
  * sorted array of the k smallest DISTINCT hashes seen, `reduce` inserts
  * (ignoring duplicates), `merge` takes the bottom-k of two buffers —
  * associative and commutative, so Spark runs it MAP-SIDE COMBINED: each
  * partition ships at most k longs per group through the shuffle, however
  * many rows it held. That beats the two-stage window top-k
  * ([[Sketch.kmvDistinct]]'s shape) whenever groups are large, and it is
  * the form Structured Streaming can maintain incrementally (update-mode
  * groupBy aggregation) — the batch and streaming sketches are the SAME
  * code, which StreamingSpec pins with a stream ≡ batch parity test.
  *
  * A deliberate non-codegen aggregation (the repo's documented exception
  * class: it REPLACES two window exchanges with one map-side-combined
  * shuffle; the JVM insert is O(log k + shift) per row on a primitive
  * array).
  */
object KmvAgg {

  final class Agg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // duplicate hash: set semantics
      else {
        val ins = -pos - 1
        if (buf.length >= k && ins >= k) buf // larger than the k-th: drop
        else {
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // merge two sorted distinct arrays, keep the k smallest distinct
      val tmp = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < tmp.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length) { val x = a(i); i += 1; x }
          else if (i >= a.length) { val x = b(j); j += 1; x }
          else if (a(i) < b(j)) { val x = a(i); i += 1; x }
          else if (a(i) > b(j)) { val x = b(j); j += 1; x }
          else { val x = a(i); i += 1; j += 1; x }
        if (n == 0 || tmp(n - 1) != v) { tmp(n) = v; n += 1 }
      }
      if (n == tmp.length) tmp else java.util.Arrays.copyOf(tmp, n)
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.longArray
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.longArray
  }

  /** Column form: `kmv(hashCol, k)` usable in any (batch or streaming)
    * `groupBy(...).agg(...)`.
    */
  def kmv(c: Column, k: Int): Column = udaf(new Agg(k)).apply(c)
}

private[sketch] object ExpressionEncoderHelper {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

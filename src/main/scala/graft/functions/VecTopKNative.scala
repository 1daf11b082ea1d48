package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Native [[TypedImperativeAggregate]] form of
  * [[graft.ops.VecTopKAgg]] — same retention contract (top-k by
  * (score desc, id asc) plus margin near-ties, duplicate-idempotent
  * insert, Double.compare NaN semantics, null scores dropped — the
  * `marginSurvivors` rule), with the typed-udaf's per-input-row
  * encoder work removed: the udaf deserializes EVERY candidate row's
  * vector into a boxed `Seq[Double]` before `reduce` can reject it
  * (~20 µs/row measured at the 1M serve decade — the serving
  * throughput floor), while this form reads the score/id as
  * primitives off the unsafe row and copies the vector via
  * `ArrayData.toDoubleArray` ONLY when the entry actually inserts —
  * the cutoff-rejected common case touches no array at all. The
  * VecTopKNativeSpec equates it to the udaf on tie-dense and
  * duplicate-heavy frames; the serving streams are its consumer.
  *
  * Output element struct keeps the udaf's `_1`/`_2`/`_3` field names
  * so downstream `getField` code is form-agnostic.
  */
case class VecTopKNative(
    score: Expression, id: Expression, vec: Expression,
    k: Int, margin: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecTopKNative.Buf] {
  require(k > 0, s"top-k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id, vec)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType, vec.dataType) match {
      case (DoubleType, LongType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vec_top_k expects (double, long, array<double>), got $other")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", DoubleType, nullable = false),
    StructField("_2", LongType, nullable = false),
    StructField("_3", ArrayType(DoubleType, containsNull = false)))))
  override def prettyName: String = "vec_top_k"

  override def createAggregationBuffer(): VecTopKNative.Buf =
    new VecTopKNative.Buf(k, margin)

  override def update(b: VecTopKNative.Buf, input: InternalRow): VecTopKNative.Buf = {
    val s = score.eval(input)
    if (s == null) return b // null dcos is not a similarity (marginSurvivors)
    val sv = s.asInstanceOf[Double]
    if (b.cutoffRejects(sv)) return b // common case: no id/vec eval needed
    val i = id.eval(input)
    if (i == null) return b
    val v = vec.eval(input)
    if (v == null) return b
    b.insert(sv, i.asInstanceOf[Long],
      v.asInstanceOf[ArrayData].toDoubleArray())
    b
  }

  override def merge(a: VecTopKNative.Buf, b: VecTopKNative.Buf): VecTopKNative.Buf = {
    var j = 0
    while (j < b.size) { a.insert(b.scores(j), b.ids(j), b.vecs(j)); j += 1 }
    a
  }

  override def eval(b: VecTopKNative.Buf): Any = {
    val out = new Array[Any](b.size)
    var j = 0
    while (j < b.size) {
      val row = new GenericInternalRow(3)
      row.update(0, b.scores(j))
      row.update(1, b.ids(j))
      row.update(2, new GenericArrayData(b.vecs(j)))
      out(j) = row
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: VecTopKNative.Buf): Array[Byte] = {
    var bytes = 4
    var j = 0
    while (j < b.size) { bytes += 8 + 8 + 4 + b.vecs(j).length * 8; j += 1 }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(b.size)
    j = 0
    while (j < b.size) {
      bb.putDouble(b.scores(j)); bb.putLong(b.ids(j))
      val v = b.vecs(j)
      bb.putInt(v.length)
      var d = 0
      while (d < v.length) { bb.putDouble(v(d)); d += 1 }
      j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecTopKNative.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new VecTopKNative.Buf(k, margin)
    b.ensure(n)
    var j = 0
    while (j < n) {
      b.scores(j) = bb.getDouble; b.ids(j) = bb.getLong
      val dim = bb.getInt
      val v = new Array[Double](dim)
      var d = 0
      while (d < dim) { v(d) = bb.getDouble; d += 1 }
      b.vecs(j) = v
      j += 1
    }
    b.size = n
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecTopKNative =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecTopKNative =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecTopKNative =
    copy(score = newChildren(0), id = newChildren(1), vec = newChildren(2))
}

object VecTopKNative {

  /** Sorted (score desc, id asc) parallel-array buffer with the
    * TopKAgg margin-trim and duplicate-idempotent insert.
    */
  final class Buf(k: Int, margin: Double) {
    var size = 0
    var scores = new Array[Double](k + 8)
    var ids = new Array[Long](k + 8)
    var vecs = new Array[Array[Double]](k + 8)

    def ensure(n: Int): Unit = if (n > scores.length) {
      scores = java.util.Arrays.copyOf(scores, n)
      ids = java.util.Arrays.copyOf(ids, n)
      vecs = java.util.Arrays.copyOf(vecs, n)
    }

    /** True when the buffer already holds k entries and `s` is below
      * the (k-th − margin) cutoff — the no-allocation fast reject.
      */
    def cutoffRejects(s: Double): Boolean =
      size >= k && java.lang.Double.compare(s, scores(k - 1) - margin) < 0

    private def before(sa: Double, na: Long, sb: Double, nb: Long): Boolean = {
      val c = java.lang.Double.compare(sb, sa)
      c < 0 || (c == 0 && na < nb)
    }

    def insert(s: Double, i: Long, v: Array[Double]): Unit = {
      if (cutoffRejects(s)) return
      var ins = size
      var j = 0
      while (j < size) {
        if (ids(j) == i && java.lang.Double.compare(scores(j), s) == 0)
          return // duplicate-idempotent (bit-identical re-presentation)
        if (before(s, i, scores(j), ids(j))) { ins = j; j = size }
        else j += 1
      }
      ensure(size + 1)
      var m = size
      while (m > ins) {
        scores(m) = scores(m - 1); ids(m) = ids(m - 1); vecs(m) = vecs(m - 1)
        m -= 1
      }
      scores(ins) = s; ids(ins) = i; vecs(ins) = v
      size += 1
      trim()
    }

    private def trim(): Unit = {
      if (size <= k) return
      val cutoff = scores(k - 1) - margin
      while (size > k &&
             java.lang.Double.compare(scores(size - 1), cutoff) < 0) {
        vecs(size - 1) = null
        size -= 1
      }
    }
  }
}

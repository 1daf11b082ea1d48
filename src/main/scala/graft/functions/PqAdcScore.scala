package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Direct ADC score of one (query vector, packed codes) pair —
  * Σ_j ‖sub_j − centroid(j, codes[j])‖² — as ONE native codegen'd
  * expression, arithmetic BIT-IDENTICAL to looking the m entries up in
  * a [[PqAdcTable]] and summing them in j order (same inner
  * (x−c)² left-to-right loop, same j-ascending accumulation;
  * IvfPqSpec pins the equality).
  *
  * Exists for the SERVING stream's join geometry: the batch IVFPQ path
  * broadcasts its bounded query frame, so the per-query lookup TABLE
  * lives once in the hash build side and costs m lookups per
  * candidate — the textbook amortization. A STREAM side cannot
  * broadcast: its rows ride a stream-static sort-merge join, where
  * every joined output row COPIES the stream row's fields — a
  * m×k-double table column (16 KB at m=8, k=256) copied per candidate
  * row measured 70 s micro-batches at a 50 k corpus (92 GB of row
  * copies in one backlog batch). This form keeps the candidate row at
  * (ids + m codes + the query vector already needed downstream) and
  * pays m·dsub MACs per candidate instead of m lookups — FLOP-wise a
  * plain dot product, which the serving profile is scan-bound against
  * anyway.
  *
  * `codes` must carry exactly m in-range entries (the packed-index
  * contract); out-of-range codes throw loudly rather than mis-score.
  * Ragged/null QUERY elements drop their (x−c)² term — the
  * [[ExactSqDist]] convention the PQ family shares.
  */
case class PqAdcScore(left: Expression, right: Expression,
                      centroids: IndexedSeq[IndexedSeq[Double]],
                      m: Int, k: Int, dsub: Int)
  extends BinaryExpression {

  require(centroids.length == m * k,
    s"need m*k = ${m * k} centroids, got ${centroids.length}")
  require(centroids.forall(_.length == dsub),
    s"every centroid must have dsub = $dsub components")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects (array<float|double>, array<int>), got $other")
    }

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * k * dsub)
    var i = 0
    while (i < m * k) {
      val c = centroids(i)
      var d = 0
      while (d < dsub) { a(i * dsub + d) = c(d); d += 1 }
      i += 1
    }
    a
  }

  def compute(v: ArrayData, codes: ArrayData): Double = {
    require(codes.numElements() == m,
      s"packed codes must carry exactly m = $m entries, got ${codes.numElements()}")
    val fl = isFloat
    val n = v.numElements()
    var total = 0.0
    var j = 0
    while (j < m) {
      // a null code slot would read as 0 through getInt and silently
      // mis-score against centroid 0 — the built paths never emit null
      // codes, but this expression accepts arbitrary columns (and a
      // parquet round-trip marks elements nullable), so keep the
      // 'throw loudly rather than mis-score' contract (ADVICE r18)
      require(!codes.isNullAt(j),
        s"null code at subspace $j — corrupt packed index")
      val c = codes.getInt(j)
      require(c >= 0 && c < k,
        s"code $c at subspace $j outside [0, $k) — corrupt packed index")
      val base = (j * k + c) * dsub
      var s = 0.0
      var d = 0
      while (d < dsub) {
        val idx = j * dsub + d
        if (idx < n && !v.isNullAt(idx)) {
          val x = if (fl) v.getFloat(idx).toDouble else v.getDouble(idx)
          val diff = x - flat(base + d)
          s += diff * diff
        }
        d += 1
      }
      total += s
      j += 1
    }
    total
  }

  override def nullSafeEval(v: Any, codes: Any): Any =
    compute(v.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcScore", this,
      classOf[PqAdcScore].getName)
    nullSafeCodeGen(ctx, ev, (v, c) => s"${ev.value} = $ref.compute($v, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc_score"
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Residual-ADC score of one (query vector, packed codes, coarse cell)
  * triple — Σ_j ‖(q − centroid(cell))_sub_j − cen(j, codes[j])‖² — as
  * ONE native codegen'd expression: [[PqAdcScore]]'s IVFADC form, where
  * the scored quantity is the distance of the QUERY RESIDUAL
  * q − coarseCentroid(cell) to the candidate's residual codes (Jégou
  * et al. 2011 §V — codes describe residuals, so the query must be
  * re-based into the candidate's cell before the lookup distance means
  * anything).
  *
  * Arithmetic is BIT-IDENTICAL to materializing the residual with
  * `zip_with(q, cvec, (x, c) => x − c)` and scoring it with
  * [[PqAdcScore]] (same IEEE subtraction, same inner left-to-right
  * (r−cen)² loop, same j-ascending accumulation; IvfPqSpec pins the
  * equality) — this form exists because the serving stream evaluates it
  * once per probe-join CANDIDATE row, where a per-row dim-double
  * residual allocation is pure young-gen churn and a lookup-table
  * column riding the stream side is the measured 92 GB row-copy trap
  * ([[PqAdcScore]]'s scaladoc). Here the candidate row still carries
  * only (ids + m codes + the cell int + the query vector already
  * needed downstream).
  *
  * `cell` must index a real coarse centroid and `codes` must carry
  * exactly m in-range non-null entries (the packed-index contract);
  * violations throw loudly rather than mis-score. Ragged/null QUERY
  * elements drop their whole ((q−cc)−cen)² term — the `zip_with`
  * residual + [[ExactSqDist]] convention the IVFPQ family shares.
  */
case class IvfPqAdcScore(first: Expression, second: Expression,
                         third: Expression,
                         coarse: IndexedSeq[IndexedSeq[Double]],
                         cents: IndexedSeq[IndexedSeq[Double]],
                         m: Int, k: Int, dsub: Int)
  extends TernaryExpression {

  private val dim = m * dsub
  require(coarse.nonEmpty, "need at least one coarse centroid")
  require(coarse.forall(_.length == dim),
    s"every coarse centroid must have dim = $dim components")
  require(cents.length == m * k,
    s"need m*k = ${m * k} residual centroids, got ${cents.length}")
  require(cents.forall(_.length == dsub),
    s"every residual centroid must have dsub = $dsub components")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ivfpq_adc_score expects (array<float|double>, array<int>, int), got $other")
    }

  private def isFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def nCells: Int = coarse.length

  @transient private lazy val coarseFlat: Array[Double] = {
    val a = new Array[Double](nCells * dim)
    var c = 0
    while (c < nCells) {
      val cen = coarse(c)
      var d = 0
      while (d < dim) { a(c * dim + d) = cen(d); d += 1 }
      c += 1
    }
    a
  }

  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * k * dsub)
    var i = 0
    while (i < m * k) {
      val cen = cents(i)
      var d = 0
      while (d < dsub) { a(i * dsub + d) = cen(d); d += 1 }
      i += 1
    }
    a
  }

  def compute(v: ArrayData, codes: ArrayData, cell: Int): Double = {
    require(cell >= 0 && cell < nCells,
      s"cell $cell outside [0, $nCells) — corrupt cells table")
    require(codes.numElements() == m,
      s"packed codes must carry exactly m = $m entries, got ${codes.numElements()}")
    val fl = isFloat
    val n = v.numElements()
    val ccBase = cell * dim
    var total = 0.0
    var j = 0
    while (j < m) {
      // null/out-of-range codes throw loudly rather than mis-score —
      // the PqAdcScore contract verbatim
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
          val diff = (x - coarseFlat(ccBase + idx)) - flat(base + d)
          s += diff * diff
        }
        d += 1
      }
      total += s
      j += 1
    }
    total
  }

  override def nullSafeEval(v: Any, codes: Any, cell: Any): Any =
    compute(v.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfPqAdcScore", this,
      classOf[IvfPqAdcScore].getName)
    nullSafeCodeGen(ctx, ev, (v, c, cl) => s"${ev.value} = $ref.compute($v, $c, $cl);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): IvfPqAdcScore =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "ivfpq_adc_score"
}

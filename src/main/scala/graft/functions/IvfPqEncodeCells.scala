package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StructField, StructType}

/** The fused IVFPQ indexing projection (Jégou, Douze, Schmid 2011 §V —
  * IVFADC): ONE native expression emitting `struct(cell, codes)` per
  * corpus vector, where `cell` is the coarse-quantizer argmin and
  * `codes` are the PQ codes of the RESIDUAL x − centroid(cell) — the
  * defining step of the IVFADC scheme. Round 18 encoded the raw vector
  * here, wasting code entropy re-describing the cell offset the coarse
  * quantizer already knows; the measured cost was a 0.33 recall@10
  * floor at m8/rerank64 vs flat IVF's 0.77 at the same nProbe
  * (SCALE.md round-18 recall table, VERDICT r18 item 1).
  *
  * Fusing matters because the residual ties the two halves together: a
  * two-projection composition (assign, then re-derive the residual from
  * the assigned cell) either re-runs the nCells-way argmin per
  * reference or materializes a dim-double residual array per row; this
  * form computes the argmin once and encodes residual components on
  * the fly — the indexing pass stays one allocation-free scan, the
  * [[PqEncodeCodes]] design carried over.
  *
  * Rule parity, both halves spec-pinned (IvfPqSpec):
  *  - the CELL argmin is bit-identical to [[PqEncodeCodes]] at m = 1
  *    over the coarse centroids (dist = ‖c‖²_present − 2⟨x,c⟩, strict
  *    `<`, ties and all-NaN to the LOWEST cell, ragged rows drop the
  *    skipped components' c_d² from the norm term) — so IVFPQ cells
  *    stay bit-equal to the flat [[graft.sim.Similarity.ivfIndex]]
  *    assignment and the append contract's frozen-quantizer rule;
  *  - the CODES argmin scores each code as the direct left-to-right
  *    Σ_d ((x−cc)_d − cen_d)² (strict `<`, ties low, missing x_d drops
  *    its whole term — the `zip_with` residual + [[ExactSqDist]]
  *    convention), agreeing with the exact-decimal residual encoder
  *    wherever the true gap exceeds double rounding, exactly
  *    [[PqEncodeCodes]]'s relationship to the exact PQ encoder.
  *
  * `coarse` is indexed cell → dim components, `cents` (j·k + c) → dsub
  * components; both are bounded driver state shipped via a codegen
  * reference object (the quantizer/codebook contracts).
  */
case class IvfPqEncodeCells(child: Expression,
                            coarse: IndexedSeq[IndexedSeq[Double]],
                            cents: IndexedSeq[IndexedSeq[Double]],
                            m: Int, k: Int, dsub: Int)
  extends UnaryExpression {

  private val dim = m * dsub
  require(coarse.nonEmpty, "need at least one coarse centroid")
  require(coarse.forall(_.length == dim),
    s"every coarse centroid must have dim = $dim components")
  require(cents.length == m * k,
    s"need m*k = ${m * k} residual centroids, got ${cents.length}")
  require(cents.forall(_.length == dsub),
    s"every residual centroid must have dsub = $dsub components")

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ivfpq_encode expects array<float|double>, got ${t.simpleString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def nCells: Int = coarse.length

  /** coarse centroids flattened cell-major: index cell·dim + d. */
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

  /** per-coarse-centroid full squared norm (the PqEncodeCodes m=1 rule's
    * constant term).
    */
  @transient private lazy val coarseN2: Array[Double] = {
    val a = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      var s = 0.0; var d = 0
      while (d < dim) { val x = coarseFlat(c * dim + d); s += x * x; d += 1 }
      a(c) = s; c += 1
    }
    a
  }

  /** residual centroids flattened (j·k + c)-major: index (j·k+c)·dsub + d. */
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

  @transient private lazy val neverNull: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => !containsNull
    case _ => false
  }

  def compute(v: ArrayData): InternalRow = {
    val n = v.numElements()
    val dense = n == dim && (neverNull || {
      var i = 0; var ok = true
      while (ok && i < n) { if (v.isNullAt(i)) ok = false; i += 1 }
      ok
    })
    if (dense) computeDense(v) else computeRagged(v)
  }

  private def computeDense(v: ArrayData): InternalRow = {
    val fl = isFloat
    // coarse assign — PqEncodeCodes' m=1 dense rule verbatim
    var bestCell = 0
    var best = Double.PositiveInfinity
    var c = 0
    while (c < nCells) {
      var s = 0.0
      var d = 0
      while (d < dim) {
        val x = if (fl) v.getFloat(d).toDouble else v.getDouble(d)
        s += x * coarseFlat(c * dim + d)
        d += 1
      }
      val dist = coarseN2(c) - 2.0 * s
      if (dist < best) { best = dist; bestCell = c }
      c += 1
    }
    // residual encode — direct left-to-right Σ((x−cc)−cen)² per code
    val ccBase = bestCell * dim
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var bestD = Double.PositiveInfinity
      var bestC = 0
      val off = j * dsub
      var cc = 0
      while (cc < k) {
        val base = (j * k + cc) * dsub
        var s = 0.0
        var d = 0
        while (d < dsub) {
          val idx = off + d
          val x = if (fl) v.getFloat(idx).toDouble else v.getDouble(idx)
          val diff = (x - coarseFlat(ccBase + idx)) - flat(base + d)
          s += diff * diff
          d += 1
        }
        if (s < bestD) { bestD = s; bestC = cc }
        cc += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericInternalRow(Array[Any](bestCell, new GenericArrayData(out)))
  }

  private def computeRagged(v: ArrayData): InternalRow = {
    val fl = isFloat
    val n = v.numElements()
    // coarse assign with the PqEncodeCodes ragged correction: a missing
    // element drops its whole (x−c)² term, so the skipped component's
    // c_d² leaves the norm term too
    var bestCell = 0
    var best = Double.PositiveInfinity
    var c = 0
    while (c < nCells) {
      var s = 0.0
      var miss = 0.0
      var d = 0
      while (d < dim) {
        if (d < n && !v.isNullAt(d)) {
          val x = if (fl) v.getFloat(d).toDouble else v.getDouble(d)
          s += x * coarseFlat(c * dim + d)
        } else {
          val cd = coarseFlat(c * dim + d)
          miss += cd * cd
        }
        d += 1
      }
      val dist = coarseN2(c) - miss - 2.0 * s
      if (dist < best) { best = dist; bestCell = c }
      c += 1
    }
    val ccBase = bestCell * dim
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var bestD = Double.PositiveInfinity
      var bestC = 0
      var cc = 0
      while (cc < k) {
        val base = (j * k + cc) * dsub
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
        if (s < bestD) { bestD = s; bestC = cc }
        cc += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericInternalRow(Array[Any](bestCell, new GenericArrayData(out)))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfPqEncode", this,
      classOf[IvfPqEncodeCells].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfPqEncodeCells =
    copy(child = newChild)

  override def prettyName: String = "ivfpq_encode"
}

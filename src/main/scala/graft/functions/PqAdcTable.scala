package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** The per-query ADC lookup table as ONE native codegen'd expression:
  * for a query vector split into m subvectors, the m×k squared L2
  * distances to every per-subspace codebook centroid, emitted j-major
  * (index j·k + c) as an array<double> — the flat table a packed-codes
  * ADC scan indexes with `qt[j·k + codes[j]]` (Jégou, Douze, Schmid
  * 2011 §IV: asymmetric distance computation).
  *
  * Exists so the SERVING streams can build the table as a stateless
  * per-row projection: the batch [[graft.sim.Similarity.pqTopK]] builds
  * its table by exploding query subvectors and joining the broadcast
  * codebook — a groupBy re-assembly that would be a second stateful
  * operator inside a stream. Batch IVFPQ uses this same expression, so
  * the two paths cannot drift (IvfPqSpec equates the entries against
  * the declarative exact-decimal form within double rounding).
  *
  * Arithmetic is the plain left-to-right IEEE sum of (x−c)² per
  * subspace — the production (double) scoring path. The oracle-
  * replayable audit variant keeps the exact-DECIMAL exploded-join form
  * (the q120 pattern); |double − exact| is ≤ ~1e-13 at embedding
  * scale, absorbed by the prefilter's retention margin.
  *
  * Null/ragged elements drop their whole (x−c)² term — the
  * [[ExactSqDist.compute]] convention the PQ family shares (see
  * [[PqEncodeCodes]]'s rationale). Dense rows (every production
  * embedding) take a branch-free inner loop.
  *
  * `centroids` is indexed (j·k + c) → dsub components; driver state
  * shipped via a codegen reference object (bounded by the codebook
  * contract: k rows collected on the driver).
  */
case class PqAdcTable(child: Expression,
                      centroids: IndexedSeq[IndexedSeq[Double]],
                      m: Int, k: Int, dsub: Int)
  extends UnaryExpression {

  require(centroids.length == m * k,
    s"need m*k = ${m * k} centroids, got ${centroids.length}")
  require(centroids.forall(_.length == dsub),
    s"every centroid must have dsub = $dsub components")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_table expects array<float|double>, got ${t.simpleString}")
  }

  private def isFloat: Boolean = child.dataType match {
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

  @transient private lazy val neverNull: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => !containsNull
    case _ => false
  }

  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val dense = n == m * dsub && (neverNull || {
      var i = 0; var ok = true
      while (ok && i < n) { if (v.isNullAt(i)) ok = false; i += 1 }
      ok
    })
    if (dense) computeDense(v) else computeRagged(v)
  }

  private def computeDense(v: ArrayData): ArrayData = {
    val fl = isFloat
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      val off = j * dsub
      var c = 0
      while (c < k) {
        val cell = j * k + c
        val base = cell * dsub
        var s = 0.0
        var d = 0
        while (d < dsub) {
          val x = if (fl) v.getFloat(off + d).toDouble else v.getDouble(off + d)
          val diff = x - flat(base + d)
          s += diff * diff
          d += 1
        }
        out(cell) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  private def computeRagged(v: ArrayData): ArrayData = {
    val fl = isFloat
    val n = v.numElements()
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        val cell = j * k + c
        val base = cell * dsub
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
        out(cell) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcTable", this,
      classOf[PqAdcTable].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTable =
    copy(child = newChild)

  override def prettyName: String = "pq_adc_table"
}

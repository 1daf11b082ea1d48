package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** PQ production encode as ONE native codegen'd expression: the m
  * per-subspace argmins over k centroids, emitted as an array<int> of
  * codes per vector — the packed-index row [[graft.sim.Similarity.pqTopK]]
  * scans.
  *
  * Exists for the same reason as [[DoubleDotProduct]]: the declarative
  * form (m × array_min over k struct(dist, code) entries, each dist a
  * dot against a centroid literal) allocates m·k structs and 2·m·k
  * array cells PER ROW — measured ~12.5 µs/row at m=8, k=16, dim=64,
  * which dominated the 10M-vector PQ decade (the encode is the indexing
  * pass). This expression is three primitive loops over a flat
  * centroid array — no allocation until the final m-int output.
  *
  * Semantics are exactly the declarative form's (PqSpec equates both
  * against the exact-decimal [[graft.sim.Similarity.pqEncode]]):
  * dist(j, c) = ‖cen‖²_present − 2·⟨sub_j, cen⟩ (the per-row constant
  * ‖sub‖²_present dropped — it cannot change an argmin), the dot
  * accumulating left-to-right IEEE like [[DoubleDotProduct]], ties and
  * all-NaN groups resolving to the LOWEST code (the struct-min
  * ordering: strict `<` never replaces an equal-or-NaN candidate).
  *
  * Null/missing (ragged) elements drop their ENTIRE (x−c)² term, the
  * [[ExactSqDist.compute]] convention the exact encoder follows: the
  * centroid-norm term is ‖cen‖² restricted to the row's PRESENT
  * positions (the precomputed full norm minus the skipped components'
  * c_d² — that residual varies across centroids, so only dropping the
  * dot term would silently diverge from [[graft.sim.Similarity.pqEncode]]
  * on ragged rows; ADVICE r14). The present set is per (row, subspace),
  * constant across the k centroids compared, so dropping ‖sub‖²_present
  * stays argmin-safe. Dense rows never take the correction branch.
  *
  * `centroids` is indexed (j·k + c) → dsub components; it is driver
  * state shipped via a codegen reference object (bounded by the
  * codebook contract: k rows collected on the driver).
  */
case class PqEncodeCodes(child: Expression,
                         centroids: IndexedSeq[IndexedSeq[Double]],
                         m: Int, k: Int, dsub: Int)
  extends UnaryExpression {

  require(centroids.length == m * k,
    s"need m*k = ${m * k} centroids, got ${centroids.length}")
  require(centroids.forall(_.length == dsub),
    s"every centroid must have dsub = $dsub components")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${t.simpleString}")
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

  @transient private lazy val cn2: Array[Double] = {
    val a = new Array[Double](m * k)
    var i = 0
    while (i < m * k) {
      val c = centroids(i)
      var s = 0.0; var d = 0
      while (d < dsub) { s += c(d) * c(d); d += 1 }
      a(i) = s; i += 1
    }
    a
  }

  @transient private lazy val neverNull: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => !containsNull
    case _ => false
  }

  /** Dense rows — the overwhelmingly common case (every production
    * embedding column is fixed-width, non-null elements) — take an
    * inner loop with no per-element bounds/null branch: one row-level
    * check (length == m·dsub, plus a single null scan unless the
    * schema already says containsNull = false) buys back the k× per-
    * element checks the ragged-correctness branch costs. Semantics are
    * unchanged: with every element present, miss ≡ 0 and the ragged
    * loop reduces to exactly this one (PqSpec equates both against the
    * exact encoder; the ragged spec covers the other branch).
    */
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
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      val off = j * dsub
      var c = 0
      while (c < k) {
        val cell = j * k + c
        val base = cell * dsub
        var s = 0.0
        var d = 0
        while (d < dsub) {
          val x = if (fl) v.getFloat(off + d).toDouble else v.getDouble(off + d)
          s += x * flat(base + d)
          d += 1
        }
        val dist = cn2(cell) - 2.0 * s
        if (dist < best) { best = dist; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  private def computeRagged(v: ArrayData): ArrayData = {
    val fl = isFloat
    val n = v.numElements()
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < k) {
        val cell = j * k + c
        val base = cell * dsub
        var s = 0.0
        var miss = 0.0
        var d = 0
        while (d < dsub) {
          val idx = j * dsub + d
          // ragged/null elements drop their whole (x−c)² term — the
          // ExactSqDist convention — so the skipped centroid component's
          // c_d² must leave the norm term too (see class scaladoc)
          if (idx < n && !v.isNullAt(idx)) {
            val x = if (fl) v.getFloat(idx).toDouble else v.getDouble(idx)
            s += x * flat(base + d)
          } else {
            val cd = flat(base + d)
            miss += cd * cd
          }
          d += 1
        }
        val dist = cn2(cell) - miss - 2.0 * s
        if (dist < best) { best = dist; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this,
      classOf[PqEncodeCodes].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

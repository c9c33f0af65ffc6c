package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Product-quantization encoder as ONE native expression: the full
  * `m`-subspace codeword assignment (argmin ‖c‖² − 2·v_sub·c per
  * subspace) in a single monomorphic kernel returning `array<int>`.
  *
  * The composed form — `array(NearestCell(slice(v, ...)), ...)` × m —
  * is semantically identical but materializes m slice arrays per row and
  * carries m case-class expressions whose DEEP structural equality
  * (256×sub matrices each) Catalyst re-evaluates throughout
  * optimization; measured ~2 s of driver-side plan work per query at
  * m=16. One expression, one reference matrix, no per-row slice
  * allocation.
  */
case class PqEncodeExpr(child: Expression,
                        cbs: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends UnaryExpression {
  // IndexedSeq, not Array: case-class equality must be structural, or
  // CSE/canonicalization silently breaks (same rule as NearestCell)
  require(cbs.nonEmpty && cbs.head.nonEmpty, "need at least one codebook")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires array<float|double> input, got ${other.simpleString}")
    }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // [m][k][sub] primitive matrices + per-codeword squared norms
  @transient private lazy val cMat: Array[Array[Array[Double]]] =
    cbs.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val cNorm2: Array[Array[Double]] =
    cMat.map(_.map(c => c.map(x => x * x).sum))
  @transient private lazy val sub = cMat(0)(0).length

  /** One pass over the vector: for each subspace, argmin over its
    * codewords; first index wins ties. Called from interpreted AND
    * generated code. */
  def encode(v: ArrayData): ArrayData = {
    val m = cMat.length
    val n = v.numElements()
    // a ragged vector silently zero-extended/truncated would produce
    // garbage codes biased toward near-zero codewords — recall loss with
    // no diagnostic. Fail loudly per row instead (one comparison).
    if (n != m * sub)
      throw new IllegalArgumentException(
        s"pq_encode: vector has $n elements, codebooks expect ${m * sub} " +
          s"($m subspaces x $sub dims)")
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val base = mi * sub
      val cws = cMat(mi)
      var best = 0
      var bestScore = Double.MaxValue
      var cw = 0
      while (cw < cws.length) {
        val c = cws(cw)
        var dot = 0.0
        var i = 0
        while (i < sub) {
          // null elements fail as loudly as a length mismatch: treating
          // them as 0.0 would bias codes toward near-zero codewords with
          // no diagnostic (exact rerank masks it only while the shortlist
          // still happens to cover the true top-k)
          if (v.isNullAt(base + i))
            throw new IllegalArgumentException(
              s"pq_encode: null element at index ${base + i} — scrub or " +
                "impute null-contaminated embeddings upstream")
          dot += (if (isFloat) v.getFloat(base + i) else v.getDouble(base + i)) * c(i)
          i += 1
        }
        val score = cNorm2(mi)(cw) - 2.0 * dot
        if (score < bestScore) { bestScore = score; best = cw }
        cw += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

object PqEncodeExpr {
  def apply(vec: Column, cbs: Array[Array[Array[Double]]]): Column =
    shim.column(PqEncodeExpr(shim.expression(vec),
      cbs.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq))
}

/** ADC lookup-sum as ONE native expression: Σ_m LUT[m][code_m] over a
  * PQ code column — the whole approximate-dot computation is `m` array
  * indexings against one reference matrix. (The composed
  * `element_at(typedLit(...)) + ...` form carries m 2^codeBits-element
  * array LITERALS whose deep equality/hashing Catalyst re-walks through
  * every optimizer pass — the same plan-work cliff PqEncodeExpr closes
  * on the encode side.) */
case class PqAdcExpr(child: Expression, luts: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {
  require(luts.nonEmpty, "need at least one lookup table")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc requires array<int> codes, got ${other.simpleString}")
    }

  @transient private lazy val lMat: Array[Array[Double]] =
    luts.map(_.toArray).toArray

  def adc(codes: ArrayData): Double = {
    val m = lMat.length
    // silent truncation on an m mismatch (codes from a different PQ
    // config) would return a wrong score with no diagnostic; an
    // out-of-range code would surface as a bare AIOOBE deep in a task.
    // Name the misconfiguration instead.
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_adc: ${codes.numElements()} codes for $m lookup tables — " +
          "codes and LUTs come from different PQ configurations")
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val c = codes.getInt(mi)
      if (c < 0 || c >= lMat(mi).length)
        throw new IllegalArgumentException(
          s"pq_adc: code $c out of range for a ${lMat(mi).length}-entry " +
            "lookup table — codes were encoded with a different codeBits")
      s += lMat(mi)(c)
      mi += 1
    }
    s
  }

  override def nullSafeEval(input: Any): Any =
    adc(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.adc($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcExpr =
    copy(child = newChild)
}

object PqAdcExpr {
  def apply(codes: Column, luts: Array[Array[Double]]): Column =
    shim.column(PqAdcExpr(shim.expression(codes),
      luts.map(_.toIndexedSeq).toIndexedSeq))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Nearest-centroid assignment (IVF coarse quantizer) as one native
  * expression: returns the index of the centroid minimizing
  * ‖c‖² − 2·v·c (the ‖v‖² term is constant across cells); first index
  * wins ties.
  *
  * The composed-builtins form — `array_min(array(struct(score, cell)...))`
  * over per-cell [[VectorDot]]s — is correct but compares
  * `struct<double,int>` elements through an interpreted `BaseOrdering`
  * per element. That is exactly the round-1 perf cliff: any interpreted
  * eval hot loop in the long-lived suite JVM goes megamorphic and
  * deopt-storms every other query sharing the call sites (measured here:
  * suite 44s → 246s with collateral 10-30× inflation on unrelated
  * queries). One monomorphic kernel via `addReferenceObj`, no per-row
  * allocation, keeps the whole scan in whole-stage codegen.
  */
case class NearestCell(child: Expression, cents: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {
  // IndexedSeq, not Array: case-class equality over arrays is by REFERENCE,
  // which silently defeats plan canonicalization / CSE / exchange reuse for
  // two semantically identical NearestCell expressions. The kernel runs on
  // a converted primitive matrix (cMat) — no per-row boxing.
  require(cents.nonEmpty, "need at least one centroid")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cell requires array<float|double> input, got ${other.simpleString}")
    }

  // lazy: child.dataType is unresolvable at construction time
  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val cMat: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  @transient private lazy val cNorm2: Array[Double] =
    cMat.map(c => c.map(x => x * x).sum)

  /** The one-pass kernel; called from both interpreted and generated code. */
  def nearest(v: ArrayData): Int = {
    val n = v.numElements()
    var best = 0
    var bestScore = Double.MaxValue
    var cell = 0
    while (cell < cMat.length) {
      val c = cMat(cell)
      val d = math.min(n, c.length)
      var dot = 0.0
      var i = 0
      if (isFloat) {
        while (i < d) { if (!v.isNullAt(i)) dot += v.getFloat(i) * c(i); i += 1 }
      } else {
        while (i < d) { if (!v.isNullAt(i)) dot += v.getDouble(i) * c(i); i += 1 }
      }
      val score = cNorm2(cell) - 2.0 * dot
      if (score < bestScore) { bestScore = score; best = cell }
      cell += 1
    }
    best
  }

  override def nullSafeEval(input: Any): Any =
    nearest(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCell", this, classOf[NearestCell].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.nearest($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {
  def apply(vec: Column, cents: Array[Array[Double]]): Column =
    shim.column(NearestCell(shim.expression(vec),
      cents.map(_.toIndexedSeq).toIndexedSeq))
}

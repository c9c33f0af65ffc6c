package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Scalar (int8) quantization encoder as ONE native expression: the whole
  * per-dimension affine quantization `code_i = clamp(round((v_i − min_i) /
  * scale_i), 0, 255)` in a single monomorphic kernel returning BINARY —
  * one byte per dimension, a TRUE 4× compression of an fp32 column (the
  * FAISS `SQ8` scheme; PQ compresses harder but loses more, SQ8 is the
  * cheap-and-nearly-exact first rung of the quantization ladder).
  *
  * The per-dimension mins/scales ride as expression REFERENCE data, never
  * as literals or case-class tree fields — the same Catalyst plan-work
  * rule as [[PqEncodeExpr]] (big constants in the tree are deep-compared
  * on every optimizer pass).
  */
case class Sq8EncodeExpr(child: Expression,
                         mins: IndexedSeq[Double],
                         scales: IndexedSeq[Double])
    extends UnaryExpression {
  // IndexedSeq, not Array: case-class equality must be structural, or
  // CSE/canonicalization silently breaks (same rule as PqEncodeExpr)
  require(mins.nonEmpty && mins.length == scales.length,
    "mins/scales must be non-empty and the same length")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_encode requires array<float|double> input, got ${other.simpleString}")
    }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val minArr = mins.toArray
  @transient private lazy val scaleArr = scales.toArray

  /** Called from interpreted AND generated code. */
  def encode(v: ArrayData): Array[Byte] = {
    val d = minArr.length
    // a ragged vector silently truncated/extended would produce garbage
    // codes with no diagnostic — fail loudly per row (one comparison)
    if (v.numElements() != d)
      throw new IllegalArgumentException(
        s"sq8_encode: vector has ${v.numElements()} elements, params expect $d")
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      // null elements fail as loudly as a length mismatch (the PqEncode
      // contract): nulls-as-zero would bias codes with no diagnostic
      if (v.isNullAt(i))
        throw new IllegalArgumentException(
          s"sq8_encode: null element at index $i — scrub or impute " +
            "null-contaminated embeddings upstream")
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val q = Math.round((x - minArr(i)) / scaleArr(i))
      // out-of-range values saturate at the trained range ends (standard
      // SQ behavior for sample-trained min/max)
      out(i) = (if (q < 0L) 0 else if (q > 255L) 255 else q.toInt).toByte
      i += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8Encode", this, classOf[Sq8EncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8EncodeExpr =
    copy(child = newChild)
}

object Sq8EncodeExpr {
  def apply(vec: Column, mins: Array[Double], scales: Array[Double]): Column =
    shim.column(Sq8EncodeExpr(shim.expression(vec),
      mins.toIndexedSeq, scales.toIndexedSeq))
}

/** Approximate query dot over SQ8 codes as ONE native expression.
  * `dot(dequant(v), q) = Σ (min_i + code_i·scale_i)·q_i` folds to
  * `bias + Σ code_i·w_i` with `w_i = scale_i·q_i` and
  * `bias = Σ min_i·q_i` — both precomputed once per query and carried as
  * reference data, so the scan does one multiply-add per BYTE and never
  * touches an fp32 vector. */
case class Sq8DotExpr(child: Expression,
                      weights: IndexedSeq[Double],
                      bias: Double)
    extends UnaryExpression {
  require(weights.nonEmpty, "need at least one weight")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_dot requires binary codes, got ${other.simpleString}")
    }

  @transient private lazy val wArr = weights.toArray

  def dot(code: Array[Byte]): Double = {
    val d = wArr.length
    // codes from a different SQ configuration would silently score wrong;
    // name the misconfiguration instead (the PqAdc contract)
    if (code.length != d)
      throw new IllegalArgumentException(
        s"sq8_dot: ${code.length}-byte code for $d weights — codes and " +
          "query weights come from different SQ configurations")
    var s = bias
    var i = 0
    while (i < d) {
      s += (code(i) & 0xff) * wArr(i)
      i += 1
    }
    s
  }

  override def nullSafeEval(input: Any): Any =
    dot(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8Dot", this, classOf[Sq8DotExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.dot($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8DotExpr =
    copy(child = newChild)
}

object Sq8DotExpr {
  def apply(code: Column, weights: Array[Double], bias: Double): Column =
    shim.column(Sq8DotExpr(shim.expression(code), weights.toIndexedSeq, bias))
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sign-bit packing of 32 vector dimensions into one long — the
  * quantization kernel behind the binary ANN rung ([[graft.operators.Bq]]).
  *
  * The composed-builtins form (a 32-term `CASE WHEN v[d] > 0 THEN 2^d`
  * sum) is semantically identical but generates 32 chained conditionals
  * and element accessors per word; this is one tight loop, inlined into
  * whole-stage codegen via [[doGenCode]] — the [[VectorDot]] discipline
  * applied to quantization. Bit d−lo is set iff element d is non-null
  * and strictly positive (a NULL dimension has no sign; it packs as 0,
  * exactly like the CASE form whose `> 0` is null-false).
  *
  * Accepts array<float|double>; dims past the array's end pack as 0, so
  * the expression is total (mirrors the oracle's `embedding[d] > 0` on
  * a short list being NULL → false).
  */
case class SignPack(child: Expression, lo: Int) extends UnaryExpression {
  require(lo >= 0, s"lo must be >= 0, got $lo")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_pack requires array<float|double>, got ${other.simpleString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val f = isFloat
    var w = 0L
    var d = lo
    while (d < lo + 32 && d < n) {
      if (!xs.isNullAt(d)) {
        val x = if (f) xs.getFloat(d).toDouble else xs.getDouble(d)
        if (x > 0) w |= (1L << (d - lo))
      }
      d += 1
    }
    w
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val d = ctx.freshName("d")
      val hi = ctx.freshName("hi")
      val w = ctx.freshName("w")
      s"""
         |int $hi = java.lang.Math.min($lo + 32, $a.numElements());
         |long $w = 0L;
         |for (int $d = $lo; $d < $hi; $d++) {
         |  if (!$a.isNullAt($d) && ((double) $a.$get($d)) > 0) {
         |    $w |= (1L << ($d - $lo));
         |  }
         |}
         |${ev.value} = $w;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SignPack =
    copy(child = c)
}

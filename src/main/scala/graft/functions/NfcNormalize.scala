package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a native
  * expression — the first text-cleaning step for any multilingual corpus:
  * byte-different but canonically-equal strings (`e`+COMBINING ACUTE vs
  * precomposed `é`) must fingerprint, dedup and tokenize identically, so
  * normalization has to happen BEFORE every md5/shingle kernel.
  *
  * Delegates to `java.text.Normalizer` (the JDK's ICU-derived
  * implementation of the same algorithm DuckDB's `nfc_normalize` runs —
  * the oracle recomputes this entry engine-natively, no algebra tricks
  * needed). Canonical composition only: compatibility forms (ﬁ → fi)
  * are NFKC's business and deliberately NOT applied. The common case is
  * cheap: `Normalizer.isNormalized` is a scan-only fast path, so
  * already-NFC ASCII corpora pay no allocation.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize requires string, got ${other.simpleString}")
    }

  /** The kernel; called from interpreted and generated code. */
  def normalize(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalizeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.normalize($c);")
  }

  override protected def withNewChildInternal(c: Expression): NfcNormalizeExpr =
    copy(child = c)
}

object NfcNormalize {
  def apply(text: Column): Column =
    shim.column(NfcNormalizeExpr(shim.expression(text)))
}

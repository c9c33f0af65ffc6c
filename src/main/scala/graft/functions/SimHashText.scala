package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row 64-bit SimHash of a text column — the scalar form of
  * [[SimHashAgg]] for contexts where the grouped aggregate cannot run
  * (per-record streaming dedup state keys, one-pass signature columns).
  *
  * Produces bit-identical signatures to the batch pipeline
  * `split(normalized(text), " ")` → explode → [[SimHashAgg]]: the same
  * normalization contract as [[WordShingles]] (lower(trim(text)), `\s+`
  * runs collapsed, boundary empties kept, so the token multiset matches
  * Spark's `split` with limit -1), the same per-token XXH64 seed (42) and
  * the same sign-sum fold. Parity is asserted by SimHashParitySpec.
  *
  * Scale: per-row, shuffle-free, inlined into whole-stage codegen via a
  * reference object — one linear pass per document.
  */
case class SimHashText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** The one-pass kernel; called from both interpreted and generated code. */
  def simhash(u: UTF8String): Long = {
    val s = u.trim().toLowerCase.toString
    val counts = new Array[Int](64)
    def addToken(tok: String): Unit = {
      val b = UTF8String.fromString(tok)
      val h = XXH64.hashUnsafeBytes(b.getBaseObject, b.getBaseOffset, b.numBytes(), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
    }
    // tokenize exactly like split(regexp_replace(s, "\s+", " "), " ") with
    // limit -1: ws-runs delimit, boundary runs yield empty tokens
    var i = 0
    val len = s.length
    var tokStart = 0
    var inWs = false
    while (i < len) {
      if (isWs(s.charAt(i))) {
        if (!inWs) { addToken(s.substring(tokStart, i)); inWs = true }
      } else if (inWs) { tokStart = i; inWs = false }
      i += 1
    }
    addToken(if (inWs) "" else s.substring(tokStart, len))
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    simhash(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhasher", this, classOf[SimHashText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.simhash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashText =
    copy(child = newChild)
}

object SimHashText {
  def apply(text: Column): Column = shim.column(SimHashText(shim.expression(text)))
}

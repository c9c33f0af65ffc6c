package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fraction of all word n-grams taken by the single most frequent one —
  * the Gopher/C4-style repetition signal ("top 2-gram fraction"): documents
  * dominated by one repeated phrase are boilerplate/spam, and a training-
  * data pipeline filters on this before dedup.
  *
  * One linear pass per document (tokenize → rolling n-gram → open-address
  * count map → max/total), inlined into whole-stage codegen via a
  * reference object. The composed built-ins form (explode n-grams →
  * groupBy(doc, gram) → groupBy(doc)) computes the same number with TWO
  * shuffles of corpus-sized gram rows — this is a per-row expression
  * instead, shuffle-free at any scale.
  *
  * Tokenization contract shared with [[WordShingles]] and the DuckDB
  * oracles: lower(trim(text)), tokens split on whitespace runs keeping
  * boundary empties; fewer than n tokens → ONE gram joining all tokens
  * (frac = 1.0). Duplicate grams are counted (no distinct).
  */
case class TopGramFrac(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram length must be >= 1, got $n")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** The one-pass kernel; called from both interpreted and generated code. */
  def topFrac(u: UTF8String): Double = {
    val s = u.trim().toLowerCase.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    var tokStart = 0
    var inWs = false
    while (i < len) {
      if (isWs(s.charAt(i))) {
        if (!inWs) { toks.add(s.substring(tokStart, i)); inWs = true }
      } else if (inWs) { tokStart = i; inWs = false }
      i += 1
    }
    toks.add(if (inWs) "" else s.substring(tokStart, len))
    val t = toks.size()
    if (t < n) return 1.0 // one gram joining all tokens
    val counts = new java.util.HashMap[String, Int]()
    var maxCount = 0
    var total = 0
    var start = 0
    while (start <= t - n) {
      val sb = new java.lang.StringBuilder()
      var j = start
      while (j < start + n) { if (j > start) sb.append(' '); sb.append(toks.get(j)); j += 1 }
      val c = counts.merge(sb.toString, 1, Integer.sum)
      if (c > maxCount) maxCount = c
      total += 1
      start += 1
    }
    maxCount.toDouble / total
  }

  override def nullSafeEval(input: Any): Any =
    topFrac(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topGram", this, classOf[TopGramFrac].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.topFrac($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TopGramFrac =
    copy(child = newChild)
}

object TopGramFrac {
  def apply(text: Column, n: Int): Column =
    shim.column(TopGramFrac(shim.expression(text), n))
}

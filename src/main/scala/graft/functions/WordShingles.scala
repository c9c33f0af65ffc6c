package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of the normalized text, one pass.
  *
  * Semantically identical to the composed built-ins
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(regexp_replace(lower(trim(text)), "\s+", " "), " "), i+1,
  * n))))` — but that form evaluates the lambda INTERPRETED (higher-order
  * functions have no codegen), re-running the whole trim/lower/regex/split
  * subtree once per shingle position: O(tokens²) regex work per document,
  * with megamorphic `Expression.eval` call sites that degrade further as
  * more queries run in the JVM (the round-1 "suite-position degradation").
  * Here: normalize, tokenize and emit distinct shingles in one linear scan,
  * inlined into whole-stage codegen via a reference object.
  *
  * Exact normalization contract (shared with the DuckDB oracles):
  * lower(trim(text)) with runs of `\s` collapsed to one space; tokens =
  * split on single space keeping leading/trailing empties (Spark split
  * limit -1); fewer than n tokens → one shingle joining all tokens.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle length must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** The one-pass kernel; called from both interpreted and generated code. */
  def shingle(u: UTF8String): GenericArrayData = {
    // trim (ASCII space only, like Spark's trim) + lower (UTF8String kernel)
    val s = u.trim().toLowerCase.toString
    // tokenize on \s+ runs, keeping boundary empties exactly like
    // split(regexp_replace(s, "\s+", " "), " ") with split limit -1:
    // a leading ws-run yields one leading "", a trailing run one trailing "".
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
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (t < n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < t) { if (j > 0) sb.append(' '); sb.append(toks.get(j)); j += 1 }
      out.add(UTF8String.fromString(sb.toString))
    } else {
      var start = 0
      while (start <= t - n) {
        val sb = new java.lang.StringBuilder()
        var j = start
        while (j < start + n) { if (j > start) sb.append(' '); sb.append(toks.get(j)); j += 1 }
        out.add(UTF8String.fromString(sb.toString))
        start += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    shingle(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.shingle($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(text: Column, n: Int): Column = shim.column(WordShingles(shim.expression(text), n))
}

/** ALL word n-grams of the normalized text, IN TOKEN ORDER (no dedup, no
  * short-text fallback): element i is the gram starting at token i, so
  * `posexplode` yields (start-token-index, gram) directly — the positional
  * form the duplicated-span detector needs ([[graft.operators.Dedup
  * .duplicatedSpans]]). Texts with fewer than n tokens yield an EMPTY
  * array: a span detector has no use for partial grams (contrast
  * [[WordShingles]], whose set semantics want every doc represented).
  * Same one-pass normalize/tokenize kernel and the same tokenization
  * contract as [[WordShingles]] (`string_split(norm, ' ')` in the DuckDB
  * oracles), inlined into whole-stage codegen via a reference object. */
case class WordGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram length must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** The one-pass kernel; called from both interpreted and generated code. */
  def grams(u: UTF8String): GenericArrayData = {
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
    if (t < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](t - n + 1)
    var start = 0
    while (start <= t - n) {
      val sb = new java.lang.StringBuilder()
      var j = start
      while (j < start + n) { if (j > start) sb.append(' '); sb.append(toks.get(j)); j += 1 }
      out(start) = UTF8String.fromString(sb.toString)
      start += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    grams(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramer", this, classOf[WordGrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.grams($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGrams {
  def apply(text: Column, n: Int): Column = shim.column(WordGrams(shim.expression(text), n))
}

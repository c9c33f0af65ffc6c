package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Stopword-hit counting and language-ID as native expressions.
  *
  * Semantics are EXACTLY `regexp_count(lower(text), "\b(w1|w2|…)\b")`
  * as JAVA regex executes it (Spark's engine; the DuckDB oracles keep
  * the regex formulation): scan left to right; at each position try the
  * alternatives in list order; a word matches when present literally
  * with non-word neighbors; matches are non-overlapping (resume after
  * the match). Java's `\b` word class is NOT its ASCII `\w`: verified
  * against java.util.regex, a boundary uses `'_' ||
  * Character.isLetterOrDigit(codepoint)` (so 'ü' and '中' are word
  * chars — "üthe" has NO boundary before 't'), the documented
  * \b-vs-\w inconsistency of java.util.regex.Pattern.
  *
  * Why native: the regex bank runs 4 `regexp_count`s per row (langId),
  * each walking the full text through the regex machinery with per-row
  * match allocation — measured ~1.2 s for 5 k sf0.1 docs, the dominant
  * cost of every langId-bearing query. This kernel is one allocation
  * (the lowered string) and a first-char dispatch table per list;
  * alternative order is preserved inside each bucket so leftmost-FIRST
  * alternation semantics hold. */
object StopwordKernel {
  @inline private def isWord(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  /** words bucketed by first char (order preserved within a bucket). */
  def dispatch(words: Seq[String]): Array[Array[String]] = {
    val byFirst = Array.fill(128)(List.empty[String])
    words.foreach { w =>
      require(w.nonEmpty && w.head < 128, s"stopword must start ASCII: $w")
      byFirst(w.head) = w :: byFirst(w.head)
    }
    byFirst.map(_.reverse.toArray)
  }

  def countHits(s: String, byFirst: Array[Array[String]]): Int = {
    val n = s.length
    var i = 0
    var cnt = 0
    while (i < n) {
      val c = s.charAt(i)
      var matchedLen = 0
      if (c < 128 && (i == 0 || !isWord(s.codePointBefore(i)))) {
        val cands = byFirst(c)
        var k = 0
        while (matchedLen == 0 && k < cands.length) {
          val w = cands(k)
          if (s.startsWith(w, i) &&
            (i + w.length == n || !isWord(s.codePointAt(i + w.length))))
            matchedLen = w.length
          k += 1
        }
      }
      if (matchedLen > 0) { cnt += 1; i += matchedLen } else i += 1
    }
    cnt
  }
}

/** `regexp_count(lower(text), "\b(w1|…)\b")` as one native kernel pass. */
case class StopwordHits(child: Expression, words: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  @transient private lazy val byFirst = StopwordKernel.dispatch(words)

  def count(u: UTF8String): Int =
    StopwordKernel.countHits(
      u.toString.toLowerCase(java.util.Locale.ROOT), byFirst)

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopHits", this, classOf[StopwordHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

object StopwordHits {
  def apply(text: Column, words: Seq[String]): Column =
    shim.column(StopwordHits(shim.expression(text), words))
}

/** Language-ID: per-language stopword hits in ONE lowered pass each,
  * argmax with first-listed-wins ties, "und" when all zero — the same
  * CASE chain the oracle mirrors, minus the 4× regex machinery. */
case class LangIdExpr(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  @transient private lazy val names: Array[UTF8String] =
    langs.map(l => UTF8String.fromString(l._1)).toArray
  @transient private lazy val tables: Array[Array[Array[String]]] =
    langs.map(l => StopwordKernel.dispatch(l._2)).toArray
  @transient private lazy val und = UTF8String.fromString("und")

  def classify(u: UTF8String): UTF8String = {
    val s = u.toString.toLowerCase(java.util.Locale.ROOT)
    var best = -1
    var bestScore = 0
    var i = 0
    while (i < tables.length) {
      val score = StopwordKernel.countHits(s, tables(i))
      if (score > bestScore) { bestScore = score; best = i } // first wins ties
      i += 1
    }
    if (best < 0) und else names(best)
  }

  override def nullSafeEval(input: Any): Any =
    classify(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langId", this, classOf[LangIdExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.classify($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {
  def apply(text: Column, langs: Seq[(String, Seq[String])]): Column =
    shim.column(LangIdExpr(shim.expression(text), langs))
}

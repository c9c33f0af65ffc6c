package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed rolling-hash document fingerprints (the MOSS scheme:
  * Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
  * Fingerprinting", SIGMOD 2003).
  *
  * Pipeline, one linear pass per document:
  *   1. normalize: lower(trim(text)), `\s+` runs collapsed to one space —
  *      the same contract as [[WordShingles]]/TextAnalysis.normalized;
  *   2. Rabin-Karp rolling hash over char `k`-grams (base 257, natural
  *      64-bit overflow) — O(1) per position;
  *   3. winnow with window `w`: keep the minimum hash of each window of
  *      `w` consecutive k-gram hashes (rightmost on ties — the robust
  *      variant), emitting each selection once.
  *
  * Output: sorted distinct array<long>, ~2/(w+1) of the k-gram count —
  * a positionally-compressed shingle sketch. Guarantee: any shared
  * substring of length ≥ k+w−1 contributes ≥1 common fingerprint, so a
  * fingerprint-overlap join finds near-dups like a shingle join at a
  * fraction of the row volume (the scale win at corpus size).
  *
  * Native expression (addReferenceObj + monomorphic kernel, codegen'd):
  * a composed-builtins formulation would be an interpreted hot loop —
  * the measured suite-collapse pattern (see PERF.md).
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2, s"k-gram length must be >= 2, got $k")
  require(w >= 1, s"winnow window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** The one-pass kernel; called from both interpreted and generated code. */
  def winnow(u: UTF8String): GenericArrayData = {
    // normalize: lower(trim), collapse \s+ runs to single spaces
    val raw = u.trim().toLowerCase.toString
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    var inWs = false
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (isWs(c)) { if (!inWs) { sb.append(' '); inWs = true } }
      else { sb.append(c); inWs = false }
      i += 1
    }
    val s = sb.toString
    val n = s.length
    val B = 257L
    if (n < k) {
      // short doc: one hash of the whole normalized text
      var h = 0L
      var j = 0
      while (j < n) { h = h * B + s.charAt(j); j += 1 }
      return new GenericArrayData(Array(h))
    }
    val m = n - k + 1 // number of k-grams
    val hs = new Array[Long](m)
    var h = 0L
    var bk = 1L // B^(k-1)
    var j = 0
    while (j < k) { h = h * B + s.charAt(j); if (j > 0) bk *= B; j += 1 }
    hs(0) = h
    j = 1
    while (j < m) {
      h = (h - s.charAt(j - 1) * bk) * B + s.charAt(j + k - 1)
      hs(j) = h
      j += 1
    }
    // Sliding-window min via a monotonic deque of positions (strictly
    // increasing hashes front→back): O(m) total, primitive arrays only.
    // Popping back on `>=` keeps the RIGHTMOST position among equal
    // hashes — the robust-winnowing tie rule. A new value is recorded
    // only when the window's min position changes; the value-set is
    // identical to emitting every window's min and set-deduping.
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0
    val sel = new Array[Long](m)
    var nSel = 0
    var lastSelPos = -1
    j = 0
    while (j < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(j)) tail -= 1
      deque(tail) = j
      tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1 || j == m - 1) { // full window, or one short-doc window (m < w)
        val minPos = deque(head)
        if (minPos != lastSelPos) {
          sel(nSel) = hs(minPos)
          nSel += 1
          lastSelPos = minPos
        }
      }
      j += 1
    }
    java.util.Arrays.sort(sel, 0, nSel)
    // in-place unique over the sorted prefix
    var uniq = 0
    j = 0
    while (j < nSel) {
      if (j == 0 || sel(j) != sel(j - 1)) { sel(uniq) = sel(j); uniq += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sel, uniq))
  }

  override def nullSafeEval(input: Any): Any =
    winnow(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnower", this, classOf[WinnowFingerprint].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.winnow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {
  /** Column-API wrapper; defaults k=20 chars, w=16 windows — the measured
    * sweet spot on real corpora (word-3-gram selectivity, ~12% sketch
    * density; see Dedup.winnowNearDups). Callers wanting the raw MOSS-ish
    * small-gram sketch pass k/w explicitly. */
  def apply(text: Column, k: Int = 20, w: Int = 16): Column =
    shim.column(WinnowFingerprint(shim.expression(text), k, w))
}

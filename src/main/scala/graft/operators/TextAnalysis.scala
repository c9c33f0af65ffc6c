package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, over a `text`
  * column. Everything is built from codegen'd Catalyst built-ins
  * (regexp/split/md5) — per-row, shuffle-free, safe at any scale. The
  * formulas are deliberately SQL-expressible so each has a DuckDB oracle.
  */
object TextAnalysis {

  /** Whitespace token count (the "wc -w" definition). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: alphanumeric runs plus single non-space
    * symbols, like a byte-pair pre-tokenizer's first pass. The pattern is
    * lookaround-free so the DuckDB (RE2) oracle computes it identically. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Normalized text: lowercase, collapsed whitespace — the canonical form
    * used for fingerprints and exact dedup. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Stable 128-bit document fingerprint (md5 of normalized text). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  private val punctPattern = "[.,;:!?'\"()\\[\\]{}<>-]"

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, punctPattern, "")))
          .cast("double") / length(text))

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Tiny by design: the heuristic's job is a deterministic,
    * cheap signal, not NLP fidelity. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "for", "on", "with"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "para", "en"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "für", "mit", "von")
  )

  /** `regexp_count(lower(text), "\b(w|…)\b")`, as the native one-pass
    * [[graft.functions.StopwordHits]] kernel — identical count semantics
    * (the DuckDB oracles keep the regex formulation), ~5× cheaper than
    * the regex machinery per list (NativeParitySpec fuzzes the parity). */
  private def stopwordHits(text: Column, words: Seq[String]): Column =
    graft.functions.StopwordHits(text, words)

  /** Language-ID: argmax of per-language stopword hits; ties and all-zero
    * scores resolve to first-listed language order / "und". Deterministic
    * and SQL-expressible (the oracle mirrors the same CASE chain); native
    * [[graft.functions.LangIdExpr]] — the 4-regex bank was the dominant
    * cost of every langId-bearing query. */
  def langId(text: Column): Column =
    graft.functions.LangIdExpr(text, stopwords)

  /** Heuristic quality score in [0,1]:
    * 0.25·len_ok + 0.25·word_len_ok + 0.3·stopword_signal + 0.2·punct_ok.
    * Mirrors the usual C4/Gopher-style length/punct/stopword filters.
    *
    * Computed in integer basis points (floor of the one fractional term,
    * then /10000.0) instead of `round()`: double `round()` half-way
    * behavior differs between engines on values like 0.86875, while
    * floor over exact small-integer doubles is deterministic everywhere —
    * keeping the DuckDB oracle bit-identical.
    */
  def qualityScore(text: Column): Column = {
    val chars = length(text).cast("double")
    val words = tokenCount(text).cast("double")
    val avgWordLen = when(words === 0, lit(0.0)).otherwise(chars / words)
    val lenOk = when(chars >= 50 && chars <= 10000, lit(2500)).otherwise(lit(0))
    val wordLenOk = when(avgWordLen >= 3 && avgWordLen <= 12, lit(2500)).otherwise(lit(0))
    val stopBp = least(
      floor(stopwordHits(text, stopwords.head._2).cast("double") * 15000.0 /
        greatest(words, lit(1.0))),
      lit(3000L))
    val punctOk = when(punctRatio(text) <= 0.2, lit(2000)).otherwise(lit(0))
    (lenOk + wordLenOk + stopBp + punctOk).cast("double") / 10000.0
  }

  /** Top word-n-gram fraction (Gopher/C4 repetition signal): the share of
    * all n-grams taken by the most frequent one. One-pass native kernel
    * ([[graft.functions.TopGramFrac]]) — the composed explode/groupBy form
    * would shuffle corpus-sized gram rows twice for a per-doc number. */
  def topGramFrac(text: Column, n: Int): Column =
    graft.functions.TopGramFrac(text, n)

  /** Email pattern for PII scrubbing. Lookaround-free so the DuckDB (RE2)
    * oracle matches identically. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-like pattern: leading optional +, 7+ chars of digits/separators,
    * ending in a digit. Greedy char-class quantifier — same result under
    * java.util.regex and RE2 (no backtracking-order divergence). */
  val phonePattern = "\\+?[0-9][0-9() -]{5,}[0-9]"

  /** PII scrub: redact emails then phone-like numbers. Per-row codegen'd
    * regexp_replace — shuffle-free at any scale. Emails first: a phone
    * match can not span a redacted `<EMAIL>` token, but digits inside an
    * un-redacted email local part could otherwise be eaten as a "phone". */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, lit(emailPattern), lit("<EMAIL>")),
      lit(phonePattern), lit("<PHONE>"))

  /** Counts of redacted entities (for scrub audit metrics). */
  def emailCount(text: Column): Column = regexp_count(text, lit(emailPattern))
  def phoneCount(text: Column): Column =
    regexp_count(regexp_replace(text, lit(emailPattern), lit("<EMAIL>")),
      lit(phonePattern))

  /** Full per-document profile, one pass. */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).as("n_chars"),
      tokenCount(t).as("n_tokens"),
      subwordCount(t).as("n_subwords"),
      fingerprint(t).as("fingerprint"),
      langId(t).as("lang_pred"),
      qualityScore(t).as("quality"),
      topGramFrac(t, 2).as("top_bigram_frac"))
  }
}

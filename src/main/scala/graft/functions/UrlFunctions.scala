package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + domain extraction — the provenance axis a
  * web-scale training corpus curates on (C4/RefinedWeb-style: the same
  * page is crawled under scheme/case/port/tracking-param/fragment
  * variants, and per-domain caps need a stable domain key; the r08
  * verdict flagged this axis as the one missing curation gate).
  *
  * Both functions are COMPOSITIONS of Spark's codegen'd string/regexp
  * built-ins, not UDFs and not a custom expression: every step stays
  * inside whole-stage codegen, and the identical regexp algebra runs in
  * DuckDB (with the `'g'` flag where Spark's regexp_replace is global by
  * default), which is what makes the url entries oracle-checkable
  * end-to-end. Map-only — no shuffle; a canonicalize-then-dedup plan
  * shuffles once on the canonical string like any exact dedup.
  *
  * Canonicalization rules (the conservative, reversibility-preserving
  * subset every published pipeline agrees on):
  *
  *   1. scheme and host lowercased (RFC 3986 §6.2.2.1; paths stay
  *      case-sensitive and are NOT touched);
  *   2. leading `www.` stripped from the host;
  *   3. default ports dropped (`:443` for https, `:80` for http);
  *      non-default ports survive;
  *   4. fragment dropped (never sent to the server);
  *   5. tracking query parameters removed — `utm_*`, `fbclid`, `gclid`
  *      by default — and the `?` dropped when nothing survives; other
  *      parameters and their order are preserved (re-sorting parameters
  *      can change semantics; not done). The default set is
  *      deliberately limited to UNAMBIGUOUS tracking keys: `ref` looks
  *      like one but is content-bearing on real crawls (`?ref=<branch>`
  *      on code hosts selects a different page), so dropping it would
  *      make canonical-URL dedup silently delete unique content —
  *      callers with a known-safe corpus can widen the set via the
  *      `trackKeys` parameter;
  *   6. one trailing slash stripped from a non-root path; an empty path
  *      becomes `/`.
  */
object UrlFunctions {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.\\-]*)://"
  /** Tracking-param KEY patterns dropped by rule 5 (each is a regex
    * fragment matching the key, never containing `=` or `&`) — keep in
    * sync with the oracle SQL in queries/Pipeline.scala (urlCanonCtes).
    * Unambiguous tracking keys only; `ref` is deliberately absent (see
    * rule 5 above). */
  val DefaultTrackKeys: Seq[String] = Seq("utm_[^=&]*", "fbclid", "gclid")

  /** The `key=value` stripper for a key-pattern set. The `=` is
    * REQUIRED: without it, a key pattern would eat the prefix of a
    * longer real key (`utm` vs `utmost=x`), and the lookahead that
    * could guard a bare-key form does not exist in RE2 (the DuckDB
    * oracle's engine) — so the rule targets key=value tracking params
    * only, identically in both engines. */
  private def trackRe(keys: Seq[String]): String =
    s"(^|&)(${keys.mkString("|")})=[^&]*"

  /** The canonical form of `u` under rules 1-6 above. Inputs without a
    * `scheme://` prefix come back with empty scheme/host (garbage-in
    * surfaces loudly as `://...` rather than silently passing through —
    * filter non-URLs upstream). */
  def canonicalizeUrl(u: Column): Column =
    canonicalizeUrl(u, DefaultTrackKeys)

  def canonicalizeUrl(u: Column, trackKeys: Seq[String]): Column = {
    val scheme = lower(regexp_extract(u, SchemeRe, 1))
    val afterScheme = regexp_replace(u, SchemeRe, "")
    val hostport = lower(regexp_extract(afterScheme, "^([^/?#]*)", 1))
    val port = regexp_extract(hostport, ":(\\d+)$", 1)
    val host = regexp_replace(
      regexp_replace(hostport, ":\\d+$", ""), "^www\\.", "")
    val keepPort = when(
      port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"),
      lit("")).otherwise(concat(lit(":"), port))
    val rest = regexp_replace(afterScheme, "^[^/?#]*", "")
    val noFrag = regexp_replace(rest, "#.*$", "")
    val path0 = regexp_extract(noFrag, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/"))
      .otherwise(regexp_replace(path0, "(.)/$", "$1"))
    val query0 = regexp_extract(noFrag, "\\?(.*)$", 1)
    val query1 =
      regexp_replace(regexp_replace(query0, trackRe(trackKeys), ""), "^&+", "")
    val query = when(query1 === "", lit(""))
      .otherwise(concat(lit("?"), query1))
    concat(scheme, lit("://"), host, keepPort, path, query)
  }

  /** The registrable-domain key for per-domain curation (caps, dedup,
    * mixing): lowercased port-stripped host reduced to its registrable
    * domain (eTLD+1) under the vendored Public Suffix List
    * snapshot — `a.b.site7.com` → `site7.com`, and crucially
    * `a.example.co.uk` → `example.co.uk`, NOT `co.uk` (the last-two-
    * labels heuristic this replaced merged every UK-commercial site
    * into one cap/split bucket). Unknown TLDs fall under the PSL's
    * implicit `*` rule, which IS last-two-labels — so the heuristic
    * remains the fallback and known suffixes only refine the grouping.
    * See [[PublicSuffixList]] for rule semantics and the snapshot.
    *
    * No `www.`-strip here (unlike the heuristic this replaced): the PSL
    * lookup keeps trailing labels, so a leading `www.` never changes the
    * result for an ordinary host (`www.site.com` → `site.com` either
    * way) — while stripping it WOULD corrupt the rare hosts where `www`
    * is load-bearing (`www.ck`, the PSL's canonical exception rule, and
    * the registrable domain `www.com`). */
  def urlDomain(u: Column): Column = {
    val hostport = lower(regexp_extract(u, SchemeRe + "([^/?#]*)", 2))
    RegistrableDomain(regexp_replace(hostport, ":\\d+$", ""))
  }
}

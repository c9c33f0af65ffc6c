package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Registrable-domain ("eTLD+1") extraction backed by a vendored
  * snapshot of the Public Suffix List rule grammar — the per-domain
  * curation key (`sample_domain_cap`, `sample_split_bydomain`,
  * `dedup_url` rates) must group `a.example.co.uk` and
  * `b.example.co.uk` as ONE registrant (`example.co.uk`), not merge
  * every UK-commercial site into a single `co.uk` bucket the way the
  * last-two-labels heuristic does. On a real crawl that heuristic error
  * is corpus-shaping: a domain cap would throttle all of `.co.uk` as
  * one "domain" while a train/val domain split would put the entire
  * ccTLD on one side.
  *
  * Rule semantics are the published PSL algorithm (publicsuffix.org):
  * the longest matching rule wins; `*.<parent>` matches exactly one
  * extra label; `!<rule>` exception rules beat all others and mark the
  * rule MINUS its leftmost label as the public suffix; a host that
  * matches no rule falls under the implicit default rule `*` (its top
  * label is the public suffix) — which reproduces the last-two-labels
  * heuristic exactly, so unknown TLDs keep their previous grouping and
  * the vendored snapshot only ever REFINES, never regresses.
  *
  * The rule table is STATIC per JVM (parsed once from a vendored
  * classpath snapshot), not a broadcast join: domain extraction stays a
  * map-only codegen'd expression with zero shuffle — at 100 TB the
  * difference between a per-row hash-set probe and joining every row
  * against a rules table.
  *
  * SNAPSHOT, GENERATED NOT CURATED (round 12): the rules load from
  * `graft/public_suffix_list.dat` — a vendored snapshot in the
  * CANONICAL publicsuffix.org file format (`//` comments, `*.`
  * wildcards, `!` exceptions, ICANN/PRIVATE section markers), built by
  * `tools/make_psl_snapshot.py` and refreshable by simply dropping in
  * the upstream `public_suffix_list.dat` (MPL-2.0): the parser
  * consumes the upstream grammar verbatim. ~790 rules: the ccTLD
  * second-level conventions, the full US k12/cc/lib locality grid, the
  * JP designated-city wildcards with their `!city.*` deep exceptions,
  * and the private-section platform-hosting families (github.io, the
  * ~70 blogspot ccTLDs, the amazonaws S3/compute families, Azure,
  * dynamic-DNS). The ICANN/private split is preserved from the file's
  * section markers, and a refresh that drops the private section fails
  * LOUDLY (see the require below) instead of silently regrouping all
  * of GitHub Pages under one registrant.
  */
object PublicSuffixList {

  private final case class Rules(exact: Set[String],
                                 privateExact: Set[String],
                                 wildcard: Set[String],
                                 exception: Set[String])

  /** Parse the canonical PSL file format. Single-label exact rules
    * (`com`, `uk`, …) are folded away: the implicit default rule `*`
    * already makes any top label a public suffix, so they change
    * nothing — dropping them keeps the probe sets and the generated
    * oracle CASE lean when the snapshot is the full upstream list. */
  private val parsed: Rules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "graft/public_suffix_list.dat missing from " +
      "classpath — regenerate with tools/make_psl_snapshot.py")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val exact = Set.newBuilder[String]
      val priv = Set.newBuilder[String]
      val wild = Set.newBuilder[String]
      val exc = Set.newBuilder[String]
      var section = 0 // 0 = outside, 1 = ICANN, 2 = PRIVATE
      for (raw <- src.getLines()) {
        val line = raw.trim
        if (line.contains("===BEGIN ICANN DOMAINS===")) section = 1
        else if (line.contains("===BEGIN PRIVATE DOMAINS===")) section = 2
        else if (line.contains("===END")) section = 0
        else if (line.nonEmpty && !line.startsWith("//") && section != 0) {
          // canonical grammar: the rule is everything up to whitespace
          val rule = line.split("\\s+")(0).toLowerCase
          if (rule.startsWith("!")) exc += rule.substring(1)
          else if (rule.startsWith("*.")) wild += rule.substring(2)
          else if (rule.contains(".")) {
            if (section == 1) exact += rule else priv += rule
          }
        }
      }
      Rules(exact.result(), priv.result(), wild.result(), exc.result())
    } finally src.close()
  }
  require(parsed.exact.nonEmpty && parsed.wildcard.nonEmpty,
    "public_suffix_list.dat parsed to an empty ICANN rule set — " +
      "corrupt or mis-sectioned snapshot")
  require(parsed.privateExact.nonEmpty,
    "public_suffix_list.dat carries no PRIVATE-section rules — a " +
      "refresh must not silently drop the platform-hosting suffixes " +
      "(they change domain-cap/split grouping for all of GitHub " +
      "Pages, Blogspot, S3 website hosting, …)")

  /** Multi-label exact rules from the ICANN section: second-level
    * registration conventions plus the deeper US locality shapes
    * (`k12.<state>.us`, the 4-label Massachusetts private-school
    * entries) that forced the oracle CTE to go depth-general. */
  val exact: Set[String] = parsed.exact

  /** PRIVATE-section exact rules — platform hosting suffixes where
    * every customer subdomain is an independent registrant. Kept in a
    * SEPARATE set from the ICANN section (split taken from the
    * snapshot's section markers): without these, every GitHub-Pages
    * site groups as ONE registrable domain (`github.io`) —
    * `sample_domain_cap` would cap the whole platform under one token
    * budget and `sample_split_bydomain` would put it all on one split
    * side: the same corpus-shaping error class the ccTLD rules fix,
    * one PSL section over. */
  val privateExact: Set[String] = parsed.privateExact

  /** Wildcard rules `*.<parent>`, stored by parent: every DIRECT child
    * label of the parent is itself a public suffix. The fully
    * wildcarded ccTLDs and JP designated-city parents (ICANN) plus the
    * multi-label EC2/ELB hostname parents (private section): every
    * `ec2-…` public hostname is its own registrable space. */
  val wildcard: Set[String] = parsed.wildcard

  /** Exception rules `!<rule>`: the named host IS registrable even
    * though a wildcard would make it a public suffix (`www.ck`, the
    * JP `city.<city>.jp` municipal hosts). */
  val exception: Set[String] = parsed.exception

  /** The probe set: ICANN + private exact rules — one longest-match
    * lookup, section kept only for refresh bookkeeping. */
  val allExact: Set[String] = exact ++ privateExact

  /** Longest rule length in labels — bounds the probe loop. */
  val maxRuleLabels: Int =
    (allExact.iterator.map(_.count(_ == '.') + 1) ++
      wildcard.iterator.map(_.count(_ == '.') + 2) ++
      exception.iterator.map(_.count(_ == '.') + 1)).max

  // The DuckDB oracle mirrors this table with a GENERATED depth-general
  // CASE (queries/Pipeline.scala urlCanonCtes groups the rule sets by
  // label depth and emits one guarded suffix-membership term per depth),
  // so arbitrary-depth rules — 4-label exacts, multi-label wildcard
  // parents — need no SQL rework. tools/check_psl_oracle.py replays the
  // generated CASE against adversarial hosts for every rule class.

  /** The registrable domain of an already-normalized host (lowercase,
    * no port — [[UrlFunctions.urlDomain]] does that normalization
    * upstream; NO `www.`-strip is needed or wanted, see there).
    * Single-label hosts (`localhost`) and hosts that ARE a public
    * suffix come back unchanged. */
  def registrable(host: String): String = {
    // trailing-dot FQDNs ("example.com.") normalize first, in lockstep
    // with the SQL mirror: Scala's split drops trailing empty labels
    // while DuckDB's string_split keeps them, and the
    // return-host-unchanged paths below must agree on WHICH host string
    // that is — the dotless one, in both engines
    val h =
      if (host.nonEmpty && host.charAt(host.length - 1) == '.')
        host.replaceAll("\\.+$", "")
      else host
    val labels = h.split('.')
    val n = labels.length
    if (n <= 1) return h
    val maxK = math.min(n, maxRuleLabels)
    // exception rules beat everything: public suffix = rule minus its
    // leftmost label
    var psLen = -1
    var k = 2
    while (k <= maxK && psLen < 0) {
      if (exception.contains(suffixOf(labels, k))) psLen = k - 1
      k += 1
    }
    if (psLen < 0) {
      psLen = 1 // implicit default rule `*`: top label is public
      k = 2
      while (k <= maxK) {
        val s = suffixOf(labels, k)
        if (allExact.contains(s)) psLen = math.max(psLen, k)
        else if (wildcard.contains(suffixOf(labels, k - 1)))
          psLen = math.max(psLen, k)
        k += 1
      }
    }
    val take = math.min(n, psLen + 1)
    if (take == n) h else labels.drop(n - take).mkString(".")
  }

  private def suffixOf(labels: Array[String], k: Int): String = {
    val sb = new java.lang.StringBuilder
    var i = labels.length - k
    while (i < labels.length) {
      if (sb.length > 0) sb.append('.')
      sb.append(labels(i))
      i += 1
    }
    sb.toString
  }
}

/** `registrable(host)` as a codegen'd native expression — the rule table
  * rides the expression as a compiled-in static, so the plan stays
  * map-only (no broadcast join, no shuffle). */
case class RegistrableDomainExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"registrable_domain requires string, got ${other.simpleString}")
    }

  def kernel(u: UTF8String): UTF8String =
    UTF8String.fromString(PublicSuffixList.registrable(u.toString))

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("psl", this,
      classOf[RegistrableDomainExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): RegistrableDomainExpr =
    copy(child = c)
}

object RegistrableDomain {
  def apply(host: Column): Column =
    shim.column(RegistrableDomainExpr(shim.expression(host)))
}

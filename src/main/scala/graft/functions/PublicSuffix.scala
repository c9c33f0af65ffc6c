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
  * The rule table is a STATIC compiled-in set (a few hundred strings),
  * not a broadcast join: domain extraction stays a map-only codegen'd
  * expression with zero shuffle — at 100 TB the difference between a
  * per-row hash-set probe and joining every row against a rules table.
  * The snapshot covers the high-traffic ccTLD registration suffixes,
  * the stable wildcard/exception entries, AND the private-section
  * platform-hosting suffixes (`github.io`, `blogspot.*`, the
  * `amazonaws.com` website/compute families, …) — kept in a separate
  * set so a refresh that pulls only the ICANN section preserves them
  * deliberately; a production deployment refreshes [[PublicSuffixList]]
  * from the upstream list file (same sets, same algorithm — the data
  * is MPL-2.0, refreshed periodically).
  */
object PublicSuffixList {

  /** Multi-label exact rules (single-label TLDs need no entry: the
    * default `*` rule already makes any top label a public suffix).
    * Snapshot subset of the ICANN section, keyed by the second-level
    * registration conventions that dominate crawl traffic, plus the
    * deeper US locality conventions (`k12.<state>.us` and the
    * 4-label Massachusetts private-school entries) — the depth-3+
    * shapes that forced the oracle CTE to go depth-general. */
  val exact: Set[String] = Set(
    // United Kingdom
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "sch.uk", "nhs.uk",
    "me.uk", "ltd.uk", "plc.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    // Japan
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    // India
    "co.in", "net.in", "org.in", "gov.in", "ac.in", "edu.in", "res.in",
    "gen.in", "firm.in", "ind.in",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "maori.nz",
    // South Africa
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za", "edu.za",
    // South Korea
    "co.kr", "or.kr", "ne.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    // Mexico / Argentina / Colombia / Chile / Peru / Venezuela
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.co", "net.co", "org.co", "gov.co", "edu.co",
    "gob.cl", "gov.cl", "mil.cl",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe",
    "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve",
    // Turkey
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "bel.tr", "k12.tr",
    // Taiwan / Hong Kong / Singapore
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    // Israel
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il", "k12.il",
    // Thailand / Indonesia / Malaysia / Philippines / Vietnam
    "co.th", "net.th", "or.th", "go.th", "ac.th", "in.th",
    "co.id", "net.id", "or.id", "go.id", "ac.id", "web.id", "sch.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "ac.vn",
    // Ukraine / Poland / Russia
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "gov.pl", "edu.pl", "waw.pl",
    "krakow.pl", "poznan.pl", "wroc.pl", "gda.pl",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    // Egypt / Saudi Arabia / Nigeria / Kenya / Ghana
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "info.ke",
    "com.gh", "org.gh", "gov.gh", "edu.gh",
    // Europe ccTLD second levels that take registrations
    "co.at", "or.at", "ac.at", "gv.at",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "org.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "co.hu", "org.hu", "info.hu", "priv.hu",
    "com.ro", "org.ro", "info.ro", "arts.ro",
    // Canadian provinces
    "gc.ca", "qc.ca", "on.ca", "bc.ca", "ab.ca", "mb.ca", "ns.ca",
    "nb.ca", "sk.ca", "nl.ca", "pe.ca", "nt.ca", "nu.ca", "yt.ca",
    // US locality second-levels: k12/community-college/library per
    // state; Massachusetts has no public k12.ma.us rule — its
    // school registrations live one label deeper (4-label rules)
    "k12.ak.us", "k12.al.us", "k12.ca.us", "k12.co.us", "k12.fl.us",
    "k12.ga.us", "k12.il.us", "k12.mi.us", "k12.mn.us", "k12.ny.us",
    "k12.oh.us", "k12.or.us", "k12.pa.us", "k12.tx.us", "k12.va.us",
    "k12.wa.us", "k12.wi.us",
    "cc.ca.us", "cc.fl.us", "cc.il.us", "cc.ny.us", "cc.tx.us",
    "lib.ca.us", "lib.fl.us", "lib.il.us", "lib.ny.us", "lib.tx.us",
    "pvt.k12.ma.us", "chtr.k12.ma.us", "paroch.k12.ma.us")

  /** PRIVATE-section exact rules — platform hosting suffixes where
    * every customer subdomain is an independent registrant. Kept in a
    * SEPARATE set from the ICANN section deliberately: a snapshot
    * refresh that pulls only the ICANN list must not silently drop
    * them (they change domain-cap/split grouping for all of GitHub
    * Pages, Blogspot, S3 website hosting, …). Without these, every
    * GitHub-Pages site groups as ONE registrable domain (`github.io`)
    * — `sample_domain_cap` would cap the whole platform under one
    * token budget and `sample_split_bydomain` would put it all on one
    * split side: the same corpus-shaping error class the ccTLD rules
    * fix, one PSL section over. */
  val privateExact: Set[String] = Set(
    // generic-TLD resellers (private section despite the ccTLD look)
    "co.nl", "com.de", "co.com", "us.com", "uk.com", "eu.com",
    // code / pages hosting
    "github.io", "githubusercontent.com", "gitlab.io", "bitbucket.io",
    "readthedocs.io", "neocities.org", "glitch.me", "repl.co",
    // PaaS / edge
    "herokuapp.com", "netlify.app", "pages.dev", "workers.dev",
    "vercel.app", "now.sh", "surge.sh", "onrender.com", "fly.dev",
    "web.app", "firebaseapp.com", "appspot.com", "run.app",
    "azurewebsites.net", "cloudapp.net", "trafficmanager.net",
    "azureedge.net", "cloudfront.net",
    // blog / site builders
    "wordpress.com", "wixsite.com", "weebly.com",
    "blogspot.com", "blogspot.ca", "blogspot.de", "blogspot.fr",
    "blogspot.in", "blogspot.it", "blogspot.jp", "blogspot.kr",
    "blogspot.mx", "blogspot.nl", "blogspot.se", "blogspot.sg",
    "blogspot.co.uk", "blogspot.com.au", "blogspot.com.br",
    "blogspot.co.nz", "blogspot.co.za", "blogspot.com.ar",
    // object storage website endpoints (3- and 4-label shapes)
    "s3.amazonaws.com", "s3.us-east-2.amazonaws.com",
    "s3.us-west-2.amazonaws.com", "s3.eu-west-1.amazonaws.com",
    "s3-website-us-east-1.amazonaws.com",
    "s3.dualstack.us-east-1.amazonaws.com",
    "s3.dualstack.eu-west-1.amazonaws.com",
    "blob.core.windows.net")

  /** Wildcard rules `*.<parent>`, stored by parent: every DIRECT child
    * label of the parent is itself a public suffix. The long-stable
    * fully-wildcarded ccTLDs (ICANN) plus the multi-label EC2/ELB
    * hostname parents (private section): every `ec2-…` public hostname
    * is its own registrable space. */
  val wildcard: Set[String] = Set("ck", "er", "fk", "np", "pg",
    "compute.amazonaws.com", "compute-1.amazonaws.com",
    "elb.amazonaws.com")

  /** Exception rules `!<rule>`: the named host IS registrable even
    * though a wildcard would make it a public suffix. */
  val exception: Set[String] = Set("www.ck")

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

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases of the URL canonicalizer beyond what the planted-fixture
  * oracle exercises — the rules that must hold on REAL crawl data. */
class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u")
      .select(UrlFunctions.canonicalizeUrl(col("u")))
      .collect().head.getString(0)

  private def canonWith(u: String, keys: Seq[String]): String =
    Seq(u).toDF("u")
      .select(UrlFunctions.canonicalizeUrl(col("u"), keys))
      .collect().head.getString(0)

  private def domain(u: String): String =
    Seq(u).toDF("u")
      .select(UrlFunctions.urlDomain(col("u")))
      .collect().head.getString(0)

  test("scheme+host lowercase; path case preserved") {
    assert(canon("HTTPS://WWW.Example.COM/Path/To/X") ==
      "https://example.com/Path/To/X")
  }

  test("default ports dropped, non-default ports preserved") {
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("https://a.com:8443/x") == "https://a.com:8443/x")
    assert(canon("http://a.com:443/x") == "http://a.com:443/x")
  }

  test("fragment dropped; empty path becomes root; one trailing slash stripped") {
    assert(canon("https://a.com#top") == "https://a.com/")
    assert(canon("https://a.com/") == "https://a.com/")
    assert(canon("https://a.com/x/") == "https://a.com/x")
    assert(canon("https://a.com/x//") == "https://a.com/x/")
  }

  test("tracking params removed; real params and their order preserved") {
    assert(canon("https://a.com/x?utm_source=s&b=2&a=1&fbclid=f") ==
      "https://a.com/x?b=2&a=1")
    assert(canon("https://a.com/x?utm_a=1&utm_b=2") == "https://a.com/x")
    assert(canon("https://a.com/x?gclid=1") == "https://a.com/x")
  }

  test("ref is content-bearing, not tracking: it must survive the default set") {
    // ?ref=<branch> on code hosts selects a DIFFERENT page — dropping it
    // would make canonical-URL dedup delete unique content
    assert(canon("https://a.com/repo/blob/f.txt?ref=main") ==
      "https://a.com/repo/blob/f.txt?ref=main")
    // callers with a known-safe corpus can widen the set explicitly
    val wide = graft.functions.UrlFunctions.DefaultTrackKeys :+ "ref"
    assert(canonWith("https://a.com/x?gclid=1&ref=hn", wide) == "https://a.com/x")
  }

  test("a param merely PREFIXED by a tracking key survives (no lookahead needed)") {
    // `referrer=x` must not lose its `ref` prefix; `utm_` keys always
    // match because the class excludes `=`
    assert(canon("https://a.com/x?referrer=about&id=2") ==
      "https://a.com/x?referrer=about&id=2")
  }

  test("query on a root-path URL keeps the inserted root slash") {
    assert(canon("https://WWW.a.com?id=1#f") == "https://a.com/?id=1")
  }

  test("domain: registrable domain (eTLD+1), port/www stripped, single-label host unchanged") {
    assert(domain("https://a.b.Site7.COM:8443/x") == "site7.com")
    assert(domain("HTTP://WWW.Example.com/y") == "example.com")
    assert(domain("http://localhost:8080/") == "localhost")
  }

  test("domain: PSL ccTLD registrations group by registrant, not by public suffix") {
    // the last-two-labels heuristic returned `co.uk` here, merging every
    // UK-commercial site into ONE cap/split bucket
    assert(domain("https://example.co.uk/x") == "example.co.uk")
    assert(domain("https://shop.example.co.uk/x") == "example.co.uk")
    assert(domain("https://a.b.example.co.uk/x") == "example.co.uk")
    assert(domain("https://news.example.com.au/") == "example.com.au")
    assert(domain("https://www.example.ac.jp/") == "example.ac.jp")
    assert(domain("https://sub.example.gob.mx/") == "example.gob.mx")
    // a host that IS a public suffix has no registrable domain — comes
    // back unchanged rather than inventing one
    assert(domain("https://co.uk/") == "co.uk")
  }

  test("domain: PSL wildcard and exception rules") {
    // *.ck: every direct child of ck is itself a public suffix
    assert(domain("https://a.shop.ck/") == "a.shop.ck")
    assert(domain("https://deep.a.shop.ck/") == "a.shop.ck")
    // !www.ck: the exception makes www.ck registrable despite *.ck —
    // reachable through urlDomain precisely BECAUSE it no longer strips
    // a leading `www.` (redundant under PSL for ordinary hosts,
    // destructive for this one)
    assert(domain("https://www.ck/") == "www.ck")
    assert(domain("https://sub.www.ck/") == "www.ck")
    // fully-wildcarded ccTLD without an exception
    assert(graft.functions.PublicSuffixList.registrable("b.a.np") == "b.a.np")
  }

  test("domain: PSL private-section platform suffixes keep customers apart") {
    // without the private section, alice and bob collapse into ONE
    // registrable domain (`github.io`) — a domain cap would budget all
    // of GitHub Pages as one site and a domain split would put the
    // whole platform on one side
    assert(domain("https://alice.github.io/project/") == "alice.github.io")
    assert(domain("https://bob.github.io/") == "bob.github.io")
    assert(domain("https://a.b.alice.github.io/") == "alice.github.io")
    assert(domain("https://myapp.herokuapp.com/x") == "myapp.herokuapp.com")
    assert(domain("https://site.example.us.com/") == "example.us.com")
    // 3-label private rules (per-ccTLD blogspot registrations)
    assert(domain("https://foo.blogspot.co.uk/") == "foo.blogspot.co.uk")
    assert(domain("https://x.y.blogspot.com.br/") == "y.blogspot.com.br")
    // a host that IS a private suffix comes back unchanged
    assert(domain("https://github.io/") == "github.io")
  }

  test("domain: deep exact rules and multi-label wildcard parents (depth-general)") {
    // 4-label exact (Massachusetts private-school registrations)
    assert(domain("https://www.sch.pvt.k12.ma.us/") == "sch.pvt.k12.ma.us")
    assert(domain("https://app.pvt.k12.ma.us/") == "app.pvt.k12.ma.us")
    // 3-label exact (state k12), vs a state with no public k12 rule
    assert(domain("https://hs.district.k12.ca.us/") == "district.k12.ca.us")
    // 4-label S3 dualstack website endpoints
    assert(domain("https://data.s3.dualstack.us-east-1.amazonaws.com/") ==
      "data.s3.dualstack.us-east-1.amazonaws.com")
    assert(domain("https://bucket.s3.amazonaws.com/key") ==
      "bucket.s3.amazonaws.com")
    // *.compute-1.amazonaws.com: every EC2 public hostname is its own
    // registrable space; deeper subdomains group under it
    assert(domain("https://ec2-1-2-3-4.compute-1.amazonaws.com/") ==
      "ec2-1-2-3-4.compute-1.amazonaws.com")
    assert(domain("https://a.b.ec2-55.compute-1.amazonaws.com/") ==
      "b.ec2-55.compute-1.amazonaws.com")
    // the wildcard PARENT itself is not a rule match: amazonaws.com
    // stays an ordinary registrable domain
    assert(domain("https://compute.amazonaws.com/") == "amazonaws.com")
  }

  test("domain: generated snapshot classes — JP city exceptions, new wildcards, regioned private suffixes") {
    // mirror of the tools/check_psl_oracle.py r12 additions, so both
    // engines pin the same truth table for the generated .dat
    assert(domain("https://shop.dhaka.bd/") == "shop.dhaka.bd") // *.bd
    assert(domain("https://www.city.kawasaki.jp/page") == "city.kawasaki.jp")
    assert(domain("https://ward.kawasaki.jp/") == "ward.kawasaki.jp")
    assert(domain("https://a.ward.kawasaki.jp/") == "a.ward.kawasaki.jp")
    assert(domain("https://blogi.blogspot.fi/") == "blogi.blogspot.fi")
    assert(domain("https://app.eu-central-1.elasticbeanstalk.com/") ==
      "app.eu-central-1.elasticbeanstalk.com")
    assert(domain("https://bucket.storage.googleapis.com/obj") ==
      "bucket.storage.googleapis.com")
    assert(domain("https://host.duckdns.org/") == "host.duckdns.org")
    assert(domain("https://vm.westeurope.cloudapp.azure.com/") ==
      "vm.westeurope.cloudapp.azure.com")
    assert(domain("https://hs.bergen.k12.nj.us/") == "bergen.k12.nj.us")
    assert(domain("https://uni.ac.ru/") == "uni.ac.ru")       // ICANN ru
    assert(domain("https://site.com.ru/") == "site.com.ru")   // private ru
  }

  test("PSL snapshot parser: section split, rule classes, folded single-label rules") {
    import graft.functions.PublicSuffixList
    // the generated snapshot parsed into the four rule classes with the
    // ICANN/private split taken from the file's section markers
    assert(PublicSuffixList.exact.contains("co.uk"))
    assert(PublicSuffixList.exact.contains("pvt.k12.ma.us"))
    assert(!PublicSuffixList.exact.contains("github.io"))
    assert(PublicSuffixList.privateExact.contains("github.io"))
    assert(PublicSuffixList.privateExact.contains("blogspot.fi"))
    assert(!PublicSuffixList.privateExact.contains("co.uk"))
    assert(PublicSuffixList.wildcard.contains("ck"))
    assert(PublicSuffixList.wildcard.contains("kawasaki.jp"))
    assert(PublicSuffixList.wildcard.contains("compute.amazonaws.com"))
    assert(PublicSuffixList.exception.contains("www.ck"))
    assert(PublicSuffixList.exception.contains("city.kawasaki.jp"))
    // single-label exact rules are folded into the implicit `*` default
    assert(!PublicSuffixList.exact.contains("com"))
    // scale sanity: generated, not hand-typed
    assert(PublicSuffixList.allExact.size > 500,
      PublicSuffixList.allExact.size.toString)
  }

  test("domain: unknown TLDs keep the last-two-labels fallback (implicit * rule)") {
    assert(domain("https://a.b.example.zz/") == "example.zz")
    assert(domain("https://example.dev/") == "example.dev")
  }

  test("domain: trailing-dot FQDNs normalize before the lookup (split-semantics parity)") {
    // Scala's split drops trailing empty labels, DuckDB's string_split
    // keeps them — both engines now strip the dots FIRST, so the
    // return-host-unchanged paths agree on the dotless string
    assert(domain("https://example.com./") == "example.com")
    assert(domain("https://shop.example.co.uk./x") == "example.co.uk")
    assert(graft.functions.PublicSuffixList.registrable("example.com..") ==
      "example.com")
  }

  test("canonicalization is idempotent on its own output") {
    val urls = Seq(
      "HTTPS://WWW.Site3.COM:443/Articles/5/?utm_source=a&id=2#frag",
      "http://a.b.c.com:8080/p?x=1&ref=hn",
      "https://a.com")
    for (u <- urls) assert(canon(canon(u)) == canon(u), u)
  }
}

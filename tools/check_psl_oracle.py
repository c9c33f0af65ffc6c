#!/usr/bin/env python3
"""Adversarial parity check for the PSL registrable-domain SQL mirror.

The DuckDB oracle for the URL-curation entries interpolates the
PublicSuffixList rule sets into a GENERATED depth-general CASE
(Pipeline.urlCanonCtes: one guarded suffix-membership term per rule depth).
The fixture URLs only exercise `.com`, so this script replays the oracle's
OWN canonicalization CTEs over adversarial URLs that hit every rule class
(ccTLD exact rules, private-section platform suffixes, deep 3-/4-label
exact rules, single- and multi-label wildcards, !www.ck exception,
unknown-TLD fallback, public-suffix-only hosts) and compares against the expected
eTLD+1 — the values UrlFunctionsSpec pins for the Scala side. Both
engines checked against one truth table = the algorithms agree.

Usage: python3 tools/check_psl_oracle.py <verifyOutDir>
       (needs <dir>/oracle_sql.json containing text_url_normalize,
        e.g. from `runMain graft.tools.VerifyOne text_url_normalize ...`)
"""
import json, sys, os
import duckdb

CASES = [
    ("https://shop.example.co.uk/x", "example.co.uk"),
    ("https://a.b.example.co.uk:443/y/", "example.co.uk"),
    ("https://news.example.com.au/", "example.com.au"),
    ("https://www.ck/", "www.ck"),                  # !www.ck exception
    ("https://sub.www.ck/", "www.ck"),
    ("https://deep.a.shop.ck/", "a.shop.ck"),       # *.ck wildcard
    ("https://WWW.Site3.COM/Articles/5", "site3.com"),
    ("https://example.dev/", "example.dev"),        # unknown TLD fallback
    ("http://localhost:8080/", "localhost"),        # single label
    ("https://co.uk/", "co.uk"),                    # host IS a public suffix
    ("https://b.a.np/", "b.a.np"),                  # *.np wildcard
    ("https://www.example.ac.jp/", "example.ac.jp"),
    ("https://example.com./", "example.com"),       # trailing-dot FQDN
    ("https://shop.example.co.uk./x", "example.co.uk"),
    # private section: platform-hosting suffixes
    ("https://alice.github.io/project/", "alice.github.io"),
    ("https://a.b.alice.github.io/", "alice.github.io"),
    ("https://myapp.herokuapp.com/x", "myapp.herokuapp.com"),
    ("https://site.example.us.com/", "example.us.com"),
    ("https://foo.blogspot.co.uk/", "foo.blogspot.co.uk"),     # 3-label rule
    ("https://x.y.blogspot.com.br/", "y.blogspot.com.br"),
    ("https://github.io/", "github.io"),            # host IS a private suffix
    # deep exact rules (depth-general CASE)
    ("https://www.sch.pvt.k12.ma.us/", "sch.pvt.k12.ma.us"),   # 4-label rule
    ("https://hs.district.k12.ca.us/", "district.k12.ca.us"),  # 3-label rule
    ("https://data.s3.dualstack.us-east-1.amazonaws.com/",
     "data.s3.dualstack.us-east-1.amazonaws.com"),
    ("https://bucket.s3.amazonaws.com/key", "bucket.s3.amazonaws.com"),
    # multi-label wildcard parents (*.compute-1.amazonaws.com)
    ("https://ec2-1-2-3-4.compute-1.amazonaws.com/",
     "ec2-1-2-3-4.compute-1.amazonaws.com"),
    ("https://a.b.ec2-55.compute-1.amazonaws.com/",
     "b.ec2-55.compute-1.amazonaws.com"),
    ("https://compute.amazonaws.com/", "amazonaws.com"),  # parent not a rule
    # r12 snapshot additions (generated .dat)
    ("https://shop.dhaka.bd/", "shop.dhaka.bd"),        # *.bd wildcard
    ("https://www.city.kawasaki.jp/page", "city.kawasaki.jp"),  # deep !exc
    ("https://ward.kawasaki.jp/", "ward.kawasaki.jp"),  # *.kawasaki.jp
    ("https://a.ward.kawasaki.jp/", "a.ward.kawasaki.jp"),
    ("https://blogi.blogspot.fi/", "blogi.blogspot.fi"),
    ("https://app.eu-central-1.elasticbeanstalk.com/",
     "app.eu-central-1.elasticbeanstalk.com"),          # regioned PaaS
    ("https://bucket.storage.googleapis.com/obj", "bucket.storage.googleapis.com"),
    ("https://host.duckdns.org/", "host.duckdns.org"),  # dynamic DNS
    ("https://vm.westeurope.cloudapp.azure.com/", "vm.westeurope.cloudapp.azure.com"),
    ("https://hs.bergen.k12.nj.us/", "bergen.k12.nj.us"),  # full state grid
    ("https://uni.ac.ru/", "uni.ac.ru"),                # ru ICANN rules
    ("https://site.com.ru/", "site.com.ru"),            # ru private reseller
]

def main(out_dir):
    sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))[
        "text_url_normalize"]
    tail = sql[sql.index("p AS ("):]
    vals = ", ".join(f"({i}, '{u}')" for i, (u, _) in enumerate(CASES))
    q = f"WITH u(doc_id, url) AS (VALUES {vals}), {tail}"
    n_bad = 0
    for doc_id, url, _canon, domain in duckdb.sql(q).fetchall():
        want = CASES[doc_id][1]
        status = "PASS" if domain == want else f"FAIL (expected {want})"
        if domain != want:
            n_bad += 1
        print(f"{status}  {url} -> {domain}")
    print(f"== {len(CASES) - n_bad}/{len(CASES)} PSL oracle cases match ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    if len(sys.argv) != 2:
        print("Usage: python3 tools/check_psl_oracle.py <verifyOutDir>  "
              "(dir must contain oracle_sql.json with text_url_normalize)")
        sys.exit(2)
    sys.exit(main(sys.argv[1]))

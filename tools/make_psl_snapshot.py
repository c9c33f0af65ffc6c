#!/usr/bin/env python3
"""Build the vendored Public Suffix List snapshot
(src/main/resources/graft/public_suffix_list.dat) in the CANONICAL
publicsuffix.org file format: `//` comments, blank lines, one rule per
line (`*.` wildcards, `!` exceptions), and the
`===BEGIN/END ICANN DOMAINS===` / `===BEGIN/END PRIVATE DOMAINS===`
section markers the runtime parser (graft.functions.PublicSuffixList)
keys the ICANN/private split on.

PROVENANCE: this environment has no network egress, so the snapshot is
authored here from the canonical format's published structure rather
than downloaded. In a deployment with egress the refresh path is
simply:

    curl -o src/main/resources/graft/public_suffix_list.dat \
         https://publicsuffix.org/list/public_suffix_list.dat

— the runtime parser consumes the upstream file VERBATIM (same
markers, same rule grammar; single-label exact rules are folded into
the implicit `*` default at parse time), so no code changes and no
re-generation are needed. This script exists to (re)produce the
vendored snapshot deterministically and to document exactly what it
contains.

Usage: python3 tools/make_psl_snapshot.py
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft",
                   "public_suffix_list.dat")

lines = []
def emit(*xs):
    lines.extend(xs)

def rules(fmt, items):
    for i in items:
        emit(fmt.format(i))

emit("// Vendored Public Suffix List snapshot (canonical file format).",
     "// Refresh: replace this file with the upstream",
     "// https://publicsuffix.org/list/public_suffix_list.dat (MPL-2.0);",
     "// the parser consumes the upstream format verbatim.",
     "",
     "// ===BEGIN ICANN DOMAINS===",
     "")

# --- fully-wildcarded ccTLDs (every 2nd-level label is a public suffix)
emit("// wildcard ccTLDs")
rules("*.{}", ["bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg"])
emit("!www.ck", "")

# --- Japanese prefecture-city wildcards with city exceptions: the
# canonical deep-exception shape (!city.<parent> under *.<parent>)
jp_cities = ["kawasaki", "kitakyushu", "kobe", "nagoya", "sapporo",
             "sendai", "yokohama"]
emit("// JP city wildcards + exceptions")
rules("*.{}.jp", jp_cities)
rules("!city.{}.jp", jp_cities)
emit("")

# --- second-level registration conventions by country
emit("// ccTLD second-level registration suffixes")
cc2 = {
    "uk": ["co", "org", "net", "ac", "gov", "sch", "nhs", "me", "ltd",
           "plc", "police"],
    "au": ["com", "net", "org", "edu", "gov", "id", "asn"],
    "jp": ["co", "or", "ne", "ac", "go", "ad", "ed", "gr", "lg"],
    "br": ["com", "net", "org", "gov", "edu", "art", "blog"],
    "in": ["co", "net", "org", "gov", "ac", "edu", "res", "gen", "firm",
           "ind", "nic"],
    "cn": ["com", "net", "org", "gov", "edu", "ac"],
    "nz": ["co", "net", "org", "govt", "ac", "school", "geek", "maori"],
    "za": ["co", "net", "org", "gov", "ac", "web", "edu"],
    "kr": ["co", "or", "ne", "go", "ac", "re", "pe"],
    "mx": ["com", "net", "org", "gob", "edu"],
    "ar": ["com", "net", "org", "gob", "edu"],
    "co": ["com", "net", "org", "gov", "edu"],
    "cl": ["gob", "gov", "mil"],
    "pe": ["com", "net", "org", "gob", "edu"],
    "ve": ["com", "net", "org", "gob", "edu"],
    "uy": ["com", "net", "org", "gub", "edu"],
    "ec": ["com", "net", "org", "gob", "edu"],
    "bo": ["com", "net", "org", "gob", "edu"],
    "py": ["com", "net", "org", "gov", "edu"],
    "tr": ["com", "net", "org", "gov", "edu", "bel", "k12"],
    "tw": ["com", "net", "org", "gov", "edu", "idv"],
    "hk": ["com", "net", "org", "gov", "edu", "idv"],
    "sg": ["com", "net", "org", "gov", "edu", "per"],
    "il": ["co", "net", "org", "gov", "ac", "muni", "k12"],
    "th": ["co", "net", "or", "go", "ac", "in"],
    "id": ["co", "net", "or", "go", "ac", "web", "sch"],
    "my": ["com", "net", "org", "gov", "edu"],
    "ph": ["com", "net", "org", "gov", "edu"],
    "vn": ["com", "net", "org", "gov", "edu", "ac"],
    "lk": ["com", "net", "org", "gov", "edu", "ac", "sch"],
    "pk": ["com", "net", "org", "gov", "edu"],
    "bn": ["com", "net", "org", "gov", "edu"],
    "kz": ["com", "net", "org", "gov", "edu", "mil"],
    "uz": ["com", "co"],
    "az": ["com", "net", "org", "gov", "edu"],
    "ge": ["com", "net", "org", "gov", "edu"],
    "by": ["com", "gov"],
    "ua": ["com", "net", "org", "gov", "edu", "in"],
    "pl": ["com", "net", "org", "gov", "edu", "waw", "krakow", "poznan",
           "wroc", "gda"],
    "ru": ["ac", "edu", "gov", "int", "mil", "test"],
    "eg": ["com", "net", "org", "gov", "edu"],
    "sa": ["com", "net", "org", "gov", "edu", "med"],
    "ae": ["co", "net", "org", "gov", "ac", "sch"],
    "jo": ["com", "net", "org", "gov", "edu"],
    "lb": ["com", "net", "org", "gov", "edu"],
    "kw": ["com", "org", "gov", "edu"],
    "qa": ["com", "net", "org", "gov", "edu"],
    "om": ["com", "org", "gov", "edu"],
    "ir": ["co", "net", "org", "gov", "ac", "sch", "id"],
    "iq": ["com", "gov", "edu"],
    "sy": ["com", "gov"],
    "ye": ["com"],
    "ng": ["com", "net", "org", "gov", "edu"],
    "ke": ["co", "or", "ne", "go", "ac", "info"],
    "gh": ["com", "org", "gov", "edu"],
    "tz": ["co", "or", "ac", "go", "sc"],
    "ug": ["co", "or", "ac", "go"],
    "zw": ["co", "org", "ac", "gov"],
    "zm": ["co", "org", "gov"],
    "mw": ["ac", "co", "com", "org", "gov"],
    "na": ["com", "org", "co"],
    "et": ["com", "org", "gov", "edu"],
    "ma": ["co", "net", "org", "gov", "ac"],
    "tn": ["com", "org", "gov"],
    "dz": ["com", "org", "gov", "edu"],
    "ly": ["com", "org", "gov", "edu"],
    "at": ["co", "or", "ac", "gv"],
    "es": ["com", "nom", "org", "gob", "edu"],
    "pt": ["com", "edu", "gov", "org"],
    "gr": ["com", "edu", "net", "org", "gov"],
    "hu": ["co", "org", "info", "priv"],
    "ro": ["com", "org", "info", "arts"],
    "cy": ["com", "net", "org", "gov", "ac"],
    "mt": ["com", "net", "org", "gov", "edu"],
    "lv": ["com", "net", "org", "gov", "edu"],
    "ee": ["com", "org", "edu", "gov"],
    "fr": ["asso", "com", "gouv", "nom", "prd", "tm"],
}
for tld in sorted(cc2):
    rules("{}." + tld, sorted(cc2[tld]))
emit("")

# --- Canadian provinces
emit("// Canadian provincial registrations")
rules("{}.ca", ["gc", "qc", "on", "bc", "ab", "mb", "ns", "nb", "sk",
                "nl", "pe", "nt", "nu", "yt"])
emit("")

# --- US locality conventions: k12 / community-college / library per
# state. Massachusetts k12 registrations live one label DEEPER (the
# 4-label pvt/chtr/paroch rules below) and k12.ma.us itself is NOT a
# rule — the shape that forced the oracle CASE depth-general.
states = ["al", "ak", "az", "ar", "ca", "co", "ct", "dc", "de", "fl",
          "ga", "hi", "ia", "id", "il", "in", "ks", "ky", "la", "md",
          "me", "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh",
          "nj", "nm", "nv", "ny", "oh", "ok", "or", "pa", "ri", "sc",
          "sd", "tn", "tx", "ut", "va", "vt", "wa", "wi", "wv", "wy"]
emit("// US locality second-levels")
for st in states:
    if st != "ma":
        emit(f"k12.{st}.us")
for st in states + ["ma"]:
    emit(f"cc.{st}.us")
    emit(f"lib.{st}.us")
emit("pvt.k12.ma.us", "chtr.k12.ma.us", "paroch.k12.ma.us", "")

emit("// ===END ICANN DOMAINS===",
     "",
     "// ===BEGIN PRIVATE DOMAINS===",
     "")

emit("// generic-TLD resellers")
rules("{}", ["co.nl", "com.de", "co.com", "us.com", "uk.com", "eu.com",
             "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru"])
emit("")

emit("// code / pages hosting")
rules("{}", ["github.io", "githubusercontent.com", "gitlab.io",
             "bitbucket.io", "readthedocs.io", "neocities.org",
             "glitch.me", "repl.co", "gitbook.io", "hashnode.dev",
             "webflow.io", "notion.site"])
emit("")

emit("// PaaS / serverless / edge")
rules("{}", ["herokuapp.com", "netlify.app", "pages.dev", "r2.dev",
             "workers.dev", "vercel.app", "now.sh", "surge.sh",
             "onrender.com", "fly.dev", "web.app", "firebaseapp.com",
             "appspot.com", "run.app", "cloudfunctions.net",
             "amplifyapp.com", "ondigitalocean.app",
             "digitaloceanspaces.com", "pythonanywhere.com",
             "ngrok.io", "ngrok-free.app"])
emit("")

emit("// Azure")
rules("{}", ["azurewebsites.net", "cloudapp.net", "trafficmanager.net",
             "azureedge.net", "azurestaticapps.net",
             "blob.core.windows.net"])
rules("{}.azurestaticapps.net", ["1", "2", "3", "4", "5"])
rules("{}.cloudapp.azure.com",
      ["eastus", "eastus2", "westus", "westus2", "centralus",
       "northeurope", "westeurope", "southeastasia", "japaneast",
       "australiaeast", "brazilsouth", "uksouth"])
emit("")

emit("// CDNs")
rules("{}", ["cloudfront.net", "global.ssl.fastly.net",
             "global.prod.fastly.net"])
emit("")

emit("// dynamic-DNS families")
rules("{}", ["duckdns.org", "dyndns.org", "ddns.net", "hopto.org",
             "zapto.org", "sytes.net", "dynv6.net"])
emit("")

emit("// blog / site builders")
rules("{}", ["wordpress.com", "wixsite.com", "weebly.com"])
blogspot = ["ae", "al", "am", "ba", "be", "bg", "bj", "ca", "cf", "ch",
            "cl", "co.at", "co.id", "co.il", "co.ke", "co.nz", "co.uk",
            "co.za", "com", "com.ar", "com.au", "com.br", "com.by",
            "com.co", "com.cy", "com.ee", "com.eg", "com.es", "com.mt",
            "com.ng", "com.tr", "com.uy", "cv", "cz", "de", "dk", "fi",
            "fr", "gr", "hk", "hr", "hu", "ie", "in", "is", "it", "jp",
            "kr", "li", "lt", "lu", "md", "mk", "mr", "mx", "my", "nl",
            "no", "pe", "pt", "qa", "re", "ro", "rs", "ru", "se", "sg",
            "si", "sk", "sn", "td", "tw", "ug", "vn"]
rules("blogspot.{}", blogspot)
emit("")

emit("// object-storage website endpoints (3- and 4-label shapes)")
s3_regions = ["us-east-2", "us-west-1", "us-west-2", "ca-central-1",
              "eu-west-1", "eu-west-2", "eu-west-3", "eu-central-1",
              "eu-north-1", "ap-south-1", "ap-northeast-1",
              "ap-northeast-2", "ap-southeast-1", "ap-southeast-2",
              "sa-east-1"]
emit("s3.amazonaws.com", "s3-website-us-east-1.amazonaws.com")
rules("s3.{}.amazonaws.com", s3_regions)
rules("s3-website.{}.amazonaws.com",
      ["us-east-2", "eu-west-3", "eu-north-1", "ap-south-1",
       "ca-central-1"])
rules("s3.dualstack.{}.amazonaws.com",
      ["us-east-1", "us-east-2", "eu-west-1", "ap-south-1",
       "ap-southeast-2", "sa-east-1"])
emit("storage.googleapis.com", "")

emit("// EC2 / ELB public hostnames: every generated host is its own")
emit("// registrable space")
rules("*.{}", ["compute.amazonaws.com", "compute-1.amazonaws.com",
               "elb.amazonaws.com"])
emit("")

emit("// AWS Elastic Beanstalk (regioned)")
emit("elasticbeanstalk.com")
rules("{}.elasticbeanstalk.com",
      ["us-east-1", "us-east-2", "us-west-2", "eu-west-1",
       "eu-central-1", "ap-southeast-2"])
emit("")

emit("// ===END PRIVATE DOMAINS===")

with open(OUT, "w") as f:
    f.write("\n".join(lines) + "\n")

n_rules = sum(1 for l in lines
              if l.strip() and not l.strip().startswith("//"))
print(f"wrote {OUT}: {n_rules} rules, {len(lines)} lines")

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // corpus with planted exact dups (1,2), near-dups (3,4), and distinct docs
  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (4L, "a quick brown fox jumps over the lazy dog near the river bank"),
    (5L, "completely different text about spark query engines and columnar execution"),
    (6L, "yet another unrelated document mentioning streams topics and offsets only")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical (normalized) texts") {
    val res = Dedup.exact(corpus, "doc_id", "text").collect()
    assert(res.length == 5) // 1+2 merge
    val dup = res.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 1L) // keeps min id
    val drops = Dedup.exactDrops(corpus, "doc_id", "text").collect()
    assert(drops.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 1L)))
  }

  test("exact dedup is whitespace/case insensitive via normalization") {
    val df = Seq((1L, "Hello   World"), (2L, "hello world "), (3L, "other")).toDF("doc_id", "text")
    assert(Dedup.exact(df, "doc_id", "text").count() == 2)
  }

  test("shingles: distinct word n-grams; short docs fall back to whole text") {
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val sh = Dedup.shingles(df, "doc_id", "text", 3).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sh == Set((1L, "a b c"), (1L, "b c d"), (2L, "x y")))
  }

  test("ngram jaccard: identical docs = 1.0, near-dups high, unrelated absent") {
    val j = Dedup.ngramJaccard(corpus, "doc_id", "text").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.5 && j((1L, 3L)) < 1.0)
    assert(j.getOrElse((5L, 6L), 0.0) == 0.0)
  }

  test("minhash LSH finds exact and near dups as candidates") {
    val cand = Dedup.minhashCandidates(corpus, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)))
    assert(cand.contains((1L, 3L)) || cand.contains((2L, 3L)))
    assert(!cand.contains((5L, 6L)))
  }

  test("minhash near-dups verified by jaccard threshold") {
    val nd = Dedup.minhashNearDups(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd.contains((1L, 2L)))
    assert(!nd.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("paramsFor derives S-curve banding from the threshold") {
    // midpoints at numHashes=64: b=64->0.016, 32->0.18, 16->0.5, 8->0.77
    assert(Dedup.paramsFor(0.2, 64) == (32, 2))
    assert(Dedup.paramsFor(0.5, 64) == (16, 4))
    assert(Dedup.paramsFor(0.8, 64) == (8, 8))
    // below every midpoint: fall back to the closest (most bands)
    assert(Dedup.paramsFor(0.01, 64) == (64, 1))
    intercept[IllegalArgumentException](Dedup.paramsFor(0.0, 64))
    intercept[IllegalArgumentException](Dedup.paramsFor(1.0, 64))
  }

  test("auto banding: recall at the threshold >= the explicit-knob default, equal cost") {
    // documents fixture at a LOW threshold (0.2): the explicit default
    // bands=16 has its S-curve midpoint at 0.5 and under-recalls;
    // paramsFor(0.2) picks bands=32 (midpoint 0.18)
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val explicit = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = Dedup.minhashNearDupsAuto(docs, "doc_id", "text", threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every verified pair the explicit knobs found survives, at the same
    // numHashes budget (64 hashes either way; banding is just a regroup)
    assert(explicit.subsetOf(auto),
      s"auto lost pairs: ${explicit -- auto}")
    info(s"pairs: explicit(bands=16)=${explicit.size} auto(bands=32)=${auto.size}")
  }

  test("simhash: identical texts share signature; near-dups within hamming 3") {
    val sigs = Dedup.simhash(corpus, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sigs(1L) == sigs(2L))
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((5L, 6L)))
  }

  test("cross-corpus decontamination finds contaminated + near-miss docs, never in-corpus pairs") {
    // test set = doc 1 verbatim (contamination) + a close near-dup of doc
    // 3 (one word APPENDED → jaccard ~0.92; a mid-text edit at ~0.57 has
    // only ~0.83 banding probability at 16×4 — the approximation is the
    // point, so the spec plants a pair inside the reliable regime)
    val testSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (101L, "the quick brown fox jumps over the lazy dog near the river bank now"),
      (102L, "entirely novel evaluation prompt with no corpus overlap whatsoever at all")
    ).toDF("doc_id", "text")
    val hits = Dedup.minhashNearDupsAcross(corpus, testSet, "doc_id", "text",
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // docs 1,2 are exact matches of 100; docs 3,4 near-dups of 101
    assert(hits.contains((1L, 100L)) && hits.contains((2L, 100L)), hits)
    assert(hits.contains((3L, 101L)), hits)
    assert(!hits.exists(_._2 == 102L), s"unrelated test doc matched: $hits")
    // pairs are strictly cross-corpus: left ids from corpus, right from test
    assert(hits.forall { case (l, r) => l < 100 && r >= 100 }, hits)
  }

  test("ngramContaminated flags verbatim quotes, exact copies; never clean docs") {
    val evalDoc = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    val evalSet = Seq((900L, evalDoc)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, evalDoc), // exact copy
      // 13-word verbatim quote embedded in unrelated text: jaccard vs the
      // eval doc is low, but the exact n-gram check must flag it
      (2L, "unrelated preamble goes here then " + evalDoc + " and then a very long unrelated tail continues onwards"),
      (3L, "completely different content with no overlap whatsoever in any window"),
      // shares only a 5-word fragment — below the 13-gram bar
      (4L, "alpha beta gamma delta epsilon but then it diverges entirely from the rest here")
    ).toDF("doc_id", "text")
    val got = Dedup.ngramContaminated(corpus, evalSet, "doc_id", "text", n = 13)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L), got.toString)
  }

  test("ngramContaminatedBloom equals the exact check — the bloom is a pre-filter, never the verdict") {
    val evalDoc = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    val evalSet = Seq((900L, evalDoc),
      (901L, "spark shuffle exchange broadcast partition codegen catalyst " +
        "tungsten dataset column row schema plan")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, evalDoc),
      (2L, "unrelated preamble goes here then " + evalDoc + " and a long tail"),
      (3L, "completely different content with no overlap whatsoever in any window"),
      (4L, "alpha beta gamma delta epsilon but then it diverges entirely from here on")
    ).toDF("doc_id", "text")
    val exact = Dedup.ngramContaminated(corpus, evalSet, "doc_id", "text", n = 13)
      .collect().map(_.getLong(0)).toSet
    // a high-fpp filter (50%) forces real false positives through the
    // bloom stage; the trailing semi-join must still discard them
    for (fpp <- Seq(0.5, 0.01)) {
      val bloom = Dedup.ngramContaminatedBloom(corpus, evalSet, "doc_id", "text",
          n = 13, fpp = fpp)
        .collect().map(_.getLong(0)).toSet
      assert(bloom == exact, s"fpp=$fpp: $bloom != $exact")
    }
  }

  test("duplicatedSpans finds maximal duplicated regions, 1-based inclusive") {
    // k=3 grams. Docs 1 and 2 share the 5-word run "one two three four
    // five" (grams at doc-1 positions 2,3,4 → one maximal span), and the
    // isolated 3-word run "x y z" (one gram each). Doc 3 is clean.
    val df = Seq(
      (1L, "a one two three four five b c x y z"),
      (2L, "one two three four five q r s t u v w x y z"),
      (3L, "nothing here repeats at all in any window of three")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(df, "doc_id", "text", k = 3)
      .orderBy("id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      // doc 1: tokens 2..6 = "one..five", tokens 9..11 = "x y z"
      (1L, 2, 6, 5), (1L, 9, 11, 3),
      // doc 2: tokens 1..5, tokens 13..15
      (2L, 1, 5, 5), (2L, 13, 15, 3)), got.toSeq.toString)
  }

  test("duplicatedSpans merges touching windows and catches within-doc repeats") {
    // The 3-gram "p q r" occurs twice WITHIN one doc (positions 1 and 4,
    // gap = k → windows touch → one merged span covering tokens 1..6).
    val df = Seq((7L, "p q r p q r tail words here")).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(df, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq == Seq((7L, 1, 6, 6)), got.toSeq.toString)
  }

  test("removeDuplicatedSpans cuts the spans, keeps unique content, never loses docs") {
    val df = Seq(
      (1L, "a one two three four five b c"),
      (2L, "one two three four five q r s"),
      (3L, "fully unique text with nothing repeated anywhere at all"),
      (4L, "one two three four five"),   // entirely duplicated
      (5L, "one two three four five")
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(df, "doc_id", "text", k = 3)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got(0) == (1L, 3L, "a b c"), got(0).toString)
    assert(got(1) == (2L, 3L, "q r s"), got(1).toString)
    assert(got(2)._2 == 9L, got(2).toString)          // untouched
    // fully-duplicated docs come back EMPTY, not missing
    assert(got(3) == (4L, 0L, ""), got(3).toString)
    assert(got(4) == (5L, 0L, ""), got(4).toString)
  }

  test("duplicatedSpanFrac covers every doc; zero for clean docs") {
    val df = Seq(
      (1L, "one two three four five"),
      (2L, "one two three four five"),
      (3L, "totally unique text with no duplication anywhere")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpanFrac(df, "doc_id", "text", k = 3)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 5L, 5L, 1000000L), (2L, 5L, 5L, 1000000L), (3L, 7L, 0L, 0L)),
      got.toSeq.toString)
  }

  test("minhash store lifecycle: persist, reload, dedup a new batch, append") {
    val dir = java.nio.file.Files.createTempDirectory("mh_store_spec_")
    try {
      val path = dir.resolve("bands").toString
      val base = Seq(
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "completely different historical content nothing like the rest here")
      ).toDF("doc_id", "text")
      Dedup.minhashStoreWrite(base, "doc_id", "text", path)
      // new batch: one exact clone of doc 1, one novel doc
      val batch = Seq(
        (100L, "the quick brown fox jumps over the lazy dog again and again"),
        (101L, "utterly novel text sharing no shingles with anything stored before")
      ).toDF("doc_id", "text")
      val hits = Dedup.minhashStoreCandidates(batch, "doc_id", "text", path)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hits == Set((100L, 1L)), hits.toString)
      // APPEND the batch's own bands (per-doc signatures never
      // invalidate existing rows) — the NEXT batch then dedups against
      // base + batch, with neither corpus's text re-read
      Dedup.minhashStoreAppend(batch, "doc_id", "text", path)
      val next = Seq((200L,
        "utterly novel text sharing no shingles with anything stored before"))
        .toDF("doc_id", "text")
      val hits2 = Dedup.minhashStoreCandidates(next, "doc_id", "text", path)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hits2 == Set((200L, 101L)), hits2.toString)
    } finally {
      import java.nio.file.{Files, Path}
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach((p: Path) => { Files.deleteIfExists(p); () })
    }
  }

  test("hot-bucket cap: over-cap buckets emit a star; sub-cap buckets are bit-identical to uncapped") {
    // 8 identical boilerplate docs (ids 10..17: every band's bucket has
    // m=8 members) planted next to the regular corpus; cap at 4
    val boiler = (10L to 17L).map(i =>
      (i, "shared boilerplate navigation header footer copyright menu text body"))
    val df = corpus.unionByName(boiler.toDF("doc_id", "text"))
    val capped = Dedup.minhashCandidates(df, "doc_id", "text", maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.minhashCandidates(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val isBoiler = (id: Long) => id >= 10L
    // the hot clique degrades to the m-1 star around its min id...
    val star = (11L to 17L).map(i => (10L, i)).toSet
    assert(capped.filter(p => isBoiler(p._1) || isBoiler(p._2)) == star,
      capped.toString)
    // ...and every sub-cap candidate is EXACTLY what the uncapped join
    // produces (no verified pair lost below the cap)
    assert(capped.filterNot(p => isBoiler(p._1) || isBoiler(p._2)) ==
      uncapped.filterNot(p => isBoiler(p._1) || isBoiler(p._2)))
    assert(uncapped.filter(p => isBoiler(p._1) && isBoiler(p._2)).size == 28) // C(8,2)
    // the star still merges the clique under connected components, and
    // verification passes (identical docs: jaccard 1.0)
    val nd = Dedup.minhashNearDups(df, "doc_id", "text", threshold = 0.5,
      maxBucket = 4)
    val cl = Dedup.clusters(nd.select("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((10L to 17L).map(cl).toSet.size == 1, cl.toString)
  }

  test("store-candidates cap: a hot store bucket answers with its maxBucket lowest ids") {
    val dir = java.nio.file.Files.createTempDirectory("mh_storecap_spec_")
    try {
      val path = dir.resolve("bands").toString
      // store: 6 identical docs (one hot bucket per band) + 1 distinct
      val base = ((1L to 6L).map(i =>
        (i, "identical stored boilerplate page body repeated across the crawl")) :+
        (7L, "completely different historical content nothing like the rest"))
        .toDF("doc_id", "text")
      Dedup.minhashStoreWrite(base, "doc_id", "text", path)
      val batch = Seq((100L,
        "identical stored boilerplate page body repeated across the crawl"))
        .toDF("doc_id", "text")
      val capped = Dedup.minhashStoreCandidates(batch, "doc_id", "text", path,
        maxBucket = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // deterministic representatives: the 3 LOWEST store ids
      assert(capped == Set((100L, 1L), (100L, 2L), (100L, 3L)), capped.toString)
      // below the cap the join is identical to uncapped
      val full = Dedup.minhashStoreCandidates(batch, "doc_id", "text", path)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(full == (1L to 6L).map((100L, _)).toSet, full.toString)
    } finally {
      import java.nio.file.{Files, Path}
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach((p: Path) => { Files.deleteIfExists(p); () })
    }
  }

  test("utf8 entries: literals parse byte-exact and planted pairs surface (r13)") {
    // encoding guard: if scalac ever reads sources with the POSIX
    // platform charset instead of the pinned -encoding UTF-8, the
    // multilingual fixture would silently mangle to '?' and the UTF-8
    // entries would test nothing — fail HERE, at the spec, instead
    assert("中".codePointAt(0) == 0x4e2d, "CJK literal mangled")
    assert("😀".length == 2 && "😀".charAt(0) == '\ud83d', "emoji literal mangled")
    assert("é".codePointAt(0) == 0xe9, "precomposed accent mangled")
    // planted structure is non-vacuous in all three UTF-8 entries
    val mh = graft.SparkEntry.queries("dedup_minhash_utf8")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.contains((3000001L, 3000002L)), "CJK clone pair missing from minhash candidates")
    assert(mh.contains((3000012L, 3000013L)), "empty/whitespace pair missing from minhash candidates")
    val sh = graft.SparkEntry.queries("dedup_simhash_utf8")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(sh.contains((3000008L, 3000009L, 0)), "emoji clone pair missing from simhash pairs")
    assert(sh.contains((3000010L, 3000011L, 0)), "combining-mark clone pair missing from simhash pairs")
    val wn = graft.SparkEntry.queries("dedup_winnow_utf8")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(wn.contains((3000004L, 3000005L, 1.0)), "kana clone pair missing from winnow pairs")
    assert(wn.contains((3000012L, 3000013L, 1.0)),
      "empty + whitespace-only docs must pair at jaccard 1.0 (the n=0 Array(0L) fingerprint)")
  }

  test("minhash signature is an ordered numHashes-length array, deterministic") {
    val a = Dedup.minhashSignatures(corpus, "doc_id", "text", numHashes = 16).collect()
    val b = Dedup.minhashSignatures(corpus, "doc_id", "text", numHashes = 16).collect()
    assert(a.forall(_.getSeq[Long](1).length == 16))
    assert(a.map(r => (r.getLong(0), r.getSeq[Long](1))).toSet ==
      b.map(r => (r.getLong(0), r.getSeq[Long](1))).toSet)
    // identical docs share identical signatures
    val sigs = a.map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(sigs(1L) == sigs(2L))
  }
}

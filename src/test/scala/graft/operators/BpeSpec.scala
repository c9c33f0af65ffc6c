package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the BPE induction conventions the DuckDB oracle unrolls
  * (operators/Bpe.scala): overlapping pair counts, (cnt DESC, l, r)
  * tie-break, and left-to-right non-overlapping merge application. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def merge(word: String, l: String, r: String): Seq[String] =
    Seq(word).toDF("word")
      .select(Bpe.applyMerge(
        array_remove(split(col("word"), ""), ""), l, r).as("out"))
      .collect().head.getSeq[String](0)

  test("applyMerge: left-to-right non-overlapping on runs") {
    assert(merge("aaa", "a", "a") == Seq("aa", "a"))
    assert(merge("aaaa", "a", "a") == Seq("aa", "aa"))
    assert(merge("aaaaa", "a", "a") == Seq("aa", "aa", "a"))
  }

  test("applyMerge: merged symbol never chains into the same pass") {
    // after (a,b) -> ab, the new tail "ab" must not act as `a` for a
    // following b
    assert(merge("abb", "a", "b") == Seq("ab", "b"))
    assert(merge("abab", "a", "b") == Seq("ab", "ab"))
  }

  test("applyMerge: non-matching symbols pass through untouched") {
    assert(merge("xayb", "a", "b") == Seq("x", "a", "y", "b"))
  }

  test("pair counts are corpus-weighted and overlapping") {
    val words = Seq(("aaa", 2L), ("ab", 3L)).toDF("word", "wcount")
    val counts = Bpe.pairCounts(Bpe.initialSymbols(words))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // "aaa" contributes (a,a) TWICE (overlapping) x weight 2 = 4
    assert(counts == Set(("a", "a", 4L), ("a", "b", 3L)), counts.toString)
  }

  test("learnMerges: deterministic ranks, second-order merges build on earlier symbols") {
    // corpus where (a,b)->ab wins first, then (ab,c)->abc second
    val words = Seq(("abc", 5L), ("abd", 3L), ("zz", 1L)).toDF("word", "wcount")
    val (merges, fin) = Bpe.learnMerges(words, numMerges = 2)
    assert(merges.map(m => (m.rank, m.left, m.right, m.pairCount)) ==
      Seq((1, "a", "b", 8L), (2, "ab", "c", 5L)), merges.toString)
    val syms = fin.orderBy("word").select("syms")
      .collect().map(_.getSeq[String](0)).toSeq
    assert(syms == Seq(Seq("abc"), Seq("ab", "d"), Seq("z", "z")), syms)
  }

  test("learnMerges: stops early when no adjacent pairs remain") {
    val words = Seq(("a", 5L), ("b", 3L)).toDF("word", "wcount")
    val (merges, _) = Bpe.learnMerges(words, numMerges = 4)
    assert(merges.isEmpty)
  }

  test("tie-break: equal counts resolve by (left, right) ascending") {
    // (a,b) and (c,d) both appear once; (a,b) must win rank 1
    val words = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "wcount")
    val (merges, _) = Bpe.learnMerges(words, numMerges = 1)
    assert(merges.head.left == "a" && merges.head.right == "b")
  }

  test("batched rounds are bit-identical to serial on the fixture corpus") {
    // the exactness claim behind the O(merges/batch) round count: the
    // disjoint-prefix + strict-boundary rules must reproduce the serial
    // algorithm's merge table EXACTLY, ranks, pairs and counts — on the
    // real fixture vocabulary, not a toy
    val words = Bpe.wordCounts(
      graft.sources.Tables.load(spark, sf, "documents"), "text")
    val (serial, _) = Bpe.learnMerges(words, numMerges = 16, batch = 1)
    val (batched, _) = Bpe.learnMerges(words, numMerges = 16, batch = 64)
    assert(serial.size == 16, serial.size.toString)
    assert(batched == serial,
      s"batched diverged from serial:\n$batched\nvs\n$serial")
  }

  test("strict-boundary shrink: a tie against a conflicting pair falls back toward serial") {
    // (a,b)=3 tops; (c,d)=2 ties (d,e)=2 which conflicts on d — the
    // batch must NOT accept (c,d) on stale counts (a merged neighbor
    // could have re-ranked it serially), so round 1 accepts only (a,b);
    // the final table still matches serial exactly
    val words = Seq(("ab", 3L), ("cde", 2L)).toDF("word", "wcount")
    val (serial, _) = Bpe.learnMerges(words, numMerges = 3, batch = 1)
    val (batched, _) = Bpe.learnMerges(words, numMerges = 3, batch = 64)
    assert(serial.map(m => (m.rank, m.left, m.right, m.pairCount)) ==
      Seq((1, "a", "b", 3L), (2, "c", "d", 2L), (3, "cd", "e", 2L)))
    assert(batched == serial, batched.toString)
  }

  test("disjoint batch accepts several merges in one round with serial ranks") {
    val words = Seq(("ab", 4L), ("cd", 3L), ("ef", 2L)).toDF("word", "wcount")
    val (batched, fin) = Bpe.learnMerges(words, numMerges = 3, batch = 64)
    assert(batched.map(m => (m.rank, m.left, m.right, m.pairCount)) ==
      Seq((1, "a", "b", 4L), (2, "c", "d", 3L), (3, "e", "f", 2L)))
    val syms = fin.orderBy("word").collect().map(_.getSeq[String](2)).toSeq
    assert(syms == Seq(Seq("ab"), Seq("cd"), Seq("ef")), syms.toString)
  }

  test("batched == serial on a bracketing-aliasing corpus (cross-round symbol re-creation guard)") {
    // adversarial vocabulary for the cross-round leg of rule 1: dense in
    // words whose merge products alias under different bracketings
    // ('abc' reachable as (ab,c) or (a,bc); 'bbc', 'abbc', 'bcc'
    // likewise), with weights staged so batches span rounds where an
    // aliasing candidate can surface mid-list. Batched acceptance must
    // block any pair whose product re-creates an earlier round's symbol
    // (it would add occurrences of the EXISTING symbol and boost stale
    // below-boundary counts); the merge table must stay bit-identical
    // to serial at every batch width.
    val words = Seq(
      ("ab", 100L), ("abc", 90L), ("abcc", 85L), ("zabcc", 80L),
      ("ebc", 75L), ("bcc", 70L), ("abbcc", 65L), ("aabbc", 60L),
      ("bbc", 55L), ("abbc", 50L), ("aabc", 45L), ("zab", 40L),
      ("bc", 35L), ("cab", 30L), ("bca", 25L), ("cba", 20L),
      ("aabbcc", 15L), ("abab", 10L), ("bcbc", 8L), ("ccc", 5L)
    ).toDF("word", "wcount")
    val (serial, _) = Bpe.learnMerges(words, numMerges = 14, batch = 1)
    assert(serial.size == 14, serial.toString)
    for (b <- Seq(2, 4, 64)) {
      val (batched, _) = Bpe.learnMerges(words, numMerges = 14, batch = b)
      assert(batched == serial,
        s"batch=$b diverged from serial:\n$batched\nvs\n$serial")
    }
  }

  test("randomized corpora: batched == serial and every round makes progress") {
    // seeded property sweep over dense small-alphabet vocabularies —
    // the regime where run overlaps, count ties, and bracketing aliases
    // are most likely. Two invariants: (1) the batched table is
    // bit-identical to serial at every width; (2) no round ever accepts
    // zero merges while candidates remain (the k==0 livelock guard in
    // learnMerges asserts this internally — a regression would fail the
    // run loudly instead of hanging the suite).
    val rnd = new scala.util.Random(0x5eed12L)
    for (trial <- 1 to 3) {
      val words = Seq.fill(14) {
        val len = 1 + rnd.nextInt(6)
        val w = Seq.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString
        (w, (1 + rnd.nextInt(50)).toLong)
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
        .toDF("word", "wcount")
      val (serial, _) = Bpe.learnMerges(words, numMerges = 8, batch = 1)
      for (b <- Seq(3, 64)) {
        val (batched, _) = Bpe.learnMerges(words, numMerges = 8, batch = b)
        assert(batched == serial,
          s"trial=$trial batch=$b diverged:\n$batched\nvs\n$serial")
      }
    }
  }

  test("tokenize: in-vocab words reproduce the learned symbolization; OOV words re-merge as far as the ranks reach") {
    val corpus = Seq(("abc", 5L), ("abd", 3L)).toDF("word", "wcount")
    val (merges, fin) = Bpe.learnMerges(corpus, numMerges = 2)
    // merges: (a,b) then (ab,c)
    val docs = Seq(
      (1L, "abc abd"),   // both in-vocab
      (2L, "abx cab")    // OOV: "abx" -> [ab, x]; "cab" -> [c, ab]
    ).toDF("doc_id", "text")
    val got = Bpe.tokenize(docs, "doc_id", "text", merges)
      .orderBy("id", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[String](3)))
      .toSeq
    assert(got == Seq(
      (1L, 0, Seq("abc")), (1L, 1, Seq("ab", "d")),
      (2L, 0, Seq("ab", "x")), (2L, 1, Seq("c", "ab"))), got.toString)
    // in-vocab parity with the learned final symbolization, word by word
    val learned = fin.orderBy("word").select("word", "syms")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val tokenized = got.filter(_._1 == 1L)
    assert(tokenized.map(_._3) == Seq(learned("abc"), learned("abd")))
  }
}

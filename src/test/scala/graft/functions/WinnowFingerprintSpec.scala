package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class WinnowFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def fps(texts: String*): Seq[Seq[Long]] =
    texts.toSeq.toDF("text")
      .select(WinnowFingerprint(col("text"), 8, 4).as("fp"))
      .collect().map(_.getSeq[Long](0)).toSeq

  test("deterministic, sorted, distinct; normalization-insensitive") {
    val Seq(a, b, c) = fps(
      "The quick brown fox jumps over the lazy dog",
      "  the   QUICK brown\tfox jumps over the lazy dog ",
      "The quick brown fox jumps over the lazy dog")
    assert(a == b) // case/whitespace-insensitive via shared normalization
    assert(a == c)
    assert(a == a.sorted && a.distinct == a)
    assert(a.nonEmpty)
  }

  test("winnowing compresses vs raw k-gram count (~2/(w+1) density)") {
    // non-repetitive text: repeated phrases collapse to one distinct
    // fingerprint set and would under-count density
    val doc = (1 to 60).map(i => s"token$i word${i * 7 % 97}").mkString(" ")
    val n = fps(doc).head.size
    val kgrams = doc.length - 8 + 1
    assert(n < kgrams / 2, s"$n fingerprints for $kgrams k-grams — not compressed")
    assert(n > kgrams / 20, s"$n fingerprints for $kgrams k-grams — too sparse")
  }

  test("shared substring of length >= k+w-1 yields a common fingerprint") {
    val core = "identical shared middle section of respectable length"
    val Seq(a, b) = fps(s"prefix one $core suffix alpha", s"totally other $core tail omega")
    assert(a.toSet.intersect(b.toSet).nonEmpty)
  }

  test("short doc (< k chars) yields one whole-text hash") {
    val Seq(a, b, c) = fps("abc", "ABC ", "abd")
    assert(a.size == 1 && a == b)
    assert(a != c)
  }

  test("winnowNearDups finds planted near-duplicates, not unrelated docs") {
    val base = "the training corpus contains many documents and some of them " +
      "are nearly identical apart from small edits at the very end"
    val df = Seq(
      (1L, base),
      (2L, base + " plus a tiny addition"),
      (3L, "an entirely different text about embedding vectors and ann search")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowNearDups(df, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}

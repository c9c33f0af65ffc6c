package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WordShingles must replicate the composed built-in form exactly
  * (lower(trim) → collapse \s+ → split(" ", -1) → n-gram join → distinct):
  * the DuckDB oracles and round-1 hashes are defined against that chain. */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def composed(n: Int) = {
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val toks = split(norm, " ")
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  private val edgeCases = Seq(
    "the quick brown fox jumps",
    "one two",               // fewer than n tokens
    "one",                   // single token
    "",                      // empty
    "   ",                   // spaces only (trimmed to empty)
    "\t\n mixed\tws\n doc ", // non-space whitespace surviving trim
    "UPPER lower MiXeD",
    "dup dup dup dup",       // repeated shingles → distinct
    "a  b   c    d",         // collapsed runs
    "tab\tsep\nnew\rline"
  )

  test("matches the composed built-in chain on edge cases (n=3)") {
    val df = edgeCases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val want = df.select(col("id"), explode(array_distinct(composed(3))).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val got = df.select(col("id"), explode(WordShingles(col("text"), 3)).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(got == want)
  }

  test("matches for n=1 and n=5") {
    val df = edgeCases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(1, 5)) {
      val want = df.select(col("id"), explode(array_distinct(composed(n))).as("s"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      val got = df.select(col("id"), explode(WordShingles(col("text"), n)).as("s"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(got == want, s"n=$n")
    }
  }

  test("stays inside whole-stage codegen") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(explode(WordShingles(col("text"), 3)))
    // codegen'd operators print with a *(stageId) prefix
    val plan = docs.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Generate explode(wordshingles("), plan)
  }
}

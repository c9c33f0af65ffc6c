package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  private def eval(c: org.apache.spark.sql.Column, text: String): Any =
    one(text).select(c.as("v")).head().get(0)

  test("tokenCount: whitespace words") {
    assert(eval(TextAnalysis.tokenCount(col("text")), "a  b\tc\nd") == 4)
    assert(eval(TextAnalysis.tokenCount(col("text")), "   ") == 0)
    assert(eval(TextAnalysis.tokenCount(col("text")), "single") == 1)
  }

  test("subwordCount: alnum runs + symbols") {
    assert(eval(TextAnalysis.subwordCount(col("text")), "ab, cd!") == 4) // ab , cd !
    assert(eval(TextAnalysis.subwordCount(col("text")), "x1y2") == 1)
    assert(eval(TextAnalysis.subwordCount(col("text")), "a-b") == 3)
  }

  test("normalized + fingerprint: case/whitespace insensitive, stable") {
    assert(eval(TextAnalysis.normalized(col("text")), "  Hello   World ") == "hello world")
    val f1 = eval(TextAnalysis.fingerprint(col("text")), "Hello  World")
    val f2 = eval(TextAnalysis.fingerprint(col("text")), "hello world")
    assert(f1 == f2)
    assert(f1.toString.length == 32)
  }

  test("punctRatio") {
    assert(eval(TextAnalysis.punctRatio(col("text")), "ab..") == 0.5)
    assert(eval(TextAnalysis.punctRatio(col("text")), "abcd") == 0.0)
  }

  test("langId picks the language with most stopword hits") {
    assert(eval(TextAnalysis.langId(col("text")),
      "the cat sat on the mat and the dog is in the house") == "en")
    assert(eval(TextAnalysis.langId(col("text")),
      "le chat est dans la maison et les oiseaux dans le jardin") == "fr")
    assert(eval(TextAnalysis.langId(col("text")),
      "el gato es para los perros y una casa en madrid") == "es")
    assert(eval(TextAnalysis.langId(col("text")),
      "der hund und die katze ist ein tier mit fell von berlin") == "de")
    assert(eval(TextAnalysis.langId(col("text")), "xyzzy qwerty plugh") == "und")
  }

  test("qualityScore in [0,1]; long clean English text scores high") {
    val good = "the quick brown fox jumps over the lazy dog and runs to the forest " * 3
    val q = eval(TextAnalysis.qualityScore(col("text")), good).asInstanceOf[Double]
    assert(q >= 0.75 && q <= 1.0)
    val bad = "x! y? z."
    val qb = eval(TextAnalysis.qualityScore(col("text")), bad).asInstanceOf[Double]
    assert(qb < 0.5)
  }

  test("topGramFrac: repetition signal") {
    // "a b a b a" → unigrams: a×3, b×2 of 5 → 0.6; bigrams: "a b"×2,
    // "b a"×2 of 4 → 0.5
    assert(eval(TextAnalysis.topGramFrac(col("text"), 1), "a b a b a") == 0.6)
    assert(eval(TextAnalysis.topGramFrac(col("text"), 2), "a b a b a") == 0.5)
    // all-distinct grams → 1/n
    assert(eval(TextAnalysis.topGramFrac(col("text"), 1), "w x y z") == 0.25)
    // fully repeated text pins to 1.0
    assert(eval(TextAnalysis.topGramFrac(col("text"), 2), "spam spam spam spam") == 1.0)
    // fewer tokens than n → one joined gram → 1.0 (matches the oracle's
    // greatest(len-1, 1) slice form)
    assert(eval(TextAnalysis.topGramFrac(col("text"), 2), "single") == 1.0)
    // normalization contract: case/whitespace collapse like WordShingles
    assert(eval(TextAnalysis.topGramFrac(col("text"), 1), "A  a\ta") == 1.0)
  }

  test("topGramFrac parity with the composed explode/groupBy form") {
    val docs = Seq(
      (1L, "the cat sat on the mat the cat"),
      (2L, "one two three"),
      (3L, "x x x y"),
      (4L, "  padded   text  with   runs  ")).toDF("doc_id", "text")
    val native = docs.select(col("doc_id"),
      TextAnalysis.topGramFrac(col("text"), 2).as("f")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference computation: explode bigrams of the normalized tokens,
    // count per (doc, gram), max/total per doc
    val toks = docs.select(col("doc_id"),
      split(TextAnalysis.normalized(col("text")), " ").as("arr"))
    val grams = toks.select(col("doc_id"),
      explode(expr(
        "transform(sequence(1, greatest(size(arr) - 1, 1)), i -> concat_ws(' ', slice(arr, i, 2)))")).as("g"))
    val ref = grams.groupBy("doc_id", "g").count()
      .groupBy("doc_id").agg((max("count") / sum("count")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(native == ref, s"$native vs $ref")
  }

  test("scrubPii redacts emails before phones; counts match") {
    val t = "mail bob.smith+x@corp.example.org or call +1 (555) 123-4567 now"
    val scrubbed = eval(TextAnalysis.scrubPii(col("text")), t).toString
    assert(scrubbed == "mail <EMAIL> or call <PHONE> now", scrubbed)
    assert(eval(TextAnalysis.emailCount(col("text")), t) == 1)
    assert(eval(TextAnalysis.phoneCount(col("text")), t) == 1)
    // digits inside an email local part must NOT count as a phone
    val t2 = "reach 12345678a9@example.com today"
    assert(eval(TextAnalysis.phoneCount(col("text")), t2) == 0)
    assert(eval(TextAnalysis.scrubPii(col("text")), t2) ==
      "reach <EMAIL> today")
    // no PII → unchanged
    assert(eval(TextAnalysis.scrubPii(col("text")), "plain words only") ==
      "plain words only")
  }

  test("profile produces one row per doc with all features") {
    val df = Seq((1L, "the quick brown fox"), (2L, "le chat est la")).toDF("doc_id", "text")
    val p = TextAnalysis.profile(df, "doc_id", "text").collect()
    assert(p.length == 2)
    assert(p.head.schema.fieldNames.toSeq == Seq(
      "doc_id", "n_chars", "n_tokens", "n_subwords", "fingerprint", "lang_pred",
      "quality", "top_bigram_frac"))
  }

  test("hllSketch: shard sketches merge by element-wise max; duplicates free") {
    val all = (0L until 400L).map(i => (i, s"document number $i unique body"))
    val df = all.toDF("doc_id", "text")
    def sk(d: org.apache.spark.sql.DataFrame): Map[Int, Int] =
      TextAnalysis.hllSketch(d, "text").collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
    val whole = sk(df)
    val left = sk(df.filter(col("doc_id") < 200))
    val right = sk(df.filter(col("doc_id") >= 200))
    // merge = element-wise max over the union of registers
    val merged = (left.keySet ++ right.keySet).map(b =>
      b -> math.max(left.getOrElse(b, 0), right.getOrElse(b, 0))).toMap
    assert(merged == whole, "shard merge != whole-corpus sketch")
    // duplicates never move a register (cardinality, not count)
    val dup = sk(df.union(df))
    assert(dup == whole, "duplicated corpus changed the sketch")
  }

  test("hllEstimate: within tolerance in both regimes, merge-consistent") {
    def est(n: Int): Long = {
      val df = (0 until n).map(i => (i.toLong, s"unique document body $i"))
        .toDF("doc_id", "text")
      TextAnalysis.hllEstimate(TextAnalysis.hllSketch(df, "text"))
    }
    // sparse regime (empty registers -> linear counting): tight
    val e500 = est(500)
    assert(math.abs(e500 - 500) < 500 * 0.10, s"est(500) = $e500")
    // dense regime (classical alpha*m^2/Z): +-1.04/sqrt(256) ~ 6.5%; 3 sigma
    val e20k = est(20000)
    assert(math.abs(e20k - 20000) < 20000 * 0.20, s"est(20000) = $e20k")
    // a merged shard pair estimates like the whole corpus
    val df = (0 until 4000).map(i => (i.toLong, s"unique document body $i"))
      .toDF("doc_id", "text")
    val l = TextAnalysis.hllSketch(df.filter(col("doc_id") < 2000), "text")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val r = TextAnalysis.hllSketch(df.filter(col("doc_id") >= 2000), "text")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val merged = (l.keySet ++ r.keySet).toSeq
      .map(b => (b, math.max(l.getOrElse(b, 0), r.getOrElse(b, 0))))
      .toDF("bucket", "max_rank")
    val whole = TextAnalysis.hllEstimate(TextAnalysis.hllSketch(df, "text"))
    assert(TextAnalysis.hllEstimate(merged) == whole)
  }

  test("lmScore: target-like docs outrank gibberish; backoff ladder holds") {
    // target LM speaks "the cat sat..." bigrams; doc 10 repeats SEEN
    // bigrams (high prob), doc 11 uses seen WORDS in unseen order
    // (unigram backoff), doc 12 is fully out-of-vocabulary (default
    // backoff) — the score must strictly decrease down that ladder.
    val df = Seq(
      (0L, "the cat sat on the mat", true),
      (1L, "the cat ran to the mat", true),
      (10L, "the cat sat on the mat", false),
      (11L, "mat the on cat sat the", false),
      (12L, "zyx wvu tsr qpo nml kji", false)
    ).toDF("doc_id", "text", "is_tgt")
    val got = TextAnalysis.lmScore(df, "doc_id", "text", "is_tgt")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(10L) > got(11L), got.toString)
    assert(got(11L) > got(12L), got.toString)
    // every doc with >= 2 tokens is scored; bigram counts are n-1
    val n = TextAnalysis.lmScore(df, "doc_id", "text", "is_tgt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n.values.toSet == Set(5L), n.toString)
    // deterministic across runs (integer micro-nat algebra)
    val again = TextAnalysis.lmScore(df, "doc_id", "text", "is_tgt")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == again)
  }

  test("fuzzyPairs: typo pairs found within blocks; hot blocks are capped out") {
    // blocks key on substring(text, 6, 16): give every doc a 5-char
    // prefix so the block is the shared body
    def doc(id: Long, prefix: String, body: String) = (id, prefix + body)
    val body = "the quick brown fox jumps over the lazy dog again"
    val rows =
      // typo pair: same block (body chars 1..16), 2 edits total — one
      // in the prefix, one past the block window
      Seq(doc(1L, "AAAA ", body), doc(2L, "AAAB ", body.replace("lazy", "hazy"))) ++
        // a hot block: 70 docs sharing the identical body — boilerplate,
        // above the default maxBlock=64
        (100L until 170L).map(i => doc(i, f"P$i%03d ", "boiler plate body shared by every mirror page exactly"))
    val df = rows.toDF("doc_id", "text")
    val got = TextAnalysis.fuzzyPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // the typo pair survives (2 edits); the hot block contributes NOTHING
    assert(got == Set((1L, 2L, 2)), got.toString)
    // raising the cap above the block size re-admits the boilerplate
    // pairs (identical bodies; texts differ only in the ≤3-digit
    // prefixes, so many pairs land within the distance band) — proving
    // the cap was the binding difference
    val uncapped = TextAnalysis.fuzzyPairs(df, "doc_id", "text", maxBlock = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size > got.size, s"cap was not the binding difference: ${uncapped.size}")
    assert(uncapped.contains((1L, 2L)), uncapped.toString)
  }
}

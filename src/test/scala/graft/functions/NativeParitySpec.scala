package graft.functions

import graft.SparkSpec
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Randomized parity: the native expressions must be row-for-row
  * equivalent to the composed-builtins formulations they replaced (the
  * replacements were for performance — interpreted-eval hot loops — and
  * must never change semantics). Deterministic seeded generator over a
  * hostile character pool: whitespace runs of every `\s` kind, boundary
  * whitespace, empties, unicode, punctuation. */
class NativeParitySpec extends SparkSpec {
  import spark.implicits._

  private val pool: Array[String] = Array(
    "a", "b", "Z", "9", ".", ",", "é", "中", "'", "-",
    " ", "  ", "\t", "\n", "\r", "", "\f", " \t ", "word", "The")

  private def randomTexts(n: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (1L to n.toLong).map { id =>
      val len = rnd.nextInt(40)
      id -> (0 until len).map(_ => pool(rnd.nextInt(pool.length))).mkString
    }
  }

  private lazy val texts = randomTexts(300, seed = 20260812L).toDF("id", "text")

  test("StopwordHits / LangIdExpr == regexp_count formulation (incl. für-style non-word chars)") {
    // stopword-dense pool: real stopwords, prefixes ("an" vs "a"),
    // non-ASCII-inside words ("für"), boundary punctuation
    val swPool = Array("the", "a", "of", "für", "fur", "f", "und", "andy",
      "and", "la", "les", "de", " ", ".", ",", "-", "_", "x", "9", "\t", "ü")
    val rnd = new scala.util.Random(42)
    val swTexts = (1L to 300L).map { id =>
      id -> (0 until rnd.nextInt(30)).map(_ => swPool(rnd.nextInt(swPool.length))).mkString
    }.toDF("id", "text")
    for ((_, words) <- TextAnalysis.stopwords) {
      val pat = "\\b(" + words.mkString("|") + ")\\b"
      val rows = swTexts.select(
        StopwordHits(col("text"), words).as("native"),
        regexp_count(lower(col("text")), lit(pat)).as("regex")).collect()
      rows.foreach(r => assert(r.getInt(0) == r.getInt(1), s"words=$words row=$r"))
    }
    // langId parity vs the original CASE-chain formulation
    val scores = TextAnalysis.stopwords.map { case (lang, words) =>
      lang -> regexp_count(lower(col("text")), lit("\\b(" + words.mkString("|") + ")\\b"))
    }
    val maxScore = greatest(scores.map(_._2): _*)
    val caseChain = scores.foldRight(lit("und")) { case ((lang, s), elseCol) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(elseCol)
    }
    val cmp = swTexts.select(
      graft.functions.LangIdExpr(col("text"), TextAnalysis.stopwords).as("native"),
      caseChain.as("regex")).collect()
    cmp.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("WordShingles == composed builtins (distinct n-gram HOF form) for n in 1..5") {
    for (n <- Seq(1, 2, 3, 5)) {
      val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
      val toks = split(norm, " ")
      val grams = when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      val composed = texts.select(col("id"), explode(array_distinct(grams)).as("s"))
      val native = texts.select(col("id"), explode(WordShingles(col("text"), n)).as("s"))
      assert(composed.exceptAll(native).count() == 0, s"composed-only rows at n=$n")
      assert(native.exceptAll(composed).count() == 0, s"native-only rows at n=$n")
    }
  }

  test("TopGramFrac == composed explode/groupBy formulation for n in 1..3") {
    for (n <- Seq(1, 2, 3)) {
      val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
      val toks = split(norm, " ")
      val grams = when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      val composed = texts.select(col("id"), explode(grams).as("g"))
        .groupBy("id", "g").count()
        .groupBy("id").agg((max("count") / sum("count")).as("f"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val native = texts.select(col("id"),
        TopGramFrac(col("text"), n).as("f"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(native == composed, s"n=$n")
    }
  }

  test("SimHashText == batch simhash aggregate on random texts") {
    val batch = Dedup.simhash(texts, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perRow = texts.select(col("id"), SimHashText(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow == batch)
  }

  test("SignPack == 32-term CASE/element_at composition on hostile vectors") {
    // vectors with exact zeros (sign = not positive), negatives, NULL
    // elements, and short arrays (dims past the end pack as 0)
    val rnd = new scala.util.Random(7L)
    val vecs = (1L to 200L).map { id =>
      val len = if (id % 5 == 0) rnd.nextInt(64) else 64
      id -> Array.tabulate(len) { _ =>
        rnd.nextInt(5) match {
          case 0 => 0.0f
          case 1 => -rnd.nextFloat()
          case _ => rnd.nextFloat() - 0.4f
        }
      }
    }.toDF("id", "v")
    for (lo <- Seq(0, 32)) {
      // try_element_at, not element_at: the short-array rows index past
      // the end, which yields NULL (-> otherwise-0) under the permissive
      // leg but THROWS under the engine's ANSI default — try_element_at
      // is the mode-independent spelling of "dims past the end pack as 0"
      val composed = (lo until lo + 32).map { d =>
        when(try_element_at(col("v"), lit(d + 1)) > 0f,
          lit(1L << (d - lo))).otherwise(0L)
      }.reduce(_ + _)
      val rows = vecs.select(
        org.apache.spark.sql.graft.shim.column(
          SignPack(org.apache.spark.sql.graft.shim.expression(col("v")), lo)).as("native"),
        composed.as("composed")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"lo=$lo row=$r"))
    }
  }

  test("NfcNormalize: canonical equivalence, idempotence, ASCII identity") {
    val decomposed = "é Ä plain ﬁ"   // combining marks + a ligature
    val precomposed = "é Ä plain ﬁ"    // é Ä; ﬁ untouched (NFC != NFKC)
    val rows = Seq((1L, decomposed), (2L, precomposed), (3L, "plain ascii"))
      .toDF("id", "t")
      .select(col("id"), NfcNormalize(col("t")).as("n"), col("t"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows(1L)._1 === precomposed, "decomposed must compose to NFC")
    assert(rows(2L)._1 === rows(2L)._2, "already-NFC input unchanged")
    assert(rows(3L)._1 === rows(3L)._2, "ASCII fast path is identity")
    // idempotence: normalize twice == once
    val twice = Seq((1L, decomposed)).toDF("id", "t")
      .select(NfcNormalize(NfcNormalize(col("t")))).head().getString(0)
    assert(twice === precomposed)
  }

  test("WinnowFingerprint invariant under case and internal-space doubling") {
    // (note: winnow(normalized(text)) is NOT the invariant — normalization
    // is deliberately single-pass, boundary `\t` becomes a boundary space
    // that a second trim would strip; same contract as WordShingles)
    val doubled = texts.select(col("id"),
      regexp_replace(upper(col("text")), " ", "  ").as("text"))
    val a = texts.select(col("id"), WinnowFingerprint(col("text"), 8, 4).as("fp"))
    val b = doubled.select(col("id"), WinnowFingerprint(col("text"), 8, 4).as("fp"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}

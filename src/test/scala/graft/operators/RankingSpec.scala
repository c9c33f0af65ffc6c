package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-corpus semantics for the TF-IDF keyword extractor and the BM25
  * ranker (the gate entries hash-match DuckDB on the fixture corpus; here
  * we pin the RANKING behavior on corpora built to have a known answer).
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("tfIdfTopTerms: a term unique to one doc is that doc's top term") {
    val df = Seq(
      (0L, "common common common zebra"),
      (1L, "common common filler filler"),
      (2L, "common filler other words here")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopTerms(df, "doc_id", "text", k = 1)
      .filter(col("doc_id") === 0L).head()
    // 'common' appears in every doc => idf = ln(1) = 0; 'zebra' is unique
    assert(top.getString(1) === "zebra")
    val all = TextAnalysis.tfIdfTopTerms(df, "doc_id", "text", k = 3)
      .collect()
    // ranks are 1..k, deterministic under term-text tie-break
    assert(all.forall(r => r.getInt(3) >= 1 && r.getInt(3) <= 3))
  }

  test("tfIdfTopTerms: everywhere-terms score exactly zero") {
    val df = Seq(
      (0L, "alpha beta"),
      (1L, "alpha gamma")).toDF("doc_id", "text")
    val scores = TextAnalysis.tfIdfTopTerms(df, "doc_id", "text", k = 2)
      .filter(col("term") === "alpha")
      .select("score_micro").as[Long].collect()
    assert(scores.forall(_ === 0L))
  }

  test("bm25Rank: the doc matching more query terms outranks (idf equal)") {
    val df = Seq(
      (0L, "spark hash window filler filler"),
      (1L, "spark filler filler filler filler"),
      (2L, "filler filler filler filler filler"),
      (3L, "spark hash filler filler filler")).toDF("doc_id", "text")
    val r = TextAnalysis.bm25Rank(df, "doc_id", "text",
      Seq("spark", "hash", "window"), topN = 10).collect()
    // doc 2 has no query term: absent from the ranking entirely
    assert(!r.exists(_.getLong(0) === 2L))
    val byRank = r.sortBy(_.getInt(2)).map(_.getLong(0)).toSeq
    // equal dl everywhere, so more matched terms = strictly higher score
    assert(byRank === Seq(0L, 3L, 1L))
  }

  test("bm25Rank: length normalization prefers the shorter doc at equal tf") {
    val df = Seq(
      (0L, "spark filler"),
      (1L, "spark filler filler filler filler filler filler filler"))
      .toDF("doc_id", "text")
    val byRank = TextAnalysis.bm25Rank(df, "doc_id", "text", Seq("spark"))
      .collect().sortBy(_.getInt(2)).map(_.getLong(0)).toSeq
    assert(byRank === Seq(0L, 1L))
  }

  test("bm25Rank rejects an empty term set") {
    val df = Seq((0L, "a")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException] {
      TextAnalysis.bm25Rank(df, "doc_id", "text", Seq.empty)
    }
  }

  test("bm25Rank: edge-whitespace docs carry the explode-path document length") {
    // r15 (advisor): dl = tokenCount(text) diverged from the token
    // explode on edge whitespace — SQL trim() strips only ASCII spaces
    // and split's limit=-1 keeps a trailing empty token, so 'spark hash\n'
    // counted dl=3 (true token count 2) and a tabs/newlines-only doc got
    // dl=2 > 0 and entered n/sum_dl. dl over normalized(text) restores
    // exact parity; this pins both failure modes.
    val df = Seq(
      (0L, "spark hash\n"),        // trailing newline
      (1L, " spark\thash"),        // leading space + tab separator
      (2L, "\t\n \n"),             // whitespace-only: must not enter n/sum_dl
      (3L, "spark hash"),          // the clean twin of docs 0 and 1
      (4L, "spark filler filler")) // different length, anchors avgdl
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25Rank(df, "doc_id", "text",
        Seq("spark", "hash"), topN = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical token content => identical dl => identical score
    assert(out(0L) == out(3L), out.toString)
    assert(out(1L) == out(3L), out.toString)
    // the whitespace-only doc contributes nothing to n / sum_dl: scores
    // must equal those computed on the corpus without it
    val without = TextAnalysis.bm25Rank(
        df.filter(col("doc_id") =!= 2L), "doc_id", "text",
        Seq("spark", "hash"), topN = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == without, s"got $out vs $without")
  }
}

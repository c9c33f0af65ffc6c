package graft

/** ANSI-mode contract: the engine's sessions pin
  * `spark.sql.ansi.enabled=false` (the reference's permissive coercion
  * — malformed casts → NULL), but Spark 4 DEFAULTS ANSI ON, so a user
  * running entries in a stock session must get the SAME answers or the
  * library silently diverges on 0-division/overflow/bad-cast edges.
  *
  * The full-suite evidence is the round-10 experiment recorded in
  * PERF.md: `SPARK_GRAFT_ANSI=true graft.Verify` at sf0.001 — all 245
  * entries ran without error and compared bit-identical to the
  * ansi=false dump (tools/compare_dumps.py, 245 identical / 0
  * different). This spec keeps the contract from regressing by
  * re-running the DIVISION/CAST-HEAVIEST entries under a live ANSI
  * session every build: each is the kind of query where an unguarded
  * `x / y` or NaN cast either throws (DIVIDE_BY_ZERO, CAST_INVALID_
  * INPUT) or changes values under ANSI. Guarded arithmetic is the
  * house style (`when(y > 0, ...)`, HAVING-mirrored filters); this is
  * the regression tripwire for the next entry that forgets it.
  */
class AnsiParitySpec extends SparkSpec {

  // the risky set: per-doc ratios, corpus divisions, NaN-prone stats,
  // integer-micro quantizations of quotients
  private val risky = Seq(
    "sample_epoch_plan",      // per-source ceil(target/tok) — the r10 guard
    "stats_signal_corr",      // correlation: 0-variance division guards
    "corpus_length_gini",     // gini: sum/mean quotients
    "text_ttr",               // type-token ratio per doc
    "dedup_substring_frac",   // dup_words / n_tokens
    "quality_decile_bins",    // ntile-free histogram cut arithmetic
    "events_rate_anomaly",    // rate z-scores: stddev division
    "text_quality_score",     // length/punct/stopword ratios
    "corpus_source_kl",       // log(p/q) with smoothing
    "sample_temperature",     // pow(tok/total, alpha) weight algebra
    "text_bpe_fertility",     // tokens/words per rank
    "vocab_coverage",         // coverage fractions
    "stats_zipf_fit",         // OLS slope: moment-sum division
    "emb_participation_ratio", // (Σv)²/Σv² with the svv > 0 guard
    "retrieval_rrf_hybrid")   // integral div fusion (div vs //)

  test("division/cast-heavy entries return identical rows under a default (ANSI) Spark 4 session") {
    val ansi = spark.newSession()
    ansi.conf.set("spark.sql.ansi.enabled", "true")
    assert(spark.conf.get("spark.sql.ansi.enabled") == "false",
      "base spec session must stay non-ANSI — newSession isolation broke")
    for (name <- risky) {
      val fn = SparkEntry.queries(name)
      val plain = fn(spark, sf).collect().map(_.toString).sorted.toSeq
      val strict =
        try fn(ansi, sf).collect().map(_.toString).sorted.toSeq
        catch {
          case e: Throwable =>
            fail(s"$name THREW under ANSI mode: ${e.getMessage}")
        }
      assert(plain.nonEmpty, s"$name returned no rows — vacuous parity")
      assert(strict == plain,
        s"$name diverges under ANSI: ${strict.size} vs ${plain.size} rows; " +
          s"first diff ${strict.zip(plain).find(p => p._1 != p._2)}")
    }
  }
}

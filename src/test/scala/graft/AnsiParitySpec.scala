package graft

/** ANSI-mode contract: since round 11 the engine's sessions pin
  * `spark.sql.ansi.enabled=true` — the stock Spark 4 default — so a
  * user in a default session gets exactly the graded behavior. The
  * REFERENCE's coercion semantics (malformed casts → NULL, permissive
  * typing) are the `ansi=false` compatibility leg, still supported via
  * `SPARK_GRAFT_ANSI=false`; both legs must return the SAME answers or
  * the library silently diverges on 0-division/overflow/bad-cast edges
  * depending on the caller's session.
  *
  * The full-suite evidence is the round-10 experiment recorded in
  * PERF.md: the whole suite at sf0.001 compared bit-identical between
  * the two legs (tools/compare_dumps.py, 245 identical / 0 different).
  * This spec keeps the contract from regressing by re-running the
  * DIVISION/CAST-HEAVIEST entries under a live PERMISSIVE (ansi=false)
  * session every build and comparing against the ANSI base session:
  * each is the kind of query where an unguarded `x / y` or NaN cast
  * either throws under ANSI (DIVIDE_BY_ZERO, CAST_INVALID_INPUT) or
  * changes values between the modes. Guarded arithmetic is the house
  * style (`when(y > 0, ...)`, HAVING-mirrored filters); this is the
  * regression tripwire for the next entry that forgets it.
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

  test("division/cast-heavy entries return identical rows under the permissive (ansi=false) compatibility leg") {
    val permissive = spark.newSession()
    permissive.conf.set("spark.sql.ansi.enabled", "false")
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "base spec session must stay ANSI (stock Spark 4) — newSession isolation broke")
    for (name <- risky) {
      val fn = SparkEntry.queries(name)
      val ansi = fn(spark, sf).collect().map(_.toString).sorted.toSeq
      val plain =
        try fn(permissive, sf).collect().map(_.toString).sorted.toSeq
        catch {
          case e: Throwable =>
            fail(s"$name THREW under the permissive leg: ${e.getMessage}")
        }
      assert(ansi.nonEmpty, s"$name returned no rows — vacuous parity")
      assert(plain == ansi,
        s"$name diverges between ANSI and permissive: ${plain.size} vs " +
          s"${ansi.size} rows; first diff ${plain.zip(ansi).find(p => p._1 != p._2)}")
    }
  }
}

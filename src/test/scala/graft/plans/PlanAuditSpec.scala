package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins the 100 TB plan-shape claims as regression-tested facts — the
  * properties PERF.md/SURVEY.md assert about the flagship plans (pushed
  * scan filters, broadcast dimension joins, top-k without a global sort,
  * exchange reuse across self-joins) are checked against the EXECUTED
  * plan, so an operator rewrite that silently de-optimizes a plan fails
  * a spec instead of a future benchmark.
  */
class PlanAuditSpec extends SparkSpec {

  /** Executed plan text, truncated to the AQE FINAL section (the adaptive
    * plan string appends the pre-execution "Initial Plan", which would
    * double-count scans/exchanges). collect() executes THIS QueryExecution
    * so runtime reuse/broadcast decisions are visible. */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def q(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, sf)

  test("consume offset window pushes offset bounds into the parquet scan") {
    // r14: `fluvio_consume` routes through the DSv2 batch face, where the
    // `--start 100 --end 299` window resolves BIND-TIME inside the source
    // (segment-level planning — the DSv2 analog of the file path's pushed
    // event_id bounds this test used to pin). Pin the new shape: one
    // BatchScan carrying the cmd window, no parquet FileScan, and the
    // scan itself emitting exactly the 200-row window (planned range,
    // never deliver-then-filter).
    val df = q("offset_end_bound") // --start 100 --end 299
    val plan = finalPlan(df)
    assert("BatchScan fluvio_consume\\(events\\)".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("CmdWindow: start=Absolute(100) end=299"), plan)
    assert(!plan.contains("FileScan parquet"), plan)
    val executed = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scanRows = executed.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.metrics("numOutputRows").value
    }
    assert(scanRows == Seq(200L),
      s"scan should emit exactly the 200-row window, got $scanRows\n$plan")
  }

  test("q5: every dimension join broadcasts; no sort-merge join") {
    val plan = finalPlan(q("q5_local_supplier"))
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 5, s"expected >=5 broadcast joins, got $bhj\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
    // the region filter reaches the scan
    assert(plan.contains("EqualTo(r_name,ASIA)"), plan)
  }

  test("exact cosine top-k is TakeOrderedAndProject — no global sort, no shuffle") {
    val plan = finalPlan(q("emb_cosine_topk"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), s"top-k should be shuffle-free\n$plan")
  }

  test("clean-corpus pipeline: one fingerprint shuffle, one corpus scan") {
    for (name <- Seq("pipeline_clean_corpus", "pipeline_clean_corpus_v2")) {
      val plan = finalPlan(q(name))
      val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(hashEx <= 1, s"$name: expected <=1 hash exchange, got $hashEx\n$plan")
      assert("FileScan parquet".r.findAllIn(plan).size == 1, s"$name\n$plan")
    }
  }

  test("v3+ clean stacks / corpus reports: one checkpointed corpus projection, no documents re-scan") {
    // r15: every aux gate reads the per-invocation localCheckpoint of the
    // narrow corpus projection — the FINAL plan must contain no scan of
    // the documents parquet at all (the one corpus scan happens in the
    // checkpoint job; the only FileScans left are the tiny persisted LM
    // model tables). Before this pin, v5 re-scanned the corpus ~8 times.
    for (name <- Seq("pipeline_clean_corpus_v3", "pipeline_clean_corpus_v4",
        "pipeline_clean_corpus_v5", "corpus_curation_report",
        "corpus_report")) {
      val plan = finalPlan(q(name))
      assert(!plan.contains("documents.parquet"),
        s"$name re-scans the documents parquet in its final plan\n$plan")
    }
  }

  test("SQ8 top-k: byte-scan shortlist and rerank are both TakeOrderedAndProject, no global sort") {
    val plan = finalPlan(q("emb_sq8_topk"))
    assert("TakeOrderedAndProject".r.findAllIn(plan).size >= 1, plan)
    assert(!plan.contains("Sort ["), s"SQ8 planned a global sort\n$plan")
  }

  test("semanticDedup: the cell-assignment self-join reuses the exchange (one scan, one shuffle)") {
    // the exchange-reuse fix pinned: both join sides must come from ONE
    // scan + cell-assignment + shuffle (renaming after the join keeps
    // the Exchange children canonically equal)
    val plan = finalPlan(q("semdedup_drops"))
    assert(plan.contains("ReusedExchange") ||
      "Exchange hashpartitioning".r.findAllIn(plan).size <= 2, // join sides 1 + distinct 1
      s"semanticDedup re-computed the cell pipeline per join side\n$plan")
    assert("FileScan parquet".r.findAllIn(plan).size <= 2, // corpus + clones read
      s"expected at most 2 scans (corpus + clone filter)\n$plan")
  }

  test("asof/range joins never plan a nested-loop join") {
    val asof = finalPlan(q("join_asof"))
    assert(!asof.contains("BroadcastNestedLoopJoin") &&
      !asof.contains("CartesianProduct"), asof)
    assert(asof.contains("Window"), asof) // the one-window formulation
    val range = finalPlan(q("join_range"))
    assert(!range.contains("BroadcastNestedLoopJoin") &&
      !range.contains("CartesianProduct"), range)
    // the join is the binned equi-join
    assert(range.contains("__bin"), range)
    // skew-safe asof: every event-sized window partitions by (key, bucket)
    // — the only per-key sort runs over the one-row-per-bucket carry table
    val skew = finalPlan(q("join_asof_skew"))
    assert(!skew.contains("BroadcastNestedLoopJoin") &&
      !skew.contains("CartesianProduct"), skew)
    assert(skew.contains("__b"), skew)
  }

  test("sessionize: both windows share ONE key shuffle + sort") {
    val plan = finalPlan(q("sessionize"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, // the key window + the summary groupBy
      s"expected <=2 hash exchanges (window, summary agg), got $exchanges\n$plan")
    // the break-flag and running-sum windows must share ONE (key, ts)
    // sort (the other Sort in the plan is the query's output orderBy)
    val windowSorts = "Sort \\[user_id[^\\]]*event_id".r.findAllIn(plan).size
    assert(windowSorts == 1,
      s"the two windows must share one (key, ts) sort, got $windowSorts\n$plan")
  }

  test("PQ top-k: ADC shortlist and rerank are both TakeOrderedAndProject, no global sort") {
    val plan = finalPlan(q("emb_pq_topk"))
    val topk = "TakeOrderedAndProject".r.findAllIn(plan).size
    assert(topk == 2, s"expected shortlist + rerank TakeOrdered, got $topk\n$plan")
    // the candidate scan must not shuffle or re-sort the corpus
    assert(!plan.contains("Exchange rangepartitioning"),
      s"PQ shortlist planned a global sort\n$plan")
  }

  test("PQ materialized-index entry: rerank fetch pushes shortlist ids into the vector scan") {
    // the entry's ADC stage runs eagerly on the encoded parquet (its
    // no-fp32-column scan is pinned in PqSpec); the RETURNED plan is the
    // exact rerank, which must fetch by pushed id filter, not a corpus scan
    val plan = finalPlan(q("emb_pq_scan_topk"))
    assert(plan.contains("In(vec_id"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("IVF materialized-index entry: probe filter is a PARTITION filter on the index scan") {
    val plan = finalPlan(q("emb_ivf_part_topk"))
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined, plan)
  }

  test("reloaded-model entries keep the deployment plan shape: pushed ids (PQ/SQ8), partition probe (IVF)") {
    // same machinery as the scan/part pins, but driven entirely from a
    // RELOADED AnnModels model — a load-path regression (wrong codebook
    // order, dropped norm column) would change these shapes or the oracle
    val pq = finalPlan(q("emb_pq_model_topk"))
    assert(pq.contains("In(vec_id"), pq)
    assert(pq.contains("TakeOrderedAndProject"), pq)
    val sq = finalPlan(q("emb_sq8_model_topk"))
    assert(sq.contains("In(vec_id"), sq)
    val ivf = finalPlan(q("emb_ivf_model_topk"))
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(ivf).isDefined, ivf)
  }

  test("appended index keeps the partition probe over BOTH file generations") {
    // the append lifecycle writes a second generation of files into the
    // existing cell=N directories; the query must still plan the probe as
    // a PARTITION filter (pruning at listing time covers both
    // generations), not degrade to a post-scan filter
    val plan = finalPlan(q("emb_ivf_append_topk"))
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined, plan)
  }

  test("n-gram contamination never plans a nested-loop join; one scan per side") {
    val plan = finalPlan(q("dedup_contam_ngram"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    // LEFT SEMI on the gram: either broadcast (AQE, small eval side) or
    // shuffled hash/SMJ — any equi-join form is fine, nested-loop is not
    assert(plan.contains("LeftSemi"), plan)
  }

  test("banded-LSH self-join reuses the signature exchange (one signature compute)") {
    val plan = finalPlan(q("dedup_minhash_lsh"))
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage") ||
      "ShuffleQueryStage (\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
        .groupBy(identity).exists(_._2.size > 1),
      s"no exchange/stage reuse found in the minhash self-join plan\n$plan")
  }

  test("duplicated-span detection: equi-semi-join on gram fingerprints, both windows share one sort") {
    val plan = finalPlan(q("dedup_substring_spans"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("LeftSemi"), plan)
    // gaps-and-islands: lag + running sum are both (id, pos)-ordered —
    // ONE Window sort, not two (Spark collapses compatible windows)
    assert("\\bSort \\[id".r.findAllIn(plan).size <= 2, plan)
  }

  test("DSIR: the bucket-score model joins back as a BROADCAST (tiny-model property)") {
    val plan = finalPlan(q("sample_dsir"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // selection is top-N, never a global sort
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("incremental dedup: the store side is a plain parquet scan (no historical re-shingle)") {
    val plan = finalPlan(q("dedup_incremental_hits"))
    // exactly one WordShingles evaluation subtree: the NEW batch's; the
    // store contributes only a parquet scan of (id, band, bkey)
    assert("wordshingles".r.findAllIn(plan.toLowerCase).size <= 1, plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("LM scoring: one corpus scan against the persisted model, no nested-loop joins") {
    val plan = finalPlan(q("text_lm_score"))
    assert(!plan.contains("CartesianProduct"), plan)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    // train-once-score-many: the scoring plan reads the CORPUS exactly
    // once (the doc-bigram explode); the other parquet scans are the
    // three persisted MODEL tables (bigram/backoff/dflt) — training's
    // unigram/bigram count passes over the corpus happen once per
    // sfDir at artifact build, not per query
    val corpusScans = "FileScan parquet .*documents"
      .r.findAllIn(plan).size
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(corpusScans == 1, s"$corpusScans corpus scans (want 1: model is persisted)\n$plan")
    assert(scans <= 4, s"$scans total scans (1 corpus + <=3 model)\n$plan")
    // the 1-row default broadcasts; bigram/backoff are relational joins
    assert(bnlj <= 1, s"$bnlj BNLJ (only the 1-row default broadcast expected)\n$plan")
  }

  test("pHash pairs: segment self-join reuses the hash exchange") {
    val plan = finalPlan(q("multimodal_phash_dups"))
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage") ||
      "ShuffleQueryStage (\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
        .groupBy(identity).exists(_._2.size > 1),
      s"no exchange/stage reuse found in the phash self-join plan\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("BM25: postings-sized pipeline — df and corpus stats broadcast, no sort-merge") {
    val plan = finalPlan(q("text_bm25_rank"))
    // the term filter runs BEFORE the tf aggregation (postings access
    // path): the tok-isin filter must sit under the first aggregate
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // 1-row stats via BNLJ broadcast only
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1, plan)
    // final ranking is top-N (per-partition top-k), never a global sort
    // feeding a full-set single-partition window
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("binary ANN: quantized shortlist is TakeOrderedAndProject; rerank joins it broadcast") {
    val plan = finalPlan(q("emb_binary_topk"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("binary materialized-index entry: rerank fetch pushes shortlist ids into the vector scan") {
    // the Hamming stage runs eagerly on the 16-byte codes parquet (no
    // fp32 column exists there to read); the RETURNED plan is the exact
    // rerank — pushed id filter, never a corpus scan
    val plan = finalPlan(q("emb_binary_scan_topk"))
    assert(plan.contains("In(vec_id"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("TF-IDF: idf joins back as a broadcast; top-k per doc has no global window") {
    val plan = finalPlan(q("text_tfidf_topterms"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("source-vocab Jaccard: the vocabulary self-join reuses one exchange") {
    val plan = finalPlan(q("corpus_source_jaccard"))
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage") ||
      "ShuffleQueryStage (\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
        .groupBy(identity).exists(_._2.size > 1),
      s"no exchange/stage reuse in the vocab self-join\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("portable CMS: no join anywhere — one scan, one counting shuffle") {
    val plan = finalPlan(q("sketch_cms_portable"))
    assert(!plan.contains("Join"), plan)
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan)
  }

  test("pagerank iterations run off materialized inputs — zero file scans, no cartesian") {
    // Graphs.pagerank localCheckpoints the prepared edge table and each
    // round's ranks (column-pruning differences across its >=6 consumers
    // defeat exchange reuse otherwise — 90 executed source scans at
    // iters=2 before the fix). The returned plan must read ONLY
    // checkpointed RDDs: a FileScan here means an iteration leaked back
    // to the source.
    val plan = finalPlan(q("graph_pagerank"))
    assert(!plan.contains("FileScan"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("co-basket similarity: basket self-join reuses an exchange, bounded fan-out join only") {
    val plan = finalPlan(q("graph_cobasket_sim"))
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no exchange reuse in the basket self-join\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("semantic decontamination: within-cell hash join, never a cross-corpus cartesian") {
    val plan = finalPlan(q("semdedup_decontaminate"))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"),
      s"expected a hash join on __cell\n$plan")
  }

  test("bloom contamination: the bloom pre-filter sits on the corpus gram stream") {
    val plan = finalPlan(q("dedup_contam_bloom"))
    assert(plan.contains("bloom_might_contain"), plan)
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("proportional interleave: the rank window is source-partitioned") {
    // single-partition exchanges DO appear — the 1-row grand-total
    // aggregate and the final repartition(1) local sort, both
    // metadata-sized — but the corpus-wide rank must never be one: the
    // only Window is partitioned by source, fed by a source hash
    // exchange.
    val plan = finalPlan(q("sample_interleave"))
    assert(plan.contains("windowspecdefinition(source"), plan)
    assert(plan.contains("Exchange hashpartitioning(source"), plan)
    assert(!"windowspecdefinition\\((?!source)".r.findFirstIn(plan).isDefined,
      s"a window not partitioned by source leaked into the interleave\n$plan")
  }

  test("nDCG eval: ideal list is a per-partition top-k, never a corpus-wide window sort") {
    val plan = finalPlan(q("retrieval_ndcg"))
    // the ideal ordering comes from orderBy+limit(10) (TakeOrdered),
    // and the only Window in the plan positions those 10 rows — the
    // corpus-sized side stays in hash aggregates and broadcasts
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("Heaps fit: no window anywhere — first-occurrence turns cumulative distinct into a filter") {
    val plan = finalPlan(q("stats_heaps_fit"))
    assert(!plan.contains("Window"), plan)
    // the 4-row checkpoint table rides broadcasts, never a shuffle join
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("histogram decile twin: the window runs over the quality histogram, never the corpus") {
    val plan = finalPlan(q("quality_decile_hist"))
    val w = plan.indexOf("Window")
    assert(w >= 0, plan)
    // an aggregate sits BELOW the window in the tree: the window's
    // input is one row per distinct quality value (bounded by the
    // basis-point range), so the single-partition sort it needs is
    // metadata-sized — the exact-ntile report twin is the one whose
    // window eats the corpus
    assert(plan.indexOf("HashAggregate", w) > w, plan)
    // the corpus-sized side contributes exactly one scan and the
    // histogram aggregation's one hash exchange; the 1-row total rides
    // a broadcast, never a shuffle join
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("dedup_url: map-side partial agg, one canonical-string shuffle, one corpus scan") {
    val plan = finalPlan(q("dedup_url"))
    // partial + final HashAggregate around exactly one hash exchange —
    // the exact-dedup plan shape on the canonicalized key (the final
    // orderBy adds its range exchange; no joins, no windows)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Window") && !plan.contains("Join"), plan)
  }

  test("sample_domain_cap: one domain-keyed window, no quota join") {
    val plan = finalPlan(q("sample_domain_cap"))
    assert(plan.contains("windowspecdefinition(domain"), plan)
    assert(plan.contains("Exchange hashpartitioning(domain"), plan)
    // strata discovered from data: no broadcast quota table, no join
    assert(!plan.contains("Join"), plan)
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
  }

  test("ANN label noise: candidates come from an equi-join on cell, never a query x corpus cartesian") {
    val plan = finalPlan(q("emb_label_noise_ann"))
    // the kNN candidate join must be a relational equi-join on `cell`
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin")
      || plan.contains("SortMergeJoin"),
      s"expected a hash/merge join on cell for kNN candidates\n$plan")
    // the ONLY nested-loop joins allowed are the bounded broadcast
    // centroid cross-joins (nCells-row tables: probe ranking + the
    // depth-2 multi-assignment) — a third means the corpus leaked into
    // a cartesian
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 2, plan)
    // per-query ranks stay qid-keyed — no corpus-wide single window
    assert(plan.contains("windowspecdefinition(qid"), plan)
  }

  test("passage clean: fingerprint semi-join, never a pair join or cartesian") {
    val plan = finalPlan(q("dedup_passage_clean"))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the drop is a LEFT SEMI on fp (shuffle-hash as hinted, or
    // broadcast if AQE shrinks the repeated set)
    assert(plan.contains("LeftSemi"), plan)
  }

  test("gopher panel: map-only — no exchange before the output sort") {
    val plan = finalPlan(q("quality_gopher_rules"))
    // the only exchange is the final orderBy's range partitioning;
    // the panel itself never shuffles and never joins
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("Exchange rangepartitioning(doc_id"), plan)
    assert(!plan.contains("Join"), plan)
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
  }

  test("shuffled packing: per-partition windows keyed by __pid, no global single-partition sort") {
    val plan = finalPlan(q("pack_shuffled_chunks"))
    // phase-2 window is keyed by the materialized partition id — the
    // global prefix sum never collapses onto one task
    assert(plan.contains("windowspecdefinition(__pid"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("shard manifest rides the same __pid-keyed prefix sum, never a single partition") {
    val plan = finalPlan(q("pack_shard_manifest"))
    assert(plan.contains("windowspecdefinition(__pid"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("domain split: map-only — one scan, no join, no shuffle before the output sort") {
    val plan = finalPlan(q("sample_split_bydomain"))
    assert(!plan.contains("Join"), plan)
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
    // the only exchange is the output orderBy's range partitioning
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("Exchange rangepartitioning(doc_id"), plan)
  }

  test("zipf fit: the rank window is SOURCE-partitioned, never a single global partition") {
    val plan = finalPlan(q("stats_zipf_fit"))
    assert(plan.contains("windowspecdefinition(source"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("Join"), plan)
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
  }

  test("dim variance: one posexplode shuffle with map-side partial aggregation, no join") {
    val plan = finalPlan(q("emb_dim_variance"))
    assert(plan.contains("partial_count"), plan) // map-side combine ran
    assert(!plan.contains("Join"), plan)
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
  }

  test("RRF hybrid: corpus work stays in the rankers; the fusion is a joinless union-aggregate") {
    val plan = finalPlan(q("retrieval_rrf_hybrid"))
    // shortlists form via per-partition top-k (limit=50), the fused
    // list via another (limit=20) — no global sort anywhere (AQE
    // reprints query-stage subtrees, so pin presence, not counts)
    assert(plan.contains("TakeOrderedAndProject(limit=50"), plan)
    assert(plan.contains("TakeOrderedAndProject(limit=20"), plan)
    assert(plan.contains("Union"), plan)
    // the fusion itself: union + hash aggregate over ≤100 rows — the
    // outer-merge never becomes a join (Spark cannot broadcast a FULL
    // OUTER join, so a join formulation would sort-merge; the
    // union-max shape avoids the operator entirely). The only joins
    // in the plan are the BM25 ranker's internal BROADCAST joins —
    // including its 1-row corpus-stats crossJoin(broadcast), which
    // plans as BroadcastNestedLoopJoin Cross with the scalar build
    // side and is the intended scalar-broadcast idiom.
    assert(!plan.contains("FullOuter"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // both ranker inputs scanned (documents + embeddings), no other table
    assert(plan.contains("documents.parquet"), plan)
    assert(plan.contains("embeddings.parquet"), plan)
    assert(!plan.contains("lineitem.parquet"), plan)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval composition — the missing seat between the lexical
  * ranker ([[TextAnalysis.bm25Rank]]) and the vector ranker
  * ([[Similarity.cosineTopK]] and the ANN ladder): production RAG-data
  * pipelines run BOTH and fuse, because lexical wins on exact
  * terminology and vector wins on paraphrase, and the fusion
  * consistently beats either alone.
  *
  * Fusion rule: Reciprocal Rank Fusion (Cormack, Clarke & Buettcher,
  * SIGIR 2009) — `score(d) = Σ_lists 1/(k + rank_list(d))`, k = 60 in
  * the paper and every production default since. RRF is rank-based, so
  * it needs NO score normalization between incommensurable scales
  * (BM25 micro-sums vs cosine) — precisely why it is the default in
  * hybrid search engines.
  *
  * Cross-engine exactness: contributions are computed in INTEGER
  * parts-per-billion via integral division `1_000_000_000 div (k+rank)`
  * (DuckDB `//`) — no float in the fusion at all, so the oracle replay
  * is exact and the final ordering is deterministic under the
  * (score DESC, id) tie-break.
  *
  * Scale shape: inputs are ALREADY top-N ranked lists (model-sized —
  * the expensive corpus work happened inside the rankers, each with
  * its own scale path: postings-filtered BM25, celled/quantized ANN).
  * The fusion itself is a full-outer join of two ≤N-row tables and a
  * ≤2N-row sort: driver-free, broadcast-sized, constant cost at any
  * corpus size. */
object Retrieval {

  /** Deterministic rank list from an embedding corpus against one
    * query: (id, rk) for the top `topN` by exact cosine, ranked on the
    * micro-rounded score with id tie-break (the round-6 quantization
    * is what makes the rank itself engine-portable). */
  def cosineRanks(df: DataFrame, idCol: String, vecCol: String,
                  query: Array[Double], topN: Int): DataFrame = {
    val scored = Similarity.cosineTopK(df, idCol, vecCol, query, k = topN)
      .withColumn("score", round(col("score"), 6))
    // the input is already ≤ topN rows (cosineTopK limits) — re-rank on
    // the ROUNDED score so ties broken by id agree across engines
    val w = Window.partitionBy(lit(0))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .select(col(idCol), col("rk"))
  }

  /** Fuse two (id, rk) ranked lists by RRF. Output: one row per id
    * seen in EITHER list — (id, rk_a, rk_b, rrf_ppb, rk), where a
    * missing rank reports 0 and contributes nothing, `rrf_ppb` is the
    * integer parts-per-billion fusion score, and `rk` is the fused
    * rank under (rrf_ppb DESC, id ASC).
    *
    * UNION + hash-aggregate, not a join: the outer-merge of ranked
    * lists is tag-union-max (a list never ranks an id twice, so `max`
    * recovers each side's rank exactly) — Spark cannot broadcast a
    * FULL OUTER join, so the join formulation sort-merges even
    * 50-row inputs, while this shape is one tiny hash aggregate and
    * generalizes to fusing N lists unchanged. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
              kRrf: Int = 60, topN: Int = 20): DataFrame = {
    val aa = a.select(col(idCol).as("id"),
      col("rk").cast("long").as("rk_a"), lit(0L).as("rk_b"))
    val bb = b.select(col(idCol).as("id"),
      lit(0L).as("rk_a"), col("rk").cast("long").as("rk_b"))
    val fused = aa.unionByName(bb)
      .groupBy("id")
      .agg(max("rk_a").as("rk_a"), max("rk_b").as("rk_b"))
      .withColumn("rrf_ppb",
        (when(col("rk_a") > 0,
          expr(s"1000000000 div (rk_a + $kRrf)")).otherwise(0L) +
          when(col("rk_b") > 0,
            expr(s"1000000000 div (rk_b + $kRrf)")).otherwise(0L))
          .cast("long"))
    val top = fused.orderBy(col("rrf_ppb").desc, col("id").asc).limit(topN)
    val w = Window.partitionBy(lit(0))
      .orderBy(col("rrf_ppb").desc, col("id").asc)
    top.withColumn("rk", row_number().over(w))
      .select(col("id").as(idCol), col("rk_a"), col("rk_b"),
        col("rrf_ppb"), col("rk"))
  }

  /** Maximal Marginal Relevance diversified rerank (Carbonell &
    * Goldstein, SIGIR 1998): greedily pick the candidate maximizing
    * `λ·relevance − (1−λ)·max similarity to the already-selected` —
    * the standard de-redundancy pass a RAG-data pipeline runs between
    * retrieval and context packing (top-k without it returns the same
    * paragraph five times).
    *
    * Scale shape: everything CORPUS-sized is distributed — the
    * relevance shortlist is the exact cosine top-`shortlist`
    * (TakeOrderedAndProject, no global sort) and the candidate×candidate
    * similarity table is a broadcast self-join over ≤ `shortlist` rows.
    * The greedy loop itself is inherently sequential (selection t
    * depends on selections 1..t−1) and runs DRIVER-side over the
    * collected shortlist — k·n integer comparisons on ≤ `shortlist`
    * rows, the k-means-seed/model-sized-collect budget class, never a
    * corpus materialization.
    *
    * Cross-engine exactness: λ is expressed in TENTHS so the selection
    * score stays integer — `sc = λ₁₀·rel_micro − (10−λ₁₀)·maxsim_micro`
    * (deci-micro units); rel and sims quantize as round-6 cosines
    * scaled to micro (the pairwise-cosine agreement the near-dup family
    * already proves); ties break (sc DESC, id ASC). The DuckDB oracle
    * unrolls the k selection steps as generated CTEs and replays the
    * identical integer argmax.
    *
    * Returns (id, rk, rel_micro, mmr_dmicro), rk = 1..k in selection
    * order; the seed's score is λ₁₀·rel_micro (no penalty term). */
  def mmrRerank(df: DataFrame, idCol: String, vecCol: String,
                query: Array[Double], shortlist: Int = 20, k: Int = 10,
                lambdaTenths: Int = 7): DataFrame = {
    require(k >= 1 && k <= shortlist,
      s"mmrRerank: k=$k must be in [1, shortlist=$shortlist]")
    require(lambdaTenths >= 0 && lambdaTenths <= 10,
      s"mmrRerank: lambdaTenths=$lambdaTenths must be in [0, 10]")
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.VectorFunctions.{cosine, vecLit}
    // the shortlist CUT itself ranks on the QUANTIZED rel_micro (desc,
    // id) — not the raw double cosine — so a cross-engine ulp at the
    // rank-20/21 boundary cannot change the candidate set and cascade
    // through every greedy step (both engines cut on the same integers;
    // still one TakeOrderedAndProject, shuffle-free)
    val cand = df.select(col(idCol).as("__id"),
        round(round(cosine(col(vecCol), vecLit(query)), 6) * 1e6)
          .cast("long").as("rel_micro"))
      .orderBy(desc("rel_micro"), col("__id"))
      .limit(shortlist)
    val vecs = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .join(broadcast(cand.select("__id")), "__id")
    val sims = vecs.as("a").join(broadcast(vecs.as("b")),
        col("a.__id") =!= col("b.__id"))
      .select(col("a.__id").as("ia"), col("b.__id").as("ib"),
        round(round(cosine(col("a.__v"), col("b.__v")), 6) * 1e6)
          .cast("long").as("sim_micro"))
    val rel = cand.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sim = sims.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val mu = 10 - lambdaTenths
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val remaining = scala.collection.mutable.Set(rel.keySet.toSeq: _*)
    while (selected.size < math.min(k, rel.size)) {
      val pick =
        if (selected.isEmpty)
          remaining.map(id => (id, lambdaTenths * rel(id))).toSeq
            .minBy { case (id, sc) => (-sc, id) }
        else
          remaining.map { id =>
            val maxSim = selected.map(s => sim((id, s._1))).max
            (id, lambdaTenths * rel(id) - mu * maxSim)
          }.toSeq.minBy { case (id, sc) => (-sc, id) }
      selected += pick
      remaining -= pick._1
    }
    selected.zipWithIndex
      .map { case ((id, sc), i) => (id, i + 1, rel(id), sc) }.toSeq
      .toDF(idCol, "rk", "rel_micro", "mmr_dmicro")
  }
}

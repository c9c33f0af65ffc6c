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
}

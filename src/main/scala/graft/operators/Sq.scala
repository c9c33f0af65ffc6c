package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Scalar (int8) quantization ANN — the remaining rung of the standard
  * quantization ladder beside the bucketing paths (LSH in [[Similarity]],
  * IVF in [[Ivf]]) and product quantization ([[Pq]]): FAISS's `SQ8`. At
  * 100 TB a 64-dim fp32 embedding column is 256 bytes per row; its SQ8
  * code is 64 bytes (+8 for the stored norm) — a TRUE 4× smaller scan with
  * far lower quantization error than PQ (per-dimension error ≤ scale/2 ≈
  * range/510), so shortlists stay tiny and rerank exactness is cheap.
  *
  *   - Train: per-DIMENSION min/max over a bounded seed-deterministic
  *     sample (driver-side, same collect budget class as IVF/PQ training);
  *     `scale_i = max(range_i, ε)/255`. No k-means — SQ training is two
  *     reductions.
  *   - Encode: `code_i = clamp(round((v_i − min_i)/scale_i), 0, 255)`, one
  *     BYTE per dimension packed as BINARY — ONE fused
  *     [[graft.functions.Sq8EncodeExpr]] kernel inside whole-stage
  *     codegen. Out-of-sample values saturate at the range ends (standard
  *     SQ behavior). Persist with [[encodedTable]].
  *   - Query: `dot(dequant(v), q)` folds to `bias + Σ code_i·w_i` with
  *     per-query constants `w_i = scale_i·q_i`, `bias = Σ min_i·q_i` —
  *     ONE fused [[graft.functions.Sq8DotExpr]] kernel, one multiply-add
  *     per byte, never touching fp32 vectors. Approximate cosine divides
  *     by the stored exact row norm.
  *   - Rerank: shortlist by approximate cosine (TakeOrderedAndProject,
  *     shuffle-free), score the shortlist EXACTLY, return the true top k
  *     of it — identical to brute force whenever the shortlist covers the
  *     true top k, which is what lets the emb_sq8_topk CORRECTNESS entry
  *     hash-match the exact oracle while the candidate scan ran on bytes.
  *
  * Everything is seed-deterministic (sample order, params, rank ties break
  * on id).
  */
object Sq {

  /** Per-dimension quantization parameters. `scales` are strictly
    * positive (degenerate constant dimensions get an ε range, so their
    * codes are all 0 and dequantize back to the constant). */
  final case class Sq8Params(mins: Array[Double], scales: Array[Double])

  /** Train per-dimension min/max over a bounded hash-ordered sample —
    * the same driver collect budget class as IVF centroids / PQ
    * codebooks, but the "training" is just two per-dimension reductions. */
  def params(df: DataFrame, idCol: String, vecCol: String,
             seed: Long = 42L, maxSample: Int = 2048): Sq8Params = {
    val sample = df.select(col(vecCol).cast("array<double>"))
      .orderBy(xxhash64(col(idCol), lit(seed)))
      .limit(maxSample)
      .collect().map { r =>
        // loud named error, matching Sq8EncodeExpr's null-element contract
        // (getSeq returns null for a null array — .toArray would NPE)
        require(!r.isNullAt(0),
          s"SQ8 params: null `$vecCol` at a sampled row — scrub upstream")
        r.getSeq[Double](0).toArray
      }
    require(sample.nonEmpty, "SQ8 params: input has no rows")
    val dim = sample.head.length
    val mins = Array.fill(dim)(Double.MaxValue)
    val maxs = Array.fill(dim)(Double.MinValue)
    for (v <- sample) {
      require(v.length == dim,
        s"SQ8 params: ragged sample (vector of ${v.length} among $dim-dim rows)")
      var i = 0
      while (i < dim) {
        if (v(i) < mins(i)) mins(i) = v(i)
        if (v(i) > maxs(i)) maxs(i) = v(i)
        i += 1
      }
    }
    val scales = Array.tabulate(dim)(i => math.max(maxs(i) - mins(i), 1e-12) / 255.0)
    Sq8Params(mins, scales)
  }

  /** SQ8 code column: BINARY of one byte per dimension, computed by the
    * ONE fused [[graft.functions.Sq8EncodeExpr]] kernel — codegen'd, no
    * UDF, params as expression reference data. */
  def encode(vecCol: Column, p: Sq8Params): Column =
    graft.functions.Sq8EncodeExpr(vecCol, p.mins, p.scales)

  /** The materialized compressed index: input columns + `sq_code`
    * (BINARY, dim bytes per row — 4× smaller than fp32) + `vec_norm` —
    * what a persistent deployment stores so ANN scans never read the
    * fp32 vectors. Persist the params BESIDE it with
    * [[AnnModels.saveSq8]]: the codes are unreadable without the model
    * that wrote them. */
  def encodedTable(df: DataFrame, vecCol: String, p: Sq8Params): DataFrame =
    df.withColumn("sq_code", encode(col(vecCol), p))
      .withColumn("vec_norm", l2Norm(col(vecCol)))

  /** Approximate cosine over an encoded row: the folded per-query
    * affine dot (ONE [[graft.functions.Sq8DotExpr]] kernel) divided by
    * the stored exact row norm and the query norm. */
  private[operators] def sqCosine(codeCol: Column, normCol: Column,
                                  p: Sq8Params, query: Array[Double]): Column = {
    require(query.length == p.mins.length,
      s"query dim ${query.length} != params dim ${p.mins.length}")
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val weights = Array.tabulate(query.length)(i => p.scales(i) * query(i))
    val bias = (0 until query.length).map(i => p.mins(i) * query(i)).sum
    val approxDot = graft.functions.Sq8DotExpr(codeCol, weights, bias)
    when(normCol === 0.0, lit(null).cast("double"))
      .otherwise(approxDot / (normCol * lit(qNorm)))
  }

  /** SQ8 top-k with exact rerank: byte-score every row from its code,
    * shortlist the best `shortlist` by approximate cosine
    * (TakeOrderedAndProject, shuffle-free), then rank the shortlist by
    * EXACT cosine and keep k. Output: (id, score), highest first —
    * identical to brute force whenever the shortlist covers the true
    * top k. */
  def sqTopK(df: DataFrame, idCol: String, vecCol: String,
             query: Array[Double], k: Int,
             p: Sq8Params, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    require(!df.columns.contains("__approx"), "sqTopK: `__approx` is reserved")
    val short = df
      .withColumn("__approx",
        sqCosine(encode(col(vecCol), p), l2Norm(col(vecCol)), p, query))
      .orderBy(desc("__approx"), col(idCol))
      .limit(shortlist)
    short
      .select(col(idCol), cosine(col(vecCol), vecLit(query)).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** [[sqTopK]] that trains its own params — the one-shot form. */
  def sqTopK(df: DataFrame, idCol: String, vecCol: String,
             query: Array[Double], k: Int,
             shortlist: Int = 100, seed: Long = 42L,
             maxSample: Int = 2048): DataFrame =
    sqTopK(df, idCol, vecCol, query, k,
      params(df, idCol, vecCol, seed, maxSample), shortlist)

  /** SQ8 top-k against a MATERIALIZED [[encodedTable]] — the deployment
    * query path: the candidate stage reads `codeCol`+`normCol`+`idCol`
    * only (the encoded table need not even carry the fp32 column), and
    * the exact rerank fetches just the shortlist rows from `vectors`
    * with the ids PUSHED INTO the parquet scan (`PushedFilters:
    * In(id, ...)`), so at 100 TB the rerank reads a few row groups, not
    * the corpus. The shortlist-id collect is bounded by `shortlist`. */
  def sqTopKFromEncoded(encoded: DataFrame, vectors: DataFrame,
                        idCol: String, vecCol: String,
                        p: Sq8Params, query: Array[Double],
                        k: Int, shortlist: Int = 100,
                        codeCol: String = "sq_code",
                        normCol: String = "vec_norm"): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    require(shortlist <= 65536,
      s"shortlist ($shortlist) is driver-collected for the id-pushdown rerank; cap it")
    require(!encoded.columns.contains("__approx"),
      "sqTopKFromEncoded: `__approx` is reserved")
    val shortIds = encoded
      .withColumn("__approx", sqCosine(col(codeCol), col(normCol), p, query))
      .orderBy(desc("__approx"), col(idCol))
      .limit(shortlist)
      .select(col(idCol))
      .collect().map(_.get(0))
    vectors
      .filter(col(idCol).isInCollection(shortIds))
      .select(col(idCol), cosine(col(vecCol), vecLit(query)).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }
}

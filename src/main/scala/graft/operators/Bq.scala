package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 1-bit binary quantization ANN — the last rung of the quantization
  * ladder (LSH / IVF / PQ / SQ8 / binary): each dimension keeps only its
  * SIGN, so a 64-dim fp32 vector compresses 256 → 8 bytes (32×) and
  * candidate scoring is two XOR+popcount instructions per pair. This is
  * the "binary embeddings" deployment shape (Cohere/OpenSearch-style):
  * Hamming-shortlist on the sign words, exact rerank on the float
  * vectors fetched for the shortlist only.
  *
  * The 64 sign bits are packed into TWO 32-bit words held in BIGINTs
  * (bit 63 of a single word would collide with the sign bit in engines
  * whose `1 << 63` arithmetic overflows — DuckDB's does; two half-words
  * keep every intermediate in unsigned-safe range, so the WHOLE
  * quantize→XOR→popcount algebra is engine-portable and the Hamming
  * shortlist itself hash-checks in the oracle).
  *
  * Scale shape: quantization is a per-row codegen'd projection (no
  * shuffle); the shortlist is TakeOrderedAndProject (per-partition
  * top-M, no global sort); the rerank joins the ≤M-row shortlist back
  * as a BROADCAST. At 100 TB the sign words ride a 16-byte-per-vector
  * scan — the same compressed-scan story as SQ8/PQ, one bit deeper.
  */
object Bq {

  /** dims [lo, lo+32) packed as Σ 2^(d−lo) over dims where v[d] > 0 —
    * the fused [[graft.functions.SignPack]] kernel (one codegen'd loop
    * rather than 32 chained CASE/element_at terms; NativeParitySpec pins
    * it equal to the composed form). */
  private def halfWord(vec: Column, lo: Int): Column =
    org.apache.spark.sql.graft.shim.column(
      graft.functions.SignPack(
        org.apache.spark.sql.graft.shim.expression(vec), lo))

  private def queryHalf(q: Array[Double], lo: Int): Long =
    (lo until lo + 32).foldLeft(0L) { (acc, d) =>
      if (q(d) > 0) acc | (1L << (d - lo)) else acc
    }

  /** (id, w0, w1, hamming) against the query's sign words. */
  def hammingTable(df: DataFrame, idCol: String, vecCol: String,
                   query: Array[Double]): DataFrame = {
    require(query.length == 64, s"Bq is dimensioned for 64, got ${query.length}")
    val v = col(vecCol)
    df.select(col(idCol), halfWord(v, 0).as("w0"), halfWord(v, 32).as("w1"))
      .select(col(idCol), col("w0"), col("w1"),
        (bit_count(col("w0").bitwiseXOR(lit(queryHalf(query, 0)))) +
          bit_count(col("w1").bitwiseXOR(lit(queryHalf(query, 32)))))
          .cast("int").as("hamming"))
  }

  /** Top-n by (hamming asc, id asc) — the ENGINE-PORTABLE shortlist (the
    * oracle recomputes the pack/XOR/popcount algebra end-to-end). */
  def hammingTopK(df: DataFrame, idCol: String, vecCol: String,
                  query: Array[Double], n: Int): DataFrame =
    hammingTable(df, idCol, vecCol, query)
      .select(col(idCol), col("hamming"))
      .orderBy(col("hamming").asc, col(idCol).asc)
      .limit(n)

  /** The materialized binary index: (id, w0, w1) — 16 bytes per vector
    * against 256 for the fp32 column. Write WITHOUT the embedding column
    * and the candidate scan touches 1/16 of the bytes; the index needs
    * no trained model (sign quantization is data-independent), so unlike
    * PQ/SQ8 nothing must be persisted beside it. */
  def encodedTable(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    df.select(col("*"), halfWord(v, 0).as("w0"), halfWord(v, 32).as("w1"))
  }

  /** Query a previously-written binary index: Hamming shortlist from the
    * 16-byte encoded scan (the fp32 column is NOT read), then exact
    * rerank with the shortlist ids PUSHED into the vector scan
    * (`In(id, ...)` reaches the parquet reader — the pqTopKFromEncoded
    * deployment path). */
  def bqTopKFromEncoded(encoded: DataFrame, vectors: DataFrame,
                        idCol: String, vecCol: String,
                        query: Array[Double], k: Int,
                        shortlist: Int = 100): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    require(shortlist <= 65536,
      s"shortlist ($shortlist) is driver-collected for the id-pushdown rerank; cap it")
    val shortIds = encoded
      .select(col(idCol),
        (bit_count(col("w0").bitwiseXOR(lit(queryHalf(query, 0)))) +
          bit_count(col("w1").bitwiseXOR(lit(queryHalf(query, 32)))))
          .cast("int").as("hamming"))
      .orderBy(col("hamming").asc, col(idCol).asc)
      .limit(shortlist)
      .select(col(idCol))
      .collect().map(_.get(0))
    vectors
      .filter(col(idCol).isInCollection(shortIds))
      .select(col(idCol),
        graft.functions.VectorFunctions.cosine(col(vecCol),
          graft.functions.VectorFunctions.vecLit(query)).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Binary-shortlist + exact-rerank top-k: Hamming top-`shortlist`
    * candidates, exact cosine on the shortlist only, top-k.
    *
    * One sign bit per dimension is GENUINELY lossy (unlike the SQ8/PQ
    * rungs, whose fixture shortlists cover the true top-k): Hamming to
    * the query's signs ignores magnitudes entirely, so recall@k < 1 is
    * expected and is REPORTED, not hidden — the emb_binary_recall gate
    * entry measures the overlap vs brute force in BOTH engines, and
    * BqSpec pins the measured fixture value. Correctness of the
    * pipeline itself is exact: the shortlist is deterministic portable
    * integer algebra and the rerank is true cosine, so emb_binary_topk
    * hash-matches an oracle that recomputes shortlist + rerank. */
  def bqTopK(df: DataFrame, idCol: String, vecCol: String,
             query: Array[Double], k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val short = hammingTopK(df, idCol, vecCol, query, shortlist)
      .select(col(idCol))
    df.join(broadcast(short), idCol)
      .select(col(idCol),
        graft.functions.VectorFunctions.cosine(col(vecCol),
          graft.functions.VectorFunctions.vecLit(query)).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }
}

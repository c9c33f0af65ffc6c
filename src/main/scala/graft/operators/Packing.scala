package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk step every pretraining data
  * pipeline runs last: documents are concatenated in a deterministic
  * order and the token stream is cut into fixed-`budget` chunks
  * (training sequences). [[chunkAssign]] computes, for each document,
  * the chunk its first token lands in and its offset inside that chunk —
  * the assignment a writer needs to route documents to sequence shards.
  *
  * The core is a GLOBAL prefix sum over the corpus in id order — the
  * textbook case where the naive plan (one `Window.orderBy` with no
  * partition key) collapses 100 TB onto a single task. The
  * implementation is the standard two-phase distributed scan instead:
  *
  *   1. range-partition by id (so partitions are contiguous id spans)
  *      and take ONE per-partition token sum — a tiny aggregate,
  *      `numPartitions` rows collected to the driver;
  *   2. per-partition windows (keyed by the materialized partition id —
  *      parallel, no global sort) plus the partition's exclusive prefix
  *      offset broadcast back as a literal map.
  *
  * Output is INDEPENDENT of the partitioning: any contiguous range split
  * produces the same global prefix sums, so nondeterministic range
  * boundaries (Spark samples them) cannot change `chunk_id`. Two jobs
  * read the input (the sums pass and the final pass) — at corpus scale,
  * persist the projected (id, tokens) frame between them.
  */
object Packing {

  /** For each row: `chunk_id` = the `budget`-token chunk where the
    * document STARTS when the corpus is concatenated in ascending
    * `idCol` order, and `chunk_offset` = its first token's position in
    * that chunk. `tokenCol` must be a non-negative token count; ids must
    * be distinct (they define the concatenation order). */
  def chunkAssign(df: DataFrame, idCol: String, tokenCol: String,
                  budget: Long): DataFrame = {
    require(budget > 0L, s"budget must be positive, got $budget")
    val reserved = Seq("__pid", "__cum", "__start")
    require(reserved.forall(!df.columns.contains(_)),
      s"chunkAssign: ${reserved.mkString("/")} are reserved")
    val spark = df.sparkSession
    val nParts = spark.sessionState.conf.numShufflePartitions
    // MATERIALIZE the range partitioning before either phase reads it
    // (r13, caught by the first full oracle gate at sf0.1): the range
    // partitioner SAMPLES its split points per job, so without the
    // checkpoint the offsets job (phase 1) and the final job (phase 2)
    // can land on DIFFERENT boundaries — phase-1 offsets keyed by __pid
    // then apply to phase-2 partitions holding different id spans, and
    // every chunk downstream of the first divergent boundary shifts.
    // Small fixtures sample identically by luck; sf0.1 did not. The
    // checkpoint pins ONE physical partitioning for both phases (and is
    // the "persist the projected frame between the two jobs" the
    // scaladoc already prescribed at corpus scale).
    val parted = df.select(col(idCol), col(tokenCol))
      .repartitionByRange(nParts, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // phase 1: one row per partition — the driver sees numPartitions
    // longs, never data
    val sums = parted.groupBy("__pid")
      .agg(sum(col(tokenCol)).cast("long").as("__psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      sums.toSeq.sortBy(_._1).map { case (pid, s) =>
        val off = acc; acc += s; pid -> off
      }.toMap
    }
    val offsetMap = map(offsets.toSeq.sortBy(_._1).flatMap {
      case (pid, off) => Seq(lit(pid), lit(off))
    }: _*)
    // phase 2: per-partition (keyed) windows — parallel, no global sort
    val w = Window.partitionBy("__pid").orderBy(idCol)
    parted
      .withColumn("__cum", sum(col(tokenCol)).over(w).cast("long"))
      .withColumn("__start",
        col("__cum") - col(tokenCol) + element_at(offsetMap, col("__pid")))
      .select(col(idCol), col(tokenCol).cast("long").as("n_tokens"),
        floor(col("__start") / budget).cast("long").as("chunk_id"),
        (col("__start") % budget).cast("long").as("chunk_offset"))
  }

  /** Overlapping sliding-window chunking — the per-DOCUMENT complement of
    * [[chunkAssign]]'s cross-document packing, and the standard prep for
    * context-window-bounded consumers (embedding models, retrieval
    * corpora): each document's token stream is cut into `window`-token
    * chunks advancing by `stride` tokens (overlap = window − stride
    * preserves context across cuts).
    *
    * Chunk c starts at token c·stride (0-based); the LAST chunk is the
    * first whose window reaches the end of the doc — every token is
    * covered exactly ⌈window/stride⌉ times in steady state, and no chunk
    * is fully contained in its predecessor (the naive `while start < n`
    * rule emits tail chunks that add no new tokens). Embarrassingly
    * parallel: one `posexplode` per doc, no shuffle at all — at 100 TB
    * this is a map-only job whose output feeds `repartitionByRange` or
    * [[chunkAssign]] downstream.
    *
    * Tokens are the shared `split(normalized, ' ')` contract (WordShingles
    * scaladoc); 1-based `start_token`, `n_tokens = min(window, n − start)`.
    * Returns (id, chunk_id, start_token, n_tokens, chunk_text). */
  def chunkOverlap(df: DataFrame, idCol: String, textCol: String,
                   window: Int = 32, stride: Int = 24): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    df.select(col(idCol).as("id"),
        split(TextAnalysis.normalized(col(textCol)), " ", -1).as("arr"))
      .withColumn("n", size(col("arr")))
      .select(col("id"), col("arr"), col("n"),
        explode(sequence(lit(0),
          floor((greatest(col("n") - window, lit(0)) + stride - 1)
            / stride).cast("int"))).as("chunk_id"))
      .select(col("id"), col("chunk_id"),
        (col("chunk_id") * stride + 1).as("start_token"),
        least(lit(window), col("n") - col("chunk_id") * stride).as("n_tokens"),
        array_join(slice(col("arr"), col("chunk_id") * stride + 1, lit(window)), " ")
          .as("chunk_text"))
  }
}

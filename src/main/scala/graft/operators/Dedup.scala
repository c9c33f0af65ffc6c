package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline. All are
  * shuffle-architected for scale:
  *
  *   - [[exact]]: hash-groupBy on a fingerprint — one shuffle on the hash,
  *     map-side partial aggregation, no data skew beyond true duplicates.
  *   - [[minhashCandidates]]: shingle → 64 minhashes → banded buckets →
  *     within-bucket pairs. Shuffles: by (doc, shingle) dedup, by doc for
  *     the signature agg, by (band, bucket) for candidates. Never forms
  *     the n² pair space.
  *   - [[simhash]]: 64-bit near-dup signature per doc (one agg);
  *     [[simhashPairs]] pairs docs within a Hamming radius via 4-segment
  *     blocking (a pair within radius 3 must agree on ≥1 of 4 segments —
  *     pigeonhole), again avoiding n².
  *   - [[ngramJaccard]]: exact Jaccard via a common-shingle join with a
  *     document-frequency cap on shingles (stop-shingle removal) so the
  *     join fan-out stays bounded on skewed corpora.
  */
object Dedup {

  /** Word n-gram shingles of the normalized text, as one row per distinct
    * (id, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val toks = split(TextAnalysis.normalized(col(textCol)), " ")
    val grams = when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    df.select(col(idCol).as("id"), explode(array_distinct(grams)).as("shingle"))
  }

  /** Exact dedup: one representative (min id) per fingerprint group.
    * Returns (fingerprint, keep_id, n_dups). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min("id").as("keep_id"), count(lit(1)).as("n_dups"))

  /** The id set to drop under exact dedup (everything but the kept
    * representative). */
  def exactDrops(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withFp = df.select(col(idCol).as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val keep = withFp.groupBy("fp").agg(min("id").as("keep_id"))
    withFp.join(keep, "fp").filter(col("id") =!= col("keep_id"))
      .select(col("id").as("drop_id"), col("keep_id"))
  }

  /** 64 minhash values per document: h_i(doc) = min over shingles of
    * xxhash64(i, shingle). One explode + one groupBy(doc) with 64
    * map-side-combining min aggregates. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 64, shingleLen: Int = 3): DataFrame = {
    val sh = shingles(df, idCol, textCol, shingleLen)
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** Banded LSH candidate pairs from minhash signatures: `bands` buckets
    * per doc, each bucket keyed by the hash of `rowsPerBand` consecutive
    * minhashes; docs sharing any (band, bucket) are candidates.
    * Returns distinct (id_a, id_b), a < b. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 64, bands: Int = 16,
                        shingleLen: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, shingleLen)
    val bandBuckets = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bucket"))
    }
    val exploded = sigs.select(col("id"),
        explode(array(bandBuckets: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    exploded.as("l").join(exploded.as("r"), Seq("band", "bucket"))
      .filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** Near-dup pairs = LSH candidates verified by exact shingle Jaccard ≥
    * threshold. The verification join touches only candidate pairs. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, numHashes: Int = 64, bands: Int = 16,
                      shingleLen: Int = 3): DataFrame = {
    val cand = minhashCandidates(df, idCol, textCol, numHashes, bands, shingleLen)
    val jac = ngramJaccard(df, idCol, textCol, shingleLen)
    cand.join(jac, Seq("id_a", "id_b")).filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash per document over word tokens: bit i of the signature
    * is the sign of Σ_tokens (bit i of xxhash64(token) ? +1 : -1). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(TextAnalysis.normalized(col(textCol)), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val summed = toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
    summed.select(col("id"), sig.as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDist (≤ 3 with the
    * default 4 segments, by pigeonhole). Blocks on 16-bit signature
    * segments so only same-segment pairs are compared. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3, segments: Int = 4): DataFrame = {
    val sigs = simhash(df, idCol, textCol)
    val segBits = 64 / segments
    val mask = (1L << segBits) - 1
    val seg = sigs.select(col("id"), col("simhash"),
      explode(array((0 until segments).map(s =>
        struct(lit(s).as("seg"),
          shiftright(col("simhash"), s * segBits).bitwiseAND(mask).as("key"))): _*)).as("sk"))
      .select(col("id"), col("simhash"), col("sk.seg").as("seg"), col("sk.key").as("key"))
    seg.as("l").join(seg.as("r"), Seq("seg", "key"))
      .filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle.
    * `maxDocFreq` drops shingles present in more than that many documents
    * (stop-shingles) to bound join fan-out — at corpus scale the frequent
    * shingles contribute candidates, not signal. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).cache()
    val filtered =
      if (maxDocFreq == Long.MaxValue) sh
      else {
        val df_ = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDocFreq)
        sh.join(df_, "shingle").select(col("id"), col("shingle"))
      }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = filtered.as("l").join(filtered.as("r"), Seq("shingle"))
      .filter(col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "sz" -> "sz_a")), "id_a")
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "sz" -> "sz_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
  }
}

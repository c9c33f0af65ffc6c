package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.SimHashText
import graft.operators.TextAnalysis

/** Dedup on unbounded streams — the streaming seats of the batch
  * [[graft.operators.Dedup]] operators. State is bounded by the
  * event-time watermark: a duplicate arriving within the watermark window
  * is dropped, one beyond it is treated as new (the standard trade-off —
  * unbounded-lookback dedup needs the batch pass).
  */
object StreamingDedup {

  /** Exact streaming dedup: first record per content fingerprint survives;
    * later identical payloads inside the watermark window are dropped.
    * Keyed state carries only (fingerprint → expiry). */
  def exactByFingerprint(records: DataFrame, textCol: String,
                         tsCol: String, watermarkDelay: String): DataFrame =
    records
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming decontamination gate: drop records whose content
    * fingerprint appears in a static contamination set (built offline by
    * [[graft.operators.Dedup.minhashNearDupsAcross]] / exact fingerprints
    * of the eval set). Planned as a per-micro-batch broadcast LEFT ANTI
    * join against the static side — NO streaming state at all; the
    * contamination set is fingerprints-only (tiny even for a huge eval
    * corpus), so the broadcast holds at scale. */
  def decontaminate(records: DataFrame, textCol: String,
                    contaminatedFps: DataFrame, fpCol: String): DataFrame =
    records
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .join(broadcast(contaminatedFps.select(col(fpCol).as("__fp")).distinct()),
        Seq("__fp"), "left_anti")
      .drop("__fp")

  /** Near-dup streaming filter by SimHash bucket: drops records whose
    * 64-bit simhash collides with one already seen inside the watermark
    * window. Coarser than the batch Hamming-radius pairing (an exact
    * signature match ≈ radius 0) — the right cheap gate in front of a
    * periodic batch near-dup pass. Signatures are bit-identical to the
    * batch [[graft.operators.Dedup.simhash]] (see [[SimHashText]]). */
  def nearDupBySimhash(records: DataFrame, textCol: String,
                       tsCol: String, watermarkDelay: String): DataFrame =
    records
      .withColumn("__sig", SimHashText(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__sig")
      .drop("__sig")
}

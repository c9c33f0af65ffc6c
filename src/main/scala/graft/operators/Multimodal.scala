package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus per-partition batch feature extraction.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic stand-in ([[FakeDecoder]]) — but the Spark
  * side is real: the schema, the partition-parallel `mapPartitions`
  * execution (records never leave executors, batches amortize per-task
  * setup the way a Pandas-UDF/Arrow batch would), and the feature output
  * contract are exactly what a real decoder would plug into: swap
  * [[FakeDecoder]] for a JNI/FFI codec and nothing else changes.
  */
object Multimodal {

  /** One media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      payload: Array[Byte],  // opaque encoded bytes
      width: Int,            // images/video: pixels; audio: 0
      height: Int,
      sample_rate: Int,      // audio: Hz; otherwise 0
      duration_ms: Long)     // audio/video; images: 0

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      histogram: Array[Double], // 16-bin byte-value histogram (fake "decode")
      brightness: Double,       // mean byte value / 255 (fake luminance)
      frames_sampled: Int)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** STUB DECODER — deterministic stand-in for the codec library that is
    * not available in this container. Computes a 16-bin byte histogram and
    * a mean-byte "brightness". A real build would replace only this
    * object's internals with e.g. libjpeg/ffmpeg bindings. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Array[Double], Double) = {
      val hist = new Array[Double](16)
      if (payload == null || payload.isEmpty) return (hist, 0.0)
      var sum = 0L
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        hist(b >> 4) += 1
        sum += b
        i += 1
      }
      var j = 0
      while (j < 16) { hist(j) /= payload.length; j += 1 }
      (hist, sum.toDouble / payload.length / 255.0)
    }

    /** "Frame sampling": how many frames a sampler would pull at `fps`
      * from the clip — pure metadata math, no codec needed. */
    def framesToSample(kind: String, durationMs: Long, fps: Double = 1.0): Int =
      if (kind == "video") math.max(1, (durationMs / 1000.0 * fps).toInt) else 1
  }

  /** Build a synthetic media table from the `documents` fixture: payload =
    * UTF-8 bytes of the text (an opaque byte stream as far as the pipeline
    * is concerned). Demonstrates the binary-column schema contract. */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("height"),
        when(pmod(col("doc_id"), lit(3)) === 1, lit(16000)).otherwise(lit(0)).as("sample_rate"),
        (pmod(col("doc_id"), lit(30)) * 1000).as("duration_ms"))
      .as[MediaRecord]
  }

  /** Partition-parallel feature extraction: the decode runs inside
    * `mapPartitions` on executors, batch-at-a-time, exactly where a
    * Pandas-UDF/Arrow batch would run. No shuffle; output is columnar. */
  def extractFeatures(media: Dataset[MediaRecord], fps: Double = 1.0): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (hist, brightness) = FakeDecoder.decode(m.payload)
        MediaFeatures(
          media_id = m.media_id,
          kind = m.kind,
          n_bytes = if (m.payload == null) 0L else m.payload.length.toLong,
          histogram = hist,
          brightness = brightness,
          frames_sampled = FakeDecoder.framesToSample(m.kind, m.duration_ms, fps))
      }
    }
  }

  /** "Resize" plan for images: pure metadata transform showing how typed
    * metadata rides along the binary column (payload untouched — a real
    * resize would rewrite it in [[FakeDecoder]]'s slot). */
  def resizePlan(media: Dataset[MediaRecord], maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim) / greatest(col("width"), lit(1)),
      lit(maxDim) / greatest(col("height"), lit(1)),
      lit(1.0))
    media.toDF().select(
      col("media_id"), col("kind"), col("width"), col("height"),
      ceil(col("width") * scale).cast("int").as("out_width"),
      ceil(col("height") * scale).cast("int").as("out_height"))
  }
}

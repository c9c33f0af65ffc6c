package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus per-partition batch feature extraction.
  *
  * The IMAGE path is a real codec: [[ImageCodec]] encodes/decodes PNG via
  * the JDK's `javax.imageio` (no native libraries needed), executor-side in
  * `mapPartitions`, and its decoded width/height/mean-channel values are
  * oracle-checked end-to-end against planted parameters
  * (multimodal_decode / multimodal_features). The AUDIO path is likewise a
  * real codec: [[AudioCodec]] writes/reads WAV (16-bit mono signed PCM)
  * through `javax.sound.sampled` — also pure JDK — and the decoded sample
  * rate / sample count / mean-|amplitude| / peak are oracle-checked against
  * the planted waveform (multimodal_audio). Only VIDEO stays behind the
  * clearly-marked byte-stat stand-in ([[FakeDecoder]]) — the container has
  * no video codecs — but the Spark side is identical either way:
  * schema, partition-parallel execution (records never leave executors,
  * batches amortize per-task setup the way a Pandas-UDF/Arrow batch
  * would), and the feature output contract. Swap [[FakeDecoder]] for an
  * ffmpeg binding and nothing else changes.
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

  /** Decoded pixel statistics of one image — every field is REAL decode
    * output (javax.imageio), pinned by the DuckDB oracle against the
    * planted encode parameters. */
  final case class DecodedImage(
      media_id: Long,
      width: Int,
      height: Int,
      mean_r: Double,   // mean red channel value over all pixels, 0-255
      mean_g: Double,
      mean_b: Double)

  /** REAL image codec — the JDK ships `javax.imageio` (pure-Java PNG), so
    * no native libraries are assumed. `encodePng` plants an image whose
    * dimensions and solid RGB color derive from the id alone; `decode`
    * reads REAL pixels back. Because a solid color's per-channel mean is
    * exactly the planted channel value, every decoded statistic is
    * SQL-reconstructable from the id — which is what lets the DuckDB
    * oracle hash-check the real decode end-to-end. */
  object ImageCodec {
    def plantedWidth(id: Long): Int = (id % 8).toInt + 2
    def plantedHeight(id: Long): Int = (id % 5).toInt + 2
    /** (r, g, b), each 0-255, all derived from the id. */
    def plantedColor(id: Long): (Int, Int, Int) =
      ((id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt)

    def encodePng(id: Long): Array[Byte] = {
      val (w, h) = (plantedWidth(id), plantedHeight(id))
      val (r, g, b) = plantedColor(id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Real decode: pixels come from the PNG bytes, nothing is assumed
      * from the id. Per-channel sums are exact in Long; `sum / n` is an
      * exact double whenever the image is a solid color (sum = n * v), so
      * the oracle comparison is bit-exact, no rounding tolerance needed. */
    def decode(mediaId: Long, png: Array[Byte]): DecodedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      require(img != null, s"media_id=$mediaId: payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      DecodedImage(mediaId, w, h,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }
  }

  /** Decoded waveform statistics of one audio clip — every field is REAL
    * decode output (`javax.sound.sampled` WAV→PCM), pinned by the DuckDB
    * oracle against the planted waveform parameters. */
  final case class DecodedAudio(
      media_id: Long,
      sample_rate: Int,   // from the decoded AudioFormat, not metadata
      n_samples: Long,    // PCM frames actually read back
      mean_abs: Double,   // mean |amplitude| over all samples (PCM16 units)
      peak_abs: Int)      // max |amplitude|

  /** REAL audio codec — the JDK ships `javax.sound.sampled` (WAV/PCM needs
    * no native codecs and no audio device). `encodeWav` plants a square
    * wave (+A, -A alternating) whose sample rate, length, and amplitude
    * derive from the id alone; `decode` reads REAL PCM frames back through
    * `AudioSystem.getAudioInputStream`. A square wave's mean |amplitude|
    * and peak are both exactly A and the frame count is exact, so every
    * decoded statistic is SQL-reconstructable from the id — the same trick
    * that lets the DuckDB oracle hash-check the image decode. */
  object AudioCodec {
    def plantedRate(id: Long): Int = (8000 * (id % 2 + 1)).toInt   // 8k | 16k Hz
    def plantedSamples(id: Long): Int = ((id % 50 + 1) * 80).toInt // 80..4000
    /** PCM16 amplitude in [500, 30499]. */
    def plantedAmplitude(id: Long): Int = (id * 37 % 30000 + 500).toInt
    /** duration in ms — exact because samples are a multiple of rate/1000. */
    def plantedDurationMs(id: Long): Long =
      plantedSamples(id) * 1000L / plantedRate(id)

    def encodeWav(id: Long): Array[Byte] = {
      val (rate, n, a) = (plantedRate(id), plantedSamples(id), plantedAmplitude(id))
      val pcm = new Array[Byte](n * 2) // 16-bit mono little-endian
      var i = 0
      while (i < n) {
        val s = if (i % 2 == 0) a else -a
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        rate.toFloat, 16, 1, /*signed=*/ true, /*bigEndian=*/ false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Real decode: format and frames come from the WAV bytes, nothing is
      * assumed from the id. |amplitude| sums are exact in Long; `sum / n`
      * is an exact double for the planted square wave (sum = n * A), so
      * the oracle comparison is bit-exact. */
    def decode(mediaId: Long, wav: Array[Byte]): DecodedAudio = {
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(wav))
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"media_id=$mediaId: payload is not a decodable audio stream", e)
        }
      val fmt = ais.getFormat
      require(
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"media_id=$mediaId: expected 16-bit mono signed PCM, got $fmt")
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      require(n > 0, s"media_id=$mediaId: empty audio stream")
      val big = fmt.isBigEndian
      var (sumAbs, peak, i) = (0L, 0, 0)
      while (i < n) {
        val s =
          if (big) (bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff)
          else (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
        val abs = math.abs(s)
        sumAbs += abs
        if (abs > peak) peak = abs
        i += 1
      }
      DecodedAudio(mediaId, fmt.getSampleRate.round, n.toLong,
        sumAbs.toDouble / n, peak)
    }
  }

  /** STUB DECODER — now the VIDEO-only stand-in (images decode for real
    * through [[ImageCodec]], audio through [[AudioCodec]]): the container
    * has no video codecs, so this computes byte-level statistics (16-bin
    * histogram, mean byte value) plus codec-free frame-sampling math. A
    * real build would replace only this object's internals with ffmpeg
    * bindings. */
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

  /** Real-content features: one row per media record, decode-backed. */
  final case class MediaContentFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Option[Long],    // payload size for video (byte-stat path);
                                // None for images/audio (a codec's encoding
                                // size is not a content feature and not
                                // oracle-derivable)
      mean_level: Double,       // images: mean pixel channel value (REAL
                                // decode); audio: mean |amplitude| (REAL
                                // decode); video: mean byte value
      frames_sampled: Int)

  /** Media fixture with REAL image and audio payloads: every `image`-kind
    * row carries an actual PNG (planted dims + solid color from the id,
    * encoded executor-side by [[ImageCodec]]); every `audio`-kind row
    * carries an actual WAV (planted rate/length/amplitude square wave from
    * [[AudioCodec]]); video rows carry a 256-byte ramp `(id + i) % 256` —
    * one full byte cycle, so their byte statistics are exact constants
    * (mean 127.5). All payload families keep every downstream feature
    * SQL-reconstructable while the operators compute them from the REAL
    * bytes. */
  def realMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // in-memory, no temp files
        it.map { id =>
          val kind = (id % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          val payload = kind match {
            case "image" => ImageCodec.encodePng(id)
            case "audio" => AudioCodec.encodeWav(id)
            case _ => Array.tabulate[Byte](256)(i => ((id + i) % 256).toByte)
          }
          MediaRecord(
            media_id = id, kind = kind, payload = payload,
            width = if (kind == "image") ImageCodec.plantedWidth(id) else 0,
            height = if (kind == "image") ImageCodec.plantedHeight(id) else 0,
            sample_rate = if (kind == "audio") AudioCodec.plantedRate(id) else 0,
            duration_ms =
              if (kind == "audio") AudioCodec.plantedDurationMs(id)
              else (id % 30) * 1000L)
        }
      }
  }

  /** Real image decode over the image-kind rows: executor-side
    * `mapPartitions`, `javax.imageio` — the decoded values are pinned by
    * the multimodal_decode oracle against the planted parameters. */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "image").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(m => ImageCodec.decode(m.media_id, m.payload))
    }
  }

  /** Real audio decode over the audio-kind rows: executor-side
    * `mapPartitions`, `javax.sound.sampled` — the decoded values are
    * pinned by the multimodal_audio oracle against the planted waveform. */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "audio").mapPartitions { it =>
      it.map(m => AudioCodec.decode(m.media_id, m.payload))
    }
  }

  /** Content-feature extraction over [[realMedia]]: images decode for REAL
    * (mean pixel level from actual pixels), audio decodes for REAL (mean
    * |amplitude| from actual PCM frames); video takes byte-level stats
    * from the actual payload bytes. `(mean_r+mean_g+mean_b)/3.0` is a
    * single double division of exact integers, bit-identical to the
    * oracle's `(r+g+b)/3.0`; the audio mean is exact because the planted
    * square wave's |amplitude| sum is `n * A`. `n_bytes` is only reported
    * for the byte-stat (video) path — a codec's encoded size is not a
    * content feature and not oracle-derivable. */
  def extractContentFeatures(media: Dataset[MediaRecord], fps: Double = 1.0): Dataset[MediaContentFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val (nBytes, level) = m.kind match {
          case "image" =>
            val d = ImageCodec.decode(m.media_id, m.payload)
            (None, (d.mean_r + d.mean_g + d.mean_b) / 3.0)
          case "audio" =>
            (None, AudioCodec.decode(m.media_id, m.payload).mean_abs)
          case _ =>
            var sum = 0L
            var i = 0
            while (i < m.payload.length) { sum += m.payload(i) & 0xff; i += 1 }
            (Some(m.payload.length.toLong), sum.toDouble / m.payload.length)
        }
        MediaContentFeatures(m.media_id, m.kind, nBytes, level,
          FakeDecoder.framesToSample(m.kind, m.duration_ms, fps))
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

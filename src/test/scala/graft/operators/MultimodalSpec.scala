package graft.operators

import graft.SparkSpec
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.syntheticMedia(spark, Tables.load(spark, sf, "documents"))

  test("syntheticMedia: schema contract (binary payload + typed metadata)") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("media_id").dataType.typeName == "long")
    assert(media.count() == 500)
    val kinds = media.toDF().select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("extractFeatures runs partition-parallel and is deterministic") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.map(_.brightness).sameElements(f2.map(_.brightness)))
    val f = f1.head
    assert(f.histogram.length == 16)
    assert(math.abs(f.histogram.sum - 1.0) < 1e-9) // normalized histogram
    assert(f.n_bytes > 0)
    assert(f.brightness > 0 && f.brightness < 1)
  }

  test("video frame sampling derives from duration; others sample 1") {
    val feats = Multimodal.extractFeatures(media, fps = 2.0).collect()
    val byKind = feats.groupBy(_.kind)
    assert(byKind("image").forall(_.frames_sampled == 1))
    assert(byKind("audio").forall(_.frames_sampled == 1))
    assert(byKind("video").exists(_.frames_sampled > 1))
  }

  test("ImageCodec: a planted PNG decodes back to its exact dims and colors") {
    for (id <- Seq(0L, 1L, 7L, 255L, 256L, 4999L)) {
      val d = Multimodal.ImageCodec.decode(id, Multimodal.ImageCodec.encodePng(id))
      val (r, g, b) = Multimodal.ImageCodec.plantedColor(id)
      assert(d.width == Multimodal.ImageCodec.plantedWidth(id))
      assert(d.height == Multimodal.ImageCodec.plantedHeight(id))
      // solid color: per-channel mean is EXACTLY the planted channel value
      assert(d.mean_r == r.toDouble && d.mean_g == g.toDouble &&
        d.mean_b == b.toDouble, s"id=$id: $d vs ($r,$g,$b)")
    }
  }

  test("ImageCodec.decode fails loudly on a non-image payload") {
    val e = intercept[IllegalArgumentException](
      Multimodal.ImageCodec.decode(42L, "not a png".getBytes))
    assert(e.getMessage.contains("not a decodable image"))
  }

  test("decodeImages: distributed real decode matches the planted parameters") {
    val real = Multimodal.realMedia(spark, Tables.load(spark, sf, "documents"))
    val decoded = Multimodal.decodeImages(real.repartition(7)).collect()
    assert(decoded.nonEmpty)
    assert(decoded.forall { d =>
      val (r, g, b) = Multimodal.ImageCodec.plantedColor(d.media_id)
      d.width == Multimodal.ImageCodec.plantedWidth(d.media_id) &&
        d.height == Multimodal.ImageCodec.plantedHeight(d.media_id) &&
        d.mean_r == r && d.mean_g == g && d.mean_b == b
    })
  }

  test("extractContentFeatures: all three modalities via real decode") {
    val real = Multimodal.realMedia(spark, Tables.load(spark, sf, "documents"))
    val feats = Multimodal.extractContentFeatures(real).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.n_bytes.isEmpty)) // encoded size is not a content feature
    val byKind = feats.groupBy(_.kind)
    // video: mean channel value across all decoded frames — closed form
    // over the planted per-frame colors (base + f), exact
    assert(byKind("video").forall { f =>
      val id = f.media_id
      val n = Multimodal.VideoCodec.plantedFrames(id)
      val t = (0 until n).map { fr =>
        val (r, g, b) = Multimodal.VideoCodec.plantedColor(id, fr)
        r + g + b
      }.sum
      f.mean_level == t / (3.0 * n)
    })
    assert(byKind("audio").forall { f =>
      f.mean_level == Multimodal.AudioCodec.plantedMeanAbs(f.media_id)
    })
    assert(byKind("image").forall { f =>
      val (r, g, b) = Multimodal.ImageCodec.plantedColor(f.media_id)
      f.mean_level == (r + g + b) / 3.0
    })
  }

  test("VideoCodec: a planted GIF decodes back to its exact frames and delays") {
    for (id <- Seq(2L, 5L, 8L, 11L, 254L, 4999L)) {
      val frames = Multimodal.VideoCodec.decode(id, Multimodal.VideoCodec.encodeGif(id))
      assert(frames.length == Multimodal.VideoCodec.plantedFrames(id))
      frames.zipWithIndex.foreach { case (d, i) =>
        val (r, g, b) = Multimodal.VideoCodec.plantedColor(id, i)
        assert(d.frame_idx == i)
        assert(d.width == Multimodal.VideoCodec.plantedWidth(id))
        assert(d.height == Multimodal.VideoCodec.plantedHeight(id))
        // solid frame: per-channel mean is EXACTLY the planted value
        assert(d.mean_r == r.toDouble && d.mean_g == g.toDouble &&
          d.mean_b == b.toDouble, s"id=$id frame=$i: $d vs ($r,$g,$b)")
        // the delay is REAL GraphicControlExtension metadata read back
        assert(d.delay_cs == Multimodal.VideoCodec.plantedDelayCs(id))
      }
    }
  }

  test("VideoCodec.decode fails loudly on a non-video payload") {
    val e = intercept[IllegalArgumentException](
      Multimodal.VideoCodec.decode(42L, "not a gif".getBytes))
    assert(e.getMessage.contains("not a decodable video"))
    // a single PNG is a decodable IMAGE but not a video container
    val e2 = intercept[IllegalArgumentException](
      Multimodal.VideoCodec.decode(42L, Multimodal.ImageCodec.encodePng(42L)))
    assert(e2.getMessage.contains("expected an animated GIF"))
  }

  test("decodeVideo: distributed real decode matches the planted parameters") {
    val real = Multimodal.realMedia(spark, Tables.load(spark, sf, "documents"))
    val decoded = Multimodal.decodeVideo(real.repartition(7)).collect()
    assert(decoded.nonEmpty)
    val byClip = decoded.groupBy(_.media_id)
    assert(byClip.forall { case (id, frames) =>
      frames.length == Multimodal.VideoCodec.plantedFrames(id)
    })
    assert(decoded.forall { d =>
      val (r, g, b) = Multimodal.VideoCodec.plantedColor(d.media_id, d.frame_idx)
      d.media_id % 3 == 2 &&
        d.width == Multimodal.VideoCodec.plantedWidth(d.media_id) &&
        d.height == Multimodal.VideoCodec.plantedHeight(d.media_id) &&
        d.mean_r == r && d.mean_g == g && d.mean_b == b &&
        d.delay_cs == Multimodal.VideoCodec.plantedDelayCs(d.media_id)
    })
  }

  test("AudioCodec: a planted WAV decodes back to its exact planted waveform") {
    for (id <- Seq(1L, 4L, 7L, 100L, 255L, 4999L)) {
      val d = Multimodal.AudioCodec.decode(id, Multimodal.AudioCodec.encodeWav(id))
      assert(d.sample_rate == Multimodal.AudioCodec.plantedRate(id))
      assert(d.n_samples == Multimodal.AudioCodec.plantedSamples(id).toLong)
      // gapped square wave: mean |amplitude| is exactly A·(n−gap)/n and
      // the peak is A (0 when the clip is all gap)
      assert(d.mean_abs == Multimodal.AudioCodec.plantedMeanAbs(id) &&
        d.peak_abs == Multimodal.AudioCodec.plantedPeak(id), s"id=$id: $d")
    }
  }

  test("decodeAudioFrames: window energies localize the planted silent gap exactly") {
    for (id <- Seq(1L, 4L, 7L, 100L, 255L, 4999L)) {
      val (_, samples) = (Multimodal.AudioCodec.plantedRate(id),
        Multimodal.AudioCodec.encodeWav(id))
      val frames = Multimodal.AudioCodec.readSamples(id, samples)._2
        .grouped(80).map(_.map(s => math.abs(s).toLong).sum).toArray
      val gs = Multimodal.AudioCodec.plantedGapStartWin(id)
      val gl = Multimodal.AudioCodec.plantedGapWins(id)
      frames.zipWithIndex.foreach { case (sum, wi) =>
        val silent = wi >= gs && wi < gs + gl
        assert((sum == 0L) == silent, s"id=$id win=$wi sum=$sum")
      }
      assert(frames.length == Multimodal.AudioCodec.plantedWindows(id))
    }
  }

  test("AudioCodec.decode fails loudly on a non-audio payload") {
    val e = intercept[IllegalArgumentException](
      Multimodal.AudioCodec.decode(42L, "not a wav".getBytes))
    assert(e.getMessage.contains("not a decodable audio"))
  }

  test("decodeAudio: distributed real decode matches the planted waveform") {
    val real = Multimodal.realMedia(spark, Tables.load(spark, sf, "documents"))
    val decoded = Multimodal.decodeAudio(real.repartition(7)).collect()
    assert(decoded.nonEmpty)
    assert(decoded.forall { d =>
      d.media_id % 3 == 1 &&
        d.sample_rate == Multimodal.AudioCodec.plantedRate(d.media_id) &&
        d.n_samples == Multimodal.AudioCodec.plantedSamples(d.media_id).toLong &&
        d.mean_abs == Multimodal.AudioCodec.plantedMeanAbs(d.media_id) &&
        d.peak_abs == Multimodal.AudioCodec.plantedPeak(d.media_id)
    })
  }

  test("resizePlan: output dims bounded by maxDim, aspect preserved-ish") {
    val plan = Multimodal.resizePlan(media, 256).collect()
    assert(plan.forall(r => r.getInt(4) <= 256 && r.getInt(5) <= 256))
    // no upscaling: outputs never exceed inputs
    assert(plan.forall(r => r.getInt(4) <= math.max(r.getInt(2), 1)))
  }

  test("phash: brightness-shift invariant (DC excluded), id-decorrelated") {
    def hashOf(id: Long, shift: Int = 0): Long = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.Phash.encodeTexturedPng(id, shift)))
      Multimodal.Phash.phash64(img)
    }
    // uniform brightness shift moves ZERO bits — the pHash property that
    // catches re-graded duplicates exact dedup misses
    for (id <- Seq(1L, 7L, 42L); s <- Seq(4, 8, 55))
      assert(hashOf(id) == hashOf(id, s), s"id=$id shift=$s")
    // distinct ids decorrelate: hamming far from 0 (63 comparable bits,
    // exactly 31 set each -> random overlap ~ 15; assert > 8)
    val ids = (0L until 20L).map(i => i -> hashOf(i)).toMap
    for (a <- 0L until 20L; b <- (a + 1) until 20L) {
      val d = java.lang.Long.bitCount(ids(a) ^ ids(b))
      assert(d > 8, s"ids $a,$b hamming $d")
    }
    // clipping guard: shifts that could clip are rejected loudly
    intercept[IllegalArgumentException](
      Multimodal.Phash.encodeTexturedPng(1L, shift = 56))
  }

  test("JPEG: gray plants round-trip bit-exact; color envelope stays within the measured bound") {
    import Multimodal.ImageCodec
    // the tolerance ARGUMENT, re-measured every build: the shipped
    // err_le_2 bound rests on a measured round-trip envelope of 1.0
    // (tools/JpegProbe) — this sweep re-derives it over ids covering
    // the full planted (color x dims) space, so a JDK decoder drift
    // past the margin fails HERE before it could reach the gate
    var colorMaxErr = 0.0
    for (id <- 0L until 640L) {
      val d = ImageCodec.decodeJpeg(id, ImageCodec.encodeJpeg(id))
      assert(d.width == ImageCodec.plantedWidth(id) &&
        d.height == ImageCodec.plantedHeight(id), d.toString)
      assert(d.uniform, s"id=$id decoded non-uniform")
      if (ImageCodec.isGrayJpeg(id)) {
        // exact leg: decoded mean IS the planted gray level, bit-exact
        assert(d.gray_mean.contains(ImageCodec.plantedGray(id).toDouble),
          s"id=$id gray drifted: $d")
      } else {
        assert(d.gray_mean.isEmpty)
        val (pr, pg, pb) = ImageCodec.plantedColor(id)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(ImageCodec.encodeJpeg(id)))
        val p = img.getRGB(0, 0)
        val err = Seq(((p >> 16) & 0xff) - pr, ((p >> 8) & 0xff) - pg,
          (p & 0xff) - pb).map(v => math.abs(v.toDouble)).max
        colorMaxErr = math.max(colorMaxErr, err)
      }
      assert(d.err_le_2, s"id=$id outside the shipped bound: $d")
    }
    assert(colorMaxErr <= 1.0,
      f"measured color envelope grew to $colorMaxErr%.3f - re-derive the bound")
  }

  test("decodeJpegs: distributed real decode over the jpeg fixture") {
    val docs = Tables.load(spark, sf, "documents")
    val out = Multimodal.decodeJpegs(Multimodal.jpegMedia(spark, docs))
      .collect()
    assert(out.length == docs.count())
    assert(out.forall(_.uniform) && out.forall(_.err_le_2))
    val gray = out.filter(_.is_gray)
    assert(gray.nonEmpty && gray.forall(d =>
      d.gray_mean.contains(Multimodal.ImageCodec.plantedGray(d.media_id).toDouble)))
  }

  test("textured JPEG: envelopes re-derived per leg (grad exact, checker 0.022, 4:2:0 0.58)") {
    import graft.operators.Multimodal.ImageCodec
    javax.imageio.ImageIO.setUseCache(false)
    // re-measure each leg's envelope over a deterministic id sample that
    // covers every (kind, dim, param) residue class the fixtures can hit
    // (moduli 3/25/13/96/2/128/96/240 — 2400 consecutive ids cover the
    // dim x kind space and a broad parameter mix); the shipped bounds
    // (grad 0.0, checker 0.1, color420 2.0) must hold with margin
    val errs = Array(0.0, 0.0, 0.0)
    for (id <- 0L until 2400L) {
      val d = ImageCodec.decodeJpegTextured(id, ImageCodec.encodeJpegTextured(id))
      assert(d.within_env, s"id=$id escaped its leg's shipped envelope: $d")
      val (pr, _, _) = ImageCodec.texPlantedSums(id)
      val k = ImageCodec.texKind(id)
      if (k == 0)
        assert(d.gray_sum.contains(pr),
          s"id=$id: gradient leg no longer decodes bit-exact (got ${d.gray_sum}, want $pr)")
      d.gray_sum.foreach { got =>
        errs(k) = math.max(errs(k),
          math.abs(got - pr).toDouble / (d.width.toLong * d.height))
      }
    }
    assert(errs(0) == 0.0, f"gradient leg drifted: ${errs(0)}%.5f")
    // the checker leg's gray_sum is None by design; its envelope is
    // asserted through within_env above (bound 0.1, measured 0.022)
  }

  test("decodeJpegsTextured: distributed real decode over the textured fixture") {
    val docs = Tables.load(spark, sf, "documents")
    val out = Multimodal.decodeJpegsTextured(
      Multimodal.jpegTexturedMedia(spark, docs)).collect()
    assert(out.length == docs.count())
    assert(out.forall(_.within_env))
    val grads = out.filter(_.kind == "grad")
    assert(grads.nonEmpty && grads.forall(d =>
      d.gray_sum.contains(Multimodal.ImageCodec.texPlantedSums(d.media_id)._1)))
    assert(out.filter(_.kind == "checker").forall(_.gray_sum.isEmpty))
    assert(out.filter(_.kind == "color420").forall(_.gray_sum.isEmpty))
  }

  test("phashPairs: planted exact + brightness clones surface, nothing else") {
    val docs = Tables.load(spark, sf, "documents")
    val pairs = Multimodal.phashPairs(
      Multimodal.phashHashes(Multimodal.phashMedia(spark, docs)), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val n = docs.count().toInt
    val expected = ((0L until math.min(50, n).toLong).map(i => (i, i + 1000000L)) ++
      (50L until math.min(100, n).toLong).map(i => (i, i + 2000000L))).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == expected, s"got ${pairs.length}")
    // every planted pair is hamming 0 — byte-clones trivially, shifted
    // clones because the shift lives entirely in the excluded DC term
    assert(pairs.forall(_._3 == 0), pairs.filter(_._3 != 0).mkString(","))
  }
}

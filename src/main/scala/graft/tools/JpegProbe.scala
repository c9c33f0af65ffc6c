package graft.tools

/** Measurement behind the `multimodal_jpeg` oracle design (the
  * measure-first discipline): is the JDK JPEG round-trip
  * (`javax.imageio` write at an explicit quality → read) EXACT for the
  * planted image classes, and if not, how large is the per-channel
  * error?
  *
  * Hypotheses probed:
  *  - solid GRAY (r=g=b=v) at quality 1.0: RGB→YCbCr maps gray to
  *    (Y=v, Cb=Cr=128) exactly, a constant block's DCT is DC-only, and
  *    the all-ones quantization table at q=1.0 preserves it — so the
  *    decode should return the planted value bit-exactly (the PNG/GIF
  *    "lossless by construction" trick, one codec over);
  *  - solid COLOR at quality 1.0 and 0.9: chroma rounding makes the
  *    decode approximate — the probe reports the max |err| per channel
  *    so the tolerance leg's bound is MEASURED, not guessed.
  *
  * No Spark session — pure JVM codec probe.
  * Usage: `sbt "runMain graft.tools.JpegProbe"`.
  */
object JpegProbe {

  private def encode(w: Int, h: Int, r: Int, g: Int, b: Int,
                     quality: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  private def decodeStats(bytes: Array[Byte]): (Int, Int, Double, Double, Double, Boolean) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var uniform = true
    val first = img.getRGB(0, 0)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      if (p != first) uniform = false
      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
    }
    val n = w.toLong * h
    (w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, uniform)
  }

  private def encodeImg(img: java.awt.image.BufferedImage,
                        quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  /** Per-component (h, v) sampling factors from the SOF0/SOF1 frame
    * header — 2x2,1x1,1x1 is 4:2:0 chroma subsampling, all-1x1 is
    * 4:4:4. Measures WHICH mode the JDK writer picked at a quality. */
  def sofSampling(jpeg: Array[Byte]): Seq[(Int, Int)] = {
    var i = 2
    while (i + 3 < jpeg.length) {
      val marker = jpeg(i + 1) & 0xff
      val len = ((jpeg(i + 2) & 0xff) << 8) | (jpeg(i + 3) & 0xff)
      if ((jpeg(i) & 0xff) == 0xff && (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)) {
        val nComp = jpeg(i + 9) & 0xff
        return (0 until nComp).map { c =>
          val sv = jpeg(i + 11 + 3 * c) & 0xff
          ((sv >> 4) & 0xf, sv & 0xf)
        }
      }
      i += 2 + len
    }
    Seq.empty
  }

  /** Horizontal gray gradient value(x) = a + s*x (bounded ≤ 255 by
    * construction — no modulo wrap, so the planted mean is the exact
    * rational a + s*(w−1)/2). Multi-block dims: per-block DCT with live
    * AC coefficients, unlike the solid plants. */
  def gradientImg(w: Int, h: Int, a: Int, s: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = a + s * x
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  /** Per-pixel gray checkerboard (v1/v2) — the highest-frequency DCT
    * content a plant can carry. */
  def checkerImg(w: Int, h: Int, v1: Int, v2: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if ((x + y) % 2 == 0) v1 else v2
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  def main(args: Array[String]): Unit = {
    // gray sweep: every v in 0..255, several non-8-multiple dims
    var grayExact = true
    var grayMaxErr = 0.0
    for (v <- 0 to 255; (w, h) <- Seq((2, 3), (9, 5), (17, 11))) {
      val (dw, dh, mr, mg, mb, uni) = decodeStats(encode(w, h, v, v, v, 1.0f))
      val err = Seq(mr, mg, mb).map(m => math.abs(m - v)).max
      grayMaxErr = math.max(grayMaxErr, err)
      if (err != 0.0 || dw != w || dh != h || !uni) grayExact = false
    }
    println(s"gray q=1.0: exact=$grayExact maxErr=$grayMaxErr")

    // color sweep at two qualities: report measured error envelope
    for (q <- Seq(1.0f, 0.9f)) {
      var maxErr = 0.0
      var allUniform = true
      for (id <- 0L until 256L) {
        val (r, g, b) =
          ((id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt)
        val (w, h) = ((id % 8).toInt + 2, (id % 5).toInt + 2)
        val (_, _, mr, mg, mb, uni) = decodeStats(encode(w, h, r, g, b, q))
        if (!uni) allUniform = false
        maxErr = math.max(maxErr,
          Seq(mr - r, mg - g, mb - b).map(math.abs).max)
      }
      println(f"color q=$q%.1f: maxErr=$maxErr%.3f uniform=$allUniform")
    }

    // ---- r13: textured plants (per-block DCT with live AC terms) and
    // the chroma-subsampling question, measured before the oracle ships

    // which subsampling mode does the JDK writer pick per quality?
    for (q <- Seq(1.0f, 0.95f, 0.9f, 0.75f, 0.5f)) {
      val samp = sofSampling(encodeImg(gradientImg(32, 24, 10, 2), q))
      println(s"sof q=$q: sampling=${samp.mkString(",")}")
    }

    // gray gradient sweep, q=1.0: multi-block dims, mean error vs the
    // exact rational planted mean a + s*(w-1)/2
    var gradMaxErr = 0.0
    for (a <- Seq(0, 7, 33, 101); s <- Seq(1, 2, 3);
         (w, h) <- Seq((24, 16), (33, 17), (40, 9))) {
      if (a + s * (w - 1) <= 255) {
        val (dw, dh, mr, mg, mb, _) = decodeStats(encodeImg(gradientImg(w, h, a, s), 1.0f))
        require(dw == w && dh == h)
        val want = a + s * (w - 1) / 2.0
        gradMaxErr = math.max(gradMaxErr,
          Seq(mr, mg, mb).map(m => math.abs(m - want)).max)
      }
    }
    println(f"gray gradient q=1.0: meanMaxErr=$gradMaxErr%.4f")

    // gray checkerboard sweep, q=1.0: highest-frequency content
    var chkMaxErr = 0.0
    for ((v1, v2) <- Seq((0, 255), (40, 200), (100, 140), (17, 230));
         (w, h) <- Seq((24, 16), (33, 17), (40, 9))) {
      val (_, _, mr, mg, mb, _) = decodeStats(encodeImg(checkerImg(w, h, v1, v2), 1.0f))
      val n = w.toLong * h
      val n1 = (n + 1) / 2 // (x+y) even count for any w,h: ceil(n/2)... measured below
      // exact planted mean: count of even-(x+y) cells
      var c1 = 0L
      for (y <- 0 until h; x <- 0 until w) if ((x + y) % 2 == 0) c1 += 1
      val want = (c1 * v1 + (n - c1) * v2).toDouble / n
      require(n1 > 0)
      chkMaxErr = math.max(chkMaxErr,
        Seq(mr, mg, mb).map(m => math.abs(m - want)).max)
    }
    println(f"gray checker q=1.0: meanMaxErr=$chkMaxErr%.4f")

    // color gradient at q=0.9 (the 4:2:0 leg if the SOF probe says the
    // writer subsamples there): R gradient, G/B solid
    for (q <- Seq(0.9f, 0.75f)) {
      var err = 0.0
      for (a <- Seq(0, 33, 101); s <- Seq(1, 2); (w, h) <- Seq((24, 16), (33, 17))) {
        if (a + s * (w - 1) <= 255) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until h; x <- 0 until w) {
            val r = a + s * x
            img.setRGB(x, y, (r << 16) | (80 << 8) | 160)
          }
          val (_, _, mr, mg, mb, _) = decodeStats(encodeImg(img, q))
          val wantR = a + s * (w - 1) / 2.0
          err = math.max(err, math.max(math.abs(mr - wantR),
            math.max(math.abs(mg - 80), math.abs(mb - 160))))
        }
      }
      println(f"color gradient q=$q%.2f: meanMaxErr=$err%.4f sampling=${
        sofSampling(encodeImg(gradientImg(32, 24, 10, 2), q)).mkString(",")}")
    }
  }
}

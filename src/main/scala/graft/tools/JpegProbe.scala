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
  }
}

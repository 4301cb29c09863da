package graft

import graft.ops.{Jpeg, JpegFixture}

/** The JPEG codec's differential proof (the PNG discipline): the pixel
  * decoder round-trips `javax.imageio`'s OWN encoder output against the
  * JDK's independent libjpeg-based decoder, and the marker walk matches
  * the fixture formulas. Tolerances: ±1 per sample on gray (pure IDCT
  * rounding — T.83 grants DCT decoders ±1), ±3 on RGB (the luma and
  * chroma ±1s amplify through the conversion coefficients; measured max
  * is 3 across the fixture, mean ≲ 0.1). */
class JpegSpec extends SparkSpec {

  test("marker walk matches the fixture formulas (all files)") {
    for (i <- 0 until JpegFixture.count) {
      val m = Jpeg.parseMeta(f"img_$i%03d.jpg", JpegFixture.jpegBytes(i))
      assert(m.width === JpegFixture.widthOf(i))
      assert(m.height === JpegFixture.heightOf(i))
      if (JpegFixture.isGray(i)) {
        assert(m.n_components === 1 && m.samp === "1x1")
        assert(m.n_dqt === 1 && m.n_dht === 2)
      } else {
        assert(m.n_components === 3 && m.samp === "2x2,1x1,1x1")
        assert(m.n_dqt === 2 && m.n_dht === 4)
      }
      assert(m.entropy_bytes > 0 && m.dqt_luma_sum > 0)
    }
    // quality is monotone in the quant table: same layout, higher q ->
    // smaller quantizers -> smaller table sum (i=1 q=0.60 vs i=7 q=0.90,
    // both color)
    val lo = Jpeg.parseMeta("lo.jpg", JpegFixture.jpegBytes(1))
    val hi = Jpeg.parseMeta("hi.jpg", JpegFixture.jpegBytes(7))
    assert(hi.dqt_luma_sum < lo.dqt_luma_sum)
  }

  test("gray pixel decode matches the JDK decoder within +-1 (IDCT rounding)") {
    for (i <- 0 until JpegFixture.count if JpegFixture.isGray(i)) {
      val bytes = JpegFixture.jpegBytes(i)
      val (w, h, planes) = Jpeg.decodePlanes(s"g$i", bytes)
      assert(planes.size === 1)
      val (_, _, pw, _, y) = planes.head
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(ref.getWidth === w && ref.getHeight === h)
      var maxd = 0
      for (yy <- 0 until h; xx <- 0 until w) {
        // raster samples, not getRGB: TYPE_BYTE_GRAY's getRGB applies a
        // colorspace (gamma) conversion that is not part of the codec
        val d = math.abs(ref.getRaster.getSample(xx, yy, 0) - y(yy * pw + xx))
        maxd = math.max(maxd, d)
      }
      assert(maxd <= 1, s"file $i: gray maxdiff $maxd")
    }
  }

  test("color pixel decode (4:2:0 fancy upsample + fixed-point YCbCr) " +
      "matches the JDK decoder within +-2") {
    for (i <- 0 until JpegFixture.count if !JpegFixture.isGray(i)) {
      val bytes = JpegFixture.jpegBytes(i)
      val (w, h, rgb) = Jpeg.decodeRgb(s"c$i", bytes)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(ref.getWidth === w && ref.getHeight === h)
      var maxd = 0; var sumd = 0L
      for (yy <- 0 until h; xx <- 0 until w) {
        val a = ref.getRGB(xx, yy); val b = rgb(yy * w + xx)
        for (sh <- Seq(16, 8, 0)) {
          val d = math.abs(((a >> sh) & 0xff) - ((b >> sh) & 0xff))
          maxd = math.max(maxd, d); sumd += d
        }
      }
      // +-3, not +-2: the luma's +-1 IDCT rounding and the chroma's +-1
      // amplify through the conversion coefficients (1.772 on blue), so
      // isolated pixels can land 3 off; the mean bound keeps the test
      // sharp (a wrong upsample or color matrix reads 5-60x this)
      assert(maxd <= 3, s"file $i: rgb maxdiff $maxd")
      val mean = sumd.toDouble / (3L * w * h)
      assert(mean <= 0.2, s"file $i: rgb meandiff $mean")
    }
  }

  test("progressive JPEG refuses loudly (SOF2), truncation refuses loudly") {
    // the JDK encoder CAN write progressive — the refusal is tested
    // against a real SOF2 stream, not a hand-mangled header
    import java.awt.image.BufferedImage
    val img = new BufferedImage(24, 16, BufferedImage.TYPE_3BYTE_BGR)
    for (x <- 0 until 24; y <- 0 until 16)
      img.setRGB(x, y, JpegFixture.rgbOf(0, x, y))
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = wr.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bo = new java.io.ByteArrayOutputStream()
    wr.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bo))
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wr.dispose()
    val prog = bo.toByteArray
    val e1 = intercept[IllegalArgumentException] {
      Jpeg.parseMeta("prog.jpg", prog)
    }
    assert(e1.getMessage.contains("non-baseline"))
    val e2 = intercept[IllegalArgumentException] {
      Jpeg.decodePlanes("prog.jpg", prog)
    }
    assert(e2.getMessage.contains("non-baseline"))
    val trunc = JpegFixture.jpegBytes(0).take(40)
    val e3 = intercept[IllegalArgumentException] {
      Jpeg.parseMeta("t.jpg", trunc)
    }
    assert(e3.getMessage.contains("truncated") ||
      e3.getMessage.contains("invalid length"))
  }

  test("scanJpeg decodes the on-disk fixture through binaryFile") {
    val dir = JpegFixture.ensure()
    val got = Jpeg.scanJpeg(
        spark.read.format("binaryFile").load(dir + "/*.jpg"))
      .collect().map(m => m.file_name -> m).toMap
    assert(got.size === JpegFixture.count)
    for (i <- 0 until JpegFixture.count) {
      val m = got(f"img_$i%03d.jpg")
      assert(m.width === JpegFixture.widthOf(i) &&
        m.height === JpegFixture.heightOf(i))
    }
  }
}

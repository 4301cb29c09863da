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
      assert(m.progressive === JpegFixture.isProgressive(i))
      if (JpegFixture.isProgressive(i)) {
        // SOF2 streams: the census reads the frame header; the DQT/DHT
        // walk still counts only the pre-first-SOS segments, and the
        // multi-scan structure shows up as n_scans > 1
        assert(m.n_components === (if (JpegFixture.isGray(i)) 1 else 3))
        assert(m.n_scans > 1, s"file $i: progressive with one scan?")
      } else {
        assert(m.n_scans === 1)
        if (JpegFixture.isGray(i)) {
          assert(m.n_components === 1 && m.samp === "1x1")
          assert(m.n_dqt === 1 && m.n_dht === 2)
        } else {
          assert(m.n_components === 3 && m.samp === "2x2,1x1,1x1")
          assert(m.n_dqt === 2 && m.n_dht === 4)
        }
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
    // r15: progressive files are no longer excluded — SOF2 decode runs
    // the same differential at the same tolerance
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

  test("progressive JPEG: census reads it, pixel decode matches the JDK") {
    // the JDK encoder CAN write progressive — and since r15 the decoder
    // runs the full §G successive-approximation algorithm, so the SOF2
    // stream goes through the same differential as baseline: decodeRgb
    // against the JDK's own decoder at the color tolerance
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
    val m = Jpeg.parseMeta("prog.jpg", prog)
    assert(m.progressive && m.width === 24 && m.height === 16)
    assert(m.n_scans > 1, "a JDK progressive stream has multiple scans")
    val (w2, h2, rgb) = Jpeg.decodeRgb("prog.jpg", prog)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(prog))
    assert(w2 === 24 && h2 === 16)
    var maxd = 0
    for (yy <- 0 until h2; xx <- 0 until w2; sh <- Seq(16, 8, 0))
      maxd = math.max(maxd, math.abs(
        ((ref.getRGB(xx, yy) >> sh) & 0xff) - ((rgb(yy * w2 + xx) >> sh) & 0xff)))
    assert(maxd <= 3, s"progressive rgb maxdiff $maxd")
    val trunc = JpegFixture.jpegBytes(0).take(40)
    val e3 = intercept[IllegalArgumentException] {
      Jpeg.parseMeta("t.jpg", trunc)
    }
    assert(e3.getMessage.contains("truncated") ||
      e3.getMessage.contains("invalid length"))
  }

  test("parseMeta handles the general format the JDK never emits: " +
      "multi-table segments, 16-bit quant precision, last-wins replace") {
    // hand-built marker stream (header census only — no entropy decode):
    // SOI, DQT[16-bit tq=0], DQT[8-bit tq=1 + 8-bit tq=0 in ONE segment],
    // SOF0, DHT[dc0 + ac0 in ONE segment], SOS, 1 entropy byte, EOI.
    // The SECOND tq=0 table must win (T.81 replace rule), so
    // dqt_luma_sum is the 8-bit table's sum, not the 16-bit one's.
    val bo = new java.io.ByteArrayOutputStream()
    def seg(mk: Int, payload: Array[Int]): Unit = {
      bo.write(0xFF); bo.write(mk)
      bo.write((payload.length + 2) >> 8); bo.write((payload.length + 2) & 0xff)
      payload.foreach(bo.write)
    }
    bo.write(0xFF); bo.write(0xD8)
    // 16-bit tq=0: value i at entry i as (0, i) big-endian -> sum 2016
    seg(0xDB, Array(0x10) ++ (0 until 64).flatMap(i => Seq(0, i)))
    // one segment, TWO 8-bit tables: tq=1 (all 7s), then tq=0 (all 2s)
    seg(0xDB, (Array(0x01) ++ Array.fill(64)(7)) ++
      (Array(0x00) ++ Array.fill(64)(2)))
    // SOF0: 8-bit, 9x17, 1 component (id 1, 1x1, tq 0)
    seg(0xC0, Array(8, 0, 9, 0, 17, 1, 1, 0x11, 0))
    // one DHT segment, TWO trivial tables (dc0, ac0): one 1-bit code each
    val oneCode = Array(1) ++ Array.fill(15)(0) ++ Array(5)
    seg(0xC4, (Array(0x00) ++ oneCode) ++ (Array(0x10) ++ oneCode))
    seg(0xDA, Array(1, 1, 0x00, 0, 63, 0))
    bo.write(0xA5) // entropy byte (never decoded by parseMeta)
    bo.write(0xFF); bo.write(0xD9)
    val m = Jpeg.parseMeta("gen.jpg", bo.toByteArray)
    assert(m.width === 17 && m.height === 9)
    assert(m.n_components === 1 && m.samp === "1x1")
    assert(m.n_dqt === 3, "16-bit table + two 8-bit tables in one segment")
    assert(m.n_dht === 2, "two Huffman tables in one segment")
    assert(m.dqt_luma_sum === 128L, "the LAST tq=0 table must win")
    assert(m.entropy_bytes === 1L)
    assert(m.n_segments === 5)
    assert(!m.progressive && m.n_scans === 1)
  }

  test("odd-dimension differential: partial MCUs, gray+color, " +
      "baseline+progressive") {
    // progressive decoders break first at the edges: partial MCUs at
    // the right/bottom, and the NON-INTERLEAVED ceil(size/8) block
    // grids of single-component AC scans diverging from the MCU-padded
    // storage grid. Every (dims, gray/color, baseline/progressive)
    // cell runs the same JDK differential as the fixture tests.
    import java.awt.image.BufferedImage
    for ((w, h) <- Seq((1, 1), (7, 3), (8, 8), (9, 17), (31, 15),
           (33, 34));
         gray <- Seq(true, false);
         progressive <- Seq(false, true)) {
      val img = new BufferedImage(w, h,
        if (gray) BufferedImage.TYPE_BYTE_GRAY
        else BufferedImage.TYPE_3BYTE_BGR)
      for (x <- 0 until w; y <- 0 until h) {
        // deterministic texture with edges and gradients
        val v = (x * 37 + y * 91 + (x * y) % 53) % 256
        img.setRGB(x, y,
          if (gray) (v << 16) | (v << 8) | v
          else (v << 16) | (((x * 11 + y * 5) % 256) << 8) |
            ((255 - v) & 0xff))
      }
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
        .next()
      val p = wr.getDefaultWriteParam
      if (progressive)
        p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bo = new java.io.ByteArrayOutputStream()
      wr.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bo))
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      wr.dispose()
      val bytes = bo.toByteArray
      val tag = s"${w}x$h gray=$gray prog=$progressive"
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (gray) {
        val (w2, h2, planes) = Jpeg.decodePlanes(tag, bytes)
        assert(w2 === w && h2 === h, tag)
        val (_, _, pw, _, y2) = planes.head
        var maxd = 0
        for (yy <- 0 until h; xx <- 0 until w)
          maxd = math.max(maxd, math.abs(
            ref.getRaster.getSample(xx, yy, 0) - y2(yy * pw + xx)))
        assert(maxd <= 1, s"$tag: gray maxdiff $maxd")
      } else {
        val (w2, h2, rgb) = Jpeg.decodeRgb(tag, bytes)
        assert(w2 === w && h2 === h, tag)
        var maxd = 0
        for (yy <- 0 until h; xx <- 0 until w; sh <- Seq(16, 8, 0))
          maxd = math.max(maxd, math.abs(
            ((ref.getRGB(xx, yy) >> sh) & 0xff) -
              ((rgb(yy * w + xx) >> sh) & 0xff)))
        assert(maxd <= 3, s"$tag: rgb maxdiff $maxd")
      }
    }
  }

  test("4:2:2 pixel path matches the JDK (h2v1 fancy upsample); " +
      "4:1:1 refuses") {
    import java.awt.image.BufferedImage
    def paint(w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, JpegFixture.rgbOf(1, x, y))
      img
    }
    // odd widths make the chroma plane's ceil-width edge load-bearing
    for ((w, h) <- Seq((8, 8), (9, 17), (24, 16), (31, 15), (33, 34))) {
      val bytes = encodeSampled(paint(w, h), 2, 1)
      val tag = s"${w}x$h 422"
      val m = Jpeg.parseMeta(tag, bytes)
      assert(m.samp === "2x1,1x1,1x1", s"$tag: writer emitted ${m.samp}")
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val (w2, h2, rgb) = Jpeg.decodeRgb(tag, bytes)
      assert(w2 === w && h2 === h, tag)
      var maxd = 0
      for (yy <- 0 until h; xx <- 0 until w; sh <- Seq(16, 8, 0))
        maxd = math.max(maxd, math.abs(
          ((ref.getRGB(xx, yy) >> sh) & 0xff) -
            ((rgb(yy * w + xx) >> sh) & 0xff)))
      assert(maxd <= 3, s"$tag: rgb maxdiff $maxd")
    }
    // a genuinely unsupported grid (4:1:1, 4x1 luma) still refuses
    val b411 = encodeSampled(paint(24, 16), 4, 1)
    assert(Jpeg.parseMeta("411.jpg", b411).samp === "4x1,1x1,1x1")
    val e = intercept[IllegalArgumentException] {
      Jpeg.decodeRgb("411.jpg", b411)
    }
    assert(e.getMessage.contains("unsupported chroma geometry"))
  }

  test("4:4:0 pixel path matches the JDK (h1v2 fancy upsample)") {
    import java.awt.image.BufferedImage
    def paint(w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, JpegFixture.rgbOf(2, x, y))
      img
    }
    // odd heights make the chroma plane's ceil-height edge load-bearing
    for ((w, h) <- Seq((8, 8), (17, 9), (16, 24), (15, 31), (34, 33))) {
      val bytes = encodeSampled(paint(w, h), 1, 2)
      val tag = s"${w}x$h 440"
      val m = Jpeg.parseMeta(tag, bytes)
      assert(m.samp === "1x2,1x1,1x1", s"$tag: writer emitted ${m.samp}")
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val (w2, h2, rgb) = Jpeg.decodeRgb(tag, bytes)
      assert(w2 === w && h2 === h, tag)
      var maxd = 0
      for (yy <- 0 until h; xx <- 0 until w; sh <- Seq(16, 8, 0))
        maxd = math.max(maxd, math.abs(
          ((ref.getRGB(xx, yy) >> sh) & 0xff) -
            ((rgb(yy * w + xx) >> sh) & 0xff)))
      info(s"$tag maxdiff $maxd")
      assert(maxd <= 3, s"$tag: rgb maxdiff $maxd")
    }
  }

  /** JDK-encode with explicit luma sampling factors via the native
    * metadata tree (the writer exposes no direct subsampling knob). */
  private def encodeSampled(img: java.awt.image.BufferedImage,
      hs: Int, vs: Int): Array[Byte] = {
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = wr.getDefaultWriteParam
    val typ = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
    val md = wr.getDefaultImageMetadata(typ, p)
    val fmt = "javax_imageio_jpeg_image_1.0"
    val tree = md.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
    val comps = tree.getElementsByTagName("componentSpec")
    val y = comps.item(0).asInstanceOf[org.w3c.dom.Element]
    y.setAttribute("HsamplingFactor", hs.toString)
    y.setAttribute("VsamplingFactor", vs.toString)
    md.setFromTree(fmt, tree)
    val bo = new java.io.ByteArrayOutputStream()
    wr.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bo))
    wr.write(null, new javax.imageio.IIOImage(img, null, md), p)
    wr.dispose()
    bo.toByteArray
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

package graft

import graft.ops.{Pdf, PdfFixture}

class PdfSpec extends SparkSpec {

  test("xref walk + Tj/TJ extraction matches the fixture formulas") {
    for (i <- 0 until PdfFixture.count) {
      val pages = Pdf.parse(f"doc_$i%03d.pdf", PdfFixture.pdfBytes(i))
      assert(pages.length === PdfFixture.pagesOf(i))
      pages.zipWithIndex.foreach { case (pg, p) =>
        assert(pg.page === p + 1)
        assert(pg.text === PdfFixture.textOf(i, p))
        assert(pg.n_lits === 3)
        assert(pg.stream_bytes === PdfFixture.contentOf(i, p).length.toLong)
      }
    }
  }

  test("FlateDecode content streams parse identically to plain") {
    // re-pack every content stream compressed, keeping xref offsets
    // correct by rebuilding the file through the same writer logic
    for (i <- 0 until PdfFixture.count) {
      val plain = Pdf.parse(f"doc_$i%03d.pdf", PdfFixture.pdfBytes(i))
      val gz = Pdf.parse(f"doc_$i%03d.pdf", deflateVariant(i))
      // /Length legitimately measures the COMPRESSED bytes in the
      // variant; everything the extractor derives must be identical
      assert(gz.map(_.copy(stream_bytes = 0L)) ===
        plain.map(_.copy(stream_bytes = 0L)))
    }
  }

  test("malformed files refuse loudly") {
    val good = PdfFixture.pdfBytes(0)
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    // truncated: startxref points past the cut
    val e1 = intercept[IllegalArgumentException] {
      Pdf.parse("t.pdf", good.take(good.length / 2))
    }
    assert(e1.getMessage.nonEmpty)
    // a corrupted xref offset no longer lands on its object header
    // (NB lastIndexOf("xref") would match inside "startxref")
    val xrefPos = s.lastIndexOf("\nxref\n") + 1
    val entry = s.indexOf("\n", s.indexOf("\n", xrefPos) + 1) + 1 + 20
    val bad = good.clone()
    bad(entry + 8) = '9' // a low digit of object 1's offset
    val e2 = intercept[IllegalArgumentException] {
      Pdf.parse("x.pdf", bad)
    }
    assert(e2.getMessage.contains("xref") ||
      e2.getMessage.contains("does not hold"))
    // /Length that does not land on endstream
    val lenAt = s.indexOf("/Length ")
    val bad2 = good.clone()
    bad2(lenAt + 8) = '9'
    val e3 = intercept[IllegalArgumentException] {
      Pdf.parse("l.pdf", bad2)
    }
    assert(e3.getMessage.contains("endstream") ||
      e3.getMessage.contains("overruns"))
  }

  test("escape grammar: octal, control escapes, nesting, continuations") {
    val (t1, n1) = Pdf.extractText("e", "BT (a\\051b\\tc) Tj ET")
    assert(t1 === "a)b\tc" && n1 === 1)
    val (t2, n2) = Pdf.extractText("e", "BT (nested (parens) ok) Tj ET")
    assert(t2 === "nested (parens) ok" && n2 === 1)
    val (t3, n3) = Pdf.extractText("e", "BT (split\\\nline) Tj ET")
    assert(t3 === "splitline" && n3 === 1)
    // \<CR> and \<CR><LF> are continuations too (ISO 32000 §7.3.4.2) —
    // neither may inject a CR into the text (ADVICE r14)
    val (t3b, _) = Pdf.extractText("e", "BT (split\\\rline) Tj ET")
    assert(t3b === "splitline")
    val (t3c, _) = Pdf.extractText("e", "BT (split\\\r\nline) Tj ET")
    assert(t3c === "splitline")
    // a literal NOT bound to a text operator contributes nothing
    val (t4, n4) = Pdf.extractText("e",
      "BT (shown) Tj (ignored) Tw [(a) -1 (b)] TJ ET")
    assert(t4 === "shownab" && n4 === 3)
  }

  test("scanPdf reads the on-disk fixture through binaryFile") {
    val dir = PdfFixture.ensure()
    val got = Pdf.scanPdf(
        spark.read.format("binaryFile").load(dir + "/*.pdf"))
      .collect().groupBy(_.file_name)
    assert(got.size === PdfFixture.count)
    for (i <- 0 until PdfFixture.count)
      assert(got(f"doc_$i%03d.pdf").length === PdfFixture.pagesOf(i))
  }

  /** File i with every content stream FlateDecode-compressed — built by
    * the same object/xref bookkeeping as the fixture writer, so offsets
    * stay exact while /Length now measures the compressed bytes. */
  private def deflateVariant(i: Int): Array[Byte] = {
    val np = PdfFixture.pagesOf(i)
    val fontObj = 3 + 2 * np
    val kids = (0 until np).map(p => s"${3 + 2 * p} 0 R").mkString(" ")
    def deflate(s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      d.finish()
      val buf = new Array[Byte](s.length * 2 + 64)
      val n = d.deflate(buf)
      d.end()
      buf.take(n)
    }
    val bodies: Seq[(Int, Array[Byte])] = (Seq(
      1 -> s"<< /Type /Catalog /Pages 2 0 R >>".getBytes("ISO-8859-1"),
      2 -> s"<< /Type /Pages /Kids [$kids] /Count $np >>".getBytes("ISO-8859-1")) ++
      (0 until np).flatMap { p =>
        val cz = deflate(PdfFixture.contentOf(i, p))
        Seq(
          (3 + 2 * p) -> (s"<< /Type /Page /Parent 2 0 R " +
            s"/MediaBox [0 0 612 792] /Contents ${4 + 2 * p} 0 R " +
            s"/Resources << /Font << /F1 $fontObj 0 R >> >> >>")
            .getBytes("ISO-8859-1"),
          (4 + 2 * p) -> (
            (s"<< /Length ${cz.length} /Filter /FlateDecode >>\nstream\n")
              .getBytes("ISO-8859-1") ++ cz ++
              "\nendstream".getBytes("ISO-8859-1")))
      } ++ Seq(
      fontObj -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        .getBytes("ISO-8859-1")))
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes("ISO-8859-1"))
    val offsets = new Array[Int](fontObj + 1)
    bodies.foreach { case (n, b) =>
      offsets(n) = out.size()
      out.write(s"$n 0 obj\n".getBytes("ISO-8859-1"))
      out.write(b)
      out.write("\nendobj\n".getBytes("ISO-8859-1"))
    }
    val xrefPos = out.size()
    out.write(s"xref\n0 ${fontObj + 1}\n".getBytes("ISO-8859-1"))
    out.write("0000000000 65535 f \n".getBytes("ISO-8859-1"))
    (1 to fontObj).foreach(n =>
      out.write(f"${offsets(n)}%010d 00000 n \n".getBytes("ISO-8859-1")))
    out.write((s"trailer\n<< /Size ${fontObj + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefPos\n%%EOF\n").getBytes("ISO-8859-1"))
    out.toByteArray
  }
}

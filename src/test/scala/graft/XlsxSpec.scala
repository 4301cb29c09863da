package graft

import graft.ops.{Xlsx, XlsxFixture}

/** The real-XLSX reader's two independent checks (the gate oracle is the
  * third): parse equals the generation FORMULA (so a bug shared by the
  * zip writer and reader still fails), and the reader is codec-complete —
  * the gate fixture uses STORED entries (so the DuckDB oracle can see the
  * XML), but the same workbooks re-packed with DEFLATE must parse
  * identically, proving nothing about the reader depends on the
  * compression method choice. */
class XlsxSpec extends SparkSpec {

  test("parse matches the generation formula (all files, all cells)") {
    for (i <- 0 until XlsxFixture.count) {
      val rows = Xlsx.parseWorkbook(f"wb_$i%03d.xlsx",
        XlsxFixture.workbookBytes(i)).sortBy(_.row_id)
      assert(rows.size === 3 + i % 3)
      rows.foreach { r =>
        assert(r.client === s"client_${(i * 7 + (r.row_id - 1) % 3) % 5}")
        assert(r.amount === (i * 31 + r.row_id * 7) % 1000)
        assert(r.note === s"note_${i}_${r.row_id}")
      }
    }
  }

  test("DEFLATE-compressed workbooks parse identically to STORED ones") {
    for (i <- 0 until XlsxFixture.count) {
      val stored = Xlsx.parseWorkbook("wb.xlsx",
        XlsxFixture.workbookBytes(i, stored = true)).sortBy(_.row_id)
      val deflated = Xlsx.parseWorkbook("wb.xlsx",
        XlsxFixture.workbookBytes(i, stored = false)).sortBy(_.row_id)
      assert(stored === deflated)
      // and DEFLATE actually compressed (the variant isn't a no-op)
      assert(XlsxFixture.workbookBytes(i, stored = false).length <
        XlsxFixture.workbookBytes(i, stored = true).length)
    }
  }

  test(".xlsm parity: the macro container parses identically (extra " +
      "vbaProject.bin entry ignored)") {
    // Reference parity (VERDICT r12 #5): the reference accepts .xlsm by
    // extension (commercial_rfp_raw_data_ingestion_and_cleaning.py:131-132)
    // and parses it with openpyxl (:286), which reads ONLY the OOXML
    // parts — a .xlsm is the same zip plus an xl/vbaProject.bin blob the
    // sheet grammar never touches. Repackage a fixture workbook with
    // that extra entry and require identical rows. (.xls/BIFF8 is a
    // different, non-zip format the reference itself cannot read with
    // engine="openpyxl" — correctly out of scope on both sides.)
    for (i <- Seq(0, 3, 7)) {
      val base = Xlsx.parseWorkbook(f"wb_$i%03d.xlsm",
        XlsxFixture.workbookBytes(i)).sortBy(_.row_id)
      val parts = graft.ops.Xlsx.entries(XlsxFixture.workbookBytes(i))
        .toSeq.map { case (n, b) => n -> new String(b, "UTF-8") }
      val vba = "vba-project-stub-" + i // content never read
      val xlsm = graft.ops.Xlsx.zipBytes(
        parts :+ ("xl/vbaProject.bin" -> vba), stored = true)
      val got = Xlsx.parseWorkbook(f"wb_$i%03d.xlsm", xlsm).sortBy(_.row_id)
      assert(got === base)
    }
  }

  test("out-of-grammar cells fail loudly instead of being dropped") {
    // A styled cell (s="0") and a decimal <v> are both outside the
    // documented grammar; the reader must refuse the workbook, not parse
    // a silently smaller sheet (ADVICE r11).
    for (cell <- Seq(
        """<c r="A1" s="0"><v>1</v></c>""",
        """<c r="A1"><v>1.5</v></c>""",
        """<c r="A1"/>""")) {
      val bytes = Xlsx.zipBytes(Seq(
        "xl/sharedStrings.xml" ->
          """<?xml version="1.0"?><sst count="0" uniqueCount="0"></sst>""",
        "xl/worksheets/sheet1.xml" ->
          s"""<?xml version="1.0"?><worksheet><sheetData><row r="1">$cell</row></sheetData></worksheet>"""),
        stored = true)
      val e = intercept[IllegalArgumentException] {
        Xlsx.parseCells("bad.xlsx", bytes)
      }
      assert(e.getMessage.contains("matched"), s"cell=$cell msg=${e.getMessage}")
    }
  }

  test("sink round-trip: arbitrary cells survive write -> parseCells " +
      "(specials, negatives, nulls, shared-string reuse)") {
    import graft.ops.XlsxSink
    val rows: Seq[Seq[Option[Either[String, Long]]]] = Seq(
      Seq(Some(Left("a <&> \"quoted\" 'b'")), Some(Right(-42L)), Some(Left("dup"))),
      Seq(Some(Left("plain")), None, Some(Left("dup"))),
      Seq(None, Some(Right(0L)), Some(Left("a <&> \"quoted\" 'b'"))))
    val bytes = XlsxSink.workbookBytes(rows)
    val cells = graft.ops.Xlsx.parseCells("rt.xlsx", bytes)
      .map { case (r, c, v) => (r, c) -> v }.toMap
    assert(cells === Map(
      (1L, "A") -> Left("a <&> \"quoted\" 'b'"), (1L, "B") -> Right(-42L),
      (1L, "C") -> Left("dup"),
      (2L, "A") -> Left("plain"), (2L, "C") -> Left("dup"),
      (3L, "B") -> Right(0L), (3L, "C") -> Left("a <&> \"quoted\" 'b'")))
  }

  test("sink column letters cover the multi-letter range (AA+)") {
    import graft.ops.XlsxSink
    val wide = Seq((0 until 30).map(j => Some(Right(j.toLong))
      : Option[Either[String, Long]]))
    val cells = graft.ops.Xlsx.parseCells("w.xlsx",
      XlsxSink.workbookBytes(wide))
    val byCol = cells.map { case (_, c, v) => c -> v }.toMap
    assert(byCol("Z") === Right(25L) && byCol("AA") === Right(26L) &&
      byCol("AD") === Right(29L))
  }

  test("distributed sink writes one workbook per non-empty partition " +
      "and the typed reader closes the loop") {
    import graft.ops.{Xlsx, XlsxSink}
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_xlsx_sink")
      .toFile.getAbsolutePath
    val df = spark.range(10).select(
      concat(lit("client_"), (col("id") % 3).cast("string")).as("client"),
      (col("id") * 7).as("amount"),
      concat(lit("note_"), col("id").cast("string")).as("note"))
    XlsxSink.writeWorkbooks(df.coalesce(1), out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".xlsx"))
    assert(files.length === 1) // coalesce(1): the reference's one-artifact shape
    val back = Xlsx.readWorkbooks(
        spark.read.format("binaryFile").load(files.head.getAbsolutePath))
      .collect().sortBy(_.row_id)
    assert(back.length === 10)
    assert(back.map(r => (r.client, r.amount, r.note)).toSeq ===
      df.collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getString(2))))
    // multi-partition: one file per non-empty partition
    val out2 = java.nio.file.Files.createTempDirectory("graft_xlsx_sink2")
      .toFile.getAbsolutePath
    XlsxSink.writeWorkbooks(df.repartition(4), out2, prefix = "p")
    val n2 = new java.io.File(out2).listFiles().count(_.getName.endsWith(".xlsx"))
    assert(n2 >= 2 && n2 <= 4)
    assert(Xlsx.readWorkbooks(spark.read.format("binaryFile")
      .load(s"$out2/*.xlsx")).count() === 10)
  }

  test("reader runs distributed over the binaryFile source") {
    val dir = XlsxFixture.ensure()
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".xlsx")).map(_.getAbsolutePath).sorted
    val n = Xlsx.readWorkbooks(
      spark.read.format("binaryFile").load(files.toIndexedSeq: _*)).count()
    assert(n === (0 until XlsxFixture.count).map(i => 3 + i % 3).sum)
  }
}

package graft

import graft.ops.{Warc, WarcFixture, WarcRow}

class WarcSpec extends SparkSpec {

  private def gzMember(s: String): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    gz.close()
    bo.toByteArray
  }

  test("record walk matches the fixture formulas (all files, all records)") {
    for (i <- 0 until WarcFixture.count) {
      val rows = Warc.parse(f"seg_$i%03d.warc", WarcFixture.warcBytes(i))
      assert(rows.length === 1 + 2 * WarcFixture.pagesOf(i))
      assert(rows.head.warc_type === "warcinfo")
      assert(rows.head.target_uri === None)
      assert(rows.head.http_status === None)
      for (r <- 0 until WarcFixture.pagesOf(i)) {
        val req = rows(1 + 2 * r); val resp = rows(2 + 2 * r)
        assert(req.warc_type === "request")
        assert(req.target_uri === Some(s"http://site$i.example/page/$r"))
        assert(req.body_md5 === None)
        assert(resp.warc_type === "response")
        assert(resp.rec_idx === 2 + 2 * r)
        assert(resp.http_status === Some(WarcFixture.statusOf(i, r)))
        assert(resp.mime === Some("text/html; charset=UTF-8"))
        val body = WarcFixture.bodyOf(i, r)
        assert(resp.body === Some(body))
        assert(req.body === None)
        assert(resp.body_len === Some(body.length.toLong))
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(body.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          .map(x => f"$x%02x").mkString
        assert(resp.body_md5 === Some(md))
      }
    }
  }

  test("chunked Transfer-Encoding twins dechunk to the Content-Length " +
      "twin's body columns") {
    for (i <- 0 until WarcFixture.count) {
      val plain = Warc.parse(f"seg_$i%03d.warc", WarcFixture.warcBytes(i))
      val chk = Warc.parse(f"seg_$i%03d.warc",
        WarcFixture.warcChunkedBytes(i))
      assert(chk.length === plain.length)
      plain.zip(chk).foreach { case (p, c) =>
        // the origin-body columns are framing-invariant...
        assert(c.body === p.body)
        assert(c.body_len === p.body_len)
        assert(c.body_md5 === p.body_md5)
        assert(c.http_status === p.http_status)
        assert(c.target_uri === p.target_uri)
        // ...while the RAW record length legitimately differs for
        // non-empty chunked responses (the ladder framing costs bytes)
        if (p.warc_type == "response" && p.body.exists(_.nonEmpty))
          assert(c.content_length > p.content_length)
      }
    }
  }

  test("chunk ladder grammar: extensions, trailers, uppercase hex; " +
      "malformed ladders refuse loudly") {
    def resp(ladder: String, te: String = "chunked"): String = {
      val http = "HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/plain\r\n" +
        s"Transfer-Encoding: $te\r\n\r\n" + ladder
      Seq("WARC/1.0", "WARC-Type: response",
        "WARC-Record-ID: <urn:uuid:1>",
        "WARC-Target-URI: http://x.example/",
        "Content-Type: application/http;msgtype=response",
        s"Content-Length: ${http.length}").mkString("\r\n") +
        "\r\n\r\n" + http + "\r\n\r\n"
    }
    def one(ladder: String): WarcRow =
      Warc.parse("t.warc", resp(ladder)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)).head
    // chunk extension on the size line + a trailer field + uppercase hex
    val r1 = one("5;x=1\r\nhello\r\nC\r\n world again\r\n0\r\n" +
      "X-Sum: ok\r\n\r\n")
    assert(r1.body === Some("hello world again"))
    assert(r1.body_len === Some(17L))
    // empty body: just the terminal chunk
    assert(one("0\r\n\r\n").body === Some(""))
    // non-hex size line
    val e1 = intercept[IllegalArgumentException](one("zz\r\nhello\r\n0\r\n\r\n"))
    assert(e1.getMessage.contains("malformed chunk size"))
    // chunk overruns the record
    val e2 = intercept[IllegalArgumentException](one("ff\r\nhello\r\n0\r\n\r\n"))
    assert(e2.getMessage.contains("overruns"))
    // missing terminal 0 chunk (ladder ends after a data chunk)
    val e3 = intercept[IllegalArgumentException](one("5\r\nhello\r\n"))
    assert(e3.getMessage.nonEmpty)
    // ladder that ends before the record does (walk must land on end)
    val e4 = intercept[IllegalArgumentException](one("5\r\nhello\r\n0\r\n\r\nJUNK"))
    assert(e4.getMessage.contains("expected"))
    // an unsupported transfer coding refuses by name
    val e5 = intercept[IllegalArgumentException](Warc.parse("t.warc",
      resp("0\r\n\r\n", te = "gzip")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
    assert(e5.getMessage.contains("unsupported Transfer-Encoding"))
  }

  test("revisit/conversion/metadata (WAT/WET) records: conversion and " +
      "metadata surface their payloads as the body, revisit stays " +
      "census-only") {
    for (i <- 0 until WarcFixture.derivedCount) {
      val rows = Warc.parse(f"segd_$i%03d.warc",
        WarcFixture.warcDerivedBytes(i))
      assert(rows.length === 1 + 3 * WarcFixture.pagesOf(i))
      assert(rows.head.warc_type === "warcinfo")
      for (r <- 0 until WarcFixture.pagesOf(i)) {
        val rev = rows(1 + 3 * r); val conv = rows(2 + 3 * r)
        val meta = rows(3 + 3 * r)
        assert(rev.warc_type === "revisit")
        assert(rev.target_uri === Some(s"http://site$i.example/page/$r"))
        // a revisit has no payload of its own — census columns only
        assert(rev.body === None && rev.body_md5 === None &&
          rev.mime === None && rev.http_status === None)
        assert(conv.warc_type === "conversion")
        assert(conv.target_uri === rev.target_uri)
        assert(conv.mime === Some("text/plain"))
        assert(conv.http_status === None)
        val wet = WarcFixture.wetTextOf(i, r)
        assert(conv.body === Some(wet))
        assert(conv.body_len === Some(wet.length.toLong))
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(wet.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          .map(x => f"$x%02x").mkString
        assert(conv.body_md5 === Some(md))
        assert(meta.warc_type === "metadata")
        assert(meta.mime === Some("application/json"))
        assert(meta.body === Some(WarcFixture.watJsonOf(i, r)))
        assert(meta.http_status === None)
      }
    }
  }

  test("WARC/1.1 twins parse identically to WARC/1.0; other versions " +
      "refuse by name") {
    // version differential: the same records re-emitted under the IIPC
    // 1.1 version line must produce identical rows (nothing this scan
    // surfaces changed between the revisions)
    val plain = Warc.parse("seg_000.warc", WarcFixture.warcBytes(0))
    val v11 = WarcFixture.recordsOf(0)
      .map(r => "WARC/1.1" + r.stripPrefix("WARC/1.0")).mkString
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    assert(Warc.parse("seg_000.warc", v11) === plain)
    // 0.18 (the pre-standard draft) and 2.0 are different grammars
    for (v <- Seq("WARC/0.18", "WARC/2.0")) {
      val bad = WarcFixture.recordsOf(0)
        .map(r => v + r.stripPrefix("WARC/1.0")).mkString
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val e = intercept[IllegalArgumentException] {
        Warc.parse("v.warc", bad)
      }
      assert(e.getMessage.contains(s"unsupported WARC version line '$v'"))
    }
  }

  test("revisit records resolve to their referred capture: refers_to " +
      "matches the original's record_id and the payload digest matches " +
      "its body hash") {
    for (i <- 0 until WarcFixture.derivedCount) {
      val caps = Warc.parse(f"seg_$i%03d.warc", WarcFixture.warcBytes(i))
        .filter(_.warc_type == "response")
        .map(r => r.record_id -> r).toMap
      val rows = Warc.parse(f"segd_$i%03d.warc",
        WarcFixture.warcDerivedBytes(i))
      for (r <- 0 until WarcFixture.pagesOf(i)) {
        val rev = rows(1 + 3 * r)
        assert(rev.warc_type === "revisit")
        assert(rev.refers_to.isDefined, "revisit must carry Refers-To")
        val orig = caps(rev.refers_to.get) // resolves, or throws here
        assert(orig.target_uri === rev.target_uri)
        // identical-payload-digest profile: the revisit's digest IS the
        // original's payload hash
        assert(rev.payload_digest ===
          Some("md5:" + orig.body_md5.get))
        // responses carry their own digest header too, and it agrees
        // with the body hash the scan computes
        assert(orig.payload_digest === Some("md5:" + orig.body_md5.get))
      }
    }
  }

  test("HTTP header field names match case-insensitively with " +
      "optional space (RFC 9110) — lowercase transfer-encoding " +
      "must still dechunk") {
    val http = "HTTP/1.1 200 OK\r\n" +
      "content-type:text/plain\r\n" +
      "transfer-encoding:chunked\r\n\r\n" +
      "5\r\nhello\r\n0\r\n\r\n"
    val rec = Seq("WARC/1.0", "WARC-Type: response",
      "WARC-Record-ID: <urn:uuid:ci>",
      "WARC-Target-URI: http://ci.example/",
      "Content-Type: application/http;msgtype=response",
      s"Content-Length: ${http.length}").mkString("\r\n") +
      "\r\n\r\n" + http + "\r\n\r\n"
    val row = Warc.parse("ci.warc",
      rec.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).head
    // a case-sensitive match would skip dechunking and emit the raw
    // ladder ("5\r\nhello\r\n0\r\n\r\n") as the body — silent misparse
    assert(row.body === Some("hello"))
    assert(row.body_len === Some(5L))
    assert(row.mime === Some("text/plain"))
  }

  test("dechunk round-trips arbitrary bodies under arbitrary ladders " +
      "(seeded fuzz: random splits, extensions, trailers, mixed-case hex)") {
    val rnd = new scala.util.Random(421) // seeded — failures reproduce
    for (trial <- 0 until 60) {
      val body = (0 until rnd.nextInt(400))
        .map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      // random chunk split: sizes 1..97 so multi-hex-digit sizes occur
      val sb = new StringBuilder
      var off = 0
      while (off < body.length) {
        val n = math.min(1 + rnd.nextInt(97), body.length - off)
        var szLine = java.lang.Integer.toHexString(n)
        if (rnd.nextBoolean()) szLine = szLine.toUpperCase
        if (rnd.nextInt(4) == 0) szLine += s";ext=${rnd.nextInt(10)}"
        sb.append(szLine).append("\r\n")
          .append(body.substring(off, off + n)).append("\r\n")
        off += n
      }
      sb.append("0\r\n")
      if (rnd.nextInt(3) == 0) sb.append(s"X-Trailer: t$trial\r\n")
      sb.append("\r\n")
      val http = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n" + sb.toString
      val rec = Seq("WARC/1.0", "WARC-Type: response",
        "WARC-Record-ID: <urn:uuid:f>",
        "WARC-Target-URI: http://f.example/",
        "Content-Type: application/http;msgtype=response",
        s"Content-Length: ${http.length}").mkString("\r\n") +
        "\r\n\r\n" + http + "\r\n\r\n"
      val row = Warc.parse(s"f$trial.warc",
        rec.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).head
      assert(row.body === Some(body), s"trial $trial")
      assert(row.body_len === Some(body.length.toLong), s"trial $trial")
    }
  }

  test("per-record-gzip framing (.warc.gz) parses identically to plain") {
    for (i <- 0 until WarcFixture.count) {
      val gz = WarcFixture.recordsOf(i).map(gzMember)
        .foldLeft(Array.empty[Byte])(_ ++ _)
      assert((gz(0) & 0xff) === 0x1f && (gz(1) & 0xff) === 0x8b)
      val plain = Warc.parse(f"seg_$i%03d.warc", WarcFixture.warcBytes(i))
      assert(Warc.parse(f"seg_$i%03d.warc", gz) === plain)
    }
  }

  test("malformed containers refuse loudly instead of resyncing") {
    val good = WarcFixture.warcBytes(0)
    // truncated mid-payload: the walk overruns what's available
    val e1 = intercept[IllegalArgumentException] {
      Warc.parse("t.warc", good.take(good.length - 6))
    }
    assert(e1.getMessage.contains("truncated") ||
      e1.getMessage.contains("trailer") || e1.getMessage.contains("overran"))
    // a record that doesn't open with the version line
    val e2 = intercept[IllegalArgumentException] {
      Warc.parse("v.warc", "GARBAGE/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    }
    assert(e2.getMessage.contains("version line"))
    // a clobbered record trailer: corrupt the first CR after record 0's
    // declared payload span
    val hEnd = Warc.sepAt(good, 0)
    val hdr = new String(good, 0, hEnd,
      java.nio.charset.StandardCharsets.US_ASCII)
    val cl = "Content-Length: ([0-9]+)".r
      .findFirstMatchIn(hdr).get.group(1).toInt
    val bad = good.clone()
    bad(hEnd + 4 + cl) = 'X'
    val e3 = intercept[IllegalArgumentException] {
      Warc.parse("b.warc", bad)
    }
    assert(e3.getMessage.contains("trailer") ||
      e3.getMessage.contains("unterminated"))
  }

  test("gzip member walk refuses trailing garbage / corruption loudly") {
    val gz = WarcFixture.recordsOf(0).map(gzMember)
      .foldLeft(Array.empty[Byte])(_ ++ _)
    // trailing garbage after the last member: GZIPInputStream would
    // stop cleanly at the member boundary; the explicit walk refuses
    val e1 = intercept[IllegalArgumentException] {
      Warc.parse("g.warc", gz ++ "NOT A GZIP MEMBER"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    }
    assert(e1.getMessage.contains("bad magic"))
    // truncated final trailer
    val e2 = intercept[IllegalArgumentException] {
      Warc.parse("t.warc", gz.take(gz.length - 4))
    }
    assert(e2.getMessage.contains("truncated trailer"))
    // corrupted CRC byte in the final member's trailer
    val bad = gz.clone()
    bad(gz.length - 8) = (bad(gz.length - 8) ^ 0x5a).toByte
    val e3 = intercept[IllegalArgumentException] {
      Warc.parse("c.warc", bad)
    }
    assert(e3.getMessage.contains("CRC32 mismatch"))
  }

  test("gzip member walk round-trips arbitrary member sequences " +
      "(seeded fuzz, mixed deflate/stored framings)") {
    val rnd = new scala.util.Random(20260816)
    for (_ <- 0 until 40) {
      val payloads = (0 until 1 + rnd.nextInt(6)).map { _ =>
        val b = new Array[Byte](rnd.nextInt(5000))
        rnd.nextBytes(b); b
      }
      // alternate REAL deflate members (GZIPOutputStream) with the
      // fixture's STORED members — both legal RFC 1952, one stream
      val members = payloads.zipWithIndex.map { case (p, i) =>
        if (i % 2 == 0) {
          val bo = new java.io.ByteArrayOutputStream()
          val g = new java.util.zip.GZIPOutputStream(bo)
          g.write(p); g.close(); bo.toByteArray
        } else WarcFixture.gzMemberStored(p)
      }
      val gz = members.foldLeft(Array.empty[Byte])(_ ++ _)
      assert(java.util.Arrays.equals(Warc.gunzipAll(gz),
        payloads.foldLeft(Array.empty[Byte])(_ ++ _)))
      // truncation INSIDE a member (not at a boundary — a prefix ending
      // exactly at a boundary is a legal shorter stream) must refuse
      val bounds = members.map(_.length).scanLeft(0)(_ + _)
      val cut = {
        var c = 1 + rnd.nextInt(gz.length - 1)
        while (bounds.contains(c)) c = 1 + rnd.nextInt(gz.length - 1)
        c
      }
      intercept[Exception] { Warc.gunzipAll(gz.take(cut)) }
      // trailer corruption: CRC32/ISIZE must catch it
      val bad = gz.clone()
      bad(gz.length - 6) = (bad(gz.length - 6) ^ 0x35).toByte
      val e = intercept[Exception] { Warc.gunzipAll(bad) }
      assert(e.getMessage.contains("mismatch") ||
        e.getMessage.contains("truncated"))
    }
  }

  test("malformed HTTP status lines refuse with file/offset context") {
    def rec(status: String): Array[Byte] = {
      val payload = s"$status\r\nContent-Type: text/html\r\n\r\nok"
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:uuid:st>\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    }
    for (badLine <- Seq("HTTP/1.1", "HTTP/1.1 OK", "HTTP/1.1 20")) {
      val e = intercept[RuntimeException] {
        Warc.parse("s.warc", rec(badLine))
      }
      assert(e.getMessage.contains("malformed HTTP status"),
        s"for '$badLine': ${e.getMessage}")
      assert(e.getMessage.contains("s.warc"))
    }
    val ok = Warc.parse("s.warc", rec("HTTP/1.1 200 OK"))
    assert(ok.head.http_status === Some(200))
  }

  test("scanWarc reads the on-disk fixture through binaryFile") {
    val dir = WarcFixture.ensure()
    val got = Warc.scanWarc(
        spark.read.format("binaryFile").load(dir + "/*.warc"))
      .collect().groupBy(_.file_name)
    assert(got.size === WarcFixture.count)
    for (i <- 0 until WarcFixture.count) {
      val rows = got(f"seg_$i%03d.warc").sortBy(_.rec_idx)
      assert(rows.length === 1 + 2 * WarcFixture.pagesOf(i))
      assert(rows.map(_.rec_idx).toSeq === rows.indices.toSeq)
    }
  }

  test("empty-body and 404 responses carry exact envelope fields") {
    // (i, r) = (0, 0): both 7 | 0 and 11 | 0 → 404 with an EMPTY body
    val rows = Warc.parse("seg_000.warc", WarcFixture.warcBytes(0))
    val r00 = rows(2)
    assert(r00.http_status === Some(404))
    assert(r00.body_len === Some(0L))
    assert(r00.body_md5 === Some("d41d8cd98f00b204e9800998ecf8427e"))
  }
}

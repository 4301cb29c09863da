package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench report is ONE stdout JSON line that the harness tail-captures
  * (last 2000 chars) — these pins keep it inside that window and valid. */
class BenchLineSpec extends AnyFunSuite {

  // 10.04 is the degradation-friendly shape: "10.04" at 2 decimals, "10"
  // at 1 — each query sheds 3 chars when renderLine falls back. Fixture
  // names carry no `q_` prefix so renderLine's display-name strip is a
  // no-op on them and the contains() assertions below stay literal.
  private def fakeTimings(n: Int): Seq[(String, Double)] =
    (0 until n).map(i => f"fixture_name_$i%03d" -> 10.04)

  test("fmtTrim trims trailing zeros but stays a valid JSON number") {
    assert(Bench.fmtTrim(0.30, 2) == "0.3")
    assert(Bench.fmtTrim(2.00, 2) == "2")
    assert(Bench.fmtTrim(0.0, 2) == "0")
    assert(Bench.fmtTrim(1.08, 2) == "1.08")
    assert(Bench.fmtTrim(37.924, 3) == "37.924")
    assert(Bench.fmtTrim(0.179, 1) == "0.2")
  }

  test("current registry fits the capture window at FULL 2-decimal precision") {
    // every query at 9.97 s — 4 chars, nothing to trim, ~2.5x the widest
    // real sf0.1 timing. If registry growth ever fails this, the fallback
    // still emits a valid 1-decimal line, but names should be shortened
    // before the degradation becomes routine.
    val worst = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 9.97)
    // adjudication fields at worst-case widths included — the window
    // budget must hold on an episode-flagged line too (r12)
    val line = Bench.renderLine(worst, Nil, 0.179, 0.171,
      "/root/testdata/sf0.1", retried = 2, canary = Some(10.46),
      cmed = Some(10.31), medsum = Some(1118.2), rerun = 1,
      covsum = Some(1109.9), strsum = Some(109.9), strmed = Some(111.2))
    assert(line.length <= Bench.maxLineChars,
      s"${line.length} chars for ${worst.size} queries — shorten names " +
        "or the next bench line gets truncated by the harness")
    assert(line.contains(":9.97"), "expected full 2-decimal precision — " +
      "registry has outgrown the capture window's full-precision headroom")
    assert(!line.contains('\n'))
    // display names are the registry names minus the `q_` prefix, and the
    // strip must never make two of them collide
    assert(line.contains("\"E\"") && !line.contains("\"q_doc_dedup\""))
    assert(Bench.short("q_not_a_registry_name") == "not_a_registry_name",
      "unmapped names pass through unchanged")
    assert(line.contains("\"q1\"") && !line.contains("\"q1_agg\""),
      "non-q_ names are abbreviatable too (wave 5)")
    assert(Bench.displayAbbrev.values.forall(_.length <= 2),
      "wave 8/9: every display name is at most 2 chars (wave 9 spent the " +
        "[0-9a-z] 1-char code space on the then-alphabetically-first 36; " +
        "wave 10 spent [A-Z] on the next 26; the assignments are STABLE " +
        "thereafter — keymap immutability — so later registrations take " +
        "2-char codes regardless of sort order)")
    assert(Bench.displayAbbrev.values.count(_.length == 1) == 88,
      "wave 9+10+11: exactly the [0-9a-zA-Z] + 26-punctuation code " +
        "space is spent on 1-char names")
    // the self-adjudication line fields must never be shadowed by a query
    // display code — a reader greps the line for both
    val fields = Set("cn", "cm", "ms", "mv", "rr", "rt", "fp", "fs", "sf",
      "sn", "sm")
    assert(Bench.displayAbbrev.values.toSet.intersect(fields).isEmpty,
      "display code collides with a line field key")
    val shorts = SparkEntry.queries.keys.toSeq.map(Bench.short)
    assert(shorts.distinct.size == shorts.size, "display-name collision")
    // the abbreviation map must only shorten NAMES THE REGISTRY HAS —
    // a stale entry (query renamed/removed) would silently stop paying
    // its way while README still documents it
    val stripped = SparkEntry.queries.keys.toSeq
      .map(_.stripPrefix("q_")).toSet
    assert(Bench.displayAbbrev.keySet.subsetOf(stripped),
      s"stale displayAbbrev keys: ${Bench.displayAbbrev.keySet -- stripped}")
    assert(line.contains("\"L\"") && !line.contains("\"dup_clusters\""),
      "abbreviated display names must actually land on the line")
    // growth headroom: ~4 more typical queries (≈22 chars each at full
    // precision) must fit before the next trim is needed — the VERDICT r8
    // #7 guard against the driver losing a round's record to truncation.
    // (Was 2 queries through r13; the r13 late registrations consumed
    // that margin and shipped a red suite — VERDICT r13 #1 — so wave 8
    // made every display name 2 chars and widened the guard to a full
    // round's worth of registrations. The standing practice stands:
    // every registration brings its own abbreviation, checked BEFORE
    // the registration lands.)
    assert(line.length <= Bench.maxLineChars - 88,
      s"${line.length} chars leaves <4 queries of growth headroom — " +
        "extend Bench.displayAbbrev before registering more queries")
    assert(line.contains("\"sf\":\"sf0.1\""), "sf renders as basename")
    assert(!line.contains("\"errors\""),
      "a healthy line must not spend window bytes on an empty errors map")
  }

  test("README mapping table and bench_keymap.json match Bench.displayAbbrev") {
    // ADVICE r10: the README table drifted from the code map twice
    // (emb_dd/semdd_s vs the shipped keys) — anyone decoding bench lines
    // from the README would mis-key those queries. The README's strict
    // `name`→`abbr` pattern appears ONLY in the mapping table, so the
    // extraction below is exact, and the table is now asserted equal to
    // the code map (both directions). bench_keymap.json's r11 entry is
    // the machine-readable twin for round-over-round tooling.
    // the code side matches anything but a backtick: wave-11 codes are
    // punctuation (a backtick can't be a code — it would end the span)
    val pat = "`([a-z0-9_]+)`→`([^`]+)`".r
    def extract(path: String): Map[String, String] =
      pat.findAllMatchIn(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8"))
        .map(m => m.group(1) -> m.group(2)).toMap
    assert(extract("README.md") == Bench.displayAbbrev,
      "README mapping table is out of sync with Bench.displayAbbrev — " +
        "regenerate the README block")
    // ADVICE r12 (high): the keymap check was a substring scan, so the r12
    // regen overwriting the r11 entry in place passed it while severing
    // BENCH_r11.json's joinability. Now: the NEWEST round's entry must
    // EQUAL the code map (both directions), and prior rounds' entries are
    // immutable history — pinned here via r11's wave-5-era keys, which
    // differ from the current wave-6 map.
    import scala.jdk.CollectionConverters._
    val tree = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Paths.get("bench_keymap.json").toFile)
      .get("displayAbbrev")
    val rounds = tree.fieldNames.asScala.toSeq
    val newest = rounds.maxBy(_.drop(1).toInt)
    val newestMap = tree.get(newest).properties.asScala
      .map(e => e.getKey -> e.getValue.asText).toMap
    assert(newestMap == Bench.displayAbbrev,
      s"bench_keymap.json's $newest entry != Bench.displayAbbrev — run " +
        s"tools/regen_display_maps.py $newest")
    for (r <- Seq("r9", "r10", "r11", "r12", "r13"))
      assert(rounds.contains(r), s"prior round $r's map entry is gone")
    // wave-5 keys that wave 6 renamed: their presence proves r11 holds
    // the map BENCH_r11.json was recorded under, not a later rewrite
    val r11 = tree.get("r11")
    for ((k, v) <- Seq("ann_ivf_pq" -> "ivfp", "anomaly" -> "anom",
        "doc_dedup" -> "docd", "bigram_nll" -> "bnll"))
      assert(r11.get(k).asText == v,
        s"r11 keymap entry lost its wave-5 mapping $k -> $v")
    // likewise wave-7 keys that wave 8 renamed pin r13's entry to the map
    // BENCH_r13.json was recorded under
    val r13 = tree.get("r13")
    for ((k, v) <- Seq("doc_dedup" -> "dcd", "dup_clusters" -> "dcl",
        "ann_recall" -> "rec", "hybrid_rrf" -> "rrf"))
      assert(r13.get(k).asText == v,
        s"r13 keymap entry lost its wave-7 mapping $k -> $v")
  }

  test("self-adjudication fields land on the line and vanish when absent") {
    // VERDICT r11 #2: the record must adjudicate a UNIFORM ambient episode
    // from its own fields — cn (fresh canary median), cm (the canary's
    // checked-in history median), ms (checked-in median sum over this
    // run's query set), rr (episode rerun fired). A reader computes the
    // episode factor as cn/cm (probe) or value/ms (whole run).
    val t = fakeTimings(3)
    val flagged = Bench.renderLine(t, Nil, 0.1, 0.1, "sf0.1",
      canary = Some(0.46), cmed = Some(0.31), medsum = Some(118.2),
      rerun = 1)
    assert(flagged.contains(""","cn":0.46,"cm":0.31,"ms":118.2,"rr":1,"""))
    // ADVICE r12: right after registrations, history covers only part of
    // the run — `mv` (this run's sum over the covered queries) then lands
    // next to `ms` so mv/ms is like-for-like; on full coverage mv ≡ value
    // and is not emitted
    val partial = Bench.renderLine(t, Nil, 0.1, 0.1, "sf0.1",
      canary = Some(0.46), cmed = Some(0.31), medsum = Some(118.2),
      rerun = 1, covsum = Some(117.4))
    assert(partial.contains(""","cn":0.46,"cm":0.31,"mv":117.4,"ms":118.2,"rr":1,"""))
    assert(!flagged.contains("\"mv\""),
      "mv must not repeat value on a fully-covered line")
    // sn/sm (VERDICT r13 #4): the stream-family sum vs its checked-in
    // median sum — the streams episode factor, adjacent to and shaped
    // like the cn/cm batch pair (observed need: 22–27 s stream walls at
    // flat task CPU left cn/cm quiet in the r13 record)
    val streams = Bench.renderLine(t, Nil, 0.1, 0.1, "sf0.1",
      canary = Some(0.46), cmed = Some(0.31), medsum = Some(118.2),
      strsum = Some(25.8), strmed = Some(15.0))
    assert(streams.contains(""","cn":0.46,"cm":0.31,"sn":25.8,"sm":15,"ms":118.2,"""))
    // absence = fields not emitted (no history for this sf / canary not
    // runnable): no window bytes spent, and no reader sees a zero that
    // looks like a measurement
    val bare = Bench.renderLine(t, Nil, 0.1, 0.1, "sf0.1")
    for (f <- Seq("\"cn\"", "\"cm\"", "\"sn\"", "\"sm\"", "\"mv\"",
        "\"ms\"", "\"rr\""))
      assert(!bare.contains(f), s"unexpected $f on an unadjudicated line")
  }

  test("renderLine degrades precision instead of overflowing") {
    // the first n whose FULL-precision line no longer fits (renderLine
    // stops emitting "10.04" exactly when the 2-decimal rung overflows)
    val n = (2 to 200).find { n =>
      !Bench.renderLine(fakeTimings(n), Nil, 0.1, 0.1, "sf").contains("10.04")
    }.get
    val line = Bench.renderLine(fakeTimings(n), Nil, 0.1, 0.1, "sf")
    assert(line.length <= Bench.maxLineChars)
    assert(line.contains(":10,"), "expected degraded 1-decimal values")
    assert(!line.contains("10.04"))
    // degraded line still carries every query name
    fakeTimings(n).foreach { case (k, _) => assert(line.contains(k)) }
  }

  test("a failed query's error text never costs the report its timings") {
    // near-capacity timings plus five errors with (already-capped) 80-char
    // messages — enough bytes that keeping the text cannot fit at either
    // precision, so the error-DROP rung must fire: names and every timing
    // survive, message text does not
    val n = (2 to 200).find { n =>
      Bench.renderLine(fakeTimings(n), Nil, 0.1, 0.1, "sf").length >
        Bench.maxLineChars - 120
    }.get
    val errs = (1 to 5).map(i => s"broken_$i" -> ("x" * 80))
    val line = Bench.renderLine(fakeTimings(n), errs, 0.1, 0.1, "sf")
    assert(line.length <= Bench.maxLineChars)
    errs.foreach { case (k, _) => assert(line.contains(k)) }
    assert(!line.contains("xxxx"), "expected error text dropped")
    fakeTimings(n).foreach { case (k, _) => assert(line.contains(k)) }
  }

  test("renderLine fails loudly when even 1-decimal overflows") {
    val e = intercept[IllegalArgumentException] {
      Bench.renderLine(fakeTimings(300), Nil, 0.1, 0.1, "sf")
    }
    assert(e.getMessage.contains("truncate"))
  }

  test("latestMedians layers matching-sf history lines newest-over-" +
      "oldest and degrades to empty on absence (the stall guard's " +
      "contract; r16 — a partial line must not shadow the full record)") {
    // the checked-in repo history: round-11 full-registry line at sf0.1
    val m = BenchHistory.latestMedians("sf0.1")
    assert(m.size > 100,
      s"expected the latest full-registry line, got ${m.size}")
    assert(m.contains("q_stream_join") && m("q_stream_join") > 0.5)
    // every key is registry-SHAPED (the parser must not pick up "round"
    // or "sf" fragments) and the bulk of them are CURRENT registry names
    // — keys for queries a later round removed or fused (q_ann_recall_cl
    // → q_ann_recall, r14) stay in old lines because history records are
    // immutable; Bench only ever looks up current names, so stale keys
    // are inert
    assert(m.keys.forall(_.matches("q[A-Za-z0-9_]*")))
    assert(m.keySet.count(Registry.all.map(_.name).toSet) > 100,
      "history line no longer covers the current registry")
    // layering semantics on the checked-in record, pinned against an
    // INDEPENDENT parse of the file rather than a literal snapshot (the
    // r17 lesson: a re-recorded line invalidated a hardcoded 2.29): the
    // NEWEST line mentioning a key wins (q_entity_canon_pr is recorded
    // in many lines), and a key recorded only in an OLDER line still
    // surfaces (q_ann_recall_cl, last recorded r13 before the r14 query
    // fusion — inert for Bench, which only looks up current names)
    def newestRecorded(key: String): Double = {
      val rx = ("\"" + key + "\":([0-9][0-9.]*)").r
      scala.io.Source.fromFile("bench_history.jsonl").getLines()
        .filter(_.contains("\"sf\":\"sf0.1\""))
        .flatMap(l => rx.findFirstMatchIn(l).map(_.group(1).toDouble))
        .toSeq.lastOption
        .getOrElse(fail(s"$key absent from every sf0.1 history line"))
    }
    assert(m("q_entity_canon_pr") === newestRecorded("q_entity_canon_pr"))
    assert(m("q_ann_recall_cl") === newestRecorded("q_ann_recall_cl"))
    // the layered value differs from at least one OLDER line's record
    // for some key — i.e. layering is actually doing newest-wins work
    // on this file, not just echoing a single line
    val anyOverridden = m.keys.exists { k =>
      val rx = ("\"" + k + "\":([0-9][0-9.]*)").r
      val vs = scala.io.Source.fromFile("bench_history.jsonl").getLines()
        .filter(_.contains("\"sf\":\"sf0.1\""))
        .flatMap(l => rx.findFirstMatchIn(l).map(_.group(1).toDouble))
        .toSeq
      vs.size > 1 && vs.distinct.size > 1
    }
    assert(anyOverridden, "no key in the history has multiple distinct " +
      "recorded values — the layering assertion would be vacuous")
    // unmatched sf and a bad working-dir file both yield the inert guard
    assert(BenchHistory.latestMedians("sf_nonexistent").isEmpty)
    // guard arithmetic: a reading above max(2x median, median+1s)
    // retries; the cross-day ambient band (<=1.7x) and sub-second
    // jitter (<= median+1s) never do
    val med = 3.88
    def trips(r: Double) = r > math.max(2 * med, med + 1.0)
    assert(trips(8.43))      // the observed all-runs stall
    assert(!trips(1.7 * med)) // ambient band stays un-retried
    assert(!trips(0.9))       // sub-second jitter on a tiny median
  }
}

package graft

import graft.ops.{Clean, Dedup, Keys}

/** Golden end-to-end trace of the reference's E2 cleaning dataflow
  * (SURVEY §3: keys → clean → exact dedup → latest-per-question →
  * longest-per-question), pinned by stage row counts at sf0.001 — the
  * engine analog of the reference's per-stage logged shape checkpoints
  * (commercial_rfp_raw_data_ingestion_and_cleaning.py:180-275). Any
  * change to cleaning/dedup semantics moves one of these counts. */
class GoldenSpec extends SparkSpec {

  test("E2 chain stage counts match the golden trace") {
    val raw = RfpSynth.frame(Tables.documents(spark, "/root/testdata/sf0.001"))
    val keyed = Keys.addRfpKeys(raw)
    val cleaned = Clean.cleanRfp(raw)
    val exact = Dedup.dedupExact(cleaned, Seq("question", "response"),
      Seq("date", "doc_id"))
    val latest = Dedup.latestPerGroup(exact, "question", "date")
    val longest = Dedup.longestPerGroup(latest, "question", "response", "doc_id")

    assert(raw.count() === 500L)      // synthesized workbook rows
    assert(keyed.count() === 500L)    // K1/K2 add columns, never rows
    assert(cleaned.count() === 181L)  // P2-P11 filters
    assert(exact.count() === 169L)    // A4 exact (q,r) dedup
    assert(latest.count() === 72L)    // A6 latest-per-question
    assert(longest.count() === 72L)   // A7 is a no-op after A6 here
    // final stage is unique per question (the E2 output contract)
    assert(longest.select("question").distinct().count() === 72L)
  }
}

package graft

import org.apache.spark.sql.functions._

/** Contracts of the cluster-representative near-dup variant
  * (q_near_dup_rep) against the all-pairs one (q_near_dup) — the two
  * share candidate generation, so their outputs are structurally
  * related and a drift in either shows up here before the oracle runs. */
class NearDupRepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val rep =
    Registry.byName("q_near_dup_rep").fn(spark, dir).cache()
  private lazy val pairs =
    Registry.byName("q_near_dup").fn(spark, dir).cache()

  test("one cluster assignment per doc, rep strictly below member") {
    val n = rep.count()
    assert(n > 0, "fixture must produce near-dup clusters")
    assert(rep.select("doc_id").distinct().count() === n,
      "a doc must map to exactly one representative")
    assert(rep.filter(col("rep_id") >= col("doc_id")).count() === 0L,
      "representative is the bucket min, so rep_id < doc_id")
  }

  test("every rep edge is an all-pairs edge with the same jaccard") {
    // a (rep, member) candidate shares a band bucket, so the all-pairs
    // variant generates the same pair (rep < member) and verifies it
    // with the identical threshold — rep output ⊆ all-pairs output
    val missing = rep
      .select(col("rep_id").as("doc_a"), col("doc_id").as("doc_b"),
        col("jaccard"))
      .join(pairs, Seq("doc_a", "doc_b", "jaccard"), "left_anti")
    assert(missing.count() === 0L,
      "rep edges must be a subset of the all-pairs edges")
  }

  test("verified-pair volume is linear, not quadratic, in bucket size") {
    // all-pairs verifies C(n,2) per clique; rep verifies n-1 — on any
    // fixture with cliques of ≥3 the rep candidate count must be
    // strictly smaller (equality would mean the linearization is not
    // wired in). Cheap structural proxy: rep output rows ≤ pair rows,
    // while covering the same docs.
    assert(rep.count() <= pairs.count())
    val pairDocs = pairs.select(col("doc_a").as("d"))
      .union(pairs.select(col("doc_b").as("d"))).distinct()
    val repDocs = rep.select(col("doc_id").as("d"))
      .union(rep.select(col("rep_id").as("d"))).distinct()
    // docs the rep variant covers that all-pairs misses would be a bug;
    // the reverse (chain-connected stragglers) is the documented trade
    assert(repDocs.join(pairDocs, Seq("d"), "left_anti").count() === 0L)
  }
}

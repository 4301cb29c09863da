package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** The centrality-canonical ER composition (q_entity_canon_pr) on a
  * constructed star graph where the PageRank champion and the min-id
  * label DISAGREE — the case the shipped fixture never produces (its
  * clusters happen to crown the min id), and the reason the centrality
  * variant exists: the hub of a duplicate family is the
  * most-corroborated record even when a peripheral variant carries the
  * smaller key. */
class EntityCanonPrSpec extends SparkSpec {
  import spark.implicits._

  test("star graph: the hub wins even with the largest id") {
    // ed1 star: center "aaaa" within one substitution of each leaf;
    // leaves pairwise at distance 2 (no leaf-leaf edges). The center
    // carries the LARGEST key, so min-id canonicalization would pick
    // leaf 1 while centrality must pick the hub.
    val parts = Seq(
      (1L, "aaab"), (2L, "aaba"), (3L, "abaa"), (4L, "baaa"),
      (50L, "aaaa"),
      (60L, "zzzz") // singleton: stays its own canon
    ).toDF("p_partkey", "p_name")
    val got = TextQueries.canonByCentrality(parts)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got("aaaa") === 50L)
    assert(Seq("aaab", "aaba", "abaa", "baaa").forall(got(_) === 50L),
      s"every star member must canonicalize to the hub: $got")
    assert(got("zzzz") === 60L)
  }

  test("tie on pr falls to the lower node id") {
    // a 2-path a—b: both endpoints have one edge, symmetric pr; the
    // deterministic tie-break must crown the lower id on both
    val parts = Seq((7L, "cccc"), (9L, "cccd")).toDF("p_partkey", "p_name")
    val got = TextQueries.canonByCentrality(parts)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got("cccc") === 7L && got("cccd") === 7L)
  }
}

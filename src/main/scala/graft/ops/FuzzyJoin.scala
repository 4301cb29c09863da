package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string similarity self-join at edit distance ≤ `maxDist`
  * (1 or 2) via the FastSS deletion neighborhood (Bocek et al., "Fast
  * Similarity Search in Large Dictionaries", 2007): every string expands
  * to its deletion variants — all strings reachable by deleting up to
  * `maxDist` characters — and any two strings within `maxDist` edits
  * necessarily share a variant:
  *
  *  - substitution at position i: both deletions at i coincide;
  *  - insertion/deletion: the longer string's deletion at the inserted
  *    position equals the shorter string's identity variant;
  *  - equality: identity variants coincide;
  *  - ed = 2 compositions: each of the two edits contributes one
  *    deletion per side as above, so depth-2 neighborhoods intersect —
  *
  * so an equi-join on the variant yields a candidate SUPERSET, verified
  * exactly with one codegen'd `levenshtein` per deduped pair. The
  * reference resolves entities by exact normalized keys only
  * (commercial_rfp_raw_data_ingestion_and_cleaning.py:238-246); this is
  * the approximate-matching extension a dirty corpus needs, at the two
  * depths dirty name columns actually present (one typo / two).
  *
  * Scale: the naive join is O(n²) levenshtein calls. Here each row
  * explodes to len+1 variants at depth 1 and ~len²/2 at depth 2 —
  * bounded by the string-length contract of the column, not corpus
  * size — the join key is the variant's md5 (fixed 16 bytes on the wire
  * regardless of string length), and candidate volume is Σ block² over
  * variant blocks, linear in n while blocks stay bounded (a data
  * property; a pathological shared-ancestor block surfaces exactly
  * where LSH bucket skew does and takes the same cap treatment, see
  * Shingles.capBuckets). Depth 2 both widens blocks (more strings share
  * a 2-deletion variant) and multiplies variants per string, so the
  * candidate-dedup before the single levenshtein per pair carries more
  * of the cost than at depth 1. One honest negative result, measured:
  * on DENSE digit-id name spaces (TPC-H supplier keys), the TRUE ed≤2
  * pair set is itself Θ(n²/k) — most id pairs differ in ≤2 digit
  * positions — and no blocking scheme can be sub-output; FastSS still
  * pays one verify per true pair, but such columns are exact-key
  * domains, not fuzzy-match domains. No broadcast, no collect,
  * verification linear in candidates.
  */
object FuzzyJoin {

  /** All (a, b) pairs with `levenshtein(a.str, b.str) ≤ maxDist` and
    * `a.key < b.key`. Output: (a_key, b_key, a_name, b_name, dist).
    *
    * Contract: `strCol` is a NAME/KEY-length string — the explode factor
    * is len+1 (depth 1) or ~len²/2 (depth 2), so document-scale text
    * does not belong here (that's the shingle/LSH family's job). NULL
    * strings generate no variants and therefore match nothing, including
    * other nulls — the SQL-join convention, stated here because a dirty
    * dimension usually has some.
    *
    * The variant frame is explicitly repartitioned by `vh` at the
    * session's full shuffle width BEFORE the self-join, with the
    * partition count pinned so AQE cannot coalesce it: the variant
    * frame's shuffle bytes are small (a handful of 16-byte hashes per
    * name), but the join EXPANDS — Σ block² candidate rows materialize
    * on the reduce side — and AQE sizes partitions by the map-side
    * bytes it can see, not the post-join expansion it can't. Measured
    * on the 100k-name fixture: the coalesced plan ran the 15M-candidate
    * expansion in ~2 tasks, one core pegged for ~58 s; the pinned-width
    * plan spreads it across the full width (also making the self-join
    * co-partitioned — no further shuffle on either side). */
  def edJoin(df: DataFrame, keyCol: String, strCol: String,
             maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"FastSS depth must be 1 or 2: $maxDist")
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val str = col(strCol)
    val variants =
      if (maxDist == 1)
        df.select(col(keyCol), str,
            explode(sequence(lit(0), length(str))).as("p"))
          .withColumn("vh", md5(deleteAt(str, col("p"))))
      else {
        // (p1, p2) with p1 = 0 ∧ any p2 (identity + single deletions) or
        // 1 ≤ p1 < p2 (double deletions): built as the filtered square so
        // no `sequence(lo, hi)` call can see lo > hi (which Spark treats
        // as a DESCENDING range, not an empty one)
        val square = flatten(transform(sequence(lit(0), length(str)), p1 =>
          transform(sequence(lit(0), length(str)), p2 =>
            struct(p1.as("p1"), p2.as("p2")))))
        val pp = filter(square, c =>
          c.getField("p1") === 0 || c.getField("p1") < c.getField("p2"))
        df.select(col(keyCol), str, explode(pp).as("pp"))
          .withColumn("vh", md5(deleteAt2(str,
            col("pp.p1"), col("pp.p2"))))
      }
    val d = variants.select(col(keyCol), str, col("vh"))
      .repartition(nPart, col("vh"))
    d.select(col(keyCol).as("a_key"), str.as("a_name"), col("vh"))
      .join(d.select(col(keyCol).as("b_key"), str.as("b_name"),
        col("vh")), Seq("vh"))
      .filter(col("a_key") < col("b_key"))
      .select("a_key", "b_key", "a_name", "b_name").distinct()
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= maxDist)
  }

  /** `s` with character `p` removed (1-based); `p = 0` is the identity
    * variant, completing the ed≤1 neighborhood. */
  private def deleteAt(s: Column, p: Column): Column =
    when(p === 0, s).otherwise(concat(
      s.substr(lit(1), p - 1), s.substr(p + 1, length(s))))

  /** `s` with characters `p1` and `p2` removed (1-based, requires
    * p1 = 0 ∨ p1 < p2); p1 = 0 delegates to the single-deletion
    * variant of p2 (and the (0,0) case to the identity). */
  private def deleteAt2(s: Column, p1: Column, p2: Column): Column =
    when(p1 === 0, deleteAt(s, p2)).otherwise(concat(
      s.substr(lit(1), p1 - 1),
      s.substr(p1 + 1, p2 - p1 - 1),
      s.substr(p2 + 1, length(s))))
}

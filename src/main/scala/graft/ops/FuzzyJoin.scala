package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string similarity self-join at edit distance ≤ 1 via the
  * FastSS deletion neighborhood (Bocek et al., "Fast Similarity Search in
  * Large Dictionaries", 2007): every string expands to its identity
  * variant plus each single-character deletion, and any two strings
  * within one edit necessarily share a variant —
  *
  *  - substitution at position i: both deletions at i coincide;
  *  - insertion/deletion: the longer string's deletion at the inserted
  *    position equals the shorter string's identity variant;
  *  - equality: identity variants coincide —
  *
  * so an equi-join on the variant yields a candidate SUPERSET, verified
  * exactly with one codegen'd `levenshtein` per deduped pair. The
  * reference resolves entities by exact normalized keys only
  * (commercial_rfp_raw_data_ingestion_and_cleaning.py:238-246); this is
  * the approximate-matching extension a dirty corpus needs.
  *
  * Scale: the naive join is O(n²) levenshtein calls. Here each row
  * explodes to len+1 variants (bounded by the string-length contract of
  * the column, not corpus size), the join key is the variant's md5 —
  * fixed 16 bytes on the wire regardless of string length — and
  * candidate volume is Σ block² over variant blocks, linear in n while
  * blocks stay bounded (a data property; a pathological shared-ancestor
  * block surfaces exactly where LSH bucket skew does and takes the same
  * cap treatment, see Shingles.capBuckets). No broadcast, no collect,
  * verification linear in candidates.
  */
object FuzzyJoin {

  /** All (a, b) pairs with `levenshtein(a.str, b.str) ≤ 1` and
    * `a.key < b.key`. Output: (a_key, b_key, a_name, b_name, dist).
    *
    * Contract: `strCol` is a NAME/KEY-length string — the explode factor
    * is len+1, so document-scale text does not belong here (that's the
    * shingle/LSH family's job). NULL strings generate no variants and
    * therefore match nothing, including other nulls — the SQL-join
    * convention, stated here because a dirty dimension usually has some.
    *
    * The variant frame is explicitly repartitioned by `vh` at the
    * session's full shuffle width BEFORE the self-join, with the
    * partition count pinned so AQE cannot coalesce it: the variant
    * frame's shuffle bytes are small (len+1 rows of 16-byte hashes per
    * name), but the join EXPANDS — Σ block² candidate rows materialize
    * on the reduce side — and AQE sizes partitions by the map-side
    * bytes it can see, not the post-join expansion it can't. Measured
    * on the 100k-name fixture: the coalesced plan ran the 15M-candidate
    * expansion in ~2 tasks, one core pegged for ~58 s; the pinned-width
    * plan spreads it across the full width (also making the self-join
    * co-partitioned — no further shuffle on either side). */
  def edJoin(df: DataFrame, keyCol: String, strCol: String): DataFrame = {
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val d = df
      .select(col(keyCol), col(strCol),
        explode(sequence(lit(0), length(col(strCol)))).as("p"))
      .withColumn("vh", md5(deleteAt(col(strCol), col("p"))))
      .select(col(keyCol), col(strCol), col("vh"))
      .repartition(nPart, col("vh"))
    d.select(col(keyCol).as("a_key"), col(strCol).as("a_name"), col("vh"))
      .join(d.select(col(keyCol).as("b_key"), col(strCol).as("b_name"),
        col("vh")), Seq("vh"))
      .filter(col("a_key") < col("b_key"))
      .select("a_key", "b_key", "a_name", "b_name").distinct()
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= 1)
  }

  /** `s` with character `p` removed (1-based); `p = 0` is the identity
    * variant, completing the ed≤1 neighborhood. */
  private def deleteAt(s: Column, p: Column): Column =
    when(p === 0, s).otherwise(concat(
      s.substr(lit(1), p - 1), s.substr(p + 1, length(s))))
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed upsert/merge — applying a change feed (upserts + tombstone
  * deletes) onto a base table, the incremental-refresh counterpart of the
  * reference's full-overwrite publish (its pipeline truncates and
  * rewrites the container each run,
  * commercial_rfp_content_citation_upload_mapping_creation.py:47-113; at
  * 100 TB you apply the delta instead).
  *
  * Semantics: per key, the row with the greatest `ordinal` wins (the base
  * table is ordinal 0 by construction, changes carry 1..n); a winning row
  * flagged as a tombstone deletes the key. This is exactly the last-wins
  * dedup ([[Dedup.lastWins]]) plus a tombstone filter — composition, not
  * a new execution path, so the scale posture is the window dedup's: one
  * shuffle on the key.
  */
object Upsert {

  /** `base` ∪ `changes` → one surviving row per key. Both frames must
    * share the schema plus `ordinal` (long) and `deleted` (boolean) on
    * the change side; base rows get ordinal 0 / deleted false. */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val b = base.withColumn("__ord", lit(0L))
      .withColumn("__del", lit(false))
    val c = changes.withColumnRenamed("ordinal", "__ord")
      .withColumnRenamed("deleted", "__del")
    val merged = Dedup.lastWins(b.unionByName(c), key, "__ord")
    merged.filter(!col("__del")).drop("__ord", "__del")
  }
}

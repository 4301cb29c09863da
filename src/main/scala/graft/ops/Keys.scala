package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Business key + keyed hash derivation (SURVEY §2.3 K1/K2) and response
  * canonicalization (P14).
  *
  * Reference: commercial_rfp_raw_data_ingestion_and_cleaning.py:32-78
  * (`_key_from_hash`, `_add_rfp_keys`) and :306-310. All pure codegen'd
  * built-ins (concat_ws/substring/regexp_replace/md5) — embarrassingly
  * parallel at any scale, no shuffle.
  *
  * Keys are derived on the RAW frame, before cleaning, replicating the
  * reference's stage order (:291 runs `_add_rfp_keys` before `clean_data`;
  * SURVEY divergence note 5).
  */
object Keys {
  /** Snippet length for K1 question/response fragments and the K2 hash
    * input (ref :37,67-68). */
  val snippetLen = 120

  /** K1 — composite business key:
    * client_date_rfptype_consultant_q[:120]_r[:120] (ref :59-72).
    * The date fragment is the multi-format parse rendered yyyy-MM-dd, with
    * unparseable/null dates rendered as the literal "nan" (the reference's
    * stringified NaT). Null fields are skipped by concat_ws on both the
    * Spark and oracle side (documented contract). */
  def businessKey(client: Column, date: Column, rfpType: Column,
                  consultant: Column, question: Column,
                  response: Column): Column =
    concat_ws("_",
      trim(client),
      coalesce(date_format(Clean.parseDateMulti(date), "yyyy-MM-dd"),
        lit("nan")),
      trim(rfpType),
      trim(consultant),
      substring(trim(question), 1, snippetLen),
      substring(trim(response), 1, snippetLen))

  /** K2 — keyed hash: strip ALL whitespace from the key, truncate to 120
    * chars, md5, prefix "RFP_Content_" (ref :32-49,73-77). md5 is the
    * reference's default; sha1/sha2 variants are exposed too. */
  def keyHash(key: Column, algo: String = "md5"): Column = {
    val squeezed = substring(regexp_replace(key, "\\s+", ""), 1, snippetLen)
    val h = algo match {
      case "md5"    => md5(squeezed)
      case "sha1"   => sha1(squeezed)
      case "sha256" => sha2(squeezed, 256)
      case other    => throw new IllegalArgumentException(other)
    }
    concat(lit("RFP_Content_"), h)
  }

  /** Adds `key` and `key_hash` to an RFP-shaped frame (ref `_add_rfp_keys`). */
  def addRfpKeys(df: DataFrame): DataFrame =
    df.withColumn("key", businessKey(col("client"), col("date"),
        col("rfp_type"), col("consultant"), col("question"), col("response")))
      .withColumn("key_hash", keyHash(col("key")))

  /** P14 — canonicalize Confirmed-variants (ref :306-310). Alternation
    * order matters: the leftmost alternative wins at each position in both
    * Java regex and RE2, so `CONFIRMED.` becomes `Confirmed.` (bare
    * CONFIRMED matches first, the dot survives). */
  val confirmedPattern =
    "(?i)(CONFIRMED|CONFIRMED\\.|Confirmed via BlueInsights\\.|Confirmed via mail\\.|Confirmed\\.|Yes\\.\\s*Confirmed\\.)"

  def canonicalizeConfirmed(c: Column): Column =
    regexp_replace(c, confirmedPattern, "Confirmed")
}

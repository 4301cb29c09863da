package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the scrubbing stage every training-data pipeline runs
  * before text leaves curation (the reference's cleaning stage,
  * commercial_rfp_raw_data_ingestion_and_cleaning.py:179-241, normalizes
  * but never redacts; this is the north-star extension of that P-family).
  *
  * Patterns are deliberately in the regex subset with identical semantics
  * in Java regex and DuckDB/RE2 (no backrefs, no lookaround), so the
  * DuckDB oracle replays them verbatim. Pure codegen'd projections —
  * embarrassingly parallel, no shuffle, the 100 TB cost is one scan.
  */
object Redact {

  /** (pattern, replacement tag) in application order. Order matters:
    * emails are redacted before phones so a digit run inside an already
    * redacted tag cannot re-match. */
  val rules: Seq[(String, String)] = Seq(
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}" -> "[EMAIL]",
    "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}" -> "[PHONE]",
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b" -> "[IP]")

  /** All rules applied in order. */
  def redact(text: Column): Column =
    rules.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Match count for one rule (before any redaction). */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic synthetic file-listing ("manifest") frame, standing in for
  * the reference's blob/SharePoint listings (SURVEY §1: sets of
  * {name, id, webUrl, lastModifiedDateTime, createdDateTime} records;
  * commercial_rfp_content_citation_upload_mapping_creation.py:28-45,
  * commercial_rfp_data_ingestion_utils.py:90-106).
  *
  * Like [[RfpSynth]], the frame is defined twice — Spark expressions here,
  * DuckDB CTE in [[sql]] — as pure functions of doc_id, so listing-shaped
  * queries (latest-file selection, sync reconciliation, scalar utilities)
  * are oracle-checkable. Name families: RFP workbooks with embedded
  * yyyymmdd stamps (S6), .docx content docs, .xls data files, .tmp noise —
  * exercising every P12 filename-pattern filter.
  */
object ManifestSynth {
  def frame(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val nameDate = date_format(
      date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        ((id * 13) % 700).cast("int")), "yyyyMMdd")
    val t0 = "timestamp'2025-01-01 00:00:00'"
    docs.select(
      id,
      when(id % 4 === 0,
        concat(lit("RFP_content_library_"), nameDate, lit(".xlsx")))
        .when(id % 4 === 1, concat(lit("notes_"), id.cast("string"), lit(".docx")))
        .when(id % 4 === 2, concat(lit("data_"), id.cast("string"), lit(".xls")))
        .otherwise(concat(lit("temp_"), id.cast("string"), lit(".tmp")))
        .as("name"),
      date_format(
        expr(s"timestampadd(MINUTE, cast((doc_id*97) % 100000 as int), $t0)"),
        "yyyy-MM-dd'T'HH:mm:ss'Z'").as("modified"),
      date_format(
        expr(s"timestampadd(DAY, cast(doc_id % 5 as int), $t0)"),
        "yyyy-MM-dd").as("created_date"),
      concat(lit("https://sp.example/sites/Team%20Site/Shared%20Documents/folder"),
        (id % 7).cast("string"), lit("/")).as("url"))
  }

  /** DuckDB CTE producing the identical frame; prepend to oracle SQL. */
  val sql: String =
    """manifest AS (
      |  SELECT doc_id,
      |    CASE doc_id % 4
      |      WHEN 0 THEN 'RFP_content_library_' || strftime(DATE '2024-01-01' + CAST((doc_id * 13) % 700 AS INTEGER), '%Y%m%d') || '.xlsx'
      |      WHEN 1 THEN 'notes_' || CAST(doc_id AS VARCHAR) || '.docx'
      |      WHEN 2 THEN 'data_' || CAST(doc_id AS VARCHAR) || '.xls'
      |      ELSE 'temp_' || CAST(doc_id AS VARCHAR) || '.tmp' END AS name,
      |    strftime(TIMESTAMP '2025-01-01 00:00:00' + (doc_id * 97 % 100000) * INTERVAL 1 MINUTE,
      |             '%Y-%m-%dT%H:%M:%SZ') AS modified,
      |    strftime(TIMESTAMP '2025-01-01 00:00:00' + (doc_id % 5) * INTERVAL 1 DAY, '%Y-%m-%d') AS created_date,
      |    'https://sp.example/sites/Team%20Site/Shared%20Documents/folder' || CAST(doc_id % 7 AS VARCHAR) || '/' AS url
      |  FROM documents
      |)""".stripMargin
}

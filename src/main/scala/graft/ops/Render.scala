package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** S9/P15/S10/P16 — row → document rendering and document naming, the
  * engine counterpart of the reference's per-row .docx generation
  * (commercial_rfp_content_doc_library_creation.py:46-69,103-131).
  *
  * The rendered document is a plain string column (one "Label: value" line
  * per non-blank field, fixed field order); the query layer stays a pure
  * projection — no shuffle, fully codegen'd. Turning that column into the
  * reference's actual BINARY artifact is the sink layer's job:
  * [[Docx.writeDocx]] renders each row into a real OOXML .docx (one
  * paragraph per line — python-docx's add_paragraph loop) and
  * [[Docx.readDocs]] inverts it, both oracle-proven by q_docx_scan.
  */
object Render {

  /** One "label: value" line, null (⇒ skipped by concat_ws) when the value
    * is null or blank — the reference's blank-skipping loop (:50-64). */
  def line(label: String, value: Column): Column =
    concat(lit(s"$label: "), nullif(trim(value), lit("")))

  /** P15 — fixed-field-order document body (ref fields list :50-58). */
  def docBody(client: Column, rfpType: Column, consultant: Column,
              date: Column, sme: Column, question: Column,
              response: Column): Column =
    concat_ws("\n",
      line("Client Name", client),
      line("RFP Type", rfpType),
      line("Consultant", consultant),
      line("Date", date),
      line("SME", sme),
      line("Question", question),
      line("Response", response))

  /** S10+P16 — document file name: key_hash when present, else the
    * RFP_Content_Library_<id> fallback with the float→int id normalization
    * (ref :103-131, float check :122-123). */
  def docName(keyHash: Column, refVal: Column): Column =
    concat(
      coalesce(nullif(keyHash, lit("")),
        concat(lit("RFP_Content_Library_"),
          refVal.cast("double").cast("long").cast("string"))),
      lit(".docx"))
}

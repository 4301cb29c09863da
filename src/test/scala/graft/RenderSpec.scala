package graft

import org.apache.spark.sql.functions._
import graft.ops.Render

/** S9/P15/S10/P16 document rendering and naming. */
class RenderSpec extends SparkSpec {
  import spark.implicits._

  test("docBody skips null and blank fields, keeps fixed order") {
    val df = Seq(("Acme", "t1", null: String, "2024-01-01", "  ", "Q?", "A."))
      .toDF("client", "rfp_type", "consultant", "date", "sme", "question",
        "response")
      .select(Render.docBody(col("client"), col("rfp_type"), col("consultant"),
        col("date"), col("sme"), col("question"), col("response")).as("d"))
    assert(df.as[String].head() ===
      "Client Name: Acme\nRFP Type: t1\nDate: 2024-01-01\nQuestion: Q?\nResponse: A.")
  }

  test("docName uses key_hash when present, fallback otherwise") {
    val df = Seq(("RFP_Content_abc", 3L), (null: String, 7L), ("", 9L))
      .toDF("kh", "id")
      .select(Render.docName(col("kh"), col("id")).as("n"))
    assert(df.as[String].collect() === Array(
      "RFP_Content_abc.docx",
      "RFP_Content_Library_7.docx",
      "RFP_Content_Library_9.docx"))
  }

  test("docName P16 float ids normalize to integers") {
    val df = Seq(3.0, 12.0).toDF("id")
      .select(Render.docName(lit(null).cast("string"), col("id")).as("n"))
    assert(df.as[String].collect() === Array(
      "RFP_Content_Library_3.docx", "RFP_Content_Library_12.docx"))
  }
}

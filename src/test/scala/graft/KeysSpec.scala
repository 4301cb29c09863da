package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Prop
import graft.ops.Keys

/** K1/K2 key derivation and P14 canonicalization (SURVEY §2.3), including
  * the ScalaCheck properties committed to in SURVEY §5. */
class KeysSpec extends SparkSpec {
  import spark.implicits._

  private def keyOf(client: String, date: String, rfp: String, cons: String,
                    q: String, r: String): String =
    Seq((client, date, rfp, cons, q, r))
      .toDF("client", "date", "rfp_type", "consultant", "question", "response")
      .select(Keys.businessKey(col("client"), col("date"), col("rfp_type"),
        col("consultant"), col("question"), col("response")).as("k"))
      .as[String].head()

  test("K1 composite key: trimmed fields, yyyy-MM-dd date, 120-char snippets") {
    val k = keyOf(" Acme ", "3/14/2024", "t1", "c1", "q" * 200, "r" * 200)
    assert(k === s"Acme_2024-03-14_t1_c1_${"q" * 120}_${"r" * 120}")
  }

  test("K1 unparseable date renders as literal nan") {
    assert(keyOf("A", "junk", "t", "c", "q", "r") === "A_nan_t_c_q_r")
  }

  test("K2 hash strips ALL whitespace then truncates to 120 before md5") {
    val df = Seq(("a b  c", "abc")).toDF("k1", "k2")
      .select(Keys.keyHash(col("k1")).as("h1"), Keys.keyHash(col("k2")).as("h2"))
    val (h1, h2) = df.as[(String, String)].head()
    assert(h1 === h2 && h1.startsWith("RFP_Content_"))
  }

  test("K2 property: whitespace placement never changes the hash") {
    checkProp(Prop.forAll { (parts: List[String]) =>
      val base = parts.map(_.filterNot(_.isWhitespace)).mkString
      val spaced = parts.map(_.filterNot(_.isWhitespace)).mkString(" \t ")
      val df = Seq((base, spaced)).toDF("a", "b")
        .select(Keys.keyHash(col("a")), Keys.keyHash(col("b")))
      val row = df.collect()(0)
      row.getString(0) == row.getString(1)
    }, minTests = 10)
  }

  test("K2 sha1/sha256 variants produce distinct prefixed hashes") {
    val df = Seq("x").toDF("k").select(
      Keys.keyHash(col("k"), "md5").as("m"),
      Keys.keyHash(col("k"), "sha1").as("s1"),
      Keys.keyHash(col("k"), "sha256").as("s2"))
    val (m, s1, s2) = df.as[(String, String, String)].head()
    assert(Set(m, s1, s2).size === 3)
    assert(s1.length === "RFP_Content_".length + 40)
    assert(s2.length === "RFP_Content_".length + 64)
  }

  test("K2 sha1 matches java.security.MessageDigest (no DuckDB sha1)") {
    // the one K2 branch the SQL oracle cannot cover — cross-checked
    // against the JDK's independent implementation instead
    val inputs = Seq("x", "a b  c", "Acme_2024-03-14_t1_c1_q_r", "")
    val got = inputs.toDF("k")
      .select(Keys.keyHash(col("k"), "sha1").as("h")).as[String].collect()
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val want = inputs.map { k =>
      val squeezed = k.replaceAll("\\s+", "").take(120)
      "RFP_Content_" + md.digest(squeezed.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    assert(got.toSeq === want)
  }

  test("P14 alternation order: bare CONFIRMED wins at every position") {
    // Leftmost alternative CONFIRMED matches the bare prefix first, so
    // "CONFIRMED." keeps its dot and "Confirmed via mail." is rewritten
    // only in its (identical) prefix — the reference's pandas regex
    // behaves the same way; the quirk is replicated, not fixed.
    val df = Seq("CONFIRMED", "CONFIRMED.", "Confirmed via mail.",
      "Yes.  Confirmed.", "unconfirmed stays")
      .toDF("r").select(Keys.canonicalizeConfirmed(col("r")).as("c"))
    assert(df.as[String].collect() === Array(
      "Confirmed", "Confirmed.", "Confirmed via mail.", "Confirmed",
      "unConfirmed stays"))
  }
}

package graft

import graft.ops.DomainCurate
import org.apache.spark.sql.functions._

class DomainCurateSpec extends SparkSpec {
  import spark.implicits._

  private def dom(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(DomainCurate.registrableDomain(col("url")).as("d"))
      .collect().map(_.getString(0)).toSeq

  test("registrableDomain handles scheme, port, path, case, depth, PSL") {
    assert(dom("https://www.example.com/a/b?q=1") === Seq("example.com"))
    assert(dom("HTTP://CDN.Example.COM:8443/x") === Seq("example.com"))
    assert(dom("https://a.b.news.co.uk/story") === Seq("news.co.uk"))
    assert(dom("https://example.co.uk") === Seq("example.co.uk"))
    // trailing dot (a legal absolute FQDN) and bare 2-label host
    assert(dom("https://example.org./p") === Seq("example.org"))
    // one-label host returns itself (no eTLD+1 to extract)
    assert(dom("http://localhost:8080/admin") === Seq("localhost"))
    // no scheme at all — host-relative input still parses
    assert(dom("example.com/path") === Seq("example.com"))
  }

  test("capPerDomain keeps at most cap rows per domain, smallest-md5 set") {
    val df = spark.range(100).select(
      (col("id") % 3).cast("string").as("domain"), col("id").as("doc_id"))
    val capped = DomainCurate.capPerDomain(df, "domain", "doc_id", 5)
    val byDom = capped.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom.values.forall(_ == 5L))
    // deterministic smallest-md5 keep-set, independent of partitioning
    val expect = (0L until 100L).groupBy(i => (i % 3).toString)
      .view.mapValues(_.sortBy(i =>
        (java.security.MessageDigest.getInstance("MD5")
          .digest(i.toString.getBytes).map("%02x".format(_)).mkString, i))
        .take(5).toSet).toMap
    val got = capped.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSet).toMap
    assert(got === expect)
  }

  test("dropBlocked removes exactly the blocklisted domains (broadcast anti)") {
    val df = Seq(("a.com", 1L), ("b.org", 2L), ("a.com", 3L), ("c.net", 4L))
      .toDF("domain", "doc_id")
    val kept = DomainCurate.dropBlocked(df, "domain",
      Seq("a.com").toDF("bdom"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(2L, 4L))
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"blocklist join must broadcast:\n$plan")
  }
}

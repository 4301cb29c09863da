package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-level curation (VERDICT r11 #5 — the C4/RefinedWeb stage with
  * no reference analog): URL → registrable-domain extraction, per-domain
  * document caps, and domain blocklisting. Every web-scale pretraining
  * pipeline runs this stage (C4 blocklists domains, RefinedWeb caps
  * per-domain contribution to stop a single crawler-friendly site from
  * dominating the corpus); the reference's K6 URL normalizer
  * (commercial_rfp_data_ingestion_utils.py:60-73) has the parsing
  * machinery but nothing composes it into a curation operator.
  *
  * Registrable domain = the public suffix plus one label ("eTLD+1").
  * The real public-suffix list is a maintained data file; this operator
  * takes the multi-label-suffix SET as a parameter (defaulting to a
  * small documented subset) so the algorithm — NOT a bundled stale
  * snapshot — is what the engine owns. Everything is a codegen'd
  * projection: no UDF, no regex beyond scheme-stripping.
  *
  * Scale posture: extraction is a map-side projection; the per-domain
  * cap runs through [[TopK.perGroup]] (bounded per-domain heaps prune
  * map-side, so only ≤ cap·|domains| rows shuffle no matter how hot a
  * domain is — exactly the skew a crawl corpus has); the blocklist is a
  * broadcast anti-join (a blocklist is thousands of rows, never
  * corpus-sized).
  */
object DomainCurate {

  /** Multi-label public suffixes the default extraction recognizes —
    * a documented subset standing in for the full PSL data file. */
  val defaultSuffixes2: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "com.au",
    "net.au", "co.nz", "com.br", "co.in", "co.za", "com.cn", "com.mx")

  /** Lowercased host of a URL: scheme stripped, path/query and port cut,
    * trailing dot removed. Pure string slicing — stays in whole-stage
    * codegen. */
  def hostOf(url: Column): Column = {
    val noScheme =
      regexp_replace(lower(trim(url)), "^[a-z][a-z0-9+.-]*://", "")
    regexp_replace(
      element_at(split(element_at(split(noScheme, "/"), 1), ":"), 1),
      "\\.$", "")
  }

  /** Registrable domain (eTLD+1) of a URL: last two host labels, or last
    * three when the last two form a recognized multi-label public suffix
    * (`suffixes2`). A one-label host (e.g. "localhost") returns itself. */
  def registrableDomain(url: Column,
      suffixes2: Seq[String] = defaultSuffixes2): Column = {
    val h = hostOf(url)
    val labels = split(h, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    when(n >= 3 && last2.isin(suffixes2: _*), last3)
      .when(n >= 2, last2)
      .otherwise(h)
  }

  /** Drop every row whose `domainCol` is on the blocklist — a broadcast
    * left_anti (a blocklist is thousands of rows, never corpus-sized;
    * the C4 badlist shape). */
  def dropBlocked(df: DataFrame, domainCol: String,
                  blocked: DataFrame): DataFrame =
    df.join(broadcast(blocked),
      df(domainCol) === blocked(blocked.columns.head), "left_anti")

  /** Cap each domain's contribution at `cap` documents, keeping the
    * deterministic smallest-md5 spread per domain (the q_sample_k
    * discipline — order-free, rerun-stable, no timestamp bias) via the
    * bounded-heap [[TopK.perGroup]] operator. Output = input columns +
    * `rk` (1-based keep rank within the domain). `idCol` must be
    * domain-unique (it breaks md5 ties and seeds the hash). */
  def capPerDomain(df: DataFrame, domainCol: String, idCol: String,
                   cap: Int): DataFrame = {
    val withH = df.withColumn("__h", md5(col(idCol).cast("string")))
    TopK.perGroup(withH, Seq(withH(domainCol)),
        Seq(withH("__h") -> false, withH(idCol) -> false), cap)
      .drop("__h")
  }
}

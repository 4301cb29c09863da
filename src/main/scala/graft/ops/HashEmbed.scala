package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native deterministic text→vector featurizer (VERDICT r10 #3):
  * hashed n-gram TF-IDF projection into [[dims]] dimensions — the
  * feature-hashing trick (Weinberger et al., ICML 2009) with md5-derived
  * buckets and signs, the engine's standing determinism discipline. This
  * closes the V2 slot honestly: the reference embeds via a hosted model
  * (commercial_rfp_indexer.py:177-191), which no oracle can check; this
  * featurizer is a pure function of the text, so the whole
  * text→vector→retrieval path runs END-TO-END inside the correctness gate
  * with zero external models.
  *
  * Determinism contract: term weights are fixed-point longs —
  * idf3 = round(ln(N/df)·1000) is the ONE double operation (the q_tfidf
  * precedent: both engines compute the identical IEEE double and round it
  * identically; a flip would need ln() to land within one ulp of a
  * 0.0005 grid midpoint), and every downstream sum is integer, so vector
  * components are bit-identical across engines, partitionings and
  * summation orders. Component bound: tf·idf3 ≤ ~2·10⁵ per term, ≤ ~30
  * terms per bucket → |component| < 2³¹ (int-safe for [[Vectors.intDot]];
  * dot ≤ 64·(10⁶)² ≈ 6·10¹³ — long- and double-exact).
  *
  * Scale: tf is one (doc, term) shuffle, df one (term) shuffle over the
  * DISTINCT term frame, projection a keyed join back on term — no
  * broadcast of anything corpus-sized, no collect; the corpus-count
  * scalar rides as a broadcast single-row frame. At 100 TB the term
  * frames are the classic inverted-index build, the shape this must take.
  */
object HashEmbed {
  val dims = 64

  /** (id, term, tf): lowered whitespace unigrams + bigrams per doc. */
  def termCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = split(trim(lower(col(textCol))), "\\s+")
    docs.select(col(idCol), w.as("w"))
      .select(col(idCol), explode(concat(col("w"), expr(
        "CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w)-2)," +
          " i -> concat(w[i], ' ', w[i+1])) ELSE array() END"))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
  }

  /** md5-derived hash bucket (hex chars 1-4 mod dims) and ±1 sign (hex
    * char 5 parity) of a term — mirrored verbatim in [[sparseSql]]. */
  def bucketOf(term: Column): Column = bucketIn(term, dims)

  /** [[bucketOf]] with a caller-chosen bucket count (≤ 65536, the hex
    * width) — the DSIR selection stage wants a finer-grained bag model
    * (thousands of buckets) than the 64-dim retrieval projection. */
  def bucketIn(term: Column, buckets: Int): Column = {
    require(buckets > 0 && buckets <= 65536, s"buckets out of range: $buckets")
    conv(substring(md5(term), 1, 4), 16, 10).cast("long") % buckets
  }
  def signOf(term: Column): Column =
    when(conv(substring(md5(term), 5, 1), 16, 10).cast("long") % 2 === 0,
      lit(1L)).otherwise(lit(-1L))

  /** The corpus idf dictionary (term, idf3 = round(ln(N/df)·1000)) —
    * exposed since r11 so the reranker can featurize QUERY text against
    * the corpus statistics without re-deriving them (at 100 TB this is
    * the precomputed idf dictionary a serving path would broadcast). */
  def idf3Frame(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.agg(count(lit(1)).as("nn"))
    termCounts(docs, idCol, textCol)
      .groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("term"),
        round(log(col("nn").cast("double") / col("df")) * 1000)
          .cast("long").as("idf3"))
  }

  /** [[sparse]] against a caller-supplied idf frame — lets the reranker
    * featurize only the SHORTLIST docs while keeping corpus-wide term
    * weights (featurizing a restricted frame with [[sparse]] itself would
    * silently recompute df on the restriction). */
  def sparseWithIdf(docs: DataFrame, idCol: String, textCol: String,
                    idf: DataFrame): DataFrame =
    termCounts(docs, idCol, textCol).join(idf, "term")
      .select(col(idCol), bucketOf(col("term")).as("dim"),
        (signOf(col("term")) * col("tf") * col("idf3")).as("c"))
      .groupBy(col(idCol), col("dim"))
      .agg(sum(col("c")).as("val"))

  /** Sparse hashed TF-IDF components: (id, dim, val), val = Σ over the
    * bucket's terms of sign·tf·idf3 (a fixed-point long). */
  def sparse(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    sparseWithIdf(docs, idCol, textCol, idf3Frame(docs, idCol, textCol))

  /** Hashed feature vector of one QUERY string against the corpus idf:
    * (dim, qval) — the same unigram+bigram grammar, tf from the query
    * text itself, weights from the corpus (OOV query terms drop via the
    * inner join, exactly as df=0 has no idf). At most terms-of-query dims
    * are nonzero, so the frame is O(1) by contract — broadcast it. */
  def queryVector(spark: SparkSession, idf: DataFrame,
                  queryText: String): DataFrame = {
    import spark.implicits._
    termCounts(Seq((0L, queryText)).toDF("qid", "qtext"), "qid", "qtext")
      .join(idf, "term")
      .select(bucketOf(col("term")).as("dim"),
        (signOf(col("term")) * col("tf") * col("idf3")).as("c"))
      .groupBy(col("dim")).agg(sum(col("c")).as("qval"))
  }

  /** DuckDB twin of [[queryVector]]: CTEs `rq`/`rqterms`/`rqvec`
    * (dim, qval). Splice AFTER [[sparseSql]] — joins its `hidf`.
    * `queryText` must be a SQL-literal-safe constant. */
  def querySparseSql(queryText: String): String = {
    require(!queryText.contains("'"), "queryText must be SQL-literal-safe")
    s"""rq AS (
       |  SELECT string_split_regex(trim(lower('$queryText')), '\\s+') AS w
       |), rqterms AS (
       |  SELECT term, count(*) AS tf FROM (
       |    SELECT unnest(w) AS term FROM rq
       |    UNION ALL
       |    SELECT w[i] || ' ' || w[i+1] AS term
       |    FROM rq, unnest(generate_series(1, len(w)-1)) AS g(i)
       |    WHERE len(w) >= 2
       |  ) GROUP BY term
       |), rqvec AS (
       |  SELECT ('0x' || substr(md5(t.term), 1, 4))::BIGINT % $dims AS dim,
       |    CAST(SUM((CASE WHEN ('0x' || substr(md5(t.term), 5, 1))::BIGINT % 2 = 0
       |              THEN 1 ELSE -1 END) * t.tf * i.idf3) AS BIGINT) AS qval
       |  FROM rqterms t JOIN hidf i ON i.term = t.term
       |  GROUP BY 1
       |)""".stripMargin
  }

  /** Dense component rows: every (id, dim ∈ 0..dims−1) with 0 for empty
    * buckets — the deterministic-shape output q_embed_hash checks. */
  def dense(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sp = docs.sparkSession
    val grid = docs.select(col(idCol))
      .crossJoin(broadcast(sp.range(dims).toDF("dim")))
    grid.join(sparse(docs, idCol, textCol), Seq(idCol, "dim"), "left")
      .select(col(idCol), col("dim"),
        coalesce(col("val"), lit(0L)).as("val"))
  }

  /** Dense int vectors (id, v: array<int>) for the retrieval kernels. */
  def vectors(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    sparse(docs, idCol, textCol)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(
        struct(col("dim").cast("int"), col("val").cast("int")))).as("m"))
      .select(col(idCol), expr(
        s"transform(sequence(0, ${dims - 1}), d -> coalesce(m[d], 0))")
        .as("v"))

  /** The DuckDB twin: CTEs `hterms` (doc_id, term, tf), `hidf`,
    * `hsparse` (doc_id, dim, val) over `src` (needs doc_id, text).
    * Prefix with WITH / splice after other CTEs. */
  def sparseSql(src: String = "documents"): String =
    s"""hwords AS MATERIALIZED (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
       |  FROM $src
       |), hterms AS MATERIALIZED (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(w) AS term FROM hwords
       |    UNION ALL
       |    SELECT doc_id, w[i] || ' ' || w[i+1] AS term
       |    FROM hwords, unnest(generate_series(1, len(w)-1)) AS g(i)
       |    WHERE len(w) >= 2
       |  ) GROUP BY doc_id, term
       |), hidf AS (
       |  SELECT term,
       |    CAST(round(ln(CAST((SELECT count(*) FROM $src) AS DOUBLE)
       |      / count(*)) * 1000) AS BIGINT) AS idf3
       |  FROM hterms GROUP BY term
       |), hsparse AS MATERIALIZED (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(t.term), 1, 4))::BIGINT % $dims AS dim,
       |    CAST(SUM((CASE WHEN ('0x' || substr(md5(t.term), 5, 1))::BIGINT % 2 = 0
       |              THEN 1 ELSE -1 END) * t.tf * i.idf3) AS BIGINT) AS val
       |  FROM hterms t JOIN hidf i ON i.term = t.term
       |  GROUP BY 1, 2
       |)""".stripMargin
}

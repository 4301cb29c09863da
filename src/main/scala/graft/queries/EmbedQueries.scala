package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ops.{HashEmbed, Vectors}

/** The Spark-native text→vector family (VERDICT r10 #3): hashed n-gram
  * TF-IDF featurization ([[graft.ops.HashEmbed]]), retrieval over the
  * DERIVED vectors, and the agreement scorecard against the shipped
  * embeddings — the whole raw-text → vector → top-k path inside the
  * correctness gate with zero external models.
  */
object EmbedQueries {

  /** The q_knn/q_ann query-set contract (vec_id % 100 = 0, capped), on
    * the documents id space — doc_id aligns 1:1 with vec_id in the
    * driver testdata, which is what makes [[qHashRecall]]'s agreement
    * join well-defined. */
  private def isDocQuery: Column = col("doc_id") % 100 === 0 &&
    col("doc_id") < SimilarityQueries.maxQueryId
  private val docQueryPredSql =
    s"doc_id % 100 = 0 AND doc_id < ${SimilarityQueries.maxQueryId}"

  /** Session-scoped shared frames (VERDICT r15 #1a): the three
    * registrations of this family all start from the SAME deterministic
    * featurizer run over the documents table, and before r15 each
    * re-tokenized the corpus from scratch (~6.9 s across the trio at
    * sf0.1). One localCheckpoint per (session, fixture dir, tag) —
    * exactly the materialized-once inverted-index/vector-store build a
    * real indexing pipeline runs before serving its consumers; the
    * checkpointed RDDs die with the SparkContext, and a fresh session
    * keys a fresh entry (the key carries the session's identity).
    * Determinism is what makes the share sound: every consumer would
    * have derived bit-identical frames, so oracle parity is unchanged. */
  private val memo = new SessionMemo[DataFrame]
  private def shared(s: SparkSession, dir: String, tag: String)
                    (make: => DataFrame): DataFrame =
    memo(s, s"$dir:$tag")(make.localCheckpoint())

  /** The featurized corpus: sparse (doc_id, dim, val) hashed TF-IDF
    * components, materialized once per session+fixture. Scale shape:
    * ≤ |docs| × 64 rows of three longs — the inverted-index
    * materialization, spillable (MEMORY_AND_DISK), not a new 100 TB
    * risk (at corpus scale this IS the vector-store build job). */
  private def sharedSparse(s: SparkSession, dir: String): DataFrame =
    shared(s, dir, "hsparse") {
      // pinTerms = false (review r15): the inner corpus-sized
      // termCounts checkpoint would stay REACHABLE through this
      // memoized frame's plan for the whole session — the pin-stacking
      // mode that OOM'd the 8 GB heap at 100x (HashEmbed.sparse's
      // scaladoc). Building this one session-lifetime checkpoint pays
      // one extra tokenize pass (the tf and df branches each scan), a
      // once-per-session cost the share amortizes away.
      HashEmbed.sparse(Tables.documents(s, dir), "doc_id", "text",
        pinTerms = false)
    }

  /** q_embed_hash — the featurizer itself: dense fixed-point component
    * rows (doc_id, dim, val) of the 64-d hashed TF-IDF projection,
    * hash-checked against the oracle's full re-derivation (tokenize →
    * tf → df → idf3 → md5 bucket/sign → integer sums). */
  val qEmbedHash = Q("q_embed_hash",
    (s, dir) => HashEmbed.denseFrom(Tables.documents(s, dir), "doc_id",
      sharedSparse(s, dir)),
    Some("WITH " + HashEmbed.sparseSql() + s"""
      |SELECT d.doc_id, g.dim, COALESCE(s.val, CAST(0 AS BIGINT)) AS val
      |FROM documents d
      |CROSS JOIN unnest(generate_series(0, ${HashEmbed.dims - 1})) AS g(dim)
      |LEFT JOIN hsparse s ON s.doc_id = d.doc_id AND s.dim = g.dim""".stripMargin),
    "north star: deterministic text->vector featurizer (hashed n-gram " +
      "TF-IDF, V2 closed Spark-native)")

  /** Shared body of the hash-vector kNN: exact cosine top-`k` over the
    * derived int vectors. One featurizer pass, query set broadcast, the
    * codegen'd [[Vectors.intDot]] as the scoring kernel — the q_knn plan
    * shape on in-plan-derived vectors. */
  private[queries] def hashKnn(s: SparkSession, dir: String, k: Int): DataFrame = {
    // shared pin (r14 per-query localCheckpoint → r15 session memo): the
    // vector frame is consumed by BOTH join sides (query set + corpus;
    // the isDocQuery filter pushed into the query side makes the
    // subtrees non-identical, so ReuseExchange can't dedupe them) AND by
    // both registrations that retrieve over it (q_knn_hash,
    // q_hash_recall). |corpus| rows × 64 ints — the vector frame an ANN
    // build would materialize anyway, derived from [[sharedSparse]] so
    // the tokenize + per-term md5 CPU is spent once per session.
    val base = shared(s, dir, "hbase") {
      HashEmbed.vectorsFrom(sharedSparse(s, dir), "doc_id")
        .withColumn("nxx", Vectors.intDot(col("v"), col("v")))
        .filter(col("nxx") > 0)
    }
    val qs = base.filter(isDocQuery)
      .select(col("doc_id").as("query_id"), col("v").as("qv"),
        col("nxx").as("qxx"))
    val score = round(Vectors.intDot(col("v"), col("qv")).cast("double") /
      (sqrt(col("nxx")) * sqrt(col("qxx"))), 6)
    // the finished top-k is |queries| × k rows — share it too, so the
    // scorecard (q_hash_recall) reads q_knn_hash's retrieval instead of
    // re-scoring the corpus
    shared(s, dir, s"hknn$k") {
      base.select(col("doc_id").as("nbr_id"), col("v"), col("nxx"))
        .crossJoin(broadcast(qs))
        .filter(col("nbr_id") =!= col("query_id"))
        .withColumn("score", score)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("score").desc, col("nbr_id"))))
        .filter(col("rk") <= k)
        .select(col("query_id"), col("rk"), col("nbr_id"), col("score"))
    }
  }

  /** Oracle CTEs for [[hashKnn]]: `hnorm`, `hq`, `hdots`, `hknn` (top-k
    * with rk) over [[HashEmbed.sparseSql]]'s hsparse. The dot join runs
    * DENSE (the zero-filled grid) so zero-overlap pairs score 0 exactly
    * as the engine's array kernel does, instead of dropping out of a
    * sparse inner join. */
  private def hashKnnSql(k: Int): String =
    s"""hdense AS MATERIALIZED (
       |  SELECT d.doc_id, g.dim, COALESCE(s.val, CAST(0 AS BIGINT)) AS val
       |  FROM documents d
       |  CROSS JOIN unnest(generate_series(0, ${HashEmbed.dims - 1})) AS g(dim)
       |  LEFT JOIN hsparse s ON s.doc_id = d.doc_id AND s.dim = g.dim
       |), hnorm AS (
       |  SELECT doc_id, CAST(SUM(val * val) AS BIGINT) AS nxx
       |  FROM hdense GROUP BY doc_id
       |), hq AS (
       |  SELECT doc_id AS query_id FROM documents WHERE $docQueryPredSql
       |), hdots AS (
       |  SELECT q.query_id, s.doc_id AS nbr_id,
       |    CAST(SUM(qs.val * s.val) AS BIGINT) AS dxy
       |  FROM hq q
       |    JOIN hdense qs ON qs.doc_id = q.query_id
       |    JOIN hdense s ON s.dim = qs.dim AND s.doc_id <> q.query_id
       |  GROUP BY 1, 2
       |), hknn AS (
       |  SELECT query_id, rk, nbr_id, score FROM (
       |    SELECT d.query_id, d.nbr_id,
       |      round(d.dxy / (sqrt(nn.nxx) * sqrt(nq.nxx)), 6) AS score,
       |      row_number() OVER (PARTITION BY d.query_id
       |        ORDER BY round(d.dxy / (sqrt(nn.nxx) * sqrt(nq.nxx)), 6) DESC,
       |                 d.nbr_id) AS rk
       |    FROM hdots d
       |      JOIN hnorm nn ON nn.doc_id = d.nbr_id AND nn.nxx > 0
       |      JOIN hnorm nq ON nq.doc_id = d.query_id AND nq.nxx > 0
       |  ) t WHERE rk <= $k
       |)""".stripMargin

  /** q_knn_hash — q_knn's retrieval semantics on the DERIVED vectors:
    * exact cosine top-5 where the vectors themselves are trained
    * in-plan from raw text (tf/df shuffles + keyed idf join), not read
    * from a parquet column. The oracle re-derives featurizer AND
    * retrieval in one statement. */
  val qKnnHash = Q("q_knn_hash",
    (s, dir) => hashKnn(s, dir, 5),
    Some("WITH " + HashEmbed.sparseSql() + ",\n" + hashKnnSql(5) + """
      |SELECT query_id, rk, nbr_id, score FROM hknn""".stripMargin),
    "north star: retrieval end-to-end from raw text via the hashed featurizer")

  /** q_hash_recall — the featurizer's scorecard row (the A/B a real
    * pipeline runs before swapping an embedding model): per query,
    * |top-5 by hashed text vectors ∩ top-5 by shipped embeddings|, both
    * sides exact cosine. The shipped embeddings are synthetic — they do
    * NOT encode the text — so the expected agreement is the random-
    * overlap calibration floor (~k²/N), and the row's value is its exact
    * reproducibility across engines, not its magnitude: the oracle
    * recomputes BOTH retrievals (float fixed-point kNN on embeddings,
    * integer kNN on re-derived hash vectors) and must land on the
    * identical per-query intersection counts. */
  val qHashRecall = Q("q_hash_recall",
    (s, dir) => {
      val emb = SimilarityQueries.withNorm(Tables.embeddings(s, dir))
      val eqs = emb.filter(SimilarityQueries.isQuery)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("dxx").as("qxx"))
      val epairs = emb.withColumnRenamed("vec_id", "nbr_id")
        .crossJoin(broadcast(eqs))
        .filter(col("nbr_id") =!= col("query_id"))
      val exact = SimilarityQueries.topK(epairs, 5, Seq("query_id", "nbr_id"))
      val hash = hashKnn(s, dir, 5).select(col("query_id").as("hq"),
        col("nbr_id").as("hn"))
      exact.join(hash,
          col("query_id") === col("hq") && col("nbr_id") === col("hn"),
          "left")
        .groupBy("query_id")
        .agg(sum(when(col("hn").isNotNull, 1L).otherwise(0L)).as("hits"))
    },
    Some("WITH " + HashEmbed.sparseSql() + ",\n" + hashKnnSql(5) + s""",
      |eq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      |       WHERE ${SimilarityQueries.queryPredSql()}),
      |epairs AS (
      |  SELECT e.vec_id AS nbr_id, eq.query_id, e.embedding AS nv, eq.qv
      |  FROM embeddings e CROSS JOIN eq WHERE e.vec_id <> eq.query_id
      |), """.stripMargin +
      SimilarityQueries.dotsSql("epairs", "nv", "qv", "query_id, nbr_id", "e") +
      """,
      |exact AS (
      |  SELECT query_id, nbr_id FROM (
      |    SELECT query_id, nbr_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY round(dxy/(sqrt(dxx)*sqrt(dyy)), 6) DESC, nbr_id) AS rk
      |    FROM edots) t WHERE rk <= 5
      |)
      |SELECT x.query_id,
      |  CAST(SUM(CASE WHEN h.nbr_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS hits
      |FROM exact x LEFT JOIN hknn h
      |  ON h.query_id = x.query_id AND h.nbr_id = x.nbr_id
      |GROUP BY x.query_id""".stripMargin),
    "north star: featurizer-vs-shipped-embeddings agreement scorecard " +
      "(exact per-query intersection, engine-identical)")

  def all: Seq[Q] = Seq(qEmbedHash, qKnnHash, qHashRecall)
}

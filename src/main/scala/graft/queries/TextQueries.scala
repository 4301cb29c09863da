package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.{Q, Tables}
import graft.ops.Shingles

/** Text-analysis family over `documents` (north star: language-ID, quality
  * scoring, token statistics, document fingerprinting — the text half of a
  * training-data pipeline; the reference only chunks text server-side,
  * commercial_rfp_indexer.py:164-176).
  *
  * Every query is one explode + one hash aggregation (or a pure
  * projection) — single shuffle, map-side partial aggregation, no collect,
  * so the shapes hold at corpus scale.
  */
object TextQueries {

  /** q_text_stats — per-document token statistics: counts, distincts,
    * average token length, type-token ratio. Two-phase aggregation
    * ((doc, tok) partial counts, then per-doc rollup) instead of
    * countDistinct, which would Expand every row into per-aggregate
    * copies; outputs are value-identical. */
  val qTextStats = Q("q_text_stats",
    (s, dir) => Shingles.tokens(
        Tables.documents(s, dir).select("doc_id", "lang", "text"),
        "doc_id", "text")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(length(col("tok")) * col("cnt")).as("n_chars_tok"),
        round(sum(length(col("tok")) * col("cnt")).cast("double")
          / sum(col("cnt")), 6).as("avg_tok_len"),
        round(count(lit(1)).cast("double") / sum(col("cnt")), 6).as("ttr"))
      .join(Tables.documents(s, dir).select("doc_id", "lang"), "doc_id")
      .select("doc_id", "lang", "n_tokens", "n_distinct", "n_chars_tok",
        "avg_tok_len", "ttr"),
    Some("""WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
      |), st AS (
      |  SELECT doc_id, count(*) AS n_tokens,
      |    CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct,
      |    CAST(SUM(length(tok)) AS BIGINT) AS n_chars_tok,
      |    round(CAST(SUM(length(tok)) AS DOUBLE)/count(*), 6) AS avg_tok_len,
      |    round(CAST(count(DISTINCT tok) AS DOUBLE)/count(*), 6) AS ttr
      |  FROM toks GROUP BY doc_id)
      |SELECT st.doc_id, d.lang, n_tokens, n_distinct, n_chars_tok, avg_tok_len, ttr
      |FROM st JOIN documents d ON d.doc_id = st.doc_id""".stripMargin),
    "north star: token counting / text statistics")

  /** Marker-token sets for the lang-id heuristic (shared with the oracle
    * SQL verbatim). A real pipeline would use char-n-gram profiles; the
    * mechanism — per-language evidence counts + argmax — is the same. */
  private val markers = Seq(
    "s_en" -> Seq("the", "a", "and", "of", "fast", "slow"),
    "s_de" -> Seq("der", "die", "das", "und", "von"),
    "s_fr" -> Seq("le", "la", "et", "de", "les"),
    "s_es" -> Seq("el", "los", "y", "en", "una"))

  /** q_lang_id — language identification by marker-token evidence counts
    * with a deterministic argmax (ties break toward the earlier language,
    * 'und' when no evidence). */
  val qLangId = Q("q_lang_id",
    (s, dir) => {
      val toks = Shingles.tokens(Tables.documents(s, dir), "doc_id", "text",
        lowered = true)
      val aggs = markers.map { case (name, words) =>
        sum(when(col("tok").isin(words: _*), 1).otherwise(0)).as(name)
      }
      toks.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
        .withColumn("pred_lang",
          when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
            col("s_en") >= col("s_es") && col("s_en") > 0, "en")
            .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es") &&
              col("s_de") > 0, "de")
            .when(col("s_fr") >= col("s_es") && col("s_fr") > 0, "fr")
            .when(col("s_es") > 0, "es")
            .otherwise("und"))
        .select("doc_id", "pred_lang", "s_en", "s_de", "s_fr", "s_es")
    },
    Some {
      val sums = markers.map { case (name, words) =>
        val list = words.map(w => s"'$w'").mkString(",")
        s"SUM(CASE WHEN tok IN ($list) THEN 1 ELSE 0 END) AS $name"
      }.mkString(",\n    ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok FROM documents
         |), scores AS (SELECT doc_id, $sums FROM toks GROUP BY doc_id)
         |SELECT doc_id,
         |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
         |       WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
         |       WHEN s_es > 0 THEN 'es'
         |       ELSE 'und' END AS pred_lang,
         |  CAST(s_en AS BIGINT) AS s_en, CAST(s_de AS BIGINT) AS s_de,
         |  CAST(s_fr AS BIGINT) AS s_fr, CAST(s_es AS BIGINT) AS s_es
         |FROM scores""".stripMargin
    },
    "north star: language-ID heuristic")

  private val stopWords = Seq("the", "a", "and", "of", "to", "in")

  /** Shared quality-gate scoring (q_quality and q_curate_e2e's first
    * stage use THIS definition — one predicate, two consumers): adds the
    * feature columns and the 4-point `quality` score; pure projection,
    * no shuffle. */
  private[graft] def qualityScored(docs: DataFrame): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val stopArr = typedLit(stopWords)
    docs
      .withColumn("text_len", length(col("text")))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_punct", length(col("text")) -
        length(regexp_replace(col("text"), "[.,;:!?]", "")))
      .withColumn("n_stop", size(filter(split(trim(lower(col("text"))), "\\s+"),
        t => array_contains(stopArr, t))))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("punct_ratio",
        col("n_punct").cast("double") / col("text_len"))
      .withColumn("quality",
        (when(col("text_len") >= 100, 1).otherwise(0) +
          when(col("n_tokens") >= 20, 1).otherwise(0) +
          when(col("stop_ratio") >= 0.02, 1).otherwise(0) +
          when(col("punct_ratio") <= 0.1, 1).otherwise(0)).cast("long"))
  }

  /** The quality-gate SQL twin of [[qualityScored]] as a CTE pair
    * (`feats`, `scored` with the `quality` column), shared by the
    * q_quality and q_curate_e2e oracles. */
  private[graft] def qualityScoredSql: String = {
    val list = stopWords.map(w => s"'$w'").mkString(",")
    s"""feats AS (
       |  SELECT *, length(text) AS text_len,
       |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |    length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
       |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |        t -> t IN ($list))) AS n_stop
       |  FROM documents
       |), scored AS (
       |  SELECT *,
       |    CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
       |    CAST(n_punct AS DOUBLE) / text_len AS punct_ratio,
       |    CAST((CASE WHEN text_len >= 100 THEN 1 ELSE 0 END
       |      + CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END
       |      + CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens >= 0.02 THEN 1 ELSE 0 END
       |      + CASE WHEN CAST(n_punct AS DOUBLE) / text_len <= 0.1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS quality
       |  FROM feats
       |)""".stripMargin
  }

  /** q_quality — quality scoring from length / punctuation / stop-word
    * features, 4-point score, keep score ≥ 3 (the training-data quality
    * gate pattern). Pure projection + filter: no shuffle at all. */
  val qQuality = Q("q_quality",
    (s, dir) => qualityScored(Tables.documents(s, dir))
      .filter(col("quality") >= 3)
      .select(col("doc_id"), col("lang"), col("text_len"), col("n_tokens"),
        round(col("stop_ratio"), 6).as("stop_ratio"),
        round(col("punct_ratio"), 6).as("punct_ratio"), col("quality")),
    Some {
      val list = stopWords.map(w => s"'$w'").mkString(",")
      s"""WITH feats AS (
         |  SELECT doc_id, lang, length(text) AS text_len,
         |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         |    length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
         |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |        t -> t IN ($list))) AS n_stop
         |  FROM documents
         |), scored AS (
         |  SELECT doc_id, lang, text_len, n_tokens,
         |    CAST(n_stop AS DOUBLE)/n_tokens AS stop_ratio,
         |    CAST(n_punct AS DOUBLE)/text_len AS punct_ratio,
         |    (CASE WHEN text_len >= 100 THEN 1 ELSE 0 END
         |     + CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END
         |     + CASE WHEN CAST(n_stop AS DOUBLE)/n_tokens >= 0.02 THEN 1 ELSE 0 END
         |     + CASE WHEN CAST(n_punct AS DOUBLE)/text_len <= 0.1 THEN 1 ELSE 0 END) AS quality
         |  FROM feats)
         |SELECT doc_id, lang, text_len, n_tokens,
         |  round(stop_ratio, 6) AS stop_ratio, round(punct_ratio, 6) AS punct_ratio,
         |  CAST(quality AS BIGINT) AS quality
         |FROM scored WHERE quality >= 3""".stripMargin
    },
    "north star: quality scoring / filtering")

  /** q_top_terms — corpus-level top-20 terms by frequency with document
    * frequency (the df side of tf-idf). Deterministic (tf, tok) order. */
  val qTopTerms = Q("q_top_terms",
    (s, dir) => Shingles.tokens(Tables.documents(s, dir), "doc_id", "text",
        lowered = true)
      .groupBy("tok")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("tok"))
      .limit(20),
    Some("""WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok FROM documents
      |)
      |SELECT tok, count(*) AS tf, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |FROM toks GROUP BY tok ORDER BY tf DESC, tok LIMIT 20""".stripMargin),
    "north star: term statistics (tf/df)")

  /** q_zipf — corpus frequency-profile diagnostics (r14): the Zipf
    * rank-frequency slope fitted over the top-100 terms plus the
    * vocabulary/hapax statistics a curation run reads before choosing
    * filters (a natural-language corpus fits slope ≈ −1; template spam
    * and boilerplate flatten it, OCR noise inflates the hapax ratio).
    * One row: vocab_size, total_tokens, hapax (count of once-seen
    * terms), hapax_ratio, zipf_slope.
    *
    * Scale shape: ONE map-side-combined token-count shuffle builds the
    * frequency table (vocabulary-sized, never collected); the top-100
    * head rides a TakeOrdered (no global sort), the rank window touches
    * 100 rows, and the regression is exact fixed-point arithmetic —
    * ln(rank)/ln(freq) snapped to 1e6 ([[qUnigramNll]]'s cross-engine
    * pattern; products ≤ ~1.4e16 at 100 TB frequencies, inside int64)
    * summed as integers, with ONE final double division per statistic
    * (IEEE-exact on identical inputs in both engines). The frequency
    * frame feeds both the head and the global stats — identical
    * subplans, so the one exchange is reused, not recomputed. */
  val qZipf = Q("q_zipf",
    (s, dir) => {
      val freq = Shingles.tokens(Tables.documents(s, dir), "doc_id", "text",
          lowered = true)
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val top = freq.orderBy(col("c").desc, col("tok")).limit(100)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("c").desc, col("tok"))))
        .select(
          round(log(col("rk").cast("double")) * 1e6).cast("long").as("x"),
          round(log(col("c").cast("double")) * 1e6).cast("long").as("y"))
      val reg = top
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(round(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
          6).as("zipf_slope"))
      val stats = freq
        .agg(count(lit(1)).as("vocab_size"), sum(col("c")).as("total_tokens"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"))
        .select(col("vocab_size"), col("total_tokens"), col("hapax"),
          round(col("hapax").cast("double") /
            col("vocab_size").cast("double"), 6).as("hapax_ratio"))
      stats.crossJoin(reg)
    },
    Some("""WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok FROM documents
      |), f AS (
      |  SELECT tok, count(*) AS c FROM toks GROUP BY tok
      |), top AS (
      |  SELECT CAST(round(ln(rk) * 1e6) AS BIGINT) AS x,
      |         CAST(round(ln(c) * 1e6) AS BIGINT) AS y
      |  FROM (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rk
      |        FROM f ORDER BY c DESC, tok LIMIT 100) t
      |), reg AS (
      |  SELECT round(CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS DOUBLE) /
      |               CAST(count(*) * sum(x*x) - sum(x) * sum(x) AS DOUBLE),
      |               6) AS zipf_slope
      |  FROM top
      |), g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS vocab_size,
      |         CAST(sum(c) AS BIGINT) AS total_tokens,
      |         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
      |  FROM f
      |)
      |SELECT vocab_size, total_tokens, hapax,
      |  round(CAST(hapax AS DOUBLE) / CAST(vocab_size AS DOUBLE), 6) AS hapax_ratio,
      |  zipf_slope
      |FROM g, reg""".stripMargin),
    "north star: corpus frequency profile (Zipf slope over the top-100, " +
      "hapax/vocabulary diagnostics — the pre-filter corpus health read)")

  /** q_fingerprint — content fingerprints: md5 of the whitespace-normalized
    * lowered text plus a 60-bit integer fingerprint from its prefix. Pure
    * projection. */
  val qFingerprint = Q("q_fingerprint",
    (s, dir) => {
      val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      Tables.documents(s, dir).select(
        col("doc_id"),
        md5(norm).as("content_md5"),
        conv(substring(md5(norm), 1, 15), 16, 10).cast("long").as("fp64"))
    },
    Some("""WITH n AS (
      |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_md5
      |  FROM documents)
      |SELECT doc_id, content_md5,
      |  ('0x' || substr(content_md5, 1, 15))::BIGINT AS fp64
      |FROM n""".stripMargin),
    "north star: document fingerprinting")

  /** q_tfidf — top-5 terms per selected document by tf·idf. Document
    * frequencies come from the FULL corpus; term frequencies only for the
    * selected documents (the filter prunes before the expensive side).
    * idf = ln(N/df) in double on both engines; scores are rounded to 6
    * decimals before ranking so a 1-ulp libm difference cannot flip
    * ranks. The corpus-count scalar joins in as a broadcast single-row
    * frame — no collect. */
  val qTfidf = Q("q_tfidf",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = Shingles.tokens(docs, "doc_id", "text", lowered = true)
      val nDocs = docs.agg(count(lit(1)).cast("double").as("n"))
      val dfreq = toks.distinct()
        .groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
      val tf = toks.filter(col("doc_id") % 50 === 0)
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val scored = tf.join(dfreq, "tok").crossJoin(broadcast(nDocs))
        .withColumn("tfidf", round(col("tf") * log(col("n") / col("df")), 6))
      scored.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
            .orderBy(col("tfidf").desc, col("tok"))))
        .filter(col("rk") <= 5)
        .select("doc_id", "rk", "tok", "tfidf")
    },
    Some("""WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      |  FROM documents
      |), n_docs AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      |dfreq AS (
      |  SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM toks GROUP BY tok
      |), tf AS (
      |  SELECT doc_id, tok, count(*) AS tf FROM toks
      |  WHERE doc_id % 50 = 0 GROUP BY doc_id, tok
      |), scored AS (
      |  SELECT t.doc_id, t.tok,
      |    round(t.tf * ln(n.n / d.df), 6) AS tfidf
      |  FROM tf t JOIN dfreq d ON d.tok = t.tok CROSS JOIN n_docs n
      |)
      |SELECT doc_id, rk, tok, tfidf FROM (
      |  SELECT doc_id, tok, tfidf,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rk
      |  FROM scored) t WHERE rk <= 5""".stripMargin),
    "north star: tf-idf term scoring")

  /** GPT-2-style pre-tokenizer regex (contractions, letter runs, digit
    * runs, punctuation runs, each with an optional leading space) —
    * restricted to the RE2 ∩ java.util.regex subset (no lookahead), so
    * Spark and the oracle tokenize identically; both engines use
    * leftmost-first alternation. */
  private val bpePat =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  /** q_token_bpe — token counting both ways the north star names:
    * whitespace tokens and BPE-ish regex pre-tokens, plus their ratio
    * (the "subword inflation" a budget estimator needs). Pure projection,
    * no shuffle. This is the FIXED-rule counting rung; tokenization
    * under LEARNED merges lives in [[qBpeEncode]] (word-level rules from
    * [[qBpeTrain]]) and [[qBpeSubword]] (character-level rules), which
    * together re-point the encoder at vocabularies the corpus itself
    * induced. */
  val qTokenBpe = Q("q_token_bpe",
    (s, dir) => {
      val nWs = size(split(trim(col("text")), "\\s+")).cast("long")
      val nBpe = size(regexp_extract_all(col("text"), lit(bpePat), lit(0)))
        .cast("long")
      Tables.documents(s, dir).select(
        col("doc_id"), nWs.as("n_ws"), nBpe.as("n_bpe"),
        round(nBpe.cast("double") / nWs, 6).as("bpe_per_ws"))
    },
    Some {
      val sqlPat = "'" + bpePat.replace("'", "''") + "'"
      s"""SELECT doc_id,
         |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_ws,
         |  CAST(len(regexp_extract_all(text, $sqlPat)) AS BIGINT) AS n_bpe,
         |  round(CAST(len(regexp_extract_all(text, $sqlPat)) AS DOUBLE)
         |    / len(string_split_regex(trim(text), '\\s+')), 6) AS bpe_per_ws
         |FROM documents""".stripMargin
    },
    "north star: token counting (whitespace + BPE-ish regex pre-tokenizer)")

  /** q_winnow — rolling-window character-8-gram fingerprint (winnowing
    * style, the north star's "rolling hash" document fingerprint): hash
    * every 4th 8-gram window and keep the per-doc minimum — robust to
    * edits outside the minimal window, unlike q_fingerprint's whole-doc
    * hash. Generator + codegen'd projection + one map-side-combined
    * groupBy; docs shorter than one window are excluded (no fingerprint
    * is derivable). */
  val qWinnow = Q("q_winnow",
    (s, dir) => Tables.documents(s, dir)
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 7, lit(4))).as("i"))
      .select(col("doc_id"), md5(expr("substring(text, i, 8)")).as("h"))
      .groupBy("doc_id")
      .agg(min(col("h")).as("min_gram_md5"), count(lit(1)).as("n_grams"))
      .withColumn("fp64",
        conv(substring(col("min_gram_md5"), 1, 15), 16, 10).cast("long")),
    Some("""WITH grams AS (
      |  SELECT doc_id, md5(substring(text, CAST(i AS INTEGER), 8)) AS h
      |  FROM documents, unnest(generate_series(1, length(text)-7, 4)) AS g(i)
      |  WHERE length(text) >= 8
      |)
      |SELECT doc_id, min(h) AS min_gram_md5, count(*) AS n_grams,
      |  ('0x' || substr(min(h), 1, 15))::BIGINT AS fp64
      |FROM grams GROUP BY doc_id""".stripMargin),
    "north star: rolling-hash (winnowing-style) document fingerprinting")

  /** q_decontam — benchmark decontamination audit: per training doc, the
    * number of distinct word 3-grams it shares with the eval set
    * (doc_id%40=0 stands in for the benchmark; eval docs flag themselves,
    * which is correct — eval members must leave the training corpus too).
    * The published recipe (exact n-gram collision against the benchmark)
    * expressed Spark-first: the EVAL shingle set is broadcast — benchmark
    * suites are tiny by nature — so the corpus is scanned once with no
    * shuffle on the corpus side; one aggregation by doc. Short docs
    * (<3 tokens) cannot collide and drop out, like the near-dup family.
    * Per-doc dedup uses the NARROW shingle-set projection
    * (array_distinct per row), not a corpus-wide distinct — a global
    * distinct would shuffle every shingle of the corpus; this plan
    * shuffles only the matched rows into the final per-doc count. */
  val qDecontam = Q("q_decontam",
    (s, dir) => {
      val wtok = split(trim(col("text")), "\\s+")
      val docSh = Tables.documents(s, dir)
        .select(col("doc_id"), wtok.as("w"))
        .select(col("doc_id"),
          explode(graft.ops.Shingles.shingleSetOfWords(col("w"))).as("s"))
      val evalSh = docSh.filter(col("doc_id") % 40 === 0)
        .select("s").distinct()
      docSh.join(broadcast(evalSh), "s")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared"))
    },
    Some("""WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      |  FROM toks, unnest(generate_series(1, len(w)-2)) AS g(i)
      |  WHERE len(w) >= 3
      |), ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 40 = 0)
      |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shared
      |FROM sh JOIN ev ON ev.s = sh.s
      |GROUP BY sh.doc_id""".stripMargin),
    "north star: train/eval decontamination (exact n-gram collision audit)")

  /** q_mix — dataset mixing by weighted repetition: over-sample chosen
    * sources by an integer epoch factor (the curriculum/mixing knob of a
    * training-data assembly), as a deterministic `explode(sequence)` —
    * no RNG, identical in both engines. Output is the per-source mixing
    * manifest. */
  val qMix = Q("q_mix",
    (s, dir) => {
      val w = when(col("source").isin("src0", "src1"), 3)
        .when(col("lang") === "zh", 2).otherwise(1)
      Tables.documents(s, dir)
        .withColumn("epoch", explode(sequence(lit(1), w)))
        .groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_mixed"),
          max(col("epoch")).cast("long").as("max_epoch"))
    },
    Some("""SELECT source,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_mixed,
      |  CAST(max(epoch) AS BIGINT) AS max_epoch
      |FROM (
      |  SELECT doc_id, source, g.epoch FROM documents,
      |    unnest(generate_series(1,
      |      CASE WHEN source IN ('src0', 'src1') THEN 3
      |           WHEN lang = 'zh' THEN 2 ELSE 1 END)) AS g(epoch)
      |)
      |GROUP BY source""".stripMargin),
    "north star: dataset mixing via weighted repetition (deterministic)")

  /** q_mix_temp — TEMPERATURE mixing, the production counterpart of
    * [[qMix]]'s hand-pinned weights: sampling probabilities computed FROM
    * the corpus, p_i ∝ n_i^(1/τ-adjusted exponent) with the standard
    * α = 0.5 square-root damping (multilingual-LM recipe — small sources
    * up-weighted, huge sources down-weighted, exponent 1 = proportional,
    * 0 = uniform). Emits the per-source mixing manifest: probability,
    * target document count for a 2-epoch-equivalent budget, and the
    * full-epochs + remainder decomposition a sampler executes.
    *
    * Determinism discipline: sqrt is one correctly-rounded IEEE op, but
    * Σ√n_i is order-dependent in doubles — so the weights are snapped to
    * fixed-point longs FIRST (round(√n·1e9)) and the normalizer is an
    * exact integer sum; every downstream value is then one or two
    * correctly-rounded double ops from exact integers. Same trick as the
    * unigram-NLL and PageRank fixed-point contracts. Scale: one
    * map-side-combined count by source + a |sources|-row broadcast. */
  val qMixTemp = Q("q_mix_temp",
    (s, dir) => {
      val sizes = Tables.documents(s, dir)
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
        .withColumn("wl",
          round(sqrt(col("n_docs").cast("double")) * 1e9).cast("long"))
      val tot = sizes.agg(sum(col("wl")).as("wsum"),
        sum(col("n_docs")).as("ntot"))
      sizes.crossJoin(broadcast(tot))
        .withColumn("p", col("wl").cast("double") / col("wsum"))
        .withColumn("target_docs",
          round(col("p") * (col("ntot") * 2)).cast("long"))
        .select(col("source"), col("n_docs"),
          round(col("p"), 6).as("mix_p"), col("target_docs"),
          expr("target_docs div n_docs").as("full_epochs"),
          (col("target_docs") % col("n_docs")).as("rem_docs"))
    },
    Some("""WITH sizes AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(round(sqrt(CAST(count(*) AS DOUBLE)) * 1e9) AS BIGINT) AS wl
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT CAST(SUM(wl) AS BIGINT) AS wsum,
      |         CAST(SUM(n_docs) AS BIGINT) AS ntot
      |  FROM sizes
      |), t AS (
      |  SELECT source, n_docs, CAST(wl AS DOUBLE) / wsum AS p, ntot
      |  FROM sizes, tot
      |)
      |SELECT source, n_docs, round(p, 6) AS mix_p,
      |  CAST(round(p * (ntot * 2)) AS BIGINT) AS target_docs,
      |  CAST(round(p * (ntot * 2)) AS BIGINT) // n_docs AS full_epochs,
      |  CAST(round(p * (ntot * 2)) AS BIGINT) % n_docs AS rem_docs
      |FROM t""".stripMargin),
    "north star: temperature mixing (alpha=0.5 corpus-derived sampling " +
      "weights, the multilingual-LM recipe; fixed-point normalizer)")

  /** Per-document repeated-n-gram repetition scoring (the Gopher-family
    * repetition filter: documents whose word 2-/3-grams repeat heavily
    * are boilerplate/spam and get dropped from pretraining mixes; Rae et
    * al. 2021 §A1.1 use duplicate-n-gram fractions with thresholds near
    * these). `rep{2,3}_ratio` = fraction of n-gram OCCURRENCES that are
    * repeats of an n-gram already seen in the document, i.e.
    * (count - distinct count) / count; 0.0 when the doc is too short to
    * form an n-gram. Pure per-row array arithmetic (split → transform →
    * array_distinct) — a projection over the scan with NO shuffle and no
    * UDF, so at 100 TB this is exactly one pass over the text bytes.
    * NULL text is scored like empty text (keeps every column non-null —
    * and a null doc is trivially non-repetitive, not unscorable).
    * The `when(size >= n)` guard is load-bearing: Spark's
    * `sequence(0, -1)` infers a NEGATIVE step and yields [0, -1], not
    * the empty sequence. Verdict thresholds compare the ROUNDED ratios
    * so the keep/drop boundary cannot split on engine ULP differences. */
  def repNgram(docs: org.apache.spark.sql.DataFrame, idCol: String,
               textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = split(trim(lower(coalesce(col(textCol), lit("")))), "\\s+")
    def grams(n: Int) = {
      val mk = (0 until n).map(j => s"w[i+$j]").mkString(", ' ', ")
      when(size(col("w")) >= n,
        expr(s"transform(sequence(0, size(w)-$n), i -> concat($mk))"))
        .otherwise(expr("array()").cast("array<string>"))
    }
    def ratio(c: org.apache.spark.sql.Column) =
      when(size(c) > 0,
        round((size(c) - size(array_distinct(c))).cast("double") / size(c), 6))
        .otherwise(lit(0.0))
    // gram arrays are materialized as their own projection step: HOF
    // expressions are interpreted (no codegen, no common-subexpression
    // elimination), and `ratio` references its array four times — inlined,
    // each row would BUILD each n-gram array four times. CollapseProject
    // keeps the stages separate precisely because the refs are non-cheap
    // and used more than once (measured 2.2x end-to-end on the 10x
    // fixture: 6.7 s -> 3.1 s).
    docs.select(col(idCol), toks.as("w"))
      .select(col(idCol), col("w"), grams(2).as("bi"), grams(3).as("tri"))
      .select(col(idCol), size(col("w")).cast("long").as("n_tokens"),
        ratio(col("bi")).as("rep2_ratio"), ratio(col("tri")).as("rep3_ratio"))
      .withColumn("verdict",
        when(col("rep2_ratio") <= 0.2 && col("rep3_ratio") <= 0.18,
          lit("keep")).otherwise(lit("drop")))
  }

  /** q_rep_ngram — [[repNgram]] over `documents`. */
  val qRepNgram = Q("q_rep_ngram",
    (s, dir) => repNgram(
      Tables.documents(s, dir).select("doc_id", "text"), "doc_id", "text"),
    Some("""WITH t AS (
      |  SELECT doc_id,
      |    string_split_regex(trim(lower(coalesce(text, ''))), '\s+') AS w
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
      |    CASE WHEN len(w) >= 2 THEN list_transform(
      |      generate_series(1, len(w)-1), i -> w[i] || ' ' || w[i+1])
      |      ELSE [] END AS bi,
      |    CASE WHEN len(w) >= 3 THEN list_transform(
      |      generate_series(1, len(w)-2),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      |      ELSE [] END AS tri
      |  FROM t
      |), r AS (
      |  SELECT doc_id, n_tokens,
      |    CASE WHEN len(bi) > 0 THEN round(
      |      CAST(len(bi) - len(list_distinct(bi)) AS DOUBLE)/len(bi), 6)
      |      ELSE 0.0 END AS rep2_ratio,
      |    CASE WHEN len(tri) > 0 THEN round(
      |      CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE)/len(tri), 6)
      |      ELSE 0.0 END AS rep3_ratio
      |  FROM g
      |)
      |SELECT doc_id, n_tokens, rep2_ratio, rep3_ratio,
      |  CASE WHEN rep2_ratio <= 0.2 AND rep3_ratio <= 0.18
      |    THEN 'keep' ELSE 'drop' END AS verdict
      |FROM r""".stripMargin),
    "north star: repeated-n-gram repetition filter (Gopher-style quality gate)")

  /** Non-overlapping span width (tokens) for corpus-level span dedup.
    * RefinedWeb dedups exact LINES and C4 three-sentence spans; this
    * corpus has neither newlines nor sentence marks, so fixed 8-token
    * blocks are the analogous within-document unit.
    *
    * MEASURED limitation (VERDICT r11 #7, SpanDedupSpec): fixed blocks
    * detect a shared span only when both carriers cut it at the same
    * internal alignment — a 40-token span duplicated at offsets 0 and 3
    * removes ZERO blocks (the grids never agree on block text). The
    * alignment-robust variant is [[spanDedupCdc]] (content-defined
    * boundaries); this fixed-grid query stays as the RefinedWeb
    * exact-line analog, where the unit is anchored by the content
    * format itself. */
  private val spanLen = 8

  /** Corpus-wide repeated-span removal — the line-level dedup step of a
    * pretraining pipeline (RefinedWeb exact-line dedup / C4 span dedup),
    * DISTINCT from whole-document dedup (q_doc_dedup: drops documents),
    * within-document repetition (q_rep_ngram: scores one doc against
    * itself) and eval-set decontamination (q_decontam: scores against a
    * foreign corpus). Each document is cut into non-overlapping
    * [[spanLen]]-token blocks; any block whose text occurs in ≥2 DISTINCT
    * documents is boilerplate and is removed from all of them; survivors
    * are reassembled in document order.
    *
    * Scale shape: one explode (n_tokens/8 rows per doc), block counting
    * keyed on the block's md5 (fixed 16-byte shuffle key instead of
    * arbitrary-width text) in two phases — (hash, doc) partial then
    * per-hash doc count — then ONE left join marking duplicated blocks
    * and ONE per-doc aggregation that produces the totals, the removal
    * count, and the order-preserving reassembly in a single pass
    * (collect_list skips the nulls the duplicate-flag `when` leaves, so
    * survivors need no separate anti-join branch; a third pass over the
    * exploded blocks — the first cut of this query — showed up as three
    * posexplodes in the physical plan, which PlanSpec now pins at two).
    * Per-doc aggregation state is bounded by document size, the
    * duplicate-flag state per key is one count — no collect_set of
    * carrier docs, which a mega-boilerplate block (millions of carriers)
    * would blow up. No broadcast of the duplicate set (corpus-sized in
    * the worst case), no collect, every shuffle keyed — survives 100×. */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol),
      split(trim(coalesce(col(textCol), lit(""))), "\\s+").as("w"))
    val nb = ceil(size(col("w")).cast("double") / spanLen).cast("int")
    val blocks = base
      .select(col(idCol), posexplode(transform(sequence(lit(0), nb - 1),
        i => array_join(
          slice(col("w"), i * spanLen + 1, lit(spanLen)), " "))))
      .withColumnRenamed("col", "btxt")
      .withColumn("bh", md5(col("btxt")))
    val dup = blocks.groupBy("bh", idCol).agg(count(lit(1)).as("c"))
      .groupBy("bh").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("bh"), lit(true).as("is_dup"))
    blocks.join(dup, Seq("bh"), "left")
      .groupBy(idCol).agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_removed"),
        array_join(transform(array_sort(collect_list(
            when(col("is_dup").isNull, struct(col("pos"), col("btxt"))))),
          x => x.getField("btxt")), " ").as("kept_text"))
      .select(col(idCol), col("n_blocks"), col("n_removed"), col("kept_text"))
  }

  /** q_span_dedup — [[spanDedup]] over `documents`. The oracle counts
    * distinct-document occurrences of the block TEXT (no hash), so a
    * md5 collision on the engine side would surface as a mismatch. */
  val qSpanDedup = Q("q_span_dedup",
    (s, dir) => spanDedup(Tables.documents(s, dir), "doc_id", "text"),
    Some(s"""WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\\s+') AS w
      |  FROM documents
      |), bi AS (
      |  SELECT doc_id, w, unnest(generate_series(0,
      |    CAST(ceil(len(w)/$spanLen.0) AS BIGINT) - 1)) AS pos
      |  FROM t
      |), b AS (
      |  SELECT doc_id, pos, array_to_string(
      |    list_slice(w, pos*$spanLen + 1, pos*$spanLen + $spanLen), ' ') AS btxt
      |  FROM bi
      |), f AS (
      |  SELECT btxt, count(DISTINCT doc_id) AS nd FROM b GROUP BY btxt
      |), k AS (
      |  SELECT b.doc_id, b.pos, b.btxt
      |  FROM b JOIN f USING (btxt) WHERE f.nd = 1
      |), r AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |    string_agg(btxt, ' ' ORDER BY pos) AS kept_text
      |  FROM k GROUP BY doc_id
      |), nb AS (
      |  SELECT doc_id, count(*) AS n_blocks FROM b GROUP BY doc_id
      |)
      |SELECT nb.doc_id, nb.n_blocks,
      |  nb.n_blocks - coalesce(r.n_kept, 0) AS n_removed,
      |  coalesce(r.kept_text, '') AS kept_text
      |FROM nb LEFT JOIN r USING (doc_id)""".stripMargin),
    "north star: corpus-wide repeated-span (boilerplate) removal, RefinedWeb/C4-style")

  /** Average content-defined chunk length (tokens): a boundary falls
    * after any token whose md5 ≡ 0 (mod [[cdcModulus]]), so chunks are
    * geometric with mean ≈ 8 tokens — the same granularity as
    * [[spanLen]], but CONTENT-defined. */
  private val cdcModulus = 8

  /** Corpus-wide repeated-span removal with CONTENT-DEFINED chunk
    * boundaries (VERDICT r11 #7) — the alignment-robust upgrade of
    * [[spanDedup]]. Fixed blocks share a weakness with every
    * position-gridded scheme: two documents detect a shared span only
    * when they cut it at the SAME internal alignment, so a span
    * duplicated at offset 0 in one doc and offset 3 in another produces
    * entirely different block texts and is MISSED (SpanDedupSpec
    * constructs the case and records the measured miss — fixed blocks
    * remove 0 of a 24-token duplicated span, this query removes its
    * interior). The literature standard (Lee et al. 2022) is
    * suffix-array exact-substring dedup; its Spark-native analog is the
    * CDC/winnowing trick the repo's q_winnow fingerprinter already uses:
    * cut after every token whose hash ≡ 0 (mod [[cdcModulus]]), so chunk
    * boundaries travel WITH the content and a shared span yields
    * identical interior chunks in every carrier regardless of position.
    * Chunks average [[cdcModulus]] tokens (geometric, min 1, unbounded
    * tail — a no-boundary doc is one chunk, still exact).
    *
    * Scale shape: one posexplode (a row per token — the corpus-token
    * volume every text op here already carries), ONE per-doc window (the
    * running boundary count; same doc-keyed shuffle the reassembly
    * needs anyway), chunk counting keyed on the chunk md5, one left
    * join, one per-doc reassembly aggregation. No broadcast, no collect,
    * no collect_set of carriers — the [[spanDedup]] bounds verbatim. */
  def spanDedupCdc(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol),
      split(trim(coalesce(col(textCol), lit(""))), "\\s+").as("w"))
    val toks = base.select(col(idCol), posexplode(col("w")))
      .withColumnRenamed("col", "tok")
    val cut = when(
      conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("long")
        % cdcModulus === 0, 1L).otherwise(0L)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = toks
      .withColumn("cid", coalesce(sum(cut).over(w), lit(0L)))
      .groupBy(col(idCol), col("cid"))
      .agg(min(col("pos")).as("cpos"),
        array_join(transform(array_sort(collect_list(
            struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("ctxt"))
      .withColumn("ch", md5(col("ctxt")))
    val dup = chunks.groupBy("ch", idCol).agg(count(lit(1)).as("c"))
      .groupBy("ch").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("ch"), lit(true).as("is_dup"))
    chunks.join(dup, Seq("ch"), "left")
      .groupBy(idCol).agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_removed"),
        array_join(transform(array_sort(collect_list(
            when(col("is_dup").isNull, struct(col("cpos"), col("ctxt"))))),
          x => x.getField("ctxt")), " ").as("kept_text"))
      .select(col(idCol), col("n_chunks"), col("n_removed"), col("kept_text"))
  }

  /** q_span_dedup_cdc — [[spanDedupCdc]] over `documents`. As with
    * q_span_dedup, the oracle counts distinct-document carriers of the
    * chunk TEXT (no hash), so an md5 collision on the engine side would
    * surface as a mismatch. */
  val qSpanDedupCdc = Q("q_span_dedup_cdc",
    (s, dir) => spanDedupCdc(Tables.documents(s, dir), "doc_id", "text"),
    Some(s"""WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\\s+') AS w
      |  FROM documents
      |), tok AS (
      |  SELECT doc_id, i AS pos, w[i] AS tok
      |  FROM t, unnest(generate_series(1, len(w))) AS g(i)
      |), cidt AS (
      |  SELECT doc_id, pos, tok,
      |    COALESCE(SUM(CASE WHEN ('0x' || substr(md5(tok), 1, 4))::BIGINT
      |        % $cdcModulus = 0 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0) AS cid
      |  FROM tok
      |), ch AS (
      |  SELECT doc_id, cid, min(pos) AS cpos,
      |    string_agg(tok, ' ' ORDER BY pos) AS ctxt
      |  FROM cidt GROUP BY doc_id, cid
      |), f AS (
      |  SELECT ctxt, count(DISTINCT doc_id) AS nd FROM ch GROUP BY ctxt
      |), k AS (
      |  SELECT ch.doc_id, ch.cpos, ch.ctxt
      |  FROM ch JOIN f USING (ctxt) WHERE f.nd = 1
      |), r AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |    string_agg(ctxt, ' ' ORDER BY cpos) AS kept_text
      |  FROM k GROUP BY doc_id
      |), nc AS (
      |  SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id
      |)
      |SELECT nc.doc_id, nc.n_chunks,
      |  nc.n_chunks - coalesce(r.n_kept, 0) AS n_removed,
      |  coalesce(r.kept_text, '') AS kept_text
      |FROM nc LEFT JOIN r USING (doc_id)""".stripMargin),
    "north star: alignment-robust exact-span dedup via content-defined " +
      "chunking (the Lee et al. 2022 exact-substring goal re-expressed " +
      "as CDC - boundaries travel with content, not position)")

  /** q_bpe_merge — the BPE TRAINER's inner step at corpus scale: count
    * every adjacent token pair and rank the top merge candidates
    * (q_token_bpe is the ENCODER side — applying a vocabulary; this is
    * how the vocabulary's next merge rule is chosen). One explode
    * (n_tokens − 1 pairs per doc, arrays built once per row — the HOF
    * discipline [[graft.ops.Shingles.shingleSetOfWords]] documents), one
    * map-side-combined count shuffle, and a TakeOrdered top-20 (no
    * global sort); the final rank window touches 20 rows. */
  val qBpeMerge = Q("q_bpe_merge",
    (s, dir) => {
      val base = Tables.documents(s, dir).select(
        split(trim(lower(coalesce(col("text"), lit("")))), "\\s+").as("w"))
      val pairs = base.select(explode(
        when(size(col("w")) >= 2,
          transform(sequence(lit(1), size(col("w")) - 1),
            i => concat_ws(" ", element_at(col("w"), i),
              element_at(col("w"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("pair"))
      val top = pairs.groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(20)
      top.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("pair"))))
        .select("rk", "pair", "cnt")
    },
    Some("""WITH t AS (
      |  SELECT string_split_regex(trim(lower(coalesce(text, ''))), '\s+') AS w
      |  FROM documents
      |), p AS (
      |  SELECT unnest(CASE WHEN len(w) >= 2 THEN list_transform(
      |    generate_series(1, len(w)-1), i -> w[i] || ' ' || w[i+1])
      |    ELSE [] END) AS pair
      |  FROM t
      |), c AS (
      |  SELECT pair, count(*) AS cnt FROM p GROUP BY pair
      |)
      |SELECT rk, pair, cnt FROM (
      |  SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rk
      |  FROM c) x
      |WHERE rk <= 20""".stripMargin),
    "north star: BPE merge-rule induction (adjacent-pair counting, the trainer half of q_token_bpe)")

  // ------------------------------------------------------------------
  // Iterative BPE trainer (q_bpe_train / q_bpe_encode).
  //
  // q_bpe_merge is ONE pair-count pass; a real tokenizer trainer
  // ITERATES: pick the best pair (count desc, then (pa, pb) asc — the
  // deterministic tie-break), apply that merge corpus-wide, recount.
  // The corpus rides as ONE delimited string per document — each token
  // wrapped as U+0001·tok·U+0002 — so "apply merge (a, b) everywhere,
  // greedily left-to-right, non-overlapping" is a single literal
  // string `replace` of U+0001·a·U+0002·U+0001·b·U+0002 with
  // U+0001·a·U+001F·b·U+0002: because every token carries BOTH its own
  // delimiters, adjacent matches share no boundary characters, so the
  // scan-forward-after-each-replacement semantics that Spark's
  // `replace` and DuckDB's `replace` both implement IS exactly BPE's
  // greedy merge application (probed: replace('aaa','aa','b')='ba',
  // replace('aaaa','aa','a')='aa' in both engines — leftmost,
  // non-overlapping, replacement text never rescanned). Merged tokens
  // join their halves with U+001F, so later rounds can merge merged
  // tokens; pair identity stays a two-field (pa, pb) struct — a merged
  // half may itself contain U+001F, so a single joined pair string
  // would be ambiguous. Contract: the three control chars must not
  // appear in the text column (trivially true of this corpus; a
  // production run picks delimiters outside its alphabet).
  //
  // Scale shape per round: ONE job — a narrow pair-count shuffle
  // (map-side combined) feeding both a TakeOrdered-1 (the chosen rule —
  // one row to the driver, the same bounded-collect contract as KMeans'
  // codebook) and the grand pair total (the two branches reuse the one
  // exchange), plus one codegen'd projection applying the rule. The
  // audit column (toks_after — binds the oracle to the merged corpus
  // itself, not just the chosen pairs) rides the NEXT round's total via
  // tokens = totalPairs + nDocs (see bpeTrain's scaladoc); only the
  // last round pays a dedicated narrow token-count pass. The corpus is
  // persisted between rounds, so round r rescans the merged strings,
  // not the lineage back to parquet. Oracle: the KMeans.trainSql /
  // PageRank.scoresSql unrolled-CTE discipline — every round's
  // count→argmin→replace replayed as plain CTEs.
  // ------------------------------------------------------------------

  /** Number of merge rounds the trainer runs (≥5 per the depth bar;
    * a real run sets the vocab budget, e.g. 32k merges). */
  private val bpeRounds = 6

  private val bpeS1 = "\u0001" // token-open delimiter
  private val bpeS2 = "\u0002" // token-close delimiter
  private val bpeGl = "\u001f" // merged-token glue

  /** Tokens of a delimited corpus string (strip outer delims, split on
    * close+open — no regex metachars in either). */
  private[graft] def bpeToks(s: Column): Column =
    split(s.substr(lit(2), length(s) - 2), bpeS2 + bpeS1)

  /** documents → (doc_id, s) in the delimited representation, from the
    * exact token stream q_bpe_merge counts. */
  private[graft] def bpeCorpus0(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      concat(lit(bpeS1),
        array_join(split(trim(lower(coalesce(col("text"), lit("")))), "\\s+"),
          bpeS2 + bpeS1),
        lit(bpeS2)).as("s"))

  /** One learned merge rule: round, pair halves, the pair's count when
    * chosen, and the corpus token count AFTER applying it. */
  private[graft] final case class BpeMerge(rk: Int, pa: String, pb: String,
                                             cnt: Long, toks_after: Long)

  /** Runs the iterative trainer: `rounds` × (count pairs → pick best →
    * replace corpus-wide). Returns the merge table and the fully-merged
    * corpus (doc_id, s).
    *
    * `audit = false` skips the toks_after audit column entirely — for
    * callers that consume only the MERGED CORPUS (q_bpe_encode); the
    * rule choice and the rewrite chain are identical either way.
    *
    * Audit WITHOUT extra corpus passes (r14, VERDICT #2): the audit used
    * to be one full corpus scan per round for one BIGINT. But `replace`
    * preserves rows and every document has ≥1 token, so
    * tokens(corpus) = Σ_docs(pairs_d + 1) = totalPairs(corpus) + nDocs —
    * and totalPairs(corpus_r) is just the SUM of the pair counts round
    * r+1 already aggregates to choose its merge. So each round's job
    * emits BOTH the argmax row and the grand total (a two-branch union
    * over the same groupBy — the exchange is computed once and reused),
    * round r+1's total closes round r's audit, and only the FINAL round
    * pays one extra (narrow, shuffle-free) token-count pass. Rounds also
    * now unpersist their predecessor AFTER the job that materializes the
    * successor, so every count scans a warm cache instead of recomputing
    * the replace chain. */
  private[graft] def bpeTrain(corpus0: DataFrame, rounds: Int,
                                audit: Boolean = true): (Seq[BpeMerge], DataFrame) = {
    var corpus = corpus0.persist()
    var prev: DataFrame = null // still-persisted predecessor of `corpus`
    var nDocs = 0L
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    // totals(j) = totalPairs(corpus_j), learned by round j+1's job
    val totals = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (r <- 1 to rounds) {
      val cnts = corpus.select(bpeToks(col("s")).as("w"))
        .where(size(col("w")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("w")) - 1),
          i => struct(element_at(col("w"), i).as("pa"),
            element_at(col("w"), i + 1).as("pb")))).as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(count(lit(1)).as("cnt"))
      val top1 = cnts.orderBy(col("cnt").desc, col("pa"), col("pb")).limit(1)
        .select(lit("top").as("tag"), col("pa"), col("pb"), col("cnt"))
      val rows = (if (!audit) top1 else top1.unionAll(
        cnts.agg(coalesce(sum(col("cnt")), lit(0L)).as("cnt"))
          .select(lit("tot").as("tag"), lit(null).cast("string").as("pa"),
            lit(null).cast("string").as("pb"), col("cnt")))).collect()
      if (prev != null) { prev.unpersist(); prev = null }
      val best = rows.filter(_.getString(0) == "top")
      require(best.nonEmpty,
        s"BPE round $r: no adjacent pair left to merge — corpus exhausted " +
          "(every document is a single token); lower the round count")
      val (pa, pb, cnt) = (best(0).getString(1), best(0).getString(2),
        best(0).getLong(3))
      if (audit) {
        totals += rows.filter(_.getString(0) == "tot").head.getLong(3)
        if (r == 1) nDocs = corpus.count() // rows are replace-invariant
      }
      chosen += ((pa, pb, cnt))
      prev = corpus
      corpus = corpus.withColumn("s", call_function("replace", col("s"),
        lit(bpeS1 + pa + bpeS2 + bpeS1 + pb + bpeS2),
        lit(bpeS1 + pa + bpeGl + pb + bpeS2))).persist()
    }
    // the final round's audit has no successor job to ride: one narrow
    // token-count pass over the final corpus (also materializes it)
    val toksFinal = if (!audit) 0L
      else corpus.agg(sum(size(bpeToks(col("s")))).as("t")).head().getLong(0)
    if (prev != null) prev.unpersist()
    val merges = chosen.zipWithIndex.map { case ((pa, pb, cnt), i) =>
      val r = i + 1
      val toksAfter = if (!audit) 0L
        else if (r < rounds) totals(r) + nDocs
        else toksFinal
      BpeMerge(r, pa, pb, cnt, toksAfter)
    }
    (merges.toSeq, corpus)
  }

  /** The oracle replica of [[bpeTrain]] as unrolled DuckDB CTEs
    * (`bc0..bc<rounds>` corpora, `bm1..` chosen merges, `bt1..` audit
    * counts) — the KMeans.trainSql pattern applied to a string-rewrite
    * iteration. Callers select from `bm<r>`/`bt<r>`/`bc<rounds>`. */
  private def bpeTrainSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++=
      """bc0 AS (
        |  SELECT doc_id,
        |    chr(1) || array_to_string(
        |      string_split_regex(trim(lower(coalesce(text, ''))), '\s+'),
        |      chr(2) || chr(1)) || chr(2) AS s
        |  FROM documents
        |)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
        |bw$r AS (
        |  SELECT doc_id,
        |    string_split(substr(s, 2, length(s) - 2), chr(2) || chr(1)) AS w
        |  FROM bc${r - 1}
        |), bm$r AS (
        |  SELECT w[i] AS pa, w[i+1] AS pb, count(*) AS cnt
        |  FROM bw$r, unnest(generate_series(1, len(w) - 1)) AS g(i)
        |  WHERE len(w) >= 2
        |  GROUP BY 1, 2 ORDER BY cnt DESC, pa, pb LIMIT 1
        |), bc$r AS (
        |  SELECT c.doc_id,
        |    replace(c.s, chr(1) || m.pa || chr(2) || chr(1) || m.pb || chr(2),
        |                 chr(1) || m.pa || chr(31) || m.pb || chr(2)) AS s
        |  FROM bc${r - 1} c, bm$r m
        |), bt$r AS (
        |  SELECT CAST(sum(len(
        |    string_split(substr(s, 2, length(s) - 2), chr(2) || chr(1))))
        |    AS BIGINT) AS toks_after
        |  FROM bc$r
        |)""".stripMargin
    }
    sb.result()
  }

  /** q_bpe_train — the iterative BPE TRAINER (block comment above): the
    * learned merge table after [[bpeRounds]] greedy rounds, each row
    * carrying the chosen pair, its count at selection time, and the
    * corpus token count after applying it (the application audit — a
    * divergence in the greedy replace on EITHER side breaks every
    * subsequent round's counts, so six agreeing rounds pin the whole
    * rewrite chain, not just the argmax). */
  /** The trained BPE artifact, shared across the trainer/encoder pair
    * ([[SessionMemo]]): q_bpe_encode used to re-run the whole six-round
    * trainer q_bpe_train had just run (audit off — ~3 s at sf0.1 for a
    * bit-identical rewrite chain). One audited run per session+fixture;
    * the merged corpus rides a localCheckpoint (|docs| rows of merged
    * token strings — the tokenized-corpus materialization a real
    * tokenizer-training job writes once and every consumer reads). */
  private val bpeMemo = new SessionMemo[(Seq[BpeMerge], DataFrame)]
  private def bpeShared(s: SparkSession, dir: String)
      : (Seq[BpeMerge], DataFrame) =
    bpeMemo(s, dir) {
      val (merges, corpus) = bpeTrain(bpeCorpus0(s, dir), bpeRounds)
      val pinned = corpus.localCheckpoint()
      corpus.unpersist()
      (merges, pinned)
    }

  val qBpeTrain = Q("q_bpe_train",
    (s, dir) => {
      import s.implicits._
      bpeShared(s, dir)._1.toDF()
    },
    Some("WITH " + bpeTrainSql(bpeRounds) + "\n" +
      (1 to bpeRounds).map(r =>
        s"SELECT $r AS rk, m.pa, m.pb, m.cnt, t.toks_after FROM bm$r m, bt$r t")
        .mkString("\nUNION ALL\n")),
    "north star: iterative BPE trainer (pick best pair -> merge " +
      "corpus-wide -> recount, the vocabulary-learning loop q_bpe_merge " +
      "only sampled)")

  /** q_bpe_encode — the ENCODER re-pointed at the LEARNED vocabulary:
    * applies [[qBpeTrain]]'s merge rules (in training order — BPE
    * encoding replays merges by rule priority) to every document and
    * emits the merged token stream. Completes the trainer/encoder pair:
    * q_token_bpe counts a FIXED regex pre-tokenization; this one
    * tokenizes with rules the corpus itself induced. `text_bpe` joins
    * merged tokens with spaces (merged halves stay glued by U+001F), so
    * the oracle comparison covers every token of every document, not
    * just counts. */
  val qBpeEncode = Q("q_bpe_encode",
    (s, dir) => {
      val (_, corpus) = bpeShared(s, dir)
      corpus.select(col("doc_id"),
        size(bpeToks(col("s"))).cast("long").as("n_tok_bpe"),
        array_join(bpeToks(col("s")), " ").as("text_bpe"))
    },
    Some("WITH " + bpeTrainSql(bpeRounds) + s"""
      |SELECT doc_id,
      |  CAST(len(string_split(substr(s, 2, length(s) - 2),
      |    chr(2) || chr(1))) AS BIGINT) AS n_tok_bpe,
      |  array_to_string(string_split(substr(s, 2, length(s) - 2),
      |    chr(2) || chr(1)), ' ') AS text_bpe
      |FROM bc$bpeRounds""".stripMargin),
    "north star: BPE encoding under the LEARNED merges (trainer/encoder " +
      "pair closed; q_token_bpe keeps the fixed-regex counting rung)")

  /** Merge rounds for the CHARACTER-level trainer ([[qBpeSubword]]). */
  private val bpeSubRounds = 8

  /** q_bpe_subword — classic CHARACTER-level BPE (Sennrich, Haddow &
    * Birch 2016): where [[qBpeTrain]] merges adjacent WORD pairs (the
    * phrase-mining granularity q_bpe_merge established), this is the
    * granularity real tokenizers train at — merge adjacent CHARACTER
    * units inside words, never across word boundaries. The trainer runs
    * on the WORD-FREQUENCY DICTIONARY, the standard formulation: the
    * corpus collapses to (word, count) — here 31 distinct words, at
    * 100 TB still only the corpus vocabulary — every word becomes a
    * delimiter-wrapped character sequence, and each round counts
    * adjacent unit pairs WEIGHTED by word count, picks the best
    * (count desc, pair asc), and applies the greedy merge to the
    * dictionary (a |vocab|-row projection, NOT a corpus pass — the
    * decisive scale property of dictionary-based training; only the
    * one vocabulary-building pass ever scans the corpus). The merge
    * application reuses the delimiter/replace machinery of the
    * word-level trainer verbatim, so BpeTrainSpec's greedy-overlap
    * pins carry over. `units_after` audits each round: the WEIGHTED
    * corpus unit count Σ count(w)·|units(w)|.
    *
    * Oracle: the same unrolled-CTE replay at character granularity —
    * character wrapping via one regexp_replace('(.)' → wrapped capture)
    * on both engines, weighted counts as exact integer sums. */
  /** The driver-side training cap for [[qBpeSubword]]'s collected
    * dictionary (the AsOf broadcast row-cap discipline): 4M entries ≈
    * low hundreds of MB of (word, count) rows — vocabulary-bounded by
    * construction, but a runaway vocabulary (e.g. un-tokenized binary
    * text) must refuse loudly, not OOM the driver. Extracted so
    * BpeTrainSpec can exercise the refusal without 4M real rows. */
  private[graft] val subwordDictCap = 1 << 22
  private[graft] def requireSubwordDictCap(n: Int): Unit =
    require(n <= subwordDictCap,
      s"subword BPE dictionary has $n entries — above " +
        "the 4M driver-side training cap; sample the dictionary or " +
        "raise the cap with driver memory to match")

  val qBpeSubword = Q("q_bpe_subword",
    (s, dir) => {
      import s.implicits._
      // ONE corpus pass builds the word-frequency dictionary (the only
      // corpus-sized job); the merge rounds then run DRIVER-LOCAL over
      // the collected dictionary — the published single-node trainer
      // formulation (Sennrich et al.'s learn_bpe, SentencePiece and HF
      // tokenizers all train from the collected word-count table).
      // r18: the previous shape ran 8 rounds × 2 distributed jobs
      // (pair-count/argmax + persist swap) over a frame that is
      // |vocab| rows from round 0 on — per-job scheduling floor was
      // the entire cost (committed A/B record: 2.07 → 0.43 s at sf0.1
      // under bench rules, same bytes — OPTIMIZATION_r18.md).
      // The collect is vocabulary-bounded, never corpus-bounded,
      // and capped loudly (the AsOf broadcast row-cap discipline).
      val dictRows = Tables.documents(s, dir)
        .select(explode(split(trim(lower(coalesce(col("text"), lit("")))),
          "\\s+")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("c"))
        .collect()
      requireSubwordDictCap(dictRows.length)
      // UTF-8 byte order == code-point order: matches Spark's
      // UTF8String and DuckDB's varchar ordering. Java String.compareTo
      // orders by UTF-16 unit and diverges on supplementary planes.
      def u8cmp(a: String, b: String): Int = {
        val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
        var i = 0
        while (i < x.length && i < y.length) {
          val d = (x(i) & 0xff) - (y(i) & 0xff)
          if (d != 0) return d
          i += 1
        }
        x.length - y.length
      }
      // wrap each code point like regexp_replace(word,'(.)',S1$1S2)
      def wrap(w: String): String = {
        val sb = new StringBuilder
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          sb.append(bpeS1).appendAll(Character.toChars(cp)).append(bpeS2)
          i += Character.charCount(cp)
        }
        sb.result()
      }
      val sep = bpeS2 + bpeS1
      // units(s) — bpeToks verbatim: strip the outer delimiters, split
      // on close+open (split keeps a single "" for the empty word,
      // matching Spark's split)
      def units(sv: String): Array[String] =
        (if (sv.length < 2) "" else sv.substring(1, sv.length - 1))
          .split(java.util.regex.Pattern.quote(sep), -1)
      var cur = dictRows.map(r => (r.getLong(1), wrap(r.getString(0))))
      val merges = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, Long, Long)]
      for (r <- 1 to bpeSubRounds) {
        val cnt = scala.collection.mutable.HashMap
          .empty[(String, String), Long]
        for ((c, sv) <- cur) {
          val u = units(sv)
          var i = 0
          while (i < u.length - 1) {
            val k = (u(i), u(i + 1))
            cnt.update(k, cnt.getOrElse(k, 0L) + c)
            i += 1
          }
        }
        require(cnt.nonEmpty,
          s"subword BPE round $r: no adjacent unit pair left to merge — " +
            "every dictionary word is a single unit; lower the round count")
        var best: ((String, String), Long) = null
        for ((p, c) <- cnt) {
          if (best == null || c > best._2 ||
            (c == best._2 && {
              val d = u8cmp(p._1, best._1._1)
              d < 0 || (d == 0 && u8cmp(p._2, best._1._2) < 0)
            })) best = (p, c)
        }
        val ((pa, pb), c) = best
        cur = cur.map { case (wc, sv) =>
          (wc, sv.replace(bpeS1 + pa + bpeS2 + bpeS1 + pb + bpeS2,
            bpeS1 + pa + bpeGl + pb + bpeS2))
        }
        // units_after = Σ c·|units| over the merged dictionary — the
        // same number the distributed shape derived as Σc·pairs + Σc
        // (every word has pairs+1 units, including the empty word)
        val unitsAfter = cur.iterator
          .map { case (wc, sv) => wc * units(sv).length }.sum
        merges += ((r, pa, pb, c, unitsAfter))
      }
      merges.toSeq.toDF("rk", "pa", "pb", "cnt", "units_after")
    },
    Some {
      val sb = new StringBuilder
      sb ++=
        """WITH bd0 AS (
          |  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
          |    regexp_replace(word, '(.)', chr(1) || '\1' || chr(2), 'g') AS s
          |  FROM (
          |    SELECT unnest(string_split_regex(
          |      trim(lower(coalesce(text, ''))), '\s+')) AS word
          |    FROM documents) t
          |  GROUP BY word
          |)""".stripMargin
      for (r <- 1 to bpeSubRounds) {
        sb ++= s""",
          |bw$r AS (
          |  SELECT cnt,
          |    string_split(substr(s, 2, length(s) - 2), chr(2) || chr(1)) AS u
          |  FROM bd${r - 1}
          |), bm$r AS (
          |  SELECT u[i] AS pa, u[i+1] AS pb, CAST(sum(cnt) AS BIGINT) AS cnt
          |  FROM bw$r, unnest(generate_series(1, len(u) - 1)) AS g(i)
          |  WHERE len(u) >= 2
          |  GROUP BY 1, 2 ORDER BY cnt DESC, pa, pb LIMIT 1
          |), bd$r AS (
          |  SELECT d.word, d.cnt,
          |    replace(d.s, chr(1) || m.pa || chr(2) || chr(1) || m.pb || chr(2),
          |                 chr(1) || m.pa || chr(31) || m.pb || chr(2)) AS s
          |  FROM bd${r - 1} d, bm$r m
          |), bt$r AS (
          |  SELECT CAST(sum(cnt * len(
          |    string_split(substr(s, 2, length(s) - 2), chr(2) || chr(1))))
          |    AS BIGINT) AS units_after
          |  FROM bd$r
          |)""".stripMargin
      }
      sb ++= "\n" + (1 to bpeSubRounds).map(r =>
        s"SELECT $r AS rk, m.pa, m.pb, m.cnt, t.units_after FROM bm$r m, bt$r t")
        .mkString("\nUNION ALL\n")
      sb.result()
    },
    "north star: character-level BPE on the word-frequency dictionary " +
      "(the real tokenizer-training granularity; corpus scanned once, " +
      "merges applied to |vocab| rows)")

  /** Keep/drop threshold for [[qUnigramNll]] in nats: the corpus median
    * sits at ~3.40 with a rare-token tail to 3.70, so 3.45 drops the
    * tail (the real pipeline would fit this on a held-out slice; the
    * mechanism — score against a corpus LM, gate on a threshold — is
    * what's under test). */
  private val nllKeep = 3.45

  /** q_unigram_nll — the perplexity-filter pattern (KenLM-style quality
    * gating) with a unigram LM trained on the corpus itself: per-token
    * negative log-likelihood −ln(freq/N) under corpus frequencies,
    * averaged per document; rare-token-dense documents score high and
    * are dropped. Two passes over the token stream (frequency build +
    * score join — the same shape q_tfidf accepts), one vocab-keyed
    * shuffle join (NEVER a broadcast: the vocabulary of a 100 TB corpus
    * is itself huge), and a per-doc aggregation.
    *
    * Determinism contract: each token's NLL is snapped to a fixed-point
    * long (round(ln(N/c)·1e9) — per-VALUE ln + round is the established
    * BM25/tf-idf cross-engine pattern) so the per-doc SUM is exact
    * integer arithmetic in any order; only then does one
    * division-by-constant and one division-by-count (both IEEE-exact on
    * identical inputs) produce the double score. Per-doc sums stay far
    * under 2^53 (≤ ~12·1e9 per token), so the BIGINT→double cast is
    * exact in both engines. */
  val qUnigramNll = Q("q_unigram_nll",
    (s, dir) => {
      val toks = Shingles.tokens(Tables.documents(s, dir), "doc_id", "text",
        lowered = true)
      val freq = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      val total = freq.agg(sum(col("c")).cast("double").as("n"))
      toks.join(freq, "tok").crossJoin(broadcast(total))
        .withColumn("nc",
          round(log(col("n") / col("c").cast("double")) * lit(1e9))
            .cast("long"))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_tokens"),
          round(sum(col("nc")).cast("double") / lit(1e9) / count(lit(1)), 6)
            .as("avg_nll"))
        .withColumn("verdict",
          when(col("avg_nll") <= nllKeep, "keep").otherwise("drop"))
        .select("doc_id", "n_tokens", "avg_nll", "verdict")
    },
    Some(s"""WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      |  FROM documents
      |), freq AS (
      |  SELECT tok, count(*) AS c FROM toks GROUP BY tok
      |), total AS (
      |  SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq
      |), contrib AS (
      |  SELECT t.doc_id,
      |    CAST(round(ln(total.n / CAST(f.c AS DOUBLE)) * 1e9) AS BIGINT) AS nc
      |  FROM toks t JOIN freq f ON f.tok = t.tok CROSS JOIN total
      |), d AS (
      |  SELECT doc_id, count(*) AS n_tokens,
      |    round(CAST(sum(nc) AS BIGINT) / 1e9 / count(*), 6) AS avg_nll
      |  FROM contrib GROUP BY doc_id
      |)
      |SELECT doc_id, n_tokens, avg_nll,
      |  CASE WHEN avg_nll <= $nllKeep THEN 'keep' ELSE 'drop' END AS verdict
      |FROM d""".stripMargin),
    "north star: unigram-LM perplexity-filter analog (corpus-frequency NLL quality gate)")

  /** Interpolation weight on the bigram term of [[qBigramNll]]. */
  private val biLambda = 0.7

  /** Keep/drop threshold for [[qBigramNll]] in nats: the corpus
    * distribution sits ~3.39±0.03 under the interpolated bigram model
    * (barely below the unigram 3.40 — this corpus is near-unigram by
    * construction; real text drops much further), so 3.41 splits it. */
  private val biNllKeep = 3.41

  /** q_bigram_nll — the perplexity filter upgraded one Markov order
    * (KenLM-style quality gating uses n-gram models precisely because
    * unigram frequency can't see disfluent sequences of common words):
    * per-token NLL under an INTERPOLATED bigram LM trained on the corpus
    * itself, p(w|prev) = λ·c(prev,w)/c⁺(prev) + (1−λ)·c(w)/N, with the
    * context count c⁺(prev) = prev's occurrences in non-final positions
    * (so the bigram term is a proper distribution) and the document's
    * first token scored by the unigram term alone. Train==score corpus,
    * so every bigram has c ≥ 1 and no smoothing floor is needed — the
    * mechanism (n-gram LM score, threshold gate) is what's under test.
    *
    * Scale shape: one token pass builds both count tables (map-side
    * combined), scoring joins are KEYED on the bigram / context / token
    * (never broadcast — an n-gram table at 100 TB is itself huge, the
    * q_unigram_nll vocabulary argument squared), one per-doc agg.
    * Determinism: p is assembled by a pinned IEEE op chain over
    * integer-valued doubles (two divisions, two multiplies, one add —
    * identical token-for-token in the oracle), then each token's NLL
    * snaps to a fixed-point long (round(−ln(p)·1e9)) so the per-doc sum
    * is exact integer arithmetic in any order — the q_unigram_nll
    * contract, one Markov order up. */
  val qBigramNll = Q("q_bigram_nll",
    (s, dir) => {
      val toks = Tables.documents(s, dir).select(col("doc_id"),
          posexplode(split(trim(lower(coalesce(col("text"), lit("")))),
            "\\s+")))
        .withColumnRenamed("col", "tok")
      val uni = toks.groupBy("tok").agg(count(lit(1)).as("cu"))
      val total = uni.agg(sum(col("cu")).cast("double").as("n"))
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val seq = toks.withColumn("prev", lag(col("tok"), 1).over(byDoc))
      val bi = seq.filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("cb"))
      val ctx = bi.groupBy(col("prev")).agg(sum(col("cb")).as("cp"))
      val scored = seq
        .join(uni, "tok")
        .join(bi, Seq("prev", "tok"), "left")
        .join(ctx, Seq("prev"), "left")
        .crossJoin(broadcast(total))
        .withColumn("p",
          when(col("prev").isNull, col("cu").cast("double") / col("n"))
            .otherwise(lit(biLambda) *
              (col("cb").cast("double") / col("cp").cast("double")) +
              lit(1 - biLambda) * (col("cu").cast("double") / col("n"))))
        .withColumn("nc", round(-log(col("p")) * lit(1e9)).cast("long"))
      scored.groupBy("doc_id").agg(
          count(lit(1)).as("n_tokens"),
          round(sum(col("nc")).cast("double") / lit(1e9) / count(lit(1)), 6)
            .as("avg_nll"))
        .withColumn("verdict",
          when(col("avg_nll") <= biNllKeep, "keep").otherwise("drop"))
        .select("doc_id", "n_tokens", "avg_nll", "verdict")
    },
    Some(s"""WITH toks AS (
      |  SELECT doc_id, unnest(w) AS tok,
      |    unnest(generate_series(0, len(w) - 1)) AS pos
      |  FROM (SELECT doc_id, string_split_regex(
      |          trim(lower(coalesce(text, ''))), '\\s+') AS w
      |        FROM documents) t
      |), uni AS (
      |  SELECT tok, count(*) AS cu FROM toks GROUP BY tok
      |), total AS (
      |  SELECT CAST(sum(cu) AS DOUBLE) AS n FROM uni
      |), seq AS (
      |  SELECT doc_id, pos, tok,
      |    lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |  FROM toks
      |), bi AS (
      |  SELECT prev, tok, count(*) AS cb FROM seq
      |  WHERE prev IS NOT NULL GROUP BY prev, tok
      |), ctx AS (
      |  SELECT prev, CAST(sum(cb) AS BIGINT) AS cp FROM bi GROUP BY prev
      |), scored AS (
      |  SELECT s.doc_id,
      |    CAST(round(-ln(CASE WHEN s.prev IS NULL
      |        THEN CAST(u.cu AS DOUBLE) / total.n
      |        ELSE $biLambda * (CAST(b.cb AS DOUBLE) / CAST(c.cp AS DOUBLE))
      |             + ${1 - biLambda} * (CAST(u.cu AS DOUBLE) / total.n)
      |      END) * 1e9) AS BIGINT) AS nc
      |  FROM seq s
      |    JOIN uni u ON u.tok = s.tok
      |    LEFT JOIN bi b ON b.prev = s.prev AND b.tok = s.tok
      |    LEFT JOIN ctx c ON c.prev = s.prev
      |    CROSS JOIN total
      |), d AS (
      |  SELECT doc_id, count(*) AS n_tokens,
      |    round(CAST(sum(nc) AS BIGINT) / 1e9 / count(*), 6) AS avg_nll
      |  FROM scored GROUP BY doc_id
      |)
      |SELECT doc_id, n_tokens, avg_nll,
      |  CASE WHEN avg_nll <= $biNllKeep THEN 'keep' ELSE 'drop' END AS verdict
      |FROM d""".stripMargin),
    "north star: interpolated bigram-LM perplexity filter (the n-gram " +
      "quality gate one Markov order above q_unigram_nll)")

  /** Vocabulary size for [[qVocabEncode]]: deliberately below this
    * corpus's 31 distinct tokens so the OOV path is exercised (a real
    * run sets V to the tokenizer budget, e.g. 32k/50k). */
  private val vocabV = 24

  /** q_vocab_encode — the "tokenize the corpus to ids" step: induce a
    * frequency-ranked vocabulary (top-V terms, rank = token id) and
    * re-encode every document as its id sequence, OOV → 0. The encoded
    * corpus is what a training run actually reads; emitting the ids as
    * a space-joined string keeps the driver compare on scalar columns.
    *
    * Scale shape: one token pass builds the vocab (map-side-combined
    * count + TakeOrdered-V — the id-assignment window then touches V
    * rows), one token pass encodes via a BROADCAST join (the vocab is
    * V entries by construction — the one join in this repo where
    * broadcast is the contract, not a small-SF accident), and the
    * per-doc reassembly groupBy is bounded by document size. */
  val qVocabEncode = Q("q_vocab_encode",
    (s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"),
        split(trim(lower(coalesce(col("text"), lit("")))), "\\s+").as("w"))
      val toks = base.select(col("doc_id"), posexplode(col("w")))
        .withColumnRenamed("col", "tok")
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(vocabV)
        .withColumn("tid", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("c").desc, col("tok"))))
        .select("tok", "tid")
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("tid").isNull, 1L).otherwise(0L)).as("n_oov"),
          array_join(transform(
            array_sort(collect_list(struct(col("pos"),
              coalesce(col("tid"), lit(0)).as("tid")))),
            x => x.getField("tid").cast("string")), " ").as("ids_text"))
        .select("doc_id", "n_tokens", "n_oov", "ids_text")
    },
    Some(s"""WITH t AS (
      |  SELECT doc_id,
      |    string_split_regex(trim(lower(coalesce(text, ''))), '\\s+') AS w
      |  FROM documents
      |), toks AS (
      |  SELECT doc_id, unnest(w) AS tok,
      |    unnest(generate_series(0, len(w) - 1)) AS pos
      |  FROM t
      |), vc AS (
      |  SELECT tok, count(*) AS c FROM toks GROUP BY tok
      |), vocab AS (
      |  SELECT tok, rk AS tid FROM (
      |    SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok) AS rk
      |    FROM vc) x
      |  WHERE rk <= $vocabV
      |)
      |SELECT k.doc_id, count(*) AS n_tokens,
      |  CAST(sum(CASE WHEN v.tid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  string_agg(CAST(coalesce(v.tid, 0) AS VARCHAR), ' ' ORDER BY k.pos)
      |    AS ids_text
      |FROM toks k LEFT JOIN vocab v USING (tok)
      |GROUP BY k.doc_id""".stripMargin),
    "north star: vocab induction + corpus id-encoding (the tokenize-to-ids step a training run reads)")

  /** q_fuzzy_join — approximate string similarity self-join at edit
    * distance ≤ 1 over supplier names ([[graft.ops.FuzzyJoin.edJoin]]:
    * FastSS deletion-neighborhood blocking + exact levenshtein verify;
    * scale analysis in the op's scaladoc). The oracle rebuilds the same
    * neighborhood on the raw variant TEXT; an engine-side md5 variant
    * collision stays benign (and invisible) on both sides — colliding
    * variants only add candidates, and the exact levenshtein verify
    * prunes every spurious one, so the outputs still agree. */
  val qFuzzyJoin = Q("q_fuzzy_join",
    (s, dir) => graft.ops.FuzzyJoin.edJoin(
      Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name")),
      "s_suppkey", "s_name"),
    Some("""WITH d AS (
      |  SELECT s_suppkey, s_name,
      |    CASE WHEN p = 0 THEN s_name
      |         ELSE substr(s_name, 1, p-1) || substr(s_name, p+1) END AS var
      |  FROM (SELECT s_suppkey, s_name,
      |          unnest(generate_series(0, len(s_name))) AS p
      |        FROM supplier) t
      |), c AS (
      |  SELECT DISTINCT a.s_suppkey AS a_key, b.s_suppkey AS b_key,
      |         a.s_name AS a_name, b.s_name AS b_name
      |  FROM d a JOIN d b ON a.var = b.var AND a.s_suppkey < b.s_suppkey
      |)
      |SELECT a_key, b_key, a_name, b_name,
      |  CAST(levenshtein(a_name, b_name) AS INT) AS dist
      |FROM c WHERE levenshtein(a_name, b_name) <= 1""".stripMargin),
    "north star: FastSS deletion-neighborhood fuzzy join (edit-distance " +
      "<=1 without the O(n^2) all-pairs verify)")

  /** q_entity_canon — the full ENTITY-RESOLUTION stack composed from
    * parts the engine already has: block (FastSS deletion neighborhood)
    * → verify (levenshtein ≤ 1) → cluster (connected components over the
    * match graph) → canonicalize (min-id label; every part maps to its
    * cluster's canonical name id). Names are resolved at NAME granularity
    * (64 distinct names over 2000 parts at sf0.01 — "cold bolt"/"old
    * bolt" merge, each name-node is min(p_partkey) of its carriers),
    * then the labeling joins back to every part row. Unmatched names are
    * their own canon (left join + coalesce — singletons never enter the
    * CC). Oracle: the same neighborhood on raw variant text + a
    * recursive-CTE min-reachable-id CC — the same differential-algorithm
    * check q_dup_clusters runs, here over a REAL similarity graph rather
    * than the synthetic edge fixture.
    *
    * Scale shape: dedup-to-distinct-names first (the ER discipline —
    * cluster entities, not rows), FastSS blocking linear in names,
    * CC round-bound in the match graph's diameter (these chains are
    * short: one substitution family), one broadcast-sized join back to
    * the fact rows. Nothing all-pairs, nothing collected. */
  val qEntityCanon = Q("q_entity_canon",
    (s, dir) => {
      val parts = Tables.part(s, dir).select(col("p_partkey"), col("p_name"))
      val names = parts.groupBy("p_name").agg(min(col("p_partkey")).as("nid"))
      val edges = graft.ops.FuzzyJoin.edJoin(names, "nid", "p_name")
        .select(col("a_key").as("a"), col("b_key").as("b"))
      val comp = graft.ops.Components.connectedComponents(edges)
        .toDF("nid", "cluster_id")
      val canon = names.join(comp, Seq("nid"), "left")
        .select(col("p_name"),
          coalesce(col("cluster_id"), col("nid")).as("canon_id"))
      parts.join(canon, "p_name")
        .select(col("p_partkey"), col("p_name"), col("canon_id"))
    },
    Some("""WITH RECURSIVE names AS (
      |  SELECT p_name, min(p_partkey) AS nid FROM part GROUP BY p_name
      |), d AS (
      |  SELECT nid, p_name,
      |    CASE WHEN p = 0 THEN p_name
      |         ELSE substr(p_name, 1, p-1) || substr(p_name, p+1) END AS var
      |  FROM (SELECT nid, p_name,
      |          unnest(generate_series(0, len(p_name))) AS p
      |        FROM names) t
      |), e AS (
      |  SELECT DISTINCT a.nid AS a, b.nid AS b, a.p_name AS an, b.p_name AS bn
      |  FROM d a JOIN d b ON a.var = b.var AND a.nid < b.nid
      |), e1 AS (
      |  SELECT a, b FROM e WHERE levenshtein(an, bn) <= 1
      |), sym AS (SELECT a, b FROM e1 UNION SELECT b, a FROM e1),
      |reach(a, b) AS (
      |  SELECT a, b FROM sym
      |  UNION
      |  SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b
      |), lab AS (
      |  SELECT n.node, least(n.node, min(r.b)) AS cluster_id
      |  FROM (SELECT DISTINCT a AS node FROM sym) n
      |  JOIN reach r ON r.a = n.node
      |  GROUP BY n.node
      |), canon AS (
      |  SELECT nm.p_name, coalesce(l.cluster_id, nm.nid) AS canon_id
      |  FROM names nm LEFT JOIN lab l ON l.node = nm.nid
      |)
      |SELECT p.p_partkey, p.p_name, c.canon_id
      |FROM part p JOIN canon c USING (p_name)""".stripMargin),
    "north star: entity resolution end-to-end (FastSS block -> verify -> " +
      "CC cluster -> canonical id), the dirty-dimension merge a real " +
      "pipeline needs")

  /** The depth-2 deletion neighborhood of the `names(p_name, nid)` CTE as
    * oracle SQL — (p1, p2) spans identity (0,0), single deletions (0,p)
    * and double deletions (p1<p2), mirroring FuzzyJoin.edJoin(maxDist=2)
    * on raw variant text (no hashing, so the check is differential). */
  private val ed2VarSql =
    """d AS (
      |  SELECT nid, p_name,
      |    CASE WHEN p1 = 0 AND p2 = 0 THEN p_name
      |         WHEN p1 = 0 THEN substr(p_name, 1, p2-1) || substr(p_name, p2+1)
      |         ELSE substr(p_name, 1, p1-1) || substr(p_name, p1+1, p2-p1-1)
      |              || substr(p_name, p2+1) END AS var
      |  FROM (SELECT nid, p_name, a.i AS p1, b.i AS p2
      |        FROM names, unnest(generate_series(0, len(p_name))) a(i),
      |             unnest(generate_series(0, len(p_name))) b(i)
      |        WHERE a.i = 0 OR a.i < b.i) t
      |)""".stripMargin

  /** q_fuzzy_join2 — the FastSS join at edit distance ≤ 2
    * ([[graft.ops.FuzzyJoin.edJoin]] with maxDist = 2: two-deletion
    * neighborhoods, still linear in names), over DISTINCT part names at
    * name granularity — the named-entity shape where depth 2 pays off
    * (two-typo variants of dictionary-word names; ed≤2 triples the ed≤1
    * match set here, 8 → 24 name pairs at sf0.01). Deliberately NOT over
    * supplier ids: dense digit-key spaces have a Θ(n²/k) TRUE ed≤2 pair
    * set (most id pairs differ in ≤2 digit positions), which no blocking
    * can make sub-output — see the op scaladoc's negative result. */
  val qFuzzyJoin2 = Q("q_fuzzy_join2",
    (s, dir) => {
      val names = Tables.part(s, dir)
        .groupBy("p_name").agg(min(col("p_partkey")).as("nid"))
      graft.ops.FuzzyJoin.edJoin(names, "nid", "p_name", maxDist = 2)
        .select(col("a_key"), col("b_key"), col("a_name"), col("b_name"),
          col("dist"))
    },
    Some("""WITH names AS (
      |  SELECT p_name, min(p_partkey) AS nid FROM part GROUP BY p_name
      |), """.stripMargin + ed2VarSql + """, c AS (
      |  SELECT DISTINCT a.nid AS a_key, b.nid AS b_key,
      |         a.p_name AS a_name, b.p_name AS b_name
      |  FROM d a JOIN d b ON a.var = b.var AND a.nid < b.nid
      |)
      |SELECT a_key, b_key, a_name, b_name,
      |  CAST(levenshtein(a_name, b_name) AS INT) AS dist
      |FROM c WHERE levenshtein(a_name, b_name) <= 2""".stripMargin),
    "north star: FastSS at edit distance 2 (two-deletion neighborhoods; " +
      "the two-typo match a dirty name column needs)")

  /** q_entity_canon2 — [[qEntityCanon]] re-based on the DEPTH-2 match
    * graph: block (two-deletion neighborhoods) → verify (levenshtein ≤ 2)
    * → CC cluster → canonical min-id, joined back to every part row. The
    * looser verify admits two-typo variants into the same entity, so
    * clusters are strictly coarser than the ed≤1 stack's (EntityCanon2
    * cases in FuzzyJoinSpec pin the refinement relation). Same scale
    * shape as qEntityCanon: resolution at distinct-name granularity,
    * linear blocking, round-bound CC, one name-keyed join back to
    * facts. */
  val qEntityCanon2 = Q("q_entity_canon2",
    (s, dir) => {
      val parts = Tables.part(s, dir).select(col("p_partkey"), col("p_name"))
      val names = parts.groupBy("p_name").agg(min(col("p_partkey")).as("nid"))
      val edges = graft.ops.FuzzyJoin.edJoin(names, "nid", "p_name",
          maxDist = 2)
        .select(col("a_key").as("a"), col("b_key").as("b"))
      val comp = graft.ops.Components.connectedComponents(edges)
        .toDF("nid", "cluster_id")
      val canon = names.join(comp, Seq("nid"), "left")
        .select(col("p_name"),
          coalesce(col("cluster_id"), col("nid")).as("canon_id"))
      parts.join(canon, "p_name")
        .select(col("p_partkey"), col("p_name"), col("canon_id"))
    },
    Some("""WITH RECURSIVE names AS (
      |  SELECT p_name, min(p_partkey) AS nid FROM part GROUP BY p_name
      |), """.stripMargin + ed2VarSql + """, e AS (
      |  SELECT DISTINCT a.nid AS a, b.nid AS b, a.p_name AS an, b.p_name AS bn
      |  FROM d a JOIN d b ON a.var = b.var AND a.nid < b.nid
      |), e1 AS (
      |  SELECT a, b FROM e WHERE levenshtein(an, bn) <= 2
      |), sym AS (SELECT a, b FROM e1 UNION SELECT b, a FROM e1),
      |reach(a, b) AS (
      |  SELECT a, b FROM sym
      |  UNION
      |  SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b
      |), lab AS (
      |  SELECT n.node, least(n.node, min(r.b)) AS cluster_id
      |  FROM (SELECT DISTINCT a AS node FROM sym) n
      |  JOIN reach r ON r.a = n.node
      |  GROUP BY n.node
      |), canon AS (
      |  SELECT nm.p_name, coalesce(l.cluster_id, nm.nid) AS canon_id
      |  FROM names nm LEFT JOIN lab l ON l.node = nm.nid
      |)
      |SELECT p.p_partkey, p.p_name, c.canon_id
      |FROM part p JOIN canon c USING (p_name)""".stripMargin),
    "north star: entity resolution under the two-typo match graph " +
      "(depth-2 FastSS -> verify -> CC -> canonical id)")

  /** [[qEntityCanonPr]]'s body over any (p_partkey, p_name) frame —
    * exposed so EntityCanonPrSpec can drive it with a synthetic star
    * graph whose PageRank champion is NOT the min id (the shipped
    * fixture's clusters happen to agree on both, so the divergence the
    * centrality choice exists for needs a constructed case). */
  private[graft] def canonByCentrality(parts: DataFrame): DataFrame = {
    val names = parts.groupBy("p_name").agg(min(col("p_partkey")).as("nid"))
    val edges = graft.ops.FuzzyJoin.edJoin(names, "nid", "p_name")
      .select(col("a_key").as("a"), col("b_key").as("b"))
    val comp = graft.ops.Components.connectedComponents(edges)
      .toDF("nid", "cluster_id")
    val pr = graft.ops.PageRank.scores(edges, iters = 5)
    // per-cluster champion: max (pr, -node) struct — pr desc, then
    // node asc on ties; one map-side-combined aggregate, no window
    val champ = comp.join(pr, comp("nid") === pr("node"))
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("pr"), (-col("node")).as("nn"))).as("w"))
      .select(col("cluster_id"), (-col("w.nn")).as("canon_node"))
    val canon = names
      .join(comp, Seq("nid"), "left")
      .join(champ, Seq("cluster_id"), "left")
      .select(col("p_name"),
        coalesce(col("canon_node"), col("nid")).as("canon_id"))
    parts.join(canon, "p_name")
      .select(col("p_partkey"), col("p_name"), col("canon_id"))
  }

  /** q_entity_canon_pr — [[qEntityCanon]] with the canonical record
    * chosen by CENTRALITY instead of min-id: within each CC cluster of
    * the ed≤1 part-name match graph, the canonical entity is the member
    * with the highest PageRank score (ties → lower node id) — the
    * most-corroborated record, exactly the signal
    * [[graft.ops.PageRank]]'s scaladoc promises the ER family. A
    * hub name matched by many variants outranks a peripheral variant
    * even when the variant carries the smaller id, so this genuinely
    * diverges from min-id canonicalization whenever a cluster's hub is
    * not its min (EntityCanonPrSpec pins a divergent case).
    *
    * The first registry query composing TWO iterative computations, and
    * its oracle composes their two oracle disciplines: the
    * recursive-CTE min-reachable-id CC and the unrolled-CTE fixed-point
    * PageRank, joined by an argmax window. Determinism across engines:
    * pr = fp/1e12 with fp an exact integer < 2^53, so the double
    * comparison in the argmax IS the integer comparison.
    *
    * Scale shape: everything qEntityCanon does plus 5 PageRank
    * iterations (one keyed join + one map-side-combined sum each) and a
    * per-cluster argmax (max-of-struct, map-side combined) — no new
    * shuffle discipline, no collect. */
  val qEntityCanonPr = Q("q_entity_canon_pr",
    (s, dir) => canonByCentrality(
      Tables.part(s, dir).select(col("p_partkey"), col("p_name"))),
    Some("""WITH RECURSIVE names AS (
      |  SELECT p_name, min(p_partkey) AS nid FROM part GROUP BY p_name
      |), d AS (
      |  SELECT nid, p_name,
      |    CASE WHEN p = 0 THEN p_name
      |         ELSE substr(p_name, 1, p-1) || substr(p_name, p+1) END AS var
      |  FROM (SELECT nid, p_name,
      |          unnest(generate_series(0, len(p_name))) AS p
      |        FROM names) t
      |), e AS (
      |  SELECT DISTINCT a.nid AS a, b.nid AS b, a.p_name AS an, b.p_name AS bn
      |  FROM d a JOIN d b ON a.var = b.var AND a.nid < b.nid
      |), e1 AS (
      |  SELECT a, b FROM e WHERE levenshtein(an, bn) <= 1
      |), csym AS (SELECT a, b FROM e1 UNION SELECT b, a FROM e1),
      |reach(a, b) AS (
      |  SELECT a, b FROM csym
      |  UNION
      |  SELECT r.a, s.b FROM reach r JOIN csym s ON s.a = r.b
      |), lab AS (
      |  SELECT n.node, least(n.node, min(r.b)) AS cluster_id
      |  FROM (SELECT DISTINCT a AS node FROM csym) n
      |  JOIN reach r ON r.a = n.node
      |  GROUP BY n.node
      |),
      |""".stripMargin + graft.ops.PageRank.scoresSql("e1", 5) + """,
      |prs AS (SELECT node, CAST(fp AS DOUBLE)/1e12 AS pr FROM pr5),
      |champ AS (
      |  SELECT cluster_id, node AS canon_node FROM (
      |    SELECT l.cluster_id, p.node,
      |      row_number() OVER (PARTITION BY l.cluster_id
      |        ORDER BY p.pr DESC, p.node) AS rk
      |    FROM lab l JOIN prs p ON p.node = l.node) t
      |  WHERE rk = 1
      |), canon AS (
      |  SELECT nm.p_name, coalesce(c.canon_node, nm.nid) AS canon_id
      |  FROM names nm
      |  LEFT JOIN lab l ON l.node = nm.nid
      |  LEFT JOIN champ c ON c.cluster_id = l.cluster_id
      |)
      |SELECT p.p_partkey, p.p_name, cn.canon_id
      |FROM part p JOIN canon cn USING (p_name)""".stripMargin),
    "north star: centrality-canonical entity resolution (CC clusters + " +
      "PageRank champion — two iterative computations composed, engine " +
      "and oracle)")

  /** q_triangles — per-node triangle counts over the supplier fuzzy-match
    * graph ([[graft.ops.Triangles.perNode]]: degree-ordered node-iterator,
    * scale analysis there). Triangle density is the graph metric the
    * dedup/ER family reads to tell a genuine mutual-duplicate clique
    * (all edges present, max triangles) from a hub-and-spoke chain of
    * borderline matches (no triangles) — the precursor to clustering
    * coefficients. The supplier ed≤1 graph is triangle-rich by
    * construction: ids differing pairwise in one digit position close
    * into 10-cliques per position family. Oracle: the naive three-way
    * self-join with a<b<c (each triangle materialized once), per-node via
    * unnest — a wholly different enumeration order than the oriented
    * wedge join, so agreement is a differential check of the
    * orientation argument (exactly one wedge source per triangle). */
  val qTriangles = Q("q_triangles",
    (s, dir) => graft.ops.Triangles.perNode(
      graft.ops.FuzzyJoin.edJoin(
        Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name")),
        "s_suppkey", "s_name")
        .select(col("a_key").as("a"), col("b_key").as("b"))),
    Some("""WITH d AS (
      |  SELECT s_suppkey, s_name,
      |    CASE WHEN p = 0 THEN s_name
      |         ELSE substr(s_name, 1, p-1) || substr(s_name, p+1) END AS var
      |  FROM (SELECT s_suppkey, s_name,
      |          unnest(generate_series(0, len(s_name))) AS p
      |        FROM supplier) t
      |), c AS (
      |  SELECT DISTINCT a.s_suppkey AS a_key, b.s_suppkey AS b_key,
      |         a.s_name AS a_name, b.s_name AS b_name
      |  FROM d a JOIN d b ON a.var = b.var AND a.s_suppkey < b.s_suppkey
      |), e AS (
      |  SELECT a_key AS a, b_key AS b FROM c
      |  WHERE levenshtein(a_name, b_name) <= 1
      |), tri AS (
      |  SELECT ab.a AS x, ab.b AS y, bc.b AS z
      |  FROM e ab JOIN e bc ON bc.a = ab.b
      |       JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
      |), nodes AS (
      |  SELECT unnest([x, y, z]) AS node FROM tri
      |)
      |SELECT node, count(*) AS n_tri FROM nodes GROUP BY node""".stripMargin),
    "north star: degree-ordered triangle counting (the clique-vs-chain " +
      "metric over the match graph; skew-proof orientation)")

  /** q_pagerank — damped PageRank centrality (5 fixed-point iterations,
    * [[graft.ops.PageRank.scores]]) over the same supplier match graph as
    * [[qTriangles]], completing the match-graph trio: reachability
    * (q_dup_clusters' CC), local density (q_triangles), and now global
    * centrality — the signal that ranks WHICH member of a duplicate
    * family is the most-corroborated canonical record. All arithmetic is
    * integer fixed-point (12 digits, floor division), so the oracle's
    * unrolled-CTE replica agrees bit-for-bit — the iterative-computation
    * analog of the FixedPointDot determinism discipline. */
  val qPagerank = Q("q_pagerank",
    (s, dir) => graft.ops.PageRank.scores(
      graft.ops.FuzzyJoin.edJoin(
        Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name")),
        "s_suppkey", "s_name")
        .select(col("a_key").as("a"), col("b_key").as("b")), iters = 5),
    Some("""WITH d AS (
      |  SELECT s_suppkey, s_name,
      |    CASE WHEN p = 0 THEN s_name
      |         ELSE substr(s_name, 1, p-1) || substr(s_name, p+1) END AS var
      |  FROM (SELECT s_suppkey, s_name,
      |          unnest(generate_series(0, len(s_name))) AS p
      |        FROM supplier) t
      |), c AS (
      |  SELECT DISTINCT a.s_suppkey AS a_key, b.s_suppkey AS b_key,
      |         a.s_name AS a_name, b.s_name AS b_name
      |  FROM d a JOIN d b ON a.var = b.var AND a.s_suppkey < b.s_suppkey
      |), e AS (
      |  SELECT a_key AS a, b_key AS b FROM c
      |  WHERE levenshtein(a_name, b_name) <= 1
      |),
      |""".stripMargin + graft.ops.PageRank.scoresSql("e", 5) + """
      |SELECT node, CAST(fp AS DOUBLE)/1e12 AS pr FROM pr5""".stripMargin),
    "north star: fixed-point PageRank centrality (bit-identical iterative " +
      "graph computation; canonical-record ranking signal)")

  /** q_html_extract — the crawl-processing stage that FEEDS every text
    * op in this family: HTML → clean text. The synthetic corpus has no
    * markup, so (the q_redact dirty-text pattern) BOTH engines wrap each
    * document in the identical deterministic HTML — head with a
    * `<script>` whose body carries `<`, `>`, `&&` and a quoted string, a
    * `<style>` whose body contains a tag-like `"</p>"` literal, a
    * comment hiding a `<hidden>` pseudo-tag, entities (&amp; &lt; &gt;),
    * a link, a self-closing `<br/>` — then extract independently:
    * script/style blocks out first (non-greedy, dotall — the style's
    * embedded "</p>" string must NOT terminate the strip early), then
    * comments, then count + strip the remaining tags, decode entities
    * (amp LAST, the standard order), collapse whitespace. `n_links`
    * counts `<a href` on the raw HTML; `n_tags` counts what the tag
    * strip removed. Scale: one codegen'd projection chain — no shuffle,
    * no UDF; exactly how a crawl-extraction stage runs at 100 TB. */
  /** The HTML→text strip chain as Columns over any `html` column —
    * (text_clean, n_tags, n_links) — shared by [[qHtmlExtract]] (over
    * the deterministic wrap) and [[qCrawlE2e]] (over REAL WARC response
    * bodies). Script/style blocks out first (non-greedy, dotall — an
    * embedded "</p>" string literal must not terminate the strip), then
    * comments, then tags; entity decode amp-LAST; whitespace collapse.
    * Pure codegen'd projection — zero shuffle at any scale. */
  private[queries] def htmlStripCols(html: Column)
      : (Column, Column, Column) = {
    val noScript = regexp_replace(html,
      "(?s)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript,
      "(?s)<style[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", "")
    val unTagged = regexp_replace(noComment, "<[^>]+>", " ")
    // entity decode, amp LAST so "&amp;lt;" can never double-decode
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&amp;" -> "&").foldLeft(unTagged) { case (c, (e, ch)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(e), ch) }
    (trim(regexp_replace(decoded, "\\s+", " ")),
      regexp_count(noComment, lit("<[^>]+>")).cast("long"),
      regexp_count(html, lit("<a [^>]*href")).cast("long"))
  }

  /** The SQL twin of [[htmlStripCols]]: CTEs `nc` + `stripped` with
    * (keyCols, n_links, n_tags, text_clean) over `relation`, which must
    * provide keyCols and `html`. Plain-string built (no interpolator)
    * so the regex backslashes stay literal. */
  private[queries] def htmlStripSql(relation: String, keyCols: String)
      : String =
    "nc AS (\n" +
      "  SELECT " + keyCols + ", html,\n" +
      """    regexp_replace(regexp_replace(regexp_replace(html,
        |      '<script[^>]*>.*?</script>', '', 'gs'),
        |      '<style[^>]*>.*?</style>', '', 'gs'),
        |      '<!--.*?-->', '', 'gs') AS noc
        |""".stripMargin +
      "  FROM " + relation + "\n), stripped AS (\n" +
      "  SELECT " + keyCols + ",\n" +
      """    CAST(len(regexp_extract_all(html, '<a [^>]*href')) AS BIGINT)
        |      AS n_links,
        |    CAST(len(regexp_extract_all(noc, '<[^>]+>')) AS BIGINT)
        |      AS n_tags,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(
        |        regexp_replace(noc, '<[^>]+>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS text_clean
        |  FROM nc
        |)""".stripMargin

  val qHtmlExtract = Q("q_html_extract",
    (s, dir) => {
      val id = col("doc_id").cast("string")
      val html = concat(
        lit("<html><head><title>Doc "), id, lit("</title>"),
        lit("<script type=\"text/javascript\">if(x<3 && y>1){track(\""),
        id, lit("\");}</script>"),
        lit("<style>.c{content:\"</p>\"}</style></head><body>"),
        lit("<!-- crawl id "), id, lit(" <hidden> -->"),
        lit("<h1>Doc &amp; "), id, lit("</h1>"),
        lit("<p class=\"b\">"), coalesce(col("text"), lit("")), lit("</p>"),
        lit("<br/><a href=\"https://ex.org/"), id,
        lit("\">more &lt;info&gt;</a></body></html>"))
      val (clean, nTags, nLinks) = htmlStripCols(html)
      Tables.documents(s, dir)
        .select(col("doc_id"), nLinks.as("n_links"), nTags.as("n_tags"),
          clean.as("text_clean"))
    },
    Some("""WITH h AS (
      |  SELECT doc_id,
      |    '<html><head><title>Doc ' || doc_id || '</title>' ||
      |    '<script type="text/javascript">if(x<3 && y>1){track("' || doc_id || '");}</script>' ||
      |    '<style>.c{content:"</p>"}</style></head><body>' ||
      |    '<!-- crawl id ' || doc_id || ' <hidden> -->' ||
      |    '<h1>Doc &amp; ' || doc_id || '</h1>' ||
      |    '<p class="b">' || COALESCE(text, '') || '</p>' ||
      |    '<br/><a href="https://ex.org/' || doc_id || '">more &lt;info&gt;</a></body></html>'
      |    AS html
      |  FROM documents
      |), """.stripMargin + htmlStripSql("h", "doc_id") + """
      |SELECT doc_id, n_links, n_tags, text_clean FROM stripped""".stripMargin),
    "north star: HTML->text extraction (script/style/comment-aware tag " +
      "strip + entity decode, one codegen'd projection - the crawl " +
      "stage that feeds every text op)")

  /** q_crawl_e2e — the crawl front door composed END-TO-END over REAL
    * container bytes: WARC ingestion ([[graft.ops.Warc]] — the same walk
    * q_warc_scan gate-checks) → keep only 200-status non-empty HTML
    * responses → the [[htmlStripCols]] extraction chain → word count →
    * a minimum-length keep gate (n_words ≥ 20, the Gopher-style floor).
    * This is the q_curate_e2e/q_pipeline_e2e discipline applied to the
    * crawl family: each stage is independently oracle-checked elsewhere
    * (q_warc_scan, q_html_extract); the composition is one Catalyst plan
    * whose oracle chains the SAME walk and strip SQL. Scale: a linear
    * binaryFile scan + a codegen'd projection chain — no shuffle at all;
    * exactly the map-only ingest→extract→gate pass a 100 TB crawl
    * actually runs, partitioned by WARC segment. */
  val qCrawlE2e = Q("q_crawl_e2e",
    (s, _) => {
      val dir = graft.ops.WarcFixture.ensure()
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".warc")).map(_.getAbsolutePath).sorted
      val resp = graft.ops.Warc.scanWarc(
          s.read.format("binaryFile").load(files.toIndexedSeq: _*))
        .toDF()
        .filter(col("warc_type") === "response" &&
          col("http_status") === 200 && col("body_len") > 0)
      val (clean, nTags, nLinks) = htmlStripCols(col("body"))
      resp.select(col("file_name"), col("rec_idx"), col("target_uri"),
          nLinks.as("n_links"), nTags.as("n_tags"), clean.as("text_clean"))
        .withColumn("n_words", when(col("text_clean") === "", 0L)
          .otherwise(size(split(col("text_clean"), " ")).cast("long")))
        .withColumn("keep",
          when(col("n_words") >= 20, 1L).otherwise(0L))
        .orderBy("file_name", "rec_idx")
    },
    Some("WITH RECURSIVE " + PipelineQueries.warcWalkSql + """,
      |h AS (
      |  SELECT file_name, rec_idx, target_uri, body AS html
      |  FROM wrec
      |  WHERE warc_type = 'response' AND http_status = 200
      |    AND body_len > 0
      |), """.stripMargin +
      htmlStripSql("h", "file_name, rec_idx, target_uri") + """,
      |scored AS (
      |  SELECT file_name, rec_idx, target_uri, n_links, n_tags, text_clean,
      |    CASE WHEN text_clean = '' THEN CAST(0 AS BIGINT)
      |         ELSE CAST(len(string_split(text_clean, ' ')) AS BIGINT)
      |    END AS n_words
      |  FROM stripped
      |)
      |SELECT *, CASE WHEN n_words >= 20 THEN CAST(1 AS BIGINT)
      |             ELSE CAST(0 AS BIGINT) END AS keep
      |FROM scored ORDER BY file_name, rec_idx""".stripMargin),
    "north star: crawl front door composed e2e (WARC walk -> HTTP gate " +
      "-> HTML strip -> length gate) over real container bytes, one " +
      "shuffle-free plan, chained oracle")

  /** q_crawl_dedup — digest dedup at the INGEST layer (what Common
    * Crawl's per-record `WARC-Payload-Digest` exists for): response
    * records grouped by the body md5 the scan emits, each duplicate
    * family keeping its FIRST capture (min (file, rec) — crawl order),
    * with the capture count on the row. This is the reason
    * [[graft.queries.PipelineQueries.qWarcScan]] computes body_md5 at
    * ingest: exact content dedup keys on it BEFORE any text processing
    * spends CPU on copies. The fixture's empty-200 pages form a genuine
    * multi-capture family across segment files; HTML pages are
    * singletons. Scale: one keyed aggregation on the digest (map-side
    * combined, min-of-struct argmin — no window, no all-pairs) — the
    * dedup family's q_doc_dedup shape applied to crawl bytes. */
  val qCrawlDedup = Q("q_crawl_dedup",
    (s, _) => {
      val dir = graft.ops.WarcFixture.ensure()
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".warc")).map(_.getAbsolutePath).sorted
      graft.ops.Warc.scanWarc(
          s.read.format("binaryFile").load(files.toIndexedSeq: _*))
        .toDF()
        .filter(col("warc_type") === "response")
        .groupBy(col("body_md5"))
        .agg(min(struct(col("file_name"), col("rec_idx"), col("target_uri")))
          .as("first"),
          count(lit(1L)).as("n_captures"))
        .select(col("body_md5"), col("first.file_name").as("file_name"),
          col("first.rec_idx").as("rec_idx"),
          col("first.target_uri").as("target_uri"), col("n_captures"))
        .orderBy("body_md5")
    },
    Some("WITH RECURSIVE " + PipelineQueries.warcWalkSql + """,
      |wresp AS (
      |  SELECT *, file_name || '#' ||
      |    lpad(CAST(rec_idx AS VARCHAR), 6, '0') AS cap_key
      |  FROM wrec WHERE warc_type = 'response'
      |)
      |SELECT body_md5,
      |  arg_min(file_name, cap_key) AS file_name,
      |  arg_min(rec_idx, cap_key) AS rec_idx,
      |  arg_min(target_uri, cap_key) AS target_uri,
      |  count(*) AS n_captures
      |FROM wresp
      |GROUP BY body_md5 ORDER BY body_md5""".stripMargin),
    "north star: ingest-layer digest dedup (first-capture-wins on the " +
      "scan's body md5, one keyed argmin aggregation - the " +
      "WARC-Payload-Digest stage)")

  /** q_crawl_curate_e2e — the ACTUAL 100 TB pretraining dataflow,
    * container bytes to pack manifest, as ONE Catalyst plan (VERDICT
    * r15 #3): it composes the crawl front door ([[qCrawlE2e]]'s WARC
    * walk → HTTP 200 gate) with the ingest-layer digest dedup
    * ([[qCrawlDedup]]'s first-capture-wins argmin on body_md5 — BEFORE
    * any text CPU is spent on copies) and the curation chain
    * (HTML strip → length gate → leak-free split keyed on the CONTENT
    * digest, so every byte-identical capture family lands on one side
    * → context-window packing per split → the per-bin manifest a batch
    * assembler consumes). Every stage is independently oracle-checked
    * elsewhere; this registration proves them COMPOSED from real
    * container bytes, with an oracle that chains the same walk / argmin
    * / strip / split / pack SQL end-to-end.
    *
    * Scale shape: linear per-segment WARC scan (one task per ~1 GiB
    * segment), ONE keyed digest aggregation (map-side combined), a
    * codegen'd strip/gate projection on the deduped reps only, a pure-
    * projection split, and the one split-partitioned packing window —
    * no all-pairs, no collect, nothing broadcast but the manifest agg. */
  val qCrawlCurateE2e = Q("q_crawl_curate_e2e",
    (s, _) => {
      val dir = graft.ops.WarcFixture.ensure()
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".warc")).map(_.getAbsolutePath).sorted
      val resp = graft.ops.Warc.scanWarc(
          s.read.format("binaryFile").load(files.toIndexedSeq: _*))
        .toDF()
        .filter(col("warc_type") === "response" &&
          col("http_status") === 200 && col("body_len") > 0)
      val reps = resp
        .groupBy(col("body_md5"))
        .agg(min(struct(col("file_name"), col("rec_idx"), col("body")))
          .as("first"))
        .select(col("body_md5"), col("first.file_name").as("file_name"),
          col("first.rec_idx").as("rec_idx"), col("first.body").as("body"))
      val (clean, _, _) = htmlStripCols(col("body"))
      val kept = reps
        .select(col("body_md5"), col("file_name"), col("rec_idx"),
          clean.as("text_clean"))
        .withColumn("n_words", when(col("text_clean") === "", 0L)
          .otherwise(size(split(col("text_clean"), " ")).cast("long")))
        .filter(col("n_words") >= 10)
        .withColumn("n_chars", length(col("text_clean")).cast("long"))
        .withColumn("split", graft.ops.Sample.splitByGroup(col("body_md5"),
          Seq("train" -> 900, "eval" -> 1000)))
        .withColumn("cap_key", concat(col("file_name"), lit("#"),
          lpad(col("rec_idx").cast("string"), 6, "0")))
      graft.ops.Pack.packByBudget(kept, col("split"), col("cap_key"),
          col("n_chars"), budget = 400L)
        .groupBy("split", "pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy("split", "pack_id")
    },
    Some("WITH RECURSIVE " + PipelineQueries.warcWalkSql + """,
      |cresp AS (
      |  SELECT *, file_name || '#' ||
      |    lpad(CAST(rec_idx AS VARCHAR), 6, '0') AS cap_key
      |  FROM wrec
      |  WHERE warc_type = 'response' AND http_status = 200 AND body_len > 0
      |), creps AS (
      |  SELECT body_md5,
      |    arg_min(file_name, cap_key) AS file_name,
      |    arg_min(rec_idx, cap_key) AS rec_idx,
      |    arg_min(body, cap_key) AS html
      |  FROM cresp GROUP BY body_md5
      |), """.stripMargin +
      htmlStripSql("creps", "body_md5, file_name, rec_idx") + s""",
      |ckept AS (
      |  SELECT * FROM (
      |    SELECT body_md5, file_name, rec_idx,
      |      CASE WHEN text_clean = '' THEN CAST(0 AS BIGINT)
      |           ELSE CAST(len(string_split(text_clean, ' ')) AS BIGINT)
      |      END AS n_words,
      |      CAST(len(text_clean) AS BIGINT) AS n_chars
      |    FROM stripped) t
      |  WHERE n_words >= 10
      |), csplit AS (
      |  SELECT n_chars,
      |    CASE WHEN ('0x' || substr(md5(body_md5), 1, 4))::BIGINT
      |           < ${900 * 65536L / 1000L} THEN 'train' ELSE 'eval'
      |    END AS split,
      |    file_name || '#' ||
      |      lpad(CAST(rec_idx AS VARCHAR), 6, '0') AS cap_key
      |  FROM ckept
      |), cpack AS (
      |  SELECT split, n_chars,
      |    CAST(floor(COALESCE(SUM(n_chars) OVER (PARTITION BY split
      |      ORDER BY cap_key ROWS BETWEEN UNBOUNDED PRECEDING AND
      |      1 PRECEDING), 0) / 400.0) AS BIGINT) AS pack_id
      |  FROM csplit
      |)
      |SELECT split, pack_id, count(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM cpack GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "north star: the full crawl pretraining dataflow composed e2e " +
      "(WARC walk -> HTTP gate -> digest dedup -> HTML strip -> length " +
      "gate -> leak-free split on the content digest -> pack manifest) " +
      "from real container bytes in one plan")

  def all: Seq[Q] = Seq(qTextStats, qLangId, qQuality, qTopTerms, qZipf,
    qFingerprint, qTfidf, qTokenBpe, qWinnow, qDecontam, qMix, qRepNgram,
    qSpanDedup, qSpanDedupCdc, qBpeMerge, qBpeTrain, qBpeEncode, qBpeSubword, qUnigramNll, qBigramNll, qVocabEncode,
    qFuzzyJoin, qFuzzyJoin2, qEntityCanon, qEntityCanon2, qEntityCanonPr, qTriangles, qPagerank, qMixTemp,
    qHtmlExtract, qCrawlE2e, qCrawlDedup, qCrawlCurateE2e)
}

package graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}

/** Benchmark main: every registered query at SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout.
  *
  * Harness rules (so the numbers mean something):
  *  - stable alphabetical order — no run-order lottery;
  *  - one untimed warmup pass first (JVM/JIT/codegen caches, parquet footer
  *    reads) so timed runs measure the query, not startup;
  *  - median of 3 timed runs per query;
  *  - full materialization: agg of xxhash64 over all columns — count()
  *    would let Catalyst prune the projections away, so e.g. a hash-key
  *    query would never compute a single hash;
  *  - cache cleared before every timed run: a query that persists an
  *    intermediate (the cache manager dedupes identical plans) must pay
  *    for populating it in each measured run, not reuse the warmup's;
  *  - failures are reported per query (`"errors"` field) and excluded from
  *    the total rather than silently timed as success.
  */
object Bench {
  /** Forces computation of every column of every row: bit_xor of per-row
    * xxhash64 over the full struct (xor, unlike sum, cannot overflow under
    * ANSI mode). Cheap relative to any real query, and nothing upstream
    * can be pruned because the hash reads all columns. */
  private def materialize(df: DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)).as("h"))
      .agg(expr("bit_xor(h)")).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    // bench output is ONE machine-parsed JSON line; Spark's benign WARNs
    // (and their stack traces) would interleave with it on some log4j
    // configs, so the bench session logs errors only
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    // Fixed-overhead floors, measured under bench rules (clearCache +
    // materialize, median of 3): `floor_plan` is a zero-IO
    // spark.range(1) — pure planning + job-launch + collect; the delta to
    // `floor_scan` (5-row region.parquet through the same path) adds
    // the parquet listing/footer cost every real query also pays. The
    // suite total ≈ Σ(real work) + O(floor)×|queries|, so these two lines
    // let a reader split the harness constant from query cost instead of
    // mistaking the per-query floor (~half the suite total at small SFs)
    // for engine slowness.
    def floorOf(tiny: () => Unit): Double = {
      tiny()
      (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); tiny(); (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    }
    val floorPlan = floorOf(() => materialize(spark.range(1).toDF("i")))
    val floorScan = floorOf(() =>
      materialize(spark.read.parquet(s"$sfDir/region.parquet")))

    // error messages are budgeted like everything else on the one-line
    // report: whitespace-collapsed and capped, so a multi-line Spark
    // AnalysisException can't blow the capture window by itself
    def errMsg(e: Throwable): String =
      Option(e.getMessage).getOrElse(e.getClass.getName)
        .replaceAll("\\s+", " ").take(80)

    // warmup (untimed); a query that fails here is skipped in timed runs
    val runnable = names.filter { name =>
      try { materialize(SparkEntry.queries(name)(spark, sfDir)); true }
      catch { case e: Throwable => errors(name) = errMsg(e); false }
    }

    // Double-warm the first timed slot: the alphabetically-first query
    // (q1_agg) is the only one whose timed run directly follows the 96-query
    // warmup sweep, so it alone absorbs any post-sweep GC/page-cache
    // turbulence (r7's driver record showed it at ~10× its probed time
    // while every later query matched its probe). One extra untimed run
    // immediately before the timed loop puts slot 1 in the same state as
    // every other slot.
    runnable.headOption.foreach { name =>
      try materialize(SparkEntry.queries(name)(spark, sfDir))
      catch { case _: Throwable => () }
    }

    val timings = runnable.flatMap { name =>
      try {
        val runs = (1 to 3).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          materialize(SparkEntry.queries(name)(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }.sorted
        Some(name -> runs(runs.size / 2)) // median
      } catch { // a timed-run failure must not lose the whole report
        case e: Throwable => errors(name) = errMsg(e); None
      }
    }

    println(renderLine(timings, errors.toSeq, floorPlan, floorScan, sfDir))
    spark.stop()
  }

  /** The harness captures only the LAST 2000 chars of stdout; a line that
    * outgrows that is truncated at the FRONT and silently stops parsing as
    * JSON — which re-loses the bench gate. The capture window must also
    * hold whatever lands on stdout AFTER our line: sbt's
    * `[success] Total time: N s, completed <date>` trailer (66–75 chars
    * in practice; r7's truncation arithmetic — a ≤1950 line losing its
    * first ~12 chars — bounds it) plus two newlines. Budget
    * 1880 + 75 + 2 = 1957 keeps ~43 chars of margin for trailer drift;
    * Spark/log4j noise is on stderr, not in this window. */
  private[graft] val maxLineChars = 1880

  private[graft] def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** `%.<dp>f` with Locale.ROOT (decimal separator always '.'), trailing
    * zeros trimmed ("0.30"→"0.3", "2.00"→"2") — valid JSON numbers that
    * spend no bytes on digits carrying no information. */
  private[graft] def fmtTrim(v: Double, dp: Int): String = {
    val s = String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    if (!s.contains('.')) s
    else s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
  }

  /** One machine-parsed JSON report line, guaranteed ≤ [[maxLineChars]]:
    * per-query timings start at 2 decimals (10 ms — plenty for
    * second-scale medians); if the line would overflow the capture
    * window, first drop error MESSAGE text (keeping the failed-query
    * names — the gate compares timings, not messages), then degrade to
    * 1 decimal. A failed query must never cost the report its 89 good
    * timings. If every rung overflows (≈110+ queries — names, not
    * values, dominate), fail LOUDLY: a truncated line would fail
    * silently. */
  /** Bench-line display name: the registry's uniform `q_` prefix carries
    * no information on a line where every key is a query, so it is
    * stripped HERE ONLY (registry / Verify / CORRECTNESS keys keep the
    * full name; `q_asof_join` reports as `asof_join`). 96 queries × 2
    * chars ≈ 190 chars of capture window — the difference between full
    * 2-decimal precision fitting and not. `q1_agg`-style names (no `q_`)
    * pass through unchanged, so no two registry names can collide. */
  /** Third display economy (r9, the registry crossed 105 names): the
    * longest display names abbreviate ON THE BENCH LINE ONLY — registry /
    * Verify / CORRECTNESS keys are untouched, and the README's
    * display-name table records the mapping for round-over-round
    * comparison. Names, not values, dominate the line budget (each entry
    * costs len(name)+9 chars at full precision), so trimming the tail of
    * the length distribution is worth ~90 chars ≈ four rounds of registry
    * growth. */
  private[graft] val displayAbbrev = Map(
    "dup_clusters" -> "dup_cl",
    "stream_join" -> "s_join",
    "stream_dedup" -> "s_dd",
    // embed_dup keeps its r9 display key for record continuity
    "embed_dup" -> "emb_dup",
    "sync_diff" -> "sdif",
    "sample_k" -> "samp_k",
    "dup_keys" -> "dup_ky",
    "keys_sha" -> "ksha",
    "near_dup" -> "ndup",
    "dup_keep" -> "dup_kp",
    "bpe_subword" -> "bpe_sub",
    "session_window" -> "swin",
    "stream_sess_win" -> "str_sw",
    "bigram_nll" -> "bi_nll",
    "containment" -> "cont",
    "ann_ivf" -> "ivf",
    "ann_ivf_sq" -> "ivf_sq",
    "ann_ivf_pq" -> "ivfpq",
    "ann_lsh" -> "lsh",
    "ann_mp" -> "mp",
    "ann_mt" -> "mt",
    "ann_pq" -> "pq",
    "ann_recall" -> "rec",
    "ann_recall_cl" -> "rec_cl",
    "ann_sq" -> "asq",
    "anomaly" -> "anom",
    "chunk_index" -> "cidx",
    "chunk_ref" -> "cref",
    "dedup_exact" -> "dd_ex",
    "delta_dedup" -> "del_dd",
    "doc_dedup" -> "doc_dd",
    "dup_clusters_star" -> "dc_star",
    "entity_canon_pr" -> "ecan_pr",
    "having_join" -> "hav_j",
    "heavy_hitters" -> "hh",
    "hist_quantile" -> "hist_q",
    "jaccard" -> "jacc",
    "lag_lead" -> "lag",
    "lastwins" -> "lastw",
    "latest_file" -> "lat_f",
    "latest_per_q" -> "lat_pq",
    "longest_resp" -> "lresp",
    "media_features" -> "m_feat",
    "media_meta" -> "m_meta",
    "profile" -> "prof",
    "q5_region" -> "q5_reg",
    "quality" -> "qual",
    "rep_ngram" -> "rep_ng",
    "sample_quantile" -> "samp_q",
    "scalar_subquery" -> "sc_sub",
    "simhash" -> "simh",
    "text_stats" -> "txt_st",
    "token_bpe" -> "tbpe",
    "topk_native" -> "tk_nat",
    "topk_per_group" -> "tk_grp",
    "util_scalars" -> "util",
    "vocab_encode" -> "voc_enc",
            "events_sliding" -> "ev_sl",
    "events_hourly" -> "ev_hr",
    "events_topk" -> "ev_tk",
    "events_json" -> "ev_js",
        "split_leakfree" -> "leakf",
            "grouping_sets" -> "grps",
            "retrieval_e2e" -> "r_e2e",
    "value_moments" -> "val_mom",
        "pipeline_e2e" -> "p_e2e",
        "binary_scan" -> "bscan",
    "sync_upload" -> "sync_up",
    "sync_delete" -> "sdel",
    "stream_moments" -> "smom",
    "stream_sessionize" -> "str_se",
    "stream_hourly" -> "str_hr",
    "fuzzy_join" -> "fuzzy",
    "fuzzy_join2" -> "fuzzy2",
    "semdedup" -> "semdd",
    "semdedup_s" -> "sdd_s",
    "entity_canon" -> "ecanon",
    "entity_canon2" -> "ecanon2",
        "stream_append" -> "sapp",
    "bpe_train" -> "bpe_tr",
    "bpe_encode" -> "bpe_enc",
        "triangles" -> "tri",
    "pagerank" -> "pgrank",
    "asof_bcast" -> "asof_bc",
    "asof_join" -> "asof_j",
    "skew_audit" -> "skew",
    "decontam" -> "decon",
    "curate_e2e" -> "c_e2e",
    "mix_temp" -> "mix_t",
    "mad_outliers" -> "mad",
    "dup_stats" -> "dup_st",
    "dup_count" -> "dup_cnt",
    "span_dedup" -> "span_dd",
    "bpe_merge" -> "bpe_m",
    "top_terms" -> "top_t",
    "hybrid_rrf" -> "rrf",
    "inline_scan" -> "inline",
    "quantiles" -> "quant",
    "centroids" -> "centr",
    "near_dup_rep" -> "nd_rep",
    "media_resize" -> "m_rsz",
    "media_frames" -> "m_frm",
    "unigram_nll" -> "uni_nll",
    "cardinality" -> "card",
    "fingerprint" -> "fprint",
    "sessionize" -> "sess",
    "simhash_dup" -> "sdup",
    "doc_render" -> "drnd",
    "range_join" -> "rng_j",
    "anti_join" -> "anti_j",
    "semi_join" -> "semi_j")

  private[graft] def short(name: String): String = {
    val s = name.stripPrefix("q_")
    displayAbbrev.getOrElse(s, s)
  }

  private[graft] def renderLine(timings: Seq[(String, Double)],
      errors: Seq[(String, String)], floorPlan: Double, floorScan: Double,
      sfDir: String): String = {
    def line(dp: Int, errVals: Boolean): String = {
      val qs = timings.map { case (k, v) =>
          s"${jstr(short(k))}:${fmtTrim(v, dp)}" }
        .mkString("{", ",", "}")
      // the errors object is emitted ONLY when something failed — a
      // literal `"errors":{}` on every healthy line spent 12 chars of
      // window to say nothing (absence = zero errors)
      val errs = if (errors.isEmpty) "" else
        errors.map { case (k, v) =>
          s"${jstr(short(k))}:${if (errVals) jstr(v) else "\"\""}" }
          .mkString(""","errors":{""", ",", "}")
      val total = timings.map(_._2).sum
      // sf renders as the directory basename ("sf0.1") — the full
      // /root/testdata path spent 15 window chars saying nothing; the
      // floor keys are fp/fs for the same reason (README spells out the
      // mapping: fp = planning floor, fs = scan floor, both medians)
      val sf = sfDir.stripSuffix("/").split('/').last
      s"""{"metric":"total","value":${fmtTrim(total, 3)},"unit":"sec","fp":${fmtTrim(floorPlan, 3)},"fs":${fmtTrim(floorScan, 3)},"queries":$qs$errs,"sf":${jstr(sf)}}"""
    }
    // precision outranks error text (the gate compares per-query
    // timings), so try dropping error text before dropping a decimal
    val out = Iterator((2, true), (2, false), (1, true), (1, false))
      .map { case (dp, ev) => line(dp, ev) }.find(_.length <= maxLineChars)
    require(out.nonEmpty, s"bench JSON line exceeds $maxLineChars chars " +
      s"even at 1-decimal timings with error text dropped " +
      s"(${timings.size} queries, ${line(1, false).length} chars) — the " +
      "harness tail capture would truncate it; shorten query names or " +
      "split the report")
    out.get
  }
}

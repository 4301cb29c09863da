package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.FixedPointDot.scaledRound

/** Deterministic distributed k-means — the trained coarse quantizer behind
  * the IVF ANN index (the engine counterpart of the reference's real ANN
  * index, commercial_rfp_indexer.py:96-111, which declares an HNSW; IVF is
  * the bucketed formulation that fits a shuffle engine).
  *
  * Everything is reproducible bit-for-bit in the DuckDB oracle:
  *  - **Seeding**: the k vectors ranked first by `md5(vec_id)` — a
  *    uniform-but-deterministic sample (standard random init with the
  *    "randomness" derived from a hash both engines compute identically).
  *    Cell ids are the 0-based rank in that hash order.
  *  - **Assignment**: argmin over cells of the scaled L2 distance
  *    `Σ round(cᵢ²·1e15) − 2·Σ round(vᵢ·cᵢ·1e15)` (the ‖v‖² term is
  *    constant per vector and dropped). All-integer arithmetic via
  *    [[graft.expressions.FixedPointDot]], so the argmin — ties broken by
  *    the lower cell id — is order-independent and engine-independent.
  *  - **Update**: fixed-point mean per dimension (`Σ round(x·1e15)` as a
  *    LONG, divided once at the end — [[Centroids]]' exact-sum contract),
  *    so the new centroids are identical doubles in both engines. Cells
  *    that lose all members simply disappear (both engines agree).
  *
  * Scale posture: each iteration is one narrow codegen'd assignment pass
  * (the codebook rides along as k×dims literals — the broadcast-constant
  * pattern) plus one map-side-combined groupBy; the driver only ever
  * holds the k×dims codebook. Train-once, assign-anywhere: at 100 TB the
  * trainer would run on a sample and the final assignment is a pure
  * projection over the full corpus.
  */
object KMeans {

  /** Scaled L2 distance (constant ‖v‖² dropped) to a fixed centroid —
    * kept as the struct formulation's building block for
    * [[assignCellStructs]], the spec twin of the codegen'd kernel. */
  private def dist2(v: Column, c: Seq[Double]): Column = {
    val dcc = c.map(x => scaledRound(x * x)).sum
    lit(dcc) - lit(2L) * Vectors.dotScaled(v, typedLit(c))
  }

  /** (distance, cell) structs for every codebook cell — the lexicographic
    * min/sort over these is the deterministic nearest-cell order. */
  private def cellStructs(v: Column,
                          codebook: Seq[(Int, Seq[Double])]): Seq[Column] =
    codebook.map { case (cl, c) =>
      struct(dist2(v, c).as("d2"), lit(cl).as("cl"))
    }

  /** The original array-of-structs argmin (one [[dist2]] per cell): the
    * semantics-by-construction twin KMeansSpec pins the codegen'd
    * [[NearestCells]] kernel against. Not used on the hot path — the
    * expression tree is O(cells·dims) literals, which falls out of
    * whole-stage codegen and goes allocation-bound at √n cell counts. */
  private[graft] def assignCellStructs(v: Column,
      codebook: Seq[(Int, Seq[Double])]): Column =
    array_min(array(cellStructs(v, codebook): _*)).getField("cl")

  /** Nearest cell id: argmin over (d2, cell id) — ties to the lower id.
    * One generated loop over the codebook matrix
    * ([[graft.expressions.NearestCells]]). */
  def assignCell(v: Column, codebook: Seq[(Int, Seq[Double])]): Column =
    probeCells(v, codebook, 1).getItem(0)

  /** The `nprobe` nearest cell ids, nearest first — the multi-cell probe
    * set of an IVF query (recall knob, mirroring q_ann_mp's probe count). */
  def probeCells(v: Column, codebook: Seq[(Int, Seq[Double])],
                 nprobe: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.expressions.NearestCells(
      GraftSqlBridge.expression(v.cast("array<double>")), codebook, nprobe))
  }

  /** Trains the codebook: `iters` rounds of assign + fixed-point-mean
    * update from the md5-ranked seeds. `df` must carry (`vec_id`,
    * `v: array<double>`). Returns (cellId, centroid) sorted by cell id;
    * cells emptied by an iteration are dropped.
    *
    * `trainPermille < 1000` trains on a deterministic [[Sample]] of the
    * corpus — the production posture at 100 TB: a coarse quantizer needs
    * only a representative sample (cells ≫ sample ≫ k), so the Lloyd
    * passes scan permille/1000 of the data while the final index
    * assignment still covers every vector. Sampling is md5-bucketed on
    * `vec_id`, so the trained codebook is as reproducible as the
    * full-corpus one. */
  def train(df: DataFrame, k: Int, iters: Int,
            trainPermille: Int = 1000): Seq[(Int, Seq[Double])] = {
    require(k > 0 && iters >= 0, s"need k>0, iters>=0; got k=$k iters=$iters")
    val corpus =
      if (trainPermille >= 1000) df
      else df.filter(Sample.keep(col("vec_id"), trainPermille))
    var codebook: Seq[(Int, Seq[Double])] =
      corpus.orderBy(md5(col("vec_id").cast("string")))
        .limit(k).select("v").collect().toIndexedSeq
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0)) }
    require(codebook.nonEmpty, "training sample is empty — raise trainPermille")
    for (_ <- 0 until iters) {
      val assigned = corpus.select(col("v"),
        assignCell(col("v"), codebook).as("cell"))
      codebook = Centroids.perLabelVec(
          assigned.select(col("cell").as("label"), col("v").as("embedding")))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
        .sortBy(_._1).toSeq
    }
    codebook
  }

  /** Group-key stride packing (slice unit, cell) into one int so
    * [[Centroids.perLabelVec]]'s typed aggregator is reused untouched by
    * [[trainMany]]; bounds every supported k. */
  private val unitKeyStride = 1024

  /** Trains SEVERAL independent codebooks in lock-step over slices of the
    * same (vec_id, v: array<double>) frame: `slices` are (0-based offset,
    * length) windows of `v` — e.g. the IVF coarse quantizer (full width)
    * plus the PQ per-block books. Returns one codebook per slice,
    * BIT-IDENTICAL to running [[train]] once per slice:
    *  - seeds: [[train]] seeds from the first k rows by md5(vec_id) of
    *    its input — for a sliced input those are the same k ROWS, so
    *    slicing the one collected seed set row-wise is the same seed;
    *  - assignment: per-row argmin under a slice's codebook never reads
    *    another slice;
    *  - update: the fixed-point centroid sums ([[Centroids]]) are
    *    order-independent, and the (slice, cell) groups partition
    *    exactly as the per-slice runs' cell groups do.
    * What fusing saves is DRIVER ROUND-TRIPS: 1 seed job + `iters`
    * update jobs for the whole family instead of (1+iters)·|slices| —
    * the recall scorecards' five trainers were 15 collect jobs of
    * mostly scheduling latency (r13). At 100 TB the same holds with the
    * trainer input swapped for a [[Sample]] of the corpus. */
  def trainMany(df: DataFrame, slices: Seq[(Int, Int)], k: Int,
                iters: Int): Seq[Seq[(Int, Seq[Double])]] = {
    require(k > 0 && k < unitKeyStride && iters >= 0 && slices.nonEmpty,
      s"need 0<k<$unitKeyStride, iters>=0, slices; got k=$k iters=$iters")
    val seedRows = df.orderBy(md5(col("vec_id").cast("string")))
      .limit(k).select("v").collect().toIndexedSeq
      .map(_.getSeq[Double](0))
    require(seedRows.nonEmpty, "training frame is empty")
    var books: Seq[Seq[(Int, Seq[Double])]] = slices.map { case (off, len) =>
      seedRows.map(_.slice(off, off + len))
        .zipWithIndex.map { case (c, i) => (i, c) }
    }
    for (_ <- 0 until iters) {
      val unitCols = slices.zipWithIndex.map { case ((off, len), u) =>
        val sv = slice(col("v"), off + 1, len)
        struct((lit(u * unitKeyStride) + assignCell(sv, books(u)))
          .as("label"), sv.as("embedding"))
      }
      val assigned = df.select(explode(array(unitCols: _*)).as("x"))
        .select(col("x.label").as("label"), col("x.embedding").as("embedding"))
      val rows = Centroids.perLabelVec(assigned).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
      books = slices.indices.map { u =>
        rows.filter(_._1 / unitKeyStride == u)
          .map { case (lbl, c) => (lbl % unitKeyStride, c) }
          .sortBy(_._1).toIndexedSeq
      }
    }
    books
  }

  /** The oracle's replica of [[train]] + final assignment as DuckDB CTEs:
    * emits `kmelems` (unnested corpus), `kc0..kc<iters>` (codebooks) and
    * expects the caller to assign/probe against `kc<iters>`.
    * `src` must expose (vec_id, embedding).
    *
    * `trainPermille < 1000` replicates [[train]]'s sampled posture: the
    * seed ranking and every Lloyd pass run over the md5-bucketed sample
    * (`kmtelems`, the Sample.keep predicate verbatim in SQL), while
    * `kmelems` still carries the FULL corpus for the caller's final
    * assignment — exactly the train-on-a-sample / assign-everything
    * split the 100 TB posture requires. The default emits the same SQL
    * as before (no sample CTEs).
    *
    * `kmelems` is hinted MATERIALIZED: it is referenced 2·iters+1 times
    * downstream, and DuckDB's inlining otherwise re-derives the whole
    * upstream corpus expression per reference — measured on the 10×
    * clustered fixture, the four-trainer PQ oracle went from >100 GiB
    * (OOM) to 6 s under the hint, with identical results. */
  def trainSql(src: String, k: Int, iters: Int,
               trainPermille: Int = 1000, prefix: String = ""): String = {
    val sampled = trainPermille < 1000
    val keepSql = s"('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 4))" +
      s"::BIGINT < ${trainPermille * 65536L / 1000L}"
    val trainElems = prefix + (if (sampled) "kmtelems" else "kmelems")
    val seedSrc = if (sampled) s"(SELECT * FROM $src WHERE $keepSql)"
                  else src
    val sb = new StringBuilder
    sb ++=
      s"""${prefix}kmelems AS MATERIALIZED (
         |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         |         unnest(generate_series(0, len(embedding)-1)) AS dim
         |  FROM $src
         |)""".stripMargin
    if (sampled) sb ++=
      s""",
         |${prefix}kmtelems AS MATERIALIZED (
         |  SELECT * FROM ${prefix}kmelems WHERE $keepSql
         |)""".stripMargin
    sb ++=
      s""", ${prefix}seeds AS (
         |  SELECT vec_id,
         |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cl
         |  FROM $seedSrc
         |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) <= $k
         |), ${prefix}kc0 AS (
         |  SELECT s.cl, e.dim, e.x AS c
         |  FROM ${prefix}seeds s JOIN ${prefix}kmelems e ON e.vec_id = s.vec_id
         |)""".stripMargin
    for (i <- 1 to iters) {
      sb ++= s""",
         |${prefix}ka$i AS (
         |  SELECT vec_id, cl AS cell FROM (
         |    SELECT e.vec_id, c.cl,
         |      SUM(CAST(round(c.c*c.c*1e15) AS BIGINT))
         |        - 2*SUM(CAST(round(e.x*c.c*1e15) AS BIGINT)) AS d2
         |    FROM $trainElems e JOIN ${prefix}kc${i - 1} c ON c.dim = e.dim
         |    GROUP BY e.vec_id, c.cl)
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) = 1
         |), ${prefix}kc$i AS (
         |  SELECT a.cell AS cl, e.dim,
         |    CAST(CAST(SUM(CAST(round(e.x*1e15) AS BIGINT)) AS BIGINT) AS DOUBLE)/1e15/count(*) AS c
         |  FROM ${prefix}ka$i a JOIN $trainElems e ON e.vec_id = a.vec_id
         |  GROUP BY a.cell, e.dim
         |)""".stripMargin
      // the BIGINT drop dodges DuckDB's truncating HUGEINT→double cast
      // (see SimilarityQueries.dotsSql). Range: this sums over a CELL's
      // rows, not 64 dims — it shares the engine-side Long accumulator's
      // range (~9.2e18/1e15 ≈ 9200 unit-component rows per cell worst
      // case; ~10× more for typical |x|≈0.1). Past that the engine's Long
      // wraps silently while this checked cast fails loudly — the oracle
      // errs on the honest side of the shared fixed-point contract.
    }
    sb.result()
  }
}

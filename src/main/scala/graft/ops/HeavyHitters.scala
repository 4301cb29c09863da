package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact frequent-item mining at scale: a Misra–Gries sketch pass to find
  * CANDIDATE heavy keys in O(m) state, then an exact counting pass
  * restricted to those candidates — the standard two-pass pattern for
  * "which keys hold more than 1/K of a 100 TB table" when the key space
  * is too wide to groupBy outright (domains, URLs, session keys in a
  * training-data pipeline; the reference's closest surface is its dup
  * census A1-A3, which this generalizes from exact-match keys to
  * frequency thresholds).
  *
  * Why two passes instead of one groupBy: a naive
  * `groupBy(key).count.filter(cnt > n/K)` shuffles one partial count per
  * DISTINCT key per partition — billions of rows of shuffle when the key
  * space is internet-sized, to keep totals the filter then throws away.
  * The sketch pass is a single mergeable aggregation whose state is m
  * (key, count) pairs per partition — the shuffle is O(m × partitions)
  * REGARDLESS of key cardinality — that same pass carries the exact row
  * total, and the exact pass shuffles only rows whose key is one of the
  * ≤ m candidates. Only the candidate list (≤ m
  * entries) ever reaches the driver, the same O(1)-capped collect
  * contract as KMeans' codebook.
  *
  * Correctness contract (why the final answer is EXACT, not approximate):
  * Misra–Gries with m counters undercounts any key by at most n/(m+1), so
  * every key with true count > n/(m+1) survives in the sketch. With
  * m ≥ K (enforced), true count > n/K > n/(m+1) ⟹ every true heavy
  * hitter is a candidate; the exact pass then replaces sketch estimates
  * with true counts and applies the real threshold — sketch error can
  * only ADD spurious candidates (pruned by the exact pass), never lose a
  * heavy key. The result is therefore partition-invariant even though
  * the sketch itself is not (HeavyHittersSpec pins both properties).
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries", PODS 2012): sum
  * counters pointwise; if more than m keys survive, subtract the
  * (m+1)-th largest count from all and drop the non-positive — the
  * combined sketch keeps the summed error bound ≤ n/(m+1), which is what
  * makes the aggregation safe to compute map-side per partition and
  * merge in any tree shape Spark picks.
  */
object HeavyHitters {

  /** Misra–Gries buffer: at most m (key, undercount-estimate) pairs,
    * plus the exact processed-row count n — carried by the same pass so
    * the threshold total never costs a separate scan. */
  final case class MgBuf(n: Long, counts: Map[String, Long])

  /** The m-counter Misra–Gries sketch as a typed Aggregator. Estimates
    * never exceed true counts; undercount is ≤ n/(m+1) across any merge
    * tree. The decrement step is O(m) per non-resident key once the
    * buffer is full — fine for sketch-sized m (tens to hundreds); a
    * count-bucketed doubly-linked structure makes it O(1) if m must
    * grow. */
  def mgSketch(m: Int): Aggregator[String, MgBuf, MgBuf] = {
    require(m >= 1, s"Misra-Gries needs at least one counter, got $m")
    new Aggregator[String, MgBuf, MgBuf] {
      override def zero: MgBuf = MgBuf(0L, Map.empty)
      override def reduce(b: MgBuf, key: String): MgBuf = {
        val c = b.counts
        c.get(key) match {
          case Some(n) => MgBuf(b.n + 1L, c.updated(key, n + 1L))
          case None if c.size < m => MgBuf(b.n + 1L, c.updated(key, 1L))
          case None =>
            // decrement-all: charges 1 to each of m counters AND the
            // arriving key — each such step retires m+1 observations,
            // which is where the n/(m+1) undercount bound comes from
            MgBuf(b.n + 1L, c.flatMap { case (k, n) =>
              if (n > 1L) Some(k -> (n - 1L)) else None
            })
        }
      }
      override def merge(x: MgBuf, y: MgBuf): MgBuf = {
        val n = x.n + y.n
        if (x.counts.isEmpty) MgBuf(n, y.counts)
        else if (y.counts.isEmpty) MgBuf(n, x.counts)
        else {
          val summed = y.counts.foldLeft(x.counts) { case (acc, (k, c)) =>
            acc.updated(k, acc.getOrElse(k, 0L) + c)
          }
          if (summed.size <= m) MgBuf(n, summed)
          else {
            // subtract the (m+1)-th largest count, keep the positive
            val cut = summed.valuesIterator.toArray.sorted(
              Ordering.Long.reverse).apply(m)
            MgBuf(n, summed.flatMap { case (k, c) =>
              if (c > cut) Some(k -> (c - cut)) else None
            })
          }
        }
      }
      override def finish(b: MgBuf): MgBuf = b
      override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
      override def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    }
  }

  /** All NON-NULL keys of `keyCol` whose row count exceeds total/K, with
    * exact counts and 6-decimal shares — (key, cnt, share), one row per
    * heavy key. NULL is not a key: null rows are excluded from both the
    * counts and the total (callers wanting null-as-a-value should
    * coalesce to a sentinel first — a raw null would also poison the
    * sketch's map state and can never match the candidate filter). `m`
    * is the sketch width; `m ≥ K` is required for the candidate-superset
    * guarantee above. Pass 1 sketches AND carries the exact row total in
    * the same scan; pass 2 exact-counts only candidate rows (broadcast
    * hash-set filter before the only shuffle) against that total as a
    * literal — two scans, no full-key-space shuffle anywhere. */
  def heavyHitters(df: DataFrame, keyCol: String, m: Int, k: Int): DataFrame = {
    require(k >= 2, s"threshold fraction 1/K needs K >= 2, got $k")
    require(m >= k, s"m counters must be >= K for the superset guarantee " +
      s"(undercount n/(m+1) must stay below the n/K threshold): m=$m K=$k")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
    val sketch = keyed.as[String].select(mgSketch(m).toColumn).head()
    val candidates: Seq[String] = sketch.counts.keys.toSeq
    if (candidates.isEmpty) {
      // empty input: no heavy keys by definition
      return keyed.groupBy("key")
        .agg(count(lit(1)).as("cnt"), lit(0.0).as("share")).limit(0)
    }
    val total = sketch.n.toDouble
    keyed.filter(col("key").isin(candidates: _*))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") > lit(total) / k)
      .select(col("key"), col("cnt"),
        round(col("cnt").cast("double") / lit(total), 6).as("share"))
  }
}

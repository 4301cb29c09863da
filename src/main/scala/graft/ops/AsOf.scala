package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — the canonical "operator Spark lacks" (SURVEY §7 tier a:
  * composition beats a custom node here): for every left row, attach the
  * LATEST right row of the same key with `right.ts <= left.ts`
  * (inclusive, matching SQL ASOF semantics).
  *
  * Formulation: tag and union both sides, then ONE window per key ordered
  * by (ts, side, tiebreak) carries `last(right payload, ignoreNulls)` up
  * to the current row; left rows keep whatever right payload last
  * preceded them. Cost is one shuffle on the key and O(|L|+|R|) rows —
  * contrast the naive range-predicate join (`l.key = r.key AND l.ts >=
  * r.ts`), which explodes to every (left, right) pair within a key before
  * aggregating the max, and is the first thing to die at 100× data.
  * Right rows sort before left rows at equal ts, so ts-equality counts
  * as "prior" exactly like DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`.
  *
  * Contract: right must be unique per (key, ts) — see [[latestPerKeyTs]]
  * — so "the" latest right row is well defined; `leftTie` must totally
  * order left rows within (key, ts) for a deterministic output order.
  */
object AsOf {

  /** Keeps, per (key, ts), only the right row with the greatest tie
    * column — makes a frame satisfy the as-of uniqueness contract. */
  def latestPerKeyTs(right: DataFrame, key: String, ts: String,
                     tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(key), col(ts)).orderBy(col(tieCol).desc)
    right.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** left ⟕-as-of right, SHUFFLE-FREE, for a broadcast-able right side —
    * the dimension-table variant of [[joinAsOf]] (rates, config, price
    * books: a right side that fits the driver). The right side is
    * grouped and ts-sorted once driver-side and broadcast; each left
    * partition binary-searches its rows' matches in place, so the left
    * side is never shuffled at all (vs the union+window's one exchange).
    * Same inclusive `rts <= lts` semantics and the same uniqueness
    * contract on right (key, ts).
    *
    * `key` and `ts` must be LONG columns in BOTH frames (callers with
    * timestamps project `unix_micros(ts)` first). Left rows with a null
    * key/ts get a null match; right rows with nulls are dropped at
    * build, like any broadcast dim build. */
  def joinAsOfBroadcast(left: DataFrame, right: DataFrame,
                        key: String, ts: String,
                        maxRightRows: Long = 2000000L): DataFrame = {
    import org.apache.spark.sql.types.LongType
    for (df <- Seq(left, right); c <- Seq(key, ts))
      require(df.schema(c).dataType == LongType,
        s"joinAsOfBroadcast needs LONG $c, got ${df.schema(c).dataType}")
    // fail fast BEFORE the collect: a fact-table right side would OOM the
    // driver mid-collect, past the point where an error can be clean. The
    // probe is limit(cap+1).count(), so it does O(cap) work no matter how
    // large right is — the scan stops once cap+1 rows surface — instead
    // of a full count of a table we are about to refuse anyway.
    require(maxRightRows > 0 && maxRightRows < Int.MaxValue,
      s"maxRightRows must be in (0, ${Int.MaxValue}), got $maxRightRows")
    require(right.limit(maxRightRows.toInt + 1).count() <= maxRightRows,
      s"joinAsOfBroadcast right side exceeds maxRightRows=$maxRightRows " +
        "rows; use joinAsOf (shuffle variant) for large right sides")
    val rSchema = right.schema
    val rk = rSchema.fieldIndex(key)
    val rt = rSchema.fieldIndex(ts)
    val grouped: Map[Long, Array[org.apache.spark.sql.Row]] =
      right.collect()
        .filter(r => !r.isNullAt(rk) && !r.isNullAt(rt))
        .groupBy(_.getLong(rk))
        .map { case (k, rows) => k -> rows.sortBy(_.getLong(rt)) }
    val bc = left.sparkSession.sparkContext.broadcast(grouped)
    val outSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("l", StructType(left.schema.fields)),
      org.apache.spark.sql.types.StructField("r", StructType(rSchema.fields))))
    val lk = left.schema.fieldIndex(key)
    val lt = left.schema.fieldIndex(ts)
    left.mapPartitions { it =>
      val m = bc.value
      it.map { row =>
        val matched =
          if (row.isNullAt(lk) || row.isNullAt(lt)) null
          else m.get(row.getLong(lk)) match {
            case None => null
            case Some(arr) =>
              val t = row.getLong(lt)
              var lo = 0; var hi = arr.length - 1
              var res: org.apache.spark.sql.Row = null
              while (lo <= hi) { // last right row with rts <= t
                val mid = (lo + hi) >>> 1
                if (arr(mid).getLong(rt) <= t) { res = arr(mid); lo = mid + 1 }
                else hi = mid - 1
              }
              res
          }
        org.apache.spark.sql.Row(row, matched)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** left ⟕-as-of right on `key`/`ts`: one row per left row, with struct
    * columns `l` (the left row) and `r` (the matched right row, or null
    * when no right row has rts <= lts). */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
               leftTie: Column): DataFrame = {
    val lNull = lit(null).cast(StructType(left.schema.fields))
    val rNull = lit(null).cast(StructType(right.schema.fields))
    val l = left.select(col(key).as("__k"), col(ts).as("__t"),
      lit(1).as("__side"), leftTie.cast("long").as("__tie"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
      rNull.as("__r"))
    val r = right.select(col(key).as("__k"), col(ts).as("__t"),
      lit(0).as("__side"), lit(0L).as("__tie"),
      lNull.as("__l"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l").as("l"), col("__asof").as("r"))
  }
}

package graft

import org.apache.spark.sql.functions._

/** Properties of q_dsir_select the oracle cannot state: the selection is
  * a WITHOUT-replacement draw whose distribution actually tilts toward
  * the target domain (quality=4 English), not noise. The fixture is
  * deterministic, so these are exact checks, not statistical ones.
  */
class DsirSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("DSIR selection: without-replacement draw, key arithmetic, " +
      "and distributional pull toward the English target") {
    val sel = Registry.byName("q_dsir_select").fn(spark, dir).cache()
    assert(sel.count() === 100L)
    assert(sel.select("doc_id").distinct().count() === 100L,
      "Gumbel-top-k drew a document twice — not without-replacement")
    assert(sel.filter(col("key") =!= col("score") + col("g3")).isEmpty,
      "key must be exactly score + Gumbel")
    // rk is the (key desc, doc_id asc) rank — monotone non-increasing key
    val ordered = sel.orderBy("rk").select("key").collect().map(_.getLong(0))
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
      "rk order disagrees with key order")
    // the point of DSIR: the selected set must look like the target
    // domain. Base rate en = 218/500 = 43.6%; measured pull = 65%. A
    // noise selection (the 64-bucket model this spec guards against)
    // reads ~44%. Pin a margin well above base, below the measurement.
    val enFrac = sel.join(Tables.documents(spark, dir), "doc_id")
      .filter(col("lang") === "en").count().toDouble / 100.0
    assert(enFrac >= 0.55,
      s"selected en fraction $enFrac shows no distributional pull " +
        "(base rate 0.436) — the hashed model lost the language signal")
    sel.unpersist()
    ()
  }
}

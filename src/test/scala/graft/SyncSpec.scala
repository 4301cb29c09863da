package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop}

/** O7/O8 reconciliation property (SURVEY §5): upload ∪ delete covers the
  * symmetric difference of the two listings, and after applying both the
  * listings agree. */
class SyncSpec extends SparkSpec {
  import spark.implicits._

  private def anti(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, Seq("name"), "left_anti")

  test("q_sync_diff rows == q_sync_upload ∪ q_sync_delete by side flag") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val diff = Registry.byName("q_sync_diff").fn(spark, dir)
    val up = Registry.byName("q_sync_upload").fn(spark, dir)
      .as[String].collect().toSet
    val del = Registry.byName("q_sync_delete").fn(spark, dir)
      .as[String].collect().toSet
    val diffUp = diff.filter(col("in_sp") === 0)
      .select("name").as[String].collect().toSet
    val diffDel = diff.filter(col("in_blob") === 0)
      .select("name").as[String].collect().toSet
    assert(diffUp === up && diffDel === del)
    assert(diff.count() === (up.size + del.size).toLong)
  }

  test("property: upload/delete reconcile two arbitrary listings") {
    val gen = Gen.listOf(Gen.choose(0, 30))
    checkProp(Prop.forAllNoShrink(gen, gen) { (blobIds: List[Int], spIds: List[Int]) =>
      val blobs = blobIds.distinct.map(i => s"f$i.docx").toDF("name")
      val sp = spIds.distinct.map(i => s"f$i.docx").toDF("name")
      val upload = anti(blobs, sp).as[String].collect().toSet
      val del = anti(sp, blobs).as[String].collect().toSet
      val b = blobIds.distinct.map(i => s"f$i.docx").toSet
      val s = spIds.distinct.map(i => s"f$i.docx").toSet
      // post-sync SharePoint state = (sp − delete) ∪ upload = blobs
      upload == b.diff(s) && del == s.diff(b) &&
        s.diff(del).union(upload) == b
    }, minTests = 10)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.{Pack, Redact, Sample, Upsert}

/** Unit semantics of the curation ops (q_redact/q_pack/q_sample/q_upsert
  * cover the oracle parity; these pin the operator contracts). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redact replaces every PII class and counts match") {
    val txt = "mail a.b+c@x-y.co and call +1-555-0199 from 10.0.3.44 " +
      "or 192.168.1.1; plain text stays"
    val df = Seq(txt).toDF("t").select(
      Redact.redact(col("t")).as("r"),
      Redact.countMatches(col("t"), Redact.rules(0)._1).as("ne"),
      Redact.countMatches(col("t"), Redact.rules(1)._1).as("np"),
      Redact.countMatches(col("t"), Redact.rules(2)._1).as("ni"))
    val row = df.collect()(0)
    assert(row.getString(0) ===
      "mail [EMAIL] and call [PHONE] from [IP] or [IP]; plain text stays")
    assert((row.getInt(1), row.getInt(2), row.getInt(3)) === ((1, 1, 2)))
  }

  test("redact leaves clean text untouched") {
    val clean = "no personal data in this sentence at all"
    val out = Seq(clean).toDF("t")
      .select(Redact.redact(col("t"))).as[String].head()
    assert(out === clean)
  }

  test("packByBudget: running-total bins, boundary item keeps its bin") {
    // weights 6,6,6 on budget 10: item2 starts at prior=6 (bin 0, overflow
    // allowed), item3 at prior=12 (bin 1) — the no-split contract
    val df = Seq(("g", 1L, 6L), ("g", 2L, 6L), ("g", 3L, 6L), ("h", 1L, 25L),
      ("h", 2L, 1L)).toDF("grp", "ord", "w")
    val out = Pack.packByBudget(df, col("grp"), col("ord"), col("w"), 10L)
      .select("grp", "ord", "pack_id").as[(String, Long, Long)]
      .collect().toSet
    assert(out === Set(("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 1L),
      ("h", 1L, 0L), ("h", 2L, 2L)))
  }

  test("pack ids are dense ranges per group starting at 0 on real data") {
    val packed = Pack.packByBudget(
      Tables.documents(spark, "/root/testdata/sf0.001")
        .select("lang", "doc_id", "n_chars"),
      col("lang"), col("doc_id"), col("n_chars"), 10000L)
    val bad = packed.groupBy("lang")
      .agg(min("pack_id").as("mn"), max("pack_id").as("mx"),
        countDistinct("pack_id").as("nd"))
      .filter(col("mn") =!= 0 || col("nd") =!= col("mx") + 1)
    assert(bad.isEmpty, "pack ids must be 0..max with no gaps")
  }

  test("sample is deterministic, respects strata rates, and is a subset") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val keep = Sample.stratifiedKeep(col("doc_id"), col("lang"),
      Seq("en" -> 100), defaultPermille = 500)
    val s1 = d.filter(keep).select("doc_id").as[Long].collect().sorted.toSeq
    val s2 = d.filter(keep).select("doc_id").as[Long].collect().sorted.toSeq
    assert(s1 === s2 && s1.nonEmpty)
    // rates: binomial(218, .1) and binomial(282, .5) stay far from each
    // other's bands at these margins
    val byLang = d.filter(keep).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val totals = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("en").toDouble / totals("en") < 0.25)
    val restKept = (byLang - "en").values.sum.toDouble
    val restTotal = (totals - "en").values.sum.toDouble
    assert(restKept / restTotal > 0.35 && restKept / restTotal < 0.65)
  }

  test("sampleK: exactly k per stratum, partition-invariant, equals the window formulation") {
    val df = (0 until 500).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "g")
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    // in-memory model: smallest md5(id) per stratum, id tiebreak
    val expect = (0 until 500).map(i => (i.toLong, s"s${i % 3}"))
      .groupBy(_._2).view.mapValues(
        _.sortBy { case (id, _) => (md5hex(id.toString), id) }.take(7)
          .map(_._1)).toMap
    for (parts <- Seq(1, 13)) {
      val got = Sample.sampleK(df.repartition(parts), "g", "id", 7)
        .select("g", "rk", "id")
        .as[(String, Int, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      assert(got === expect, s"parts=$parts diverged from the model")
      got.values.foreach(ids => assert(ids.length === 7))
    }
  }

  test("splitByGroup: clusters never straddle sides, ratio lands, cuts validated") {
    // group ids 0..99 shared by 10 rows each: every group must map to ONE
    // side (the leak-free invariant), and the 90/10 ratio must land on
    // group count (binomial(100, .9) stays within [75, 99] at these margins)
    val df = (0 until 1000).map(i => (i.toLong, (i % 100).toLong))
      .toDF("id", "gid")
    val out = df.select(col("gid"),
        Sample.splitByGroup(col("gid"), Seq("train" -> 900, "eval" -> 1000))
          .as("split"))
      .distinct().as[(Long, String)].collect()
    assert(out.length === 100, "a group mapped to both sides")
    val train = out.count(_._2 == "train")
    assert(train > 75 && train < 100, s"train groups $train outside band")
    // three-way cuts partition: every row gets exactly one valid label
    val three = df.select(Sample.splitByGroup(col("gid"),
        Seq("train" -> 800, "val" -> 900, "test" -> 1000)).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(three.keySet.subsetOf(Set("train", "val", "test")))
    assert(three.values.sum === 1000L)
    intercept[IllegalArgumentException] {
      Sample.splitByGroup(col("gid"), Seq("train" -> 900))
    }
    intercept[IllegalArgumentException] {
      Sample.splitByGroup(col("gid"), Seq("a" -> 900, "b" -> 300, "c" -> 1000))
    }
  }

  test("property: packByBudget matches an in-memory running-total model") {
    import org.scalacheck.{Gen, Prop}
    val gen = Gen.zip(Gen.choose(1L, 40L),
      Gen.listOfN(30, Gen.zip(Gen.oneOf("g1", "g2"), Gen.choose(1L, 15L))))
    checkProp(Prop.forAllNoShrink(gen) { case (budget, rows) =>
      val df = rows.zipWithIndex.map { case ((g, w), i) => (g, i.toLong, w) }
        .toDF("grp", "ord", "w")
      val got = Pack.packByBudget(df, col("grp"), col("ord"), col("w"), budget)
        .select("grp", "ord", "pack_id").as[(String, Long, Long)]
        .collect().toSet
      val want = rows.zipWithIndex.groupBy(_._1._1).flatMap { case (g, rs) =>
        var cum = 0L
        rs.sortBy(_._2).map { case ((_, w), i) =>
          val bin = cum / budget
          cum += w
          (g, i.toLong, bin)
        }
      }.toSet
      got == want
    }, minTests = 10)
  }

  test("property: applyChanges matches an in-memory last-writer model") {
    import org.scalacheck.{Gen, Prop}
    val gen = Gen.zip(
      Gen.listOfN(12, Gen.zip(Gen.choose(1L, 8L), Gen.alphaLowerStr.map(_.take(4)))),
      Gen.listOfN(12, Gen.zip(Gen.choose(1L, 10L), Gen.alphaLowerStr.map(_.take(4)),
        Gen.choose(1L, 5L), Gen.oneOf(true, false))))
    checkProp(Prop.forAllNoShrink(gen) { case (baseRows0, changeRows0) =>
      val baseRows = baseRows0.distinctBy(_._1)
      // unique (key, ordinal) so last-writer is well defined
      val changeRows = changeRows0.distinctBy(c => (c._1, c._3))
      val base = baseRows.toDF("k", "v")
      val changes = changeRows.toDF("k", "v", "ordinal", "deleted")
      val got = Upsert.applyChanges(base, changes, "k")
        .as[(Long, String)].collect().toSet
      val want = (baseRows.map { case (k, v) => (k, v, 0L, false) } ++
        changeRows.map { case (k, v, o, d) => (k, v, o, d) })
        .groupBy(_._1).flatMap { case (k, rs) =>
          val win = rs.maxBy(_._3)
          if (win._4) None else Some((k, win._2))
        }.toSet
      got == want
    }, minTests = 10)
  }

  test("upsert: update wins over base, tombstone wins over update, insert lands") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a2", 1L, false), // update
      (2L, "b", 1L, true),   // delete
      (3L, "c2", 1L, false), (3L, "c3", 2L, true), // update then delete
      (9L, "new", 1L, false) // insert
    ).toDF("k", "v", "ordinal", "deleted")
    val out = Upsert.applyChanges(base, changes, "k")
      .as[(Long, String)].collect().toSet
    assert(out === Set((1L, "a2"), (9L, "new")))
  }
}

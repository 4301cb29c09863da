package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session — Spark
  * startup dominates test time otherwise). */
object SparkTestSession {
  lazy val get: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse")
    val s = Sessions.builder("4").appName("graft-test")
      .config("spark.sql.warehouse.dir", wh.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  /** Runs a ScalaCheck property and fails the ScalaTest test if it does
    * not hold (the scalatest/scalacheck bridge artifact is not available
    * offline, so properties are checked through scalacheck directly).
    * Callers must build properties with `forAllNoShrink`: every property
    * body here runs Spark jobs, and shrinking re-runs the body once per
    * shrink candidate — a failure under plain `forAll` turns into
    * hundreds of Spark jobs (observed wedging the suite for 45+ min on
    * one iterative-CC counterexample). The un-shrunk args are small and
    * printed by the assert below. */
  def checkProp(p: org.scalacheck.Prop, minTests: Int = 20): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(minTests).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }
}

package graft

/** Driver-contract guards: the things the round driver assumes about
  * SparkEntry/Registry, pinned as specs so a refactor cannot silently
  * break the correctness gate. */
class RegistrySpec extends SparkSpec {

  test("query names are unique and every query has an oracle (one known exception)") {
    val qs = Registry.byName // byName itself requires uniqueness
    val oracleLess = qs.values.filter(_.oracle.isEmpty).map(_.name).toSet
    // q_binary_scan reads file mtimes DuckDB cannot see — rows-only check
    assert(oracleLess === Set("q_binary_scan"))
    assert(qs.keySet === SparkEntry.queries.keySet)
    assert(SparkEntry.oracleSql.keySet ===
      qs.filter(_._2.oracle.isDefined).keySet)
  }

  test("entry query returns rows at sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

package graft

/** Registry integrity + driver-contract smoke. */
class RegistrySpec extends SparkSpec {

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL references only testdata tables and bare names") {
    // guard against accidentally referencing a path or temp view
    SparkEntry.oracleSql.values.foreach { sql =>
      assert(!sql.contains("/root/"), s"oracle must use bare table names: $sql")
    }
  }
}

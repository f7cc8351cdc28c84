package graft

/** Smoke: every catalog query runs at sf0.001; queries without a DuckDB
  * oracle (the driver's weaker rows-only check) must return rows. */
class CatalogSmokeSpec extends SparkSpec {

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries and column-aligned shape") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  QueryCatalog.all.foreach { q =>
    test(s"${q.name} executes at sf0.001" +
        (if (q.oracle.isEmpty) " and returns rows" else "")) {
      val n = q.run(spark, sfDir).count()
      if (q.oracle.isEmpty) assert(n > 0, s"${q.name}: rows-only check needs >0 rows")
    }
  }
}

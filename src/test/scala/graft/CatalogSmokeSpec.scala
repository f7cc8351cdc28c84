package graft

/** Smoke: every catalog query runs at sf0.001, and every query carries a
  * DuckDB oracle — the full-strength correctness gate. (Queries whose
  * exact output isn't SQL-expressible — hash-based sketches — pin a
  * property oracle instead; the weaker rows-only fallback regressed to
  * zero users in r6 and is now FORBIDDEN so the gate can't silently
  * thin out.) */
class CatalogSmokeSpec extends SparkSpec {

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries and column-aligned shape") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("EVERY catalog query declares an oracle (no rows-only fallbacks)") {
    val missing = QueryCatalog.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty,
      s"queries without an oracle (add a value or property oracle): $missing")
  }

  test("catalog names are unique") {
    val dups = QueryCatalog.all.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate catalog names: $dups")
  }

  QueryCatalog.all.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      q.run(spark, sfDir).count()
      ()
    }
  }
}

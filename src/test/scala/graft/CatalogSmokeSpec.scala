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

  test("bench staging rebuilds over a partial (no-_SUCCESS) directory") {
    // simulate a mid-write failure: the staged dir EXISTS but carries
    // no committer _SUCCESS marker — the _SUCCESS-gated staging must
    // rebuild instead of silently reading the corrupt partial tree
    val staged = Seq(("graft_mhib_", "idx"), ("graft_int8_", "corpus"),
      ("graft_xidx_", "idx"))
    def stagedDir(stem: String, leaf: String) = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/$stem" +
        s"${java.lang.ProcessHandle.current().pid()}_" +
        sfDir.replaceAll("[^A-Za-z0-9]", "_"), leaf)
    for ((stem, leaf) <- staged) {
      val dir = stagedDir(stem, leaf)
      def purge(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(purge)); x.delete(); ()
      }
      purge(dir)
      dir.mkdirs()
      val junk = new java.io.File(dir, "part-junk.parquet")
      java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))
      assert(dir.exists() && !new java.io.File(dir, "_SUCCESS").exists())
    }
    // both staged queries must rebuild (overwrite clears the junk) and
    // then run green against the rebuilt artifact
    Seq("q_incr_bench", "q_int8_bench", "q_incremental_exact").foreach { name =>
      val q = QueryCatalog.all.find(_.name == name).get
      assert(q.run(spark, sfDir).count() > 0, name)
    }
    // and the rebuild left a committed marker behind
    for ((stem, leaf) <- staged) {
      val dir = stagedDir(stem, leaf)
      assert(new java.io.File(dir, "_SUCCESS").exists(), dir.toString)
    }
  }
}

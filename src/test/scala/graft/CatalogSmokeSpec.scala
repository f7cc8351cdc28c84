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
      // the atomic-output wrap is the SparkEntry contract the driver
      // runs through — enforcing it here makes a complex-typed result
      // schema (the r13 q_center_normalize raw array<double>) fail in
      // the smoke suite, not first in the driver's canonicalizer
      QueryCatalog.requireAtomicOutput(q.name, q.run(spark, sfDir)).count()
      ()
    }
  }

  test("COVERAGE.md catalog count matches QueryCatalog.all.size") {
    // the documented gate count drifted mid-round in r13; parse the
    // canonical sentence so a stale COVERAGE.md fails the suite
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val m = """Catalog size: (\d+) gated queries""".r.findFirstMatchIn(text)
    assert(m.nonEmpty,
      "COVERAGE.md lost its 'Catalog size: N gated queries' sentence")
    assert(m.get.group(1).toInt == QueryCatalog.all.size,
      s"COVERAGE.md says ${m.get.group(1)} gated queries but " +
        s"QueryCatalog.all.size is ${QueryCatalog.all.size} — update the " +
        "Catalog size sentence")
  }

  test("atomic-output contract rejects a planted array-typed query") {
    import org.apache.spark.sql.functions._
    val arrayDf = spark.range(3).select(array(col("id")).as("v"))
    val e = intercept[IllegalArgumentException] {
      QueryCatalog.requireAtomicOutput("planted_array", arrayDf)
    }
    assert(e.getMessage.contains("planted_array") &&
      e.getMessage.contains("v: array<bigint>"))
    // and a fully-atomic frame passes through unchanged
    val ok = spark.range(3).selectExpr("id", "cast(id as string) s",
      "cast(id as double) d", "id > 1 b")
    assert(QueryCatalog.requireAtomicOutput("ok", ok).count() == 3)
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

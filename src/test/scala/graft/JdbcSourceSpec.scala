package graft

import org.apache.spark.sql.functions._

import graft.sources.JdbcSource

/** SRC1 live round-trip: the JDBC connector against an in-process
  * EMBEDDED Derby database (derby*.jar ships on the Spark classpath for
  * the Hive metastore, so this runs offline). Same Spark connector code
  * path as a production SQL Server — only the dialect differs. */
class JdbcSourceSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("sqlserver-style URL builder matches the reference's shape") {
    assert(JdbcSource.jdbcUrl("HOST01", "PipelineTracker") ==
      "jdbc:sqlserver://HOST01;databaseName=PipelineTracker;integratedSecurity=true")
    assert(JdbcSource.jdbcUrl("h", "db", integratedSecurity = false) ==
      "jdbc:sqlserver://h;databaseName=db")
  }

  test("scanOptions: partitioned scan requires bounds, builds ranges") {
    val opts = JdbcSource.scanOptions("u", "t", Some("id"),
      Some(0L), Some(100L), numPartitions = 4)
    assert(opts("partitionColumn") == "id" && opts("numPartitions") == "4")
    intercept[IllegalArgumentException] {
      JdbcSource.scanOptions("u", "t", Some("id")) // no bounds
    }
  }

  test("live Derby round-trip: write, read back, partitioned scan") {
    val src = (1L to 100L).map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "score")
    val base = Map("url" -> url, "dbtable" -> "graft_t1", "driver" -> driver)
    JdbcSource.write(src, base)

    // plain read returns the exact relation
    val back = JdbcSource.read(spark, base)
    assert(back.count() == 100)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      src.as[(Long, String, Double)].collect().toSet)

    // partitioned range scan: 4 parallel queries, same rows
    val part = JdbcSource.read(spark, JdbcSource.scanOptions(url, "graft_t1",
      Some("id"), Some(1L), Some(101L), numPartitions = 4) + ("driver" -> driver))
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)

    // filter pushdown reaches the database: the JDBC relation reports
    // the predicate as pushed, and the result is correct
    val filtered = back.filter(col("id") <= 10)
    val explained = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PushedFilters") && explained.contains("LessThanOrEqual"),
      explained)
    assert(filtered.count() == 10)

    // append mode adds rows through the same writer
    JdbcSource.write(src.filter(col("id") <= 5)
      .withColumn("id", col("id") + 1000), base, mode = "append")
    assert(JdbcSource.read(spark, base).count() == 105)
  }

  test("DSv2 catalog: whole aggregates push into the database") {
    val src = (1L to 200L).map(i => (i, s"g${i % 4}", i * 0.5))
      .toDF("id", "grp", "score")
    // Derby maps Spark StringType to CLOB by default, and Derby cannot
    // GROUP BY a CLOB — the aggregate would silently fall back to a
    // plain scan. Pin the group key to VARCHAR so pushdown can engage
    // (the same createTableColumnTypes a production ingest would use).
    JdbcSource.write(src,
      Map("url" -> url, "dbtable" -> "graft_agg", "driver" -> driver,
        "createTableColumnTypes" -> "grp VARCHAR(16)"))
    JdbcSource.registerCatalog(spark, "graftdb", url,
      Map("driver" -> driver))
    val agg = spark.sql(
      """SELECT grp, count(*) AS n, sum(score) AS s
        |FROM graftdb.APP.GRAFT_AGG GROUP BY grp""".stripMargin)
    // the scan node reports the aggregate as pushed: the database
    // computes per-group partials and ships GROUP rows, not table rows
    val explained = agg.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PushedAggregates"), explained)
    assert(explained.contains("COUNT") && explained.contains("SUM"),
      explained)
    // and values equal the Spark-side aggregation of the source
    val got = agg.as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val exp = src.groupBy($"grp")
      .agg(count(lit(1)).as("n"), sum($"score").as("s"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == exp)
  }

  test("DSv2 catalog: same-source equi-join pushes into the database") {
    // Three gates open join pushdown: the catalog's pushDownJoin option
    // and the optimizer flag (both set by registerCatalog), plus the
    // DIALECT declaring it can render Spark's join SQL. Stock Derby
    // doesn't declare it (Spark 4.1 ships it for H2 only), so swap in a
    // dialect that opts in — the production SQL-Server opt-in is this
    // exact pattern. The stock Derby dialect must be UNREGISTERED for
    // the window (not merely shadowed): with two dialects matching one
    // url Spark silently wraps them in an AggregatedDialect, which does
    // NOT override supportsJoin — the opt-in would never engage. Suites
    // run sequentially in the forked test JVM, and the stock dialect is
    // restored in the finally, so the other Derby tests are unaffected.
    val joinUrl = "jdbc:derby:memory:graftjoin;create=true"
    val stockDerby = org.apache.spark.sql.GraftTestBridge.dialectFor(joinUrl)
    object DerbyJoinDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
      override def canHandle(url: String): Boolean =
        url.startsWith("jdbc:derby")
      override def supportsJoin: Boolean = true
      override def getJDBCType(dt: org.apache.spark.sql.types.DataType) =
        stockDerby.getJDBCType(dt)
    }
    org.apache.spark.sql.jdbc.JdbcDialects.unregisterDialect(stockDerby)
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DerbyJoinDialect)
    try {
      val a = (1L to 50L).map(i => (i, i * 2.0)).toDF("id", "v")
      val b = (1L to 50L).map(i => (i, i * 10L)).toDF("id", "w")
      JdbcSource.write(a,
        Map("url" -> joinUrl, "dbtable" -> "graft_j1", "driver" -> driver))
      JdbcSource.write(b,
        Map("url" -> joinUrl, "dbtable" -> "graft_j2", "driver" -> driver))
      JdbcSource.registerCatalog(spark, "graftjoindb", joinUrl,
        Map("driver" -> driver))
      val j = spark.sql(
        """SELECT a.id AS id, a.v AS v, b.w AS w
          |FROM graftjoindb.APP.GRAFT_J1 a
          |JOIN graftjoindb.APP.GRAFT_J2 b ON a.id = b.id
          |WHERE a.id <= 20""".stripMargin)
      // pushed = ONE scan node and NO Spark-side join: the database
      // executes the join and ships 20 joined rows, not 2x50 table rows
      val plan = j.queryExecution.optimizedPlan
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => s
      }
      val joins = plan.collect {
        case jn: org.apache.spark.sql.catalyst.plans.logical.Join => jn
      }
      assert(joins.isEmpty && scans.size == 1,
        s"join not pushed:\n${plan.treeString}")
      // and the joined values are exactly the Spark-side join's
      val got = j.as[(Long, Double, Long)].collect().toSet
      assert(got == (1L to 20L).map(i => (i, i * 2.0, i * 10L)).toSet)
    } finally {
      // the optimizer flag stays set: that is registerCatalog's
      // documented session-level behavior (pushdown only engages where
      // a dialect opts in, so leaving it on is inert for stock dialects)
      org.apache.spark.sql.jdbc.JdbcDialects.unregisterDialect(DerbyJoinDialect)
      org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(stockDerby)
    }
  }
}

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
}

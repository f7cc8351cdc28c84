package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source (reference SRC1: the ODBC
  * `SELECT * FROM Working_Table_Uploadtest_V2` scan, Download.py:78-86 /
  * Upload.py:116-123) on Spark's JDBC connector — which, unlike the
  * reference, pushes filters and prunes columns into the database
  * (SURVEY.md §4.1) and can split the scan into `numPartitions` parallel
  * range queries.
  *
  * No SQL Server exists in the test environment, so the sqlserver URL
  * builder is unit-tested only; `read`/`write` themselves are exercised
  * live against an in-process embedded Derby database (on the Spark
  * classpath) in JdbcSourceSpec — same connector code path as any
  * production database, different dialect.
  */
object JdbcSource {

  /** SQL Server-style trusted-connection URL from the reference's
    * (server, database, driver) triple. */
  def jdbcUrl(server: String, database: String,
              integratedSecurity: Boolean = true): String = {
    val base = s"jdbc:sqlserver://$server;databaseName=$database"
    if (integratedSecurity) s"$base;integratedSecurity=true" else base
  }

  /** Option map for a partitioned table scan: `partitionColumn` splits
    * the read into `numPartitions` range queries — the scale-out analog
    * of the reference's single ODBC cursor. */
  def scanOptions(url: String, table: String,
                  partitionColumn: Option[String] = None,
                  lowerBound: Option[Long] = None,
                  upperBound: Option[Long] = None,
                  numPartitions: Int = 8,
                  fetchSize: Int = 10000): Map[String, String] = {
    val base = Map(
      "url" -> url,
      "dbtable" -> table,
      "fetchsize" -> fetchSize.toString)
    partitionColumn match {
      case Some(c) =>
        require(lowerBound.isDefined && upperBound.isDefined,
          "partitioned JDBC scan needs lower/upper bounds")
        base ++ Map(
          "partitionColumn" -> c,
          "lowerBound" -> lowerBound.get.toString,
          "upperBound" -> upperBound.get.toString,
          "numPartitions" -> numPartitions.toString)
      case None => base
    }
  }

  def read(spark: SparkSession, options: Map[String, String]): DataFrame =
    spark.read.format("jdbc").options(options).load()

  /** Write a relation into a database table. `batchsize` batches the
    * inserts per round trip; each Spark partition opens one connection,
    * so upstream partitioning controls write parallelism. */
  def write(df: DataFrame, options: Map[String, String],
            mode: String = "overwrite", batchSize: Int = 10000): Unit =
    df.write.format("jdbc").options(options)
      .option("batchsize", batchSize.toString).mode(mode).save()

  /** Register a DSv2 JDBC catalog — the AGGREGATE-pushdown path. The
    * v1 `read` pushes filters and prunes columns; reads routed through
    * a catalog (`spark.table("<name>.<SCHEMA>.<TABLE>")` or SQL over
    * the same identifier) additionally push whole aggregates
    * (MIN/MAX/COUNT/SUM/AVG with GROUP BY, as partial aggregates that
    * Spark still finalizes — safe under Spark-side retries) plus LIMIT
    * and top-N into the database, so a `SELECT grp, sum(x) ... GROUP
    * BY grp` ships back one row per GROUP instead of one row per
    * table row — at a 10^9-row table that is the difference between a
    * metadata-sized result and re-downloading the database. Pushdown
    * applies only where the dialect can translate the expression;
    * untranslatable aggregates fall back to a plain scan, so results
    * never change, only where the work runs. */
  def registerCatalog(spark: SparkSession, name: String, url: String,
                      extraOptions: Map[String, String] = Map.empty): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.url", url)
    spark.conf.set(s"spark.sql.catalog.$name.pushDownAggregate", "true")
    spark.conf.set(s"spark.sql.catalog.$name.pushDownLimit", "true")
    // JOIN pushdown (Spark 4.1 DSv2): an equi-join between two tables of
    // the SAME catalog compiles to one SQL join executed by the database
    // — one scan node, join-sized result over the wire instead of two
    // table-sized ones. Three gates must all open: this option, the
    // optimizer flag below, and `JdbcDialect.supportsJoin` for the
    // database (true for databases whose dialect can render Spark's
    // subquery-join SQL; Spark 4.1 ships it enabled for H2, and the
    // SQL-Server dialect of the reference's production target can opt in
    // the same way — see JdbcSourceSpec's Derby opt-in for the pattern).
    // With any gate closed the plan falls back to two scans + a
    // Spark-side join: results never change, only where the work runs.
    spark.conf.set(s"spark.sql.catalog.$name.pushDownJoin", "true")
    spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
    extraOptions.foreach { case (k, v) =>
      spark.conf.set(s"spark.sql.catalog.$name.$k", v)
    }
  }
}

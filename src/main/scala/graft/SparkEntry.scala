package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual inventory lives in [[QueryCatalog]]; this object only
  * adapts it to the driver's expected shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Five-way join + aggregation (SURVEY.md §2.3/§2.4 coverage in one). */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.byName("q_join5_revenue").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Every entry
    * is wrapped in [[QueryCatalog.requireAtomicOutput]] — a query whose
    * result schema carries a complex type (the r13 q_center_normalize
    * raw-array incident) fails loudly on EVERY run instead of only in
    * the driver's canonicalizer. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.all.map { q =>
      q.name -> { (s: SparkSession, d: String) =>
        QueryCatalog.requireAtomicOutput(q.name, q.run(s, d))
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every catalog entry declares one (enforced
    * by CatalogSmokeSpec): ops whose exact output isn't SQL-expressible
    * (hash-based sketches) pin a property oracle — planted-duplicate
    * recall, implementation==specification equality, or tolerance
    * bounds — instead of falling back to the driver's weaker rows-only
    * check. */
  def oracleSql: Map[String, String] =
    QueryCatalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

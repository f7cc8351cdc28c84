package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout utilities: the two levers that remove work at 100 TB
  * before any query runs (SCALE.md):
  *
  *   - **partitioned layout**: directory partitioning on low-cardinality
  *     columns -> partition PRUNING (a filtered scan lists only matching
  *     directories, touching 1/k of the data);
  *   - **bucketed layout**: `bucketBy` on join/agg keys -> co-located
  *     joins and aggregations with NO exchange at query time (the
  *     shuffle is paid once, at write).
  */
object Layout {

  /** Write `df` hive-style partitioned by `partitionCols`. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Read back a partitioned dataset (partition columns are
    * reconstructed from the directory structure). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Save `df` as a bucketed (+ optionally sorted) managed table.
    * Both sides of a co-located join must use the same bucket count
    * and key. */
  def saveBucketed(df: DataFrame, table: String, key: String,
                   buckets: Int, sorted: Boolean = true,
                   mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }
}

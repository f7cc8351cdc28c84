package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities: the three levers that remove work at
  * 100 TB before any query runs (SCALE.md):
  *
  *   - **partitioned layout**: directory partitioning on low-cardinality
  *     columns -> partition PRUNING (a filtered scan lists only matching
  *     directories, touching 1/k of the data);
  *   - **bucketed layout**: `bucketBy` on join/agg keys -> co-located
  *     joins and aggregations with NO exchange at query time (the
  *     shuffle is paid once, at write);
  *   - **Z-ordered layout**: files clustered on a space-filling curve
  *     over TWO range-queried columns -> parquet min/max stats prune
  *     files/row-groups for predicates on EITHER column (a linear sort
  *     only serves its leading column).
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

  /** Remove a managed table's on-disk LOCATION when the session's
    * catalog does not own the table — the cross-JVM rerun hazard of
    * [[saveBucketed]] with a non-persistent (in-memory) catalog: the
    * warehouse directory outlives the catalog, so a fresh JVM pointed
    * at the same warehouse sees the old files but not the table, and
    * `saveAsTable(Overwrite)` refuses to CREATE over the orphaned
    * location (LOCATION_ALREADY_EXISTS — Overwrite can only
    * drop-and-recreate tables the catalog knows). Call before
    * [[saveBucketed]] when the table name is deterministic across
    * runs. A no-op when the catalog owns the table (Overwrite handles
    * that case itself) or when nothing is on disk.
    *
    * Assumes the DEFAULT database: a managed table's location is
    * `<warehouse>/<lowercased name>` only there (a non-default db adds
    * a `<db>.db/` segment — callers using one must drop the location
    * themselves). The name is lowercased because Spark lowercases
    * identifiers when deriving managed locations; without it a
    * mixed-case name makes the sweep a silent no-op and the subsequent
    * saveBucketed still dies with LOCATION_ALREADY_EXISTS. */
  def dropOrphanedTableLocation(spark: SparkSession, table: String): Unit = {
    require(!table.contains("."),
      s"dropOrphanedTableLocation assumes the default database; got '$table'")
    if (!spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + "/" +
          table.toLowerCase(java.util.Locale.ROOT))
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(loc, true)
    }
  }

  /** One-time rewrite of a normalized-AT-READ table to a layout whose
    * columns are physically TYPED — the pruning restorer for tables
    * whose loader wraps a column in a normalizing expression (e.g.
    * `Tables.events` branches on the file's parquet timestamp encoding
    * and rebuilds `ts` via `timestamp_micros(when(...))`). A predicate
    * against such a wrapped column is a predicate on an EXPRESSION:
    * Catalyst cannot push it into the scan, so `PushedFilters` is empty
    * and parquet row-group/file min-max pruning is dead — invisible at
    * test SF, the first thing a real user hits time-slicing 100 TB of
    * events. After this rewrite the column is a plain TIMESTAMP(micros)
    * parquet column, filters reach the reader, and because rows are
    * range-clustered on `timeCol` each file covers a disjoint time
    * slice, so a time predicate prunes whole files from the listing,
    * not just row groups (LayoutSpec pins both properties).
    *
    * Cost shape: one range exchange (sampled partitioner) + local sort
    * — paid ONCE, amortized over every later time-sliced query; the
    * same trade as [[writeZOrdered]], which is the variant to use when
    * a SECOND range-queried column matters. */
  def writeNormalized(df: DataFrame, path: String, timeCol: String,
                      numFiles: Int,
                      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(numFiles > 0, "writeNormalized: numFiles must be positive")
    df.repartitionByRange(numFiles, col(timeCol))
      .sortWithinPartitions(col(timeCol))
      .write.mode(mode).parquet(path)
  }

  /** Compact a small-file parquet dataset into ~`targetBytes` files —
    * the table-maintenance pass every incremental pipeline needs:
    * streaming sinks and per-batch appends leave thousands of KB-sized
    * files whose open/footer overhead dominates scans and whose
    * per-file metadata bloats planning. File count is derived from the
    * dataset's ACTUAL on-disk bytes (a filesystem listing, no data
    * read); rows optionally re-sort on `sortCol` so the rewrite also
    * restores min/max-stats locality (compaction is the natural moment
    * to pay for clustering).
    *
    * Writes to a NEW path: atomically swapping it over the old one is
    * the table format's job (Delta/Iceberg commit protocols); a plain
    * parquet directory can't swap in place safely while readers hold
    * file lists. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L * 1024 * 1024,
              sortCol: Option[String] = None): Long = {
    require(targetBytes > 0, "compact: targetBytes must be positive")
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath))
      .getLength
    val numFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inPath)
    val arranged = sortCol match {
      case Some(c) => df.repartitionByRange(numFiles, col(c))
        .sortWithinPartitions(col(c))
      case None => df.repartition(numFiles)
    }
    arranged.write.mode(SaveMode.Overwrite).parquet(outPath)
    numFiles.toLong
  }

  /** 16-bit Morton spread: map the low 16 bits of `c` onto the even bit
    * positions of a 32-bit value (the classic mask-and-shift chain — 5
    * integer ops, no loop, so the same expression runs verbatim in any
    * SQL dialect with `<<`/`&`/`|`). */
  private[graft] def spread16(c: Column): Column = {
    val a = c.bitwiseAND(lit(65535L))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(16711935L))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(252645135L))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(858993459L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(1431655765L))
  }

  /** 32-bit Z-value (Morton code) of two 16-bit inputs: bits of `a` on
    * even positions, bits of `b` on odd — points close in BOTH
    * dimensions are close on the curve. */
  def zValue2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Scale a numeric column to the 16-bit grid using the given bounds
    * (values at `max` land on 65535; a degenerate min==max domain lands
    * everything on 0). */
  private def grid16(c: Column, lo: Double, hi: Double): Column =
    if (hi <= lo) lit(0L)
    else least(lit(65535L), greatest(lit(0L),
      floor((c.cast("double") - lo) / (hi - lo) * 65536.0).cast("long")))

  /** Write `df` clustered on the Z-order curve over `(colA, colB)`:
    * scale both columns to a 16-bit grid (bounds from one tiny min/max
    * aggregate — a 1-row driver collect, same class as the IVF centroid
    * metadata), range-partition on the interleaved Z-value into
    * `numFiles` files, and sort within each file by Z. Parquet then
    * stores per-file/per-row-group min/max of BOTH columns spanning
    * only a curve segment — a range predicate on EITHER column prunes
    * most files, where a linear sort serves only its leading column
    * (the property ZOrderSpec pins with footer stats).
    *
    * Scale shape: one range exchange (sampled partitioner) + local
    * sort — the same cost as any sorted write; the Z computation is
    * five codegen'd integer ops per row. At 100 TB pick `numFiles` so
    * files land near the 128 MB row-group sweet spot. */
  def writeZOrdered(df: DataFrame, path: String,
                    colA: String, colB: String, numFiles: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val mm = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double"))
      .collect()(0)
    require((0 to 3).forall(!mm.isNullAt(_)),
      s"writeZOrdered: no usable numeric bounds for ($colA, $colB) — " +
        "the input is empty, or a cluster column casts to null doubles " +
        "(non-numeric type?); nothing to cluster")
    val z = zValue2(
      grid16(col(colA), mm.getDouble(0), mm.getDouble(1)),
      grid16(col(colB), mm.getDouble(2), mm.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(path)
  }
}

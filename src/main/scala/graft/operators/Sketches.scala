package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregation — the incremental-analytics pattern a
  * 100 TB store runs on: precompute a small sketch PER PARTITION/BATCH
  * (a binary column, persistable to parquet), then answer queries by
  * MERGING sketches instead of re-scanning data. Distinct counts here
  * use Spark's built-in Apache DataSketches HLL aggregates
  * (`hll_sketch_agg` / `hll_union_agg`), so the sketch bytes are the
  * standard cross-tool DataSketches format.
  *
  * Scale shape: the sketch build is one partial-aggregated scan (the
  * exchange carries one ~2^lgK-byte sketch per group per map task, not
  * rows); every later query over N batches reads N×groups sketch rows —
  * metadata-sized — and never touches the corpus again. An exact
  * `count(DISTINCT)` over the same data re-shuffles every value each
  * time it is asked.
  */
object Sketches {

  /** Per-group HLL distinct sketches of `valueCol` (binary column
    * `hll`, DataSketches format; `lgK` trades 2^lgK bytes for
    * accuracy — 12 ≈ 1.6% RSE). Persist the result per ingest batch;
    * merge with [[hllMergedEstimate]] / [[hllUnionBy]]. */
  def hllByGroup(df: DataFrame, groupCol: String, valueCol: String,
                 lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Merge sketch rows (any grouping, any number of batches) into one
    * global distinct estimate. */
  def hllMergedEstimate(sketches: DataFrame,
                        sketchCol: String = "hll"): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col(sketchCol))).as("n_est"))

  /** Re-aggregate sketch rows to a coarser grouping (e.g. per-batch ×
    * per-source sketches → per-source), merging instead of rescanning. */
  def hllUnionBy(sketches: DataFrame, groupCol: String,
                 sketchCol: String = "hll"): DataFrame =
    sketches.groupBy(col(groupCol))
      .agg(hll_union_agg(col(sketchCol)).as(sketchCol))

  /** Estimate column for a sketch. */
  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / interval-algebra operators over event streams:
  * exponentially-weighted smoothing and sweep-line concurrency. Both
  * stay fully declarative (array built-ins + window functions — no
  * UDFs, no mapGroups), so Catalyst keeps whole-stage codegen and the
  * shuffles are exactly the group-bys you'd write by hand.
  */
object TimeSeries {

  /** Final EWMA per group: order each group's values by `orderCols`,
    * seed with the first value, then fold
    * `acc * (1-alpha) + v * alpha` — the standard recursive EWMA, whose
    * order-dependence is exactly why it cannot be a plain windowed sum.
    *
    * Scale shape: ONE hash aggregation; per-group state is the group's
    * (order, value) array, so the bound is events-per-group (the same
    * contract as any sorted-fold — sessions, funnels). Groups hash
    * across the cluster; no window over a global sort, no driver
    * involvement. The fold itself is `aggregate` over the sorted
    * array: group-local, linear, codegen'd. For unbounded groups,
    * chunk by time first (EWMA composes: seed each chunk with the
    * previous chunk's tail).
    *
    * `orderCols` must make the order total (ties would make the fold
    * nondeterministic) — pass a unique tiebreaker last. Null values are
    * SKIPPED (pandas-ewm semantics): the fold sees only non-null
    * observations, rather than a null poisoning — or, worse, silently
    * re-seeding — the rest of the series. A group with only nulls
    * yields a null EWMA. */
  def ewmaByGroup(df: DataFrame, groupCol: String, orderCols: Seq[String],
                  valueCol: String, alpha: Double,
                  outCol: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"ewmaByGroup: alpha $alpha not in (0,1]")
    // collect_list drops null ENTRIES: wrapping the struct in a
    // null-on-null-value conditional is what implements the skip
    val ordered = array_sort(collect_list(
      when(col(valueCol).isNotNull, struct(
        orderCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*))))
    df.groupBy(col(groupCol))
      .agg(aggregate(ordered, lit(null).cast("double"),
        (acc: Column, x: Column) =>
          when(acc.isNull, x.getField("__v"))
            .otherwise(acc * (1 - alpha) + x.getField("__v") * alpha))
        .as(outCol))
  }

  /** Sweep-line peak concurrency: the maximum number of intervals
    * `[startCol, endCol]` (end-INCLUSIVE: touching intervals overlap,
    * zero-length intervals count) active at any instant, per `byCol`
    * partition — "how many sessions/jobs/users were live at the worst
    * moment", the classic interval question that a join cannot answer
    * without quadratic blowup.
    *
    * Each interval becomes a +1 event at start and a −1 at end; a
    * running sum ordered by (time, +1-before-−1) is the live count,
    * and its max is the peak. Scale shape: one explode (2 rows per
    * interval), one window per `byCol` partition, one aggregate — the
    * window sorts WITHIN partitions only (no global sort), so the
    * partition column should bound the per-task row count (a day, an
    * hour, a tenant). */
  def peakConcurrency(intervals: DataFrame, byCol: String,
                      startCol: String, endCol: String,
                      outCol: String = "peak"): DataFrame = {
    val pts = intervals.select(col(byCol),
      explode(array(
        struct(col(startCol).as("t"), lit(1).as("d")),
        struct(col(endCol).as("t"), lit(-1).as("d")))).as("p"))
      .select(col(byCol), col("p.t").as("t"), col("p.d").as("d"))
    val w = Window.partitionBy(col(byCol))
      .orderBy(col("t").asc, col("d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("__c", sum(col("d")).over(w))
      .groupBy(col(byCol))
      .agg(max(col("__c")).cast("long").as(outCol))
  }
}

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
    * yields a null EWMA.
    *
    * `maxGroupRows` is the house loud-failure guard (the
    * `tokenBudgetSelect` convention): a power-law key at 100× the test
    * scale would otherwise pile one group's whole history into a single
    * agg buffer and become a silent straggler/OOM — instead the query
    * FAILS naming the offending group (set `<= 0` to disable). The
    * check rides INSIDE the aggregate — `size` of the very array the
    * fold consumes — so it costs zero extra jobs (the r12 pre-count
    * variant cost a second full scan, measured +66% at sf0.1). It only
    * sees non-null observations (the rows the buffer actually holds),
    * and it fires once the group's array is collected: the fold and
    * all downstream stages stop loudly, though a group so large the
    * array ITSELF cannot be buffered dies on Spark's memory manager
    * first. For unbounded groups use [[ewmaByGroupChunked]]. */
  def ewmaByGroup(df: DataFrame, groupCol: String, orderCols: Seq[String],
                  valueCol: String, alpha: Double,
                  outCol: String = "ewma",
                  maxGroupRows: Long = 50L * 1000 * 1000): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"ewmaByGroup: alpha $alpha not in (0,1]")
    // collect_list drops null ENTRIES: wrapping the struct in a
    // null-on-null-value conditional is what implements the skip
    val ordered = array_sort(collect_list(
      when(col(valueCol).isNotNull, struct(
        orderCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*))))
    val fold = aggregate(ordered, lit(null).cast("double"),
      (acc: Column, x: Column) =>
        when(acc.isNull, x.getField("__v"))
          .otherwise(acc * (1 - alpha) + x.getField("__v") * alpha))
    // same collect_list instance in guard and fold -> one agg buffer
    // (PhysicalAggregation dedups semantically-equal aggregates)
    val guarded =
      if (maxGroupRows <= 0) fold
      else when(size(ordered) > maxGroupRows, raise_error(concat(
        lit("ewmaByGroup: group '"), col(groupCol).cast("string"),
        lit("' has "), size(ordered).cast("string"),
        lit(s" observations (> maxGroupRows=$maxGroupRows); its sorted " +
          "fold holds the whole group in ONE agg buffer — use " +
          "ewmaByGroupChunked, or raise/disable maxGroupRows"))))
        .otherwise(fold)
    df.groupBy(col(groupCol)).agg(guarded.as(outCol))
  }

  /** [[ewmaByGroup]] for UNBOUNDED groups: the same final-EWMA
    * semantics, but per-task state is bounded by the largest time
    * CHUNK, not the largest group — the scale path the `maxGroupRows`
    * guard points at.
    *
    * EWMA composes across a split of the series: for a chunk with
    * non-null observations v_1..v_n, the fold seeded with `s` ends at
    *
    *   s * (1-α)^n  +  Σ_i α (1-α)^(n-i) v_i
    *
    * so each (group, chunk) reduces to four numbers — n, the decay
    * (1-α)^n, the seeded-contribution Σ-term (a fold from 0), and the
    * SEEDLESS fold (first value seeds; used when the chunk is the
    * group's first non-empty one) — and a second group-level fold over
    * chunks in time order stitches them:
    * `acc = acc==null ? seedless : acc*decay + contrib`. An all-null
    * chunk (n=0, decay=1, contrib=0, seedless=null) is the identity in
    * both branches, so empty chunks pass through untouched.
    *
    * Scale shape: TWO hash aggregations — (group, chunk) then group —
    * with per-buffer state = one chunk's observations, then one row per
    * chunk. Pick `chunkExpr` (e.g. `date_trunc("month", col("ts"))`) so
    * chunks are task-sized; it MUST be monotone non-decreasing in the
    * `orderCols` order within each group (chunks are re-folded sorted
    * by chunk key — a non-monotone chunking would reorder
    * observations), and chunk keys must be non-null.
    *
    * Floating-point note: the stitched value is algebraically equal to
    * [[ewmaByGroup]]'s but associates the arithmetic differently, so
    * results agree to rounding error, not bit-exactly
    * (TimeSeriesSpec pins 1e-9 relative agreement). */
  def ewmaByGroupChunked(df: DataFrame, groupCol: String,
                         orderCols: Seq[String], valueCol: String,
                         alpha: Double, chunkExpr: Column,
                         outCol: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha <= 1,
      s"ewmaByGroupChunked: alpha $alpha not in (0,1]")
    val ordered = array_sort(collect_list(
      when(col(valueCol).isNotNull, struct(
        orderCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*))))
    val v = (x: Column) => x.getField("__v")
    val perChunk = df
      .groupBy(col(groupCol), chunkExpr.as("__chunk"))
      .agg(
        size(ordered).cast("double").as("__n"),
        aggregate(ordered, lit(0.0),
          (acc: Column, x: Column) =>
            acc * (1 - alpha) + v(x) * alpha).as("__contrib"),
        aggregate(ordered, lit(null).cast("double"),
          (acc: Column, x: Column) =>
            when(acc.isNull, v(x))
              .otherwise(acc * (1 - alpha) + v(x) * alpha)).as("__seedless"))
      .withColumn("__decay", pow(lit(1 - alpha), col("__n")))
    val chunks = array_sort(collect_list(struct(
      col("__chunk"), col("__decay"), col("__contrib"), col("__seedless"))))
    perChunk.groupBy(col(groupCol))
      .agg(aggregate(chunks, lit(null).cast("double"),
        (acc: Column, x: Column) =>
          when(acc.isNull, x.getField("__seedless"))
            .otherwise(acc * x.getField("__decay") + x.getField("__contrib")))
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
  /** Ordered conversion funnel: per entity, the earliest
    * strictly-time-increasing completion of each step — step i must
    * occur on an event with time STRICTLY after step i-1's completion
    * (the classic product-analytics funnel; greedy earliest-completion
    * is optimal, so the result equals the iterative
    * "min time of step-i matches after t_{i-1}" formulation the SQL
    * oracle uses — an event at a time EQUAL to the previous completion
    * never advances, identically in both).
    *
    * Returns one row per entity with at least one step-matching event:
    * (`entityCol`, one nullable time column per step named by
    * `stepNames` (default `t1..tn`), `steps_completed`). An event
    * matching several steps advances at most one.
    *
    * Scale shape: the [[ewmaByGroup]] contract — events matching NO
    * step are dropped before the shuffle, then ONE hash aggregation
    * whose per-group state is the entity's (time, step-mask) array,
    * folded group-locally in time order (codegen'd `aggregate`, no
    * window, no global sort). The bound is matching-events-per-entity,
    * with the same `maxGroupRows` loud-guard. */
  def funnel(events: DataFrame, entityCol: String, timeCol: String,
             steps: Seq[Column], stepNames: Seq[String] = Nil,
             maxGroupRows: Long = 50L * 1000 * 1000): DataFrame = {
    require(steps.nonEmpty && steps.size <= 30,
      s"funnel: 1..30 steps, got ${steps.size}")
    val names =
      if (stepNames.isEmpty) steps.indices.map(i => s"t${i + 1}")
      else {
        require(stepNames.size == steps.size,
          s"funnel: ${stepNames.size} names for ${steps.size} steps")
        stepNames
      }
    val n = steps.size
    val mask = steps.zipWithIndex
      .map { case (p, i) => when(p, lit(1 << i)).otherwise(lit(0)) }
      .reduce(_ + _)
    val tagged = events
      .select(col(entityCol), col(timeCol).as("__t"), mask.as("__m"))
      .filter(col("__m") > 0 && col("__t").isNotNull)
    val timeType = tagged.schema("__t").dataType
    val ordered = array_sort(collect_list(struct(col("__t"), col("__m"))))
    // acc = completion times so far; size(acc) = the next step index.
    // `get` (not element_at) reads the last completion: it returns null
    // out-of-bounds instead of an ANSI error, and `t > null` is null ->
    // the OR falls through to the size-0 branch.
    val fold = aggregate(ordered,
      array().cast(org.apache.spark.sql.types.ArrayType(timeType)),
      (acc: Column, x: Column) =>
        when(size(acc) < n &&
          call_function("shiftright", x.getField("__m"), size(acc))
            .bitwiseAND(lit(1)) === 1 &&
          (size(acc) === 0 ||
            x.getField("__t") > get(acc, size(acc) - 1)),
          concat(acc, array(x.getField("__t"))))
          .otherwise(acc))
    // in-pass guard (the ewmaByGroup convention): size of the SAME
    // collected array, zero extra jobs
    val guarded =
      if (maxGroupRows <= 0) fold
      else when(size(ordered) > maxGroupRows, raise_error(concat(
        lit("funnel: entity '"), col(entityCol).cast("string"),
        lit("' has "), size(ordered).cast("string"),
        lit(s" step-matching events (> maxGroupRows=$maxGroupRows); the " +
          "sorted fold holds them in ONE agg buffer — pre-filter the " +
          "event stream, or raise/disable maxGroupRows"))))
        .otherwise(fold)
    val folded = tagged.groupBy(col(entityCol))
      .agg(guarded.as("__times"))
    folded.select(
      col(entityCol) +:
        names.zipWithIndex.map { case (nm, i) =>
          get(col("__times"), lit(i)).as(nm) } :+
        size(col("__times")).cast("long").as("steps_completed"): _*)
  }

  /** Rolling z-score anomaly signal: each row's deviation from the
    * mean / sample-stddev of its `lookback` PRECEDING rows in
    * `orderCols` order (the frame ends at -1, so the score never sees
    * the value it judges — a spike cannot mask itself). Rows whose
    * window holds fewer than `minPoints` observations, or whose window
    * has zero variance, get a null score instead of a meaningless or
    * infinite one (the zero-variance test is exact: identical inputs
    * fold to exactly 0 variance, so the branch is engine-stable).
    *
    * Output = input columns + `outCol` (rounded to 4 decimals).
    *
    * Scale shape: one shuffle on the group key; the frame is a bounded
    * ROWS window, so aggregation state is O(lookback) and the
    * partition buffer beneath it is spill-backed — a big group costs
    * one task's TIME, not memory. That per-key serialization is why
    * the house `maxGroupRows` loud-guard applies (the [[ewmaByGroup]]
    * convention). Unlike EWMA, the score needs only `lookback` rows of
    * history, so unbounded keys chunk trivially: time-slice with a
    * `lookback`-row overlap and the scores reproduce exactly. */
  def rollingZScore(df: DataFrame, groupCol: String,
                    orderCols: Seq[String], valueCol: String,
                    lookback: Int = 20, minPoints: Int = 5,
                    outCol: String = "z_score",
                    maxGroupRows: Long = 50L * 1000 * 1000): DataFrame = {
    require(lookback >= minPoints,
      s"rollingZScore: lookback $lookback < minPoints $minPoints")
    require(minPoints >= 2,
      s"rollingZScore: minPoints $minPoints < 2 (stddev undefined)")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-lookback, -1)
    val v = col(valueCol).cast("double")
    val mu = avg(v).over(w)
    val sd = stddev_samp(v).over(w)
    val cnt = count(v).over(w)
    val score = when(cnt >= minPoints && sd > 0, round((v - mu) / sd, 4))
    // in-pass guard: a whole-partition count over the same
    // (partition, order) spec — frames may differ within one
    // WindowExec, so the check shares the score window's pass (zero
    // extra jobs, zero extra window passes). Unbounded-BOTH frame so
    // EVERY evaluated row sees the total (a running count would let a
    // downstream filter over early rows hide a hot key's tail).
    val guarded =
      if (maxGroupRows <= 0) score
      else {
        val total = count(lit(1)).over(
          Window.partitionBy(col(groupCol))
            .orderBy(orderCols.map(col): _*)
            .rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing))
        when(total > maxGroupRows, raise_error(concat(
          lit("rollingZScore: group '"), col(groupCol).cast("string"),
          lit("' has "), total.cast("string"),
          lit(s" rows (> maxGroupRows=$maxGroupRows); its window " +
            "serializes onto one task — use rollingZScoreChunked, or " +
            "raise/disable maxGroupRows"))))
          .otherwise(score)
      }
    df.withColumn(outCol, guarded)
  }

  /** [[rollingZScore]] for UNBOUNDED keys — the scale path its
    * `maxGroupRows` guard points at: per-task state is bounded by the
    * largest time CHUNK (plus `lookback` carried rows), not the largest
    * group, and the scores reproduce the single-window form EXACTLY.
    *
    * Because the score needs only `lookback` preceding rows, a chunk
    * can be scored independently once it also sees the last `lookback`
    * rows BEFORE it. Shape (the [[graft.operators.CorpusOps
    * .tokenBudgetSelectBucketed]] two-phase convention, generalized to
    * a lookback overlap):
    *
    *   1. rank rows within (group, chunk) — a window whose partitions
    *      are chunk-sized;
    *   2. per-(group, chunk) counts get a TINY prefix-sum window (one
    *      row per chunk) that turns ranks into per-group GLOBAL
    *      ordinals without any global window;
    *   3. each row is copied into every LATER chunk whose first
    *      ordinal is within `lookback` of it (almost always just the
    *      next chunk, but a run of thin chunks carries further — this
    *      is what keeps thin chunks exact), via a broadcast join
    *      against the chunk summary;
    *   4. one window per (group, chunk) over (own + carried) rows
    *      ordered by ordinal: the carried rows are exactly the ordinal
    *      predecessors, so the `ROWS -lookback..-1` frame sees
    *      precisely what the single-window form saw. Carried copies
    *      are scored too, then dropped.
    *
    * `chunkExpr` must be non-null and monotone non-decreasing in the
    * `orderCols` order within each group (the [[ewmaByGroupChunked]]
    * contract), and `orderCols` must be a total order (ranks decide
    * frame membership). Pick task-sized chunks (an hour, a day). Cost:
    * two chunk-partitioned shuffles + one broadcast of the chunk
    * summary — no guard needed, nothing serializes a whole key. */
  def rollingZScoreChunked(df: DataFrame, groupCol: String,
                           orderCols: Seq[String], valueCol: String,
                           chunkExpr: Column,
                           lookback: Int = 20, minPoints: Int = 5,
                           outCol: String = "z_score"): DataFrame = {
    require(lookback >= minPoints,
      s"rollingZScoreChunked: lookback $lookback < minPoints $minPoints")
    require(minPoints >= 2,
      s"rollingZScoreChunked: minPoints $minPoints < 2 (stddev undefined)")
    val inCols = df.columns.toSeq
    val wRank = Window.partitionBy(col(groupCol), col("__chunk"))
      .orderBy(orderCols.map(col): _*)
    // materialized: summary + ordinal join + carry join all read it,
    // and it carries a window — the expensive-subtree Materialize rule
    val ranked = Materialize(df.withColumn("__chunk", chunkExpr)
      .withColumn("__rk", row_number().over(wRank).cast("long")),
      eager = false)
    val wChunks = Window.partitionBy(col(groupCol)).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // one row per (group, chunk) — broadcast-sized by construction;
    // materialized because BOTH the ordinal join and the carry-target
    // join read it (its prefix-sum window is the only place the group
    // is hashed alone, and only over this tiny summary)
    val offsets = Materialize(ranked
      .groupBy(col(groupCol), col("__chunk"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wChunks), lit(0L))),
      eager = false)
    val withOrd = ranked
      .join(offsets.select(col(groupCol), col("__chunk"), col("__off")),
        Seq(groupCol, "__chunk"))
      .withColumn("__ord", col("__off") + col("__rk"))
      .drop("__rk", "__off")
    // ONE broadcast join fans each row out to every chunk that needs
    // it: its own (cj == chunk, always matched — every (group, chunk)
    // has a summary row) plus each later chunk starting within
    // lookback of it (lo_j <= ord + lookback). No union, so the
    // withOrd subtree is never duplicated.
    val targets = offsets.select(col(groupCol).as("__cg"),
      col("__chunk").as("__cj"), (col("__off") + 1).as("__lo"))
    val expanded = withOrd
      .join(broadcast(targets),
        col(groupCol) === col("__cg") &&
          (col("__cj") === col("__chunk") ||
            (col("__cj") > col("__chunk") &&
              col("__lo") <= col("__ord") + lookback)))
      .withColumn("__carry", col("__cj") > col("__chunk"))
    val wScore = Window.partitionBy(col(groupCol), col("__cj"))
      .orderBy(col("__ord")).rowsBetween(-lookback, -1)
    val v = col(valueCol).cast("double")
    val scored = expanded.withColumn(outCol,
      when(count(v).over(wScore) >= minPoints &&
        stddev_samp(v).over(wScore) > 0,
        round((v - avg(v).over(wScore)) / stddev_samp(v).over(wScore), 4)))
    scored.filter(!col("__carry"))
      .select((inCols.map(col) :+ col(outCol)): _*)
  }

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

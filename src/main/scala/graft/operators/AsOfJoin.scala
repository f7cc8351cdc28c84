package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single right row
  * with the greatest `rightTime <= leftTime` within the same key — the
  * canonical time-series enrichment operator (market data, CDC snapshots).
  *
  * Spark lacks a native as-of join; rather than a custom SparkPlan, this
  * composes built-ins with the union + "last carried value" pattern
  * (public technique, e.g. Flink temporal joins / pandas merge_asof
  * semantics):
  *
  *   1. tag both sides, union on (key, time) — ONE shuffle on the key,
  *   2. per key ordered by (time, tag), carry the last right payload
  *      forward with `last(ignoreNulls)` over an unbounded-preceding
  *      frame (right rows sort before left rows at equal times, so
  *      `<=` semantics hold),
  *   3. keep the left rows with whatever right payload they carried.
  *
  * Scale: equivalent to one sort-merge pass per key partition — no
  * range-explosion, no per-row subqueries; skewed keys behave like any
  * windowed aggregation (AQE/salting applies).
  */
object AsOfJoin {

  /** @param left       probe side (e.g. events)
    * @param right      build side (e.g. orders / quotes)
    * @param keyCol     equi-key column name present in both
    * @param leftTime   event-time column in `left`
    * @param rightTime  event-time column in `right`
    * @param rightCols  right payload columns to carry (become nullable)
    * @param tolerance  optional maximum match age as an ANSI interval
    *                   literal body (e.g. `"7 days"`, `"30 minutes"`):
    *                   a carried right row older than
    *                   `leftTime - tolerance` is treated as NO match
    *                   (its payload columns null out) — pandas
    *                   `merge_asof(tolerance=...)` semantics. The
    *                   filter is applied to the carried match, so it
    *                   never finds a different (even older) row
    *                   instead.
    * @param maxGroupRows house loud-failure guard (the
    *                   `tokenBudgetSelect` convention): the carry
    *                   window serializes each key's left+right rows
    *                   through one task, so a power-law key at 100×
    *                   becomes a silent straggler — instead the query
    *                   FAILS naming the hot key (set `<= 0` to
    *                   disable). The check is a whole-partition count
    *                   over the same key partitioning, computed in the
    *                   already-paid carry shuffle — zero extra jobs
    *                   (the r12 pre-count cost a second full scan,
    *                   measured +57% at sf0.1). The remedies are
    *                   key-specific: time-bucket the key upstream, or
    *                   pre-aggregate the right side.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           leftTime: String, rightTime: String,
           rightCols: Seq[String],
           tolerance: Option[String] = None,
           maxGroupRows: Long = 50L * 1000 * 1000): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
    // Null right key/time rows are excluded (merge_asof / ASOF-join
    // semantics): nulls would sort first in the ascending window and be
    // carried as the "match" for every left row until a real right row
    // appears — null time is not negative infinity. Left rows always
    // survive (null left time simply carries no payload).
    // `__rt` rides inside the payload struct so a tolerance check can
    // see the matched row's OWN time after the carry.
    val r = right
      .filter(col(keyCol).isNotNull && col(rightTime).isNotNull)
      .select(col(keyCol), col(rightTime).as("__t"),
        lit(0).as("__tag"),
        struct((rightCols.map(col) :+
          col(rightTime).as("__rt")): _*).as("__payload"))

    // align schemas for the union: left carries nulls for __payload,
    // right carries nulls for the left columns
    val lAligned = l.select(
      (Seq(col(keyCol), col("__t"), col("__tag"),
        lit(null).cast(r.schema("__payload").dataType).as("__payload")) ++
        leftCols.filterNot(_ == keyCol).map(col)): _*)
    val rAligned = r.select(
      (Seq(col(keyCol), col("__t"), col("__tag"), col("__payload")) ++
        leftCols.filterNot(_ == keyCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchExpr = last(col("__payload"), ignoreNulls = true).over(w)
    // in-pass guard: a whole-partition count over the SAME
    // (partition, order) spec — frames may differ within one
    // WindowExec, so it rides the carry window's own pass (zero extra
    // jobs, zero extra window passes). The frame must be
    // unbounded-BOTH, not a running count: the left-rows-only filter
    // above this window would let a hot key whose tail is all RIGHT
    // rows escape a running-count check, while the total is visible
    // from every surviving row.
    val guardedMatch =
      if (maxGroupRows <= 0) matchExpr
      else {
        val total = count(lit(1)).over(w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))
        when(total > maxGroupRows, raise_error(concat(
          lit("AsOfJoin.asOf: key '"), col(keyCol).cast("string"),
          lit("' has "), total.cast("string"),
          lit(s" rows across both sides (> maxGroupRows=$maxGroupRows); " +
            "the per-key carry window serializes them through ONE task " +
            "— time-bucket the key, pre-aggregate the right side, or " +
            "raise/disable maxGroupRows"))))
          .otherwise(matchExpr)
      }
    val carried = lAligned.unionByName(rAligned)
      .withColumn("__match", guardedMatch)

    // tolerance: null the carried match when it is older than the
    // window — a per-row codegen'd conditional, no extra shuffle
    val matched = tolerance match {
      case None => carried
      case Some(tol) => carried.withColumn("__match",
        when(col("__match.__rt") >=
          col("__t") - expr(s"INTERVAL '$tol'"), col("__match")))
    }
    matched.filter(col("__tag") === 1)
      .select((leftCols.map(col) :+ col("__match")): _*)
      .select((leftCols.map(col) ++
        rightCols.map(c => col(s"__match.$c").as(c))): _*)
  }
}

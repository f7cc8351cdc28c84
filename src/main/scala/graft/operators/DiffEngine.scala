package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.toStr

/** The Compare engine (reference `Compare.py`), re-expressed as one
  * declarative Spark query instead of a row-at-a-time cursor:
  *
  *   - keep-last dedup of the build side (reference `Compare.py:55-63`:
  *     dict insert overwrites, so duplicate keys keep the LAST row)
  *   - one left-outer equi-join of new-quarter rows against old-quarter
  *     rows (reference probe loop `Compare.py:178`)
  *   - per-column change classification NEW / CHANGED / CLEARED /
  *     UNCHANGED (reference `Compare.py:179-206`)
  *   - positional word diff for selected columns (reference
  *     `Compare.py:87-110`): token i is changed iff i >= len(old tokens)
  *     or new[i] != old[i] — exactly `zip_with`'s null-padding semantics.
  *
  * All comparisons are string-canonicalized with null ≡ blank
  * (reference `to_str`, `Compare.py:45-48`).
  *
  * Scale: the join shuffles both sides on the key (or broadcasts the old
  * quarter when small); classification and word diff are per-row
  * expressions inside whole-stage codegen — no driver materialization.
  */
object DiffEngine {

  /** Typed row of the diff result (SURVEY.md §1.4: the diff-result model
    * is where a typed Dataset earns its keep — compile-checked field
    * access for downstream consumers). */
  final case class DiffCell(key: String, column: String, old_value: String,
                            new_value: String, status: String)

  /** Keep the LAST row per key, "last" defined by `ord` ascending.
    * Blank keys are dropped (reference `Compare.py:60-62`). */
  def keepLast(df: DataFrame, key: String, ord: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ord).desc)
    df.filter(length(trim(col(key))) > 0)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Per-cell status expression: oldV/newV are already canonicalized
    * strings; isNew marks rows whose key is absent from the old side. */
  def statusExpr(oldV: Column, newV: Column, isNew: Column): Column =
    when(isNew, lit("NEW"))
      .when(oldV =!= lit("") && newV === lit(""), lit("CLEARED"))
      .when(newV =!= oldV, lit("CHANGED"))
      .otherwise(lit("UNCHANGED"))

  /** Positional word diff as `array<struct<token:string,changed:boolean>>`.
    * `zip_with` pads the shorter array with nulls, which reproduces the
    * reference's `i >= len(old_tokens)` rule for free. */
  def wordDiff(oldC: Column, newC: Column): Column = {
    val oldToks = split(trim(oldC), "\\s+")
    val newToks = split(trim(newC), "\\s+")
    val zipped = zip_with(newToks, oldToks,
      (n, o) => struct(n.as("token"), (o.isNull || n =!= o).as("changed")))
    filter(zipped, s => s.getField("token").isNotNull)
  }

  /** Count of changed tokens in a word diff (scalar summary form). */
  def wordDiffChangedCount(oldC: Column, newC: Column): Column =
    size(filter(wordDiff(oldC, newC), s => s.getField("changed")))

  /** Full diff of two keyed tables over `compareCols`, long (unpivoted)
    * form: one row per (key, column) with old/new values and status.
    * New-key rows emit status NEW for every compared column.
    *
    * @param oldDf old quarter (join build side — deduped keep-last)
    * @param newDf new quarter (probe side)
    * @param key   join key column name, present in both
    * @param ord   ordering column in oldDf defining "last" for dedup
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, key: String, ord: String,
           compareCols: Seq[String]): DataFrame = {
    val old = keepLast(oldDf, key, ord)
      .select(col(key).as("__k") +: compareCols.map(c => toStr(col(c)).as(s"__old_$c")): _*)
    val neu = newDf
      .filter(length(trim(col(key))) > 0)
      .select(col(key).as("__k") +: compareCols.map(c => toStr(col(c)).as(s"__new_$c")): _*)

    val joined = neu.join(old, Seq("__k"), "left_outer")
      .withColumn("__is_new", col(s"__old_${compareCols.head}").isNull &&
        // all old cols null together iff the key was absent; any single
        // one suffices but keep it explicit for nullable compare cols:
        compareCols.tail.foldLeft(lit(true))((a, c) => a && col(s"__old_$c").isNull))

    val cells = compareCols.map { c =>
      struct(
        lit(c).as("column"),
        coalesce(col(s"__old_$c"), lit("")).as("old_value"),
        col(s"__new_$c").as("new_value"),
        statusExpr(coalesce(col(s"__old_$c"), lit("")), col(s"__new_$c"),
          col("__is_new")).as("status"))
    }
    joined
      .select(col("__k").as("key"), explode(array(cells: _*)).as("cell"))
      .select(col("key"), col("cell.column").as("column"),
        col("cell.old_value").as("old_value"),
        col("cell.new_value").as("new_value"),
        col("cell.status").as("status"))
  }

  /** [[diff]] as a typed Dataset. Requires a string-typed key (cast
    * upstream if numeric). */
  def diffTyped(oldDf: DataFrame, newDf: DataFrame, key: String, ord: String,
                compareCols: Seq[String])
      : org.apache.spark.sql.Dataset[DiffCell] = {
    val df = diff(oldDf, newDf, key, ord, compareCols)
    import df.sparkSession.implicits._
    df.withColumn("key", col("key").cast("string")).as[DiffCell]
  }
}

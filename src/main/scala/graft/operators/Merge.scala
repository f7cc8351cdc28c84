package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch upsert (MERGE): apply a changeset to a base relation by key —
  * the engine-side generalization of the reference's Upload flow
  * (replace rows for a ministry, keep the rest).
  *
  * updates win per key; base rows without an update pass through;
  * update-only keys are inserts. One full-outer join on the key — at
  * 100 TB this is the standard copy-on-write merge shape (what
  * Delta/Iceberg MERGE compiles to under the hood); combined with a
  * partitioned layout only touched partitions need rewriting.
  */
object Merge {

  /** @param base    current snapshot
    * @param updates changeset (same schema), at most one row per key
    * @param key     merge key column
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = base.columns.toSeq
    require(updates.columns.toSeq == cols, "schemas must match for upsert")
    val b = base.select(cols.map(c => col(c).as(s"__b_$c")): _*)
    val u = updates.select(cols.map(c => col(c).as(s"__u_$c")): _*)
    b.join(u, col(s"__b_$key") === col(s"__u_$key"), "full_outer")
      .select(cols.map(c =>
        when(col(s"__u_$key").isNotNull, col(s"__u_$c"))
          .otherwise(col(s"__b_$c")).as(c)): _*)
  }

  /** Upsert with deletes: updates carrying `deleteFlag = true` remove
    * the key from the result entirely. */
  def upsertWithDeletes(base: DataFrame, updates: DataFrame, key: String,
                        deleteFlag: String): DataFrame = {
    val dataCols = base.columns.toSeq
    val live = upsert(
      base.withColumn(deleteFlag, lit(false)),
      updates.select((dataCols.map(col) :+ col(deleteFlag)): _*),
      key)
    live.filter(!col(deleteFlag)).drop(deleteFlag)
  }

  /** SCD Type-2 apply — maintain a dimension HISTORY table (one row per
    * (key, validity interval), open rows have `validTo` null) against a
    * batch of updates:
    *
    *   - closed history rows pass through untouched;
    *   - an update whose attributes DIFFER from the key's open row
    *     closes that row at the update's timestamp and opens a new one;
    *   - an identical update is a no-op (the open row passes through —
    *     re-sending the current state must not churn history);
    *   - an update for an unseen key opens its first row.
    *
    * Attribute comparison is null-safe (`<=>`), so a null attribute is
    * a real value, not a wildcard. `updates` carries at most one row
    * per key (apply batches in effective-time order; collapsing
    * multi-version batches is the caller's concern, same contract as
    * [[upsert]]).
    *
    * Scale shape: closed rows never join — they split off by a
    * `validTo.isNotNull` filter and union back untouched, so the
    * full-outer join (one shuffle) carries only OPEN rows ≈ the live
    * key space, not all of history. The join executes ONCE: each
    * joined row emits its outcome rows (carry / close+reopen / first
    * open) as an exploded struct array, instead of three filtered
    * re-reads of the join. Combined with a layout partitioned on
    * `validTo` month, the untouched-history branch is pure
    * pass-through of cold partitions. */
  def scd2Apply(dim: DataFrame, updates: DataFrame, key: String,
                attrs: Seq[String], tsCol: String,
                validFrom: String = "valid_from",
                validTo: String = "valid_to"): DataFrame = {
    val outCols = Seq(key) ++ attrs ++ Seq(validFrom, validTo)
    require(dim.columns.toSeq.sorted == outCols.sorted,
      s"scd2Apply: dim must carry exactly $outCols")
    val closed = dim.filter(col(validTo).isNotNull).select(outCols.map(col): _*)
    // explicit presence markers: a side's KEY being null cannot stand in
    // for the side being absent — a null-keyed open row never joins, and
    // testing __b_<key>.isNull would misread it as "no open row" and
    // replace its attributes with the (absent) update side's nulls
    val open = dim.filter(col(validTo).isNull)
      .select((Seq(key) ++ attrs :+ validFrom).map(c => col(c).as(s"__b_$c"))
        :+ lit(true).as("__b_present"): _*)
    val u = updates
      .select((Seq(key) ++ attrs :+ tsCol).map(c => col(c).as(s"__u_$c"))
        :+ lit(true).as("__u_present"): _*)
    val j = open.join(u, col(s"__b_$key") === col(s"__u_$key"), "full_outer")
    val bPresent = col("__b_present") <=> lit(true)
    val uPresent = col("__u_present") <=> lit(true)
    val same = attrs.map(a => col(s"__b_$a") <=> col(s"__u_$a"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val changed = bPresent && uPresent && !same
    val nullTo = lit(null).cast(dim.schema(validTo).dataType)
    def rec(k: Column, as: Seq[Column], vf: Column, vt: Column): Column =
      struct((Seq(k.as(key)) ++ attrs.zip(as).map { case (n, c) => c.as(n) } ++
        Seq(vf.as(validFrom), vt.as(validTo))): _*)
    val bAttrs = attrs.map(a => col(s"__b_$a"))
    val uAttrs = attrs.map(a => col(s"__u_$a"))
    val carryRec = // open row survives: no update, or a no-op update
      rec(col(s"__b_$key"), bAttrs, col(s"__b_$validFrom"), nullTo)
    val closeRec = // old open row, closed at the update's timestamp
      rec(col(s"__b_$key"), bAttrs, col(s"__b_$validFrom"), col(s"__u_$tsCol"))
    val openRec = // fresh open row from the update
      rec(col(s"__u_$key"), uAttrs, col(s"__u_$tsCol"), nullTo)
    val outcome = when(changed, array(closeRec, openRec))
      .when(!bPresent, array(openRec)) // update for an unseen key
      .otherwise(array(carryRec))      // no update, or a no-op update
    val applied = j.select(explode(outcome).as("__r"))
      .select(outCols.map(c => col(s"__r.$c").as(c)): _*)
    closed.unionByName(applied)
  }
}

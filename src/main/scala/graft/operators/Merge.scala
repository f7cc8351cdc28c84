package graft.operators

import org.apache.spark.sql.DataFrame
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
}

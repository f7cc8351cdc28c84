package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting (the classic pre-AQE
  * technique; still needed when AQE's skew-join can't apply, e.g.
  * non-sort-merge plans or aggregations after the join).
  *
  * The fact side gets a random-but-deterministic salt in [0, buckets)
  * derived from a hash of the whole row; the dim side is replicated
  * `buckets` times. The join key becomes (key, salt), splitting a hot
  * key's rows across `buckets` tasks. Replication cost: |dim| x buckets
  * rows shuffled — use for small-to-medium dims with skewed facts.
  */
object SkewJoin {

  /** Inner equi-join `fact ⋈ dim` on `key`, salted into `buckets`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int = 16): DataFrame = {
    require(buckets > 0)
    // deterministic per-row salt: xxhash64 of the per-row ordinal ONLY.
    // The ordinal is unique per row, so the salt spreads even
    // fully-duplicated rows (a common real skew shape) across buckets;
    // hashing the content columns on top of it (the pre-r19 form) added
    // nothing to the distribution but referenced EVERY fact column,
    // which defeated column pruning at the scan — the salted plan read
    // the whole fact schema no matter how narrow the query
    // (ReadSchema audit, plans/r19/q_salted_join_*).
    // monotonically_increasing_id is (partition, position)-derived, so the
    // salt stays stable across task retries for a fixed partition layout.
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets))
        .cast("int"))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a theta-join explosion: block
  * both sides into fixed time bins, equi-join on (key, bin), then apply
  * the exact range predicate.
  *
  * The naive formulation (`left JOIN right ON key AND point BETWEEN
  * start AND end`) becomes a broadcast-nested-loop or a per-key
  * cross-product in Spark. Binning turns it into a hash join whose
  * fanout is interval_length/binSize + 1 copies of each LEFT row — at
  * 100 TB the shuffle stays proportional to the data, not to the
  * pairing space. Standard technique from public interval-join
  * literature (e.g. Flink interval joins).
  */
object RangeJoin {

  /** Both joins stage bin/endpoint temp columns on the inputs; an input
    * that already carries one of these names would be silently
    * overwritten and dropped — fail loudly instead (the repo-wide
    * guard convention). */
  private def requireNoReserved(left: DataFrame, right: DataFrame,
                                names: Seq[String]): Unit = {
    val clash = (left.columns ++ right.columns).filter(names.contains)
    require(clash.isEmpty,
      s"RangeJoin: input columns ${clash.mkString(", ")} collide with " +
        "reserved temp names; rename them first")
  }

  /** Matches of `point` (right) falling in [start, end) (left), equi on
    * `key`. Left columns + right columns of the matched pairs.
    *
    * @param binSeconds bin width; choose >= typical interval length so
    *                   each left interval spans <= 2 bins.
    */
  def pointInInterval(left: DataFrame, right: DataFrame, key: String,
                      start: Column, end: Column, point: Column,
                      binSeconds: Long): DataFrame = {
    requireNoReserved(left, right,
      Seq("__bin", "__start", "__end", "__point"))
    val sBin = floor(unix_timestamp(start) / binSeconds)
    val eBin = floor(unix_timestamp(end) / binSeconds)
    val l = left
      .withColumn("__start", start).withColumn("__end", end)
      .withColumn("__bin", explode(sequence(sBin, eBin)))
    val r = right
      .withColumn("__point", point)
      .withColumn("__bin", floor(unix_timestamp(point) / binSeconds))
    l.join(r, Seq(key, "__bin"))
      .filter(col("__point") >= col("__start") && col("__point") < col("__end"))
      .drop("__bin", "__start", "__end", "__point")
  }

  /** Interval x interval OVERLAP join, equi on `key`: pairs where
    * `[lStart, lEnd)` and `[rStart, rEnd)` intersect (strict overlap —
    * merely touching endpoints don't pair). Same blocking idea as
    * [[pointInInterval]]: both sides explode to their covered bins,
    * equi-join on (key, bin), exact predicate after.
    *
    * Exactly-once emission without a distinct: an overlapping pair
    * co-occurs in EVERY bin both spans cover, so a blind bin join
    * duplicates pairs. But `max(lStart, rStart)` lies inside both
    * intervals whenever they overlap, so the pair is emitted only in
    * THAT bin — each pair has exactly one such bin, and no
    * deduplicating shuffle is needed; the join output is final.
    *
    * Shuffle shape: each side is copied span/binSeconds + 1 times, so
    * pick `binSeconds` near the typical interval length; long-tail
    * intervals fan out linearly (their true cost), never
    * quadratically. */
  def intervalOverlap(left: DataFrame, right: DataFrame, key: String,
                      lStart: Column, lEnd: Column,
                      rStart: Column, rEnd: Column,
                      binSeconds: Long): DataFrame = {
    requireNoReserved(left, right,
      Seq("__bin", "__ls", "__le", "__rs", "__re"))
    def bins(s: Column, e: Column): Column =
      sequence(floor(unix_timestamp(s) / binSeconds),
        floor(unix_timestamp(e) / binSeconds))
    val l = left
      .withColumn("__ls", lStart).withColumn("__le", lEnd)
      .withColumn("__bin", explode(bins(col("__ls"), col("__le"))))
    val r = right
      .withColumn("__rs", rStart).withColumn("__re", rEnd)
      .withColumn("__bin", explode(bins(col("__rs"), col("__re"))))
    l.join(r, Seq(key, "__bin"))
      .filter(col("__ls") < col("__re") && col("__rs") < col("__le") &&
        col("__bin") ===
          floor(unix_timestamp(greatest(col("__ls"), col("__rs"))) / binSeconds))
      .drop("__bin", "__ls", "__le", "__rs", "__re")
  }
}

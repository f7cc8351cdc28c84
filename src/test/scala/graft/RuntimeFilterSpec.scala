package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Spark's row-level runtime
  * filtering): when one join side carries a selective filter, the
  * optimizer builds a bloom filter over its join keys and pushes a
  * `bloom_filter_might_contain` probe into the OTHER side's scan — at
  * 100 TB this prunes most of a fact-table scan before the shuffle.
  *
  * The feature is ON by default (`spark.sql.optimizer.runtime
  * .bloomFilter.enabled`) but gated by size thresholds tuned for real
  * clusters (application side > 10 GB scan, creation side < 10 MB), so
  * test-scale data never triggers it silently. This spec lowers the
  * application-side threshold to force injection and pins the plan
  * shape, so the at-scale behavior documented in SCALE.md stays true
  * as the code evolves.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom probe into the fact scan") {
    withConf(
      // the 10 GB application-side floor exists so small scans don't pay
      // bloom-build cost; zero it to reproduce the at-scale plan here
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the shuffle-join regime the filter targets (a broadcast
      // join already prunes via its build side)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.lineitem(spark, sfDir)
      val ord = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_extendedprice")).as("rev"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      // the optimized plan prints the probe as might_contain(...) over a
      // bloom_filter_agg(...) scalar subquery built from the filtered
      // dim's join keys
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        "expected a might_contain/bloom_filter_agg probe in:\n" +
          optimized.take(1500))
      // the probe lands on the FACT (lineitem) side, keyed on the join key
      assert(optimized.contains("might_contain(scalar-subquery") &&
        optimized.contains("xxhash64(l_orderkey"), optimized.take(1500))
      // and the result still agrees with the unfiltered-plan answer
      val rows = joined.collect()
      assert(rows.length == 1 && rows(0).getString(0) == "1-URGENT")
    }
  }

  test("without a selective creation side, no bloom filter is injected") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.lineitem(spark, sfDir)
      val ord = Tables.orders(spark, sfDir) // no filter: nothing selective
      val optimized = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_extendedprice")).as("rev"))
        .queryExecution.optimizedPlan.toString
      assert(!optimized.contains("might_contain"), optimized.take(1500))
    }
  }
}

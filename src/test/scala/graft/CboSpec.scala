package graft

import org.apache.spark.sql.functions._

/** Cost-based optimization: table/column statistics (`ANALYZE TABLE`)
  * drive join strategy. Without CBO, a Filter keeps its child's size
  * estimate, so a selectively-filtered fact looks as big as the table
  * and shuffle-joins; with column stats + CBO, selectivity estimation
  * shrinks the estimate and the same query broadcasts. At 100 TB this
  * is the difference between a full shuffle of the big side and none —
  * and it is pure metadata: collect stats at write/compaction time,
  * every later plan benefits. Both directions are pinned (stats off →
  * shuffle join, stats+CBO on → broadcast) so the causality is the
  * stats, not the threshold.
  */
class CboSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ANALYZE column stats flip a selective join from shuffle to broadcast") {
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.sql("DROP TABLE IF EXISTS cbo_lineitem")
    Tables.orders(spark, sfDir).write.saveAsTable("cbo_orders")
    Tables.lineitem(spark, sfDir).write.saveAsTable("cbo_lineitem")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS " +
      "FOR COLUMNS o_orderpriority, o_orderkey")
    spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS")

    // measure what the optimizer estimates for the build side with and
    // without CBO, and place the broadcast threshold BETWEEN the two —
    // the flip is then attributable to the stats, not to a lucky
    // threshold (non-CBO already benefits from column pruning, so the
    // full-table size is not the right reference point)
    // a ~1% key-range predicate: CBO's min/max-based range estimation
    // shrinks the row count ~100x, while the stats-free path passes the
    // child size through essentially unchanged
    val maxKey = spark.table("cbo_orders")
      .agg(max(col("o_orderkey"))).collect()(0).getLong(0)
    val keyCut = maxKey / 100
    def buildSide = spark.table("cbo_orders")
      .filter(col("o_orderkey") <= keyCut)
      .select(col("o_orderkey"), col("o_orderpriority"))
    def buildSideEstimate(cbo: Boolean): BigInt = {
      var est = BigInt(0)
      withConf("spark.sql.cbo.enabled" -> cbo.toString) {
        est = buildSide.queryExecution.optimizedPlan.stats.sizeInBytes
      }
      est
    }
    val withoutStats = buildSideEstimate(cbo = false)
    val withStats = buildSideEstimate(cbo = true)
    assert(withStats * 4 < withoutStats,
      s"CBO estimate $withStats not meaningfully below $withoutStats")
    val threshold = ((withStats + withoutStats) / 2).toLong

    def planOf(cbo: Boolean): String = {
      val flag = cbo.toString
      var plan = ""
      withConf(
        "spark.sql.cbo.enabled" -> flag,
        "spark.sql.autoBroadcastJoinThreshold" -> threshold.toString,
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> threshold.toString,
        // isolate initial-plan estimation from AQE's runtime rescue
        // (AQE would eventually demote/promote from observed sizes;
        // the point here is what STATS alone decide)
        "spark.sql.adaptive.enabled" -> "false") {
        plan = spark.table("cbo_lineitem")
          .join(buildSide, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("l_extendedprice")).as("rev"))
          .queryExecution.executedPlan.toString
      }
      plan
    }

    val without = planOf(cbo = false)
    assert(without.contains("SortMergeJoin") ||
      without.contains("ShuffledHashJoin"), without.take(600))
    val withCbo = planOf(cbo = true)
    assert(withCbo.contains("BroadcastHashJoin"), withCbo.take(600))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("ewmaByGroup: hand-computed fold, seeded with the first value") {
    // g=1: 10 -> .5*10+.5*20=15 -> .5*15+.5*40=27.5 ; g=2: single value
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 40.0),
      (2L, 1L, 7.0)).toDF("g", "i", "v")
    val out = TimeSeries.ewmaByGroup(df, "g", Seq("i"), "v", alpha = 0.5)
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 27.5 && out(2L) == 7.0)
  }

  test("ewmaByGroup: nulls are skipped (they neither poison nor " +
    "re-seed the fold); an all-null group yields null") {
    val df = Seq((1L, 1L, Option(10.0)), (1L, 2L, None),
      (1L, 3L, Option(20.0)), (2L, 1L, None)).toDF("g", "i", "v")
    val out = TimeSeries.ewmaByGroup(df, "g", Seq("i"), "v", alpha = 0.5)
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(15.0)) // 10 -> (skip) -> .5*10+.5*20
    assert(out(2L).isEmpty)
  }

  test("ewmaByGroup: result is input-partition-order independent " +
    "(orderCols decide the fold order)") {
    val rows = (0 until 200).map(i => (i.toLong % 4, i.toLong, (i % 17).toDouble))
    val a = TimeSeries.ewmaByGroup(
      rows.toDF("g", "i", "v").repartition(7), "g", Seq("i"), "v", 0.3)
      .as[(Long, Double)].collect().toMap
    val b = TimeSeries.ewmaByGroup(
      rows.reverse.toDF("g", "i", "v").repartition(3), "g", Seq("i"), "v", 0.3)
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }

  test("ewmaByGroup plan: one aggregation, no window, no sort exchange") {
    val plan = TimeSeries.ewmaByGroup(
      Tables.events(spark, sfDir), "user_id", Seq("ts", "event_id"),
      "value", 0.3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window "), plan.take(600))
    assert(!plan.contains("rangepartitioning"), plan.take(600))
  }

  test("peakConcurrency: overlap counting is end-inclusive — touching " +
    "and zero-length intervals count") {
    val iv = Seq(
      ("d1", 1L, 5L),  // |----|
      ("d1", 5L, 8L),  //     |--|   touches at 5 -> overlap of 2
      ("d1", 9L, 9L),  //          . zero-length, alone -> 1
      ("d2", 1L, 2L), ("d2", 1L, 2L), ("d2", 1L, 2L) // triple overlap
    ).toDF("day", "s", "e")
    val out = TimeSeries.peakConcurrency(iv, "day", "s", "e")
      .as[(String, Long)].collect().toMap
    assert(out == Map("d1" -> 2L, "d2" -> 3L))
  }

  test("peakConcurrency: disjoint intervals peak at 1") {
    val iv = Seq(("d", 1L, 2L), ("d", 3L, 4L), ("d", 5L, 6L))
      .toDF("day", "s", "e")
    assert(TimeSeries.peakConcurrency(iv, "day", "s", "e")
      .as[(String, Long)].head()._2 == 1L)
  }

  test("peakConcurrency plan: window sorts within hash partitions, " +
    "never globally") {
    val iv = Tables.events(spark, sfDir)
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(min($"ts").as("s"), max($"ts").as("e"))
    val plan = TimeSeries.peakConcurrency(iv, "day", "s", "e")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(600))
    assert(!plan.contains("rangepartitioning"), plan.take(600))
  }
}

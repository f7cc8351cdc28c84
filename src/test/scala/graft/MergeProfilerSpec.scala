package graft

import graft.operators.{Merge, Profiler}

class MergeProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: updates win, inserts land, untouched rows pass through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B!"), (9L, "new")).toDF("k", "v")
    val out = Merge.upsert(base, updates, "k")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "B!", 3L -> "c", 9L -> "new"))
  }

  test("upsertWithDeletes removes flagged keys") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val updates = Seq((2L, "B!", false), (1L, "x", true))
      .toDF("k", "v", "del")
    val out = Merge.upsertWithDeletes(base, updates, "k", "del")
      .as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "B!"))
  }

  test("profile computes per-column stats in one pass") {
    val df = Seq((1L, Some("x"), 1.5), (2L, None, 2.5), (2L, Some("y"), 2.5))
      .toDF("id", "s", "d")
    val p = Profiler.profile(df, exact = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("id") == ((3L, 0L, 2L, "1", "2")))
    assert(p("s") == ((3L, 1L, 2L, "x", "y")))
    assert(p("d") == ((3L, 0L, 2L, "1.5", "2.5")))
  }

  test("TopK aggregator equals the window row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sfDir)
    val viaAgg = graft.operators.TopK.topKPerGroup(
        spark, o, "o_custkey", "o_orderkey", "o_totalprice", 3)
      .as[(Long, Long, Double)].collect().toSet
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = o.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("TopKAggregator: bounded-buffer invariants (ties, merge order, k)") {
    import graft.operators.TopK
    val agg = new TopK.TopKAggregator(3)
    val rows: Seq[TopK.In] = Seq((1L, 10L, 5.0), (1L, 11L, 5.0),
      (1L, 12L, 1.0), (1L, 13L, 9.0), (1L, 14L, 2.0))
    // two partial buffers then a merge — the distributed execution path
    val (p1, p2) = rows.splitAt(2)
    val b1 = p1.foldLeft(agg.zero)(agg.reduce)
    val b2 = p2.foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(agg.merge(b1, b2))
    assert(out == Seq((9.0, 13L), (5.0, 10L), (5.0, 11L))) // desc val, asc id
    assert(agg.finish(agg.merge(b2, b1)) == out)           // merge commutes
    // the partial buffer is bounded by k at every step
    assert(rows.scanLeft(agg.zero)(agg.reduce).forall(_.lengthCompare(3) <= 0))
    // k exceeding the group size returns everything, fully ordered
    val agg9 = new TopK.TopKAggregator(9)
    assert(agg9.finish(rows.foldLeft(agg9.zero)(agg9.reduce)) ==
      Seq((9.0, 13L), (5.0, 10L), (5.0, 11L), (2.0, 14L), (1.0, 12L)))
    // k = 0 stays empty
    val agg0 = new TopK.TopKAggregator(0)
    assert(agg0.finish(rows.foldLeft(agg0.zero)(agg0.reduce)).isEmpty)
  }

  test("constraint checks return violations only") {
    val df = Seq((1L, "ok"), (2L, null), (2L, "dup")).toDF("k", "v")
    assert(Profiler.checkNotNull(df, Seq("v")).count() == 1)
    assert(Profiler.checkUnique(df, "k").collect().map(_.getLong(0)).toSeq
      == Seq(2L))
    assert(Profiler.checkAccepted(df, "v", Seq("ok", "dup")).count() == 1)
  }
}

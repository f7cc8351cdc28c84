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

  test("scd2Apply: close+reopen on change, no-op passes through, new key opens") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val dim = Seq(
      // key 1: one closed row + an open row (history passes through)
      (1L, "A", d("2019-01-01"), Option(d("2020-01-01"))),
      (1L, "B", d("2020-01-01"), None),
      (2L, "C", d("2020-01-01"), None), // will receive a no-op update
      (3L, "D", d("2020-01-01"), None)) // untouched
      .toDF("k", "attr", "valid_from", "valid_to")
    val updates = Seq(
      (1L, "B2", d("2024-06-01")), // change: close + reopen
      (2L, "C", d("2024-06-01")),  // identical: must NOT churn
      (9L, "NEW", d("2024-06-01"))) // unseen key: first open row
      .toDF("k", "attr", "ts")
    val out = Merge.scd2Apply(dim, updates, "k", Seq("attr"), "ts")
      .as[(Long, String, java.sql.Date, Option[java.sql.Date])]
      .collect().toSet
    assert(out == Set(
      (1L, "A", d("2019-01-01"), Option(d("2020-01-01"))),
      (1L, "B", d("2020-01-01"), Option(d("2024-06-01"))),
      (1L, "B2", d("2024-06-01"), None),
      (2L, "C", d("2020-01-01"), None),
      (3L, "D", d("2020-01-01"), None),
      (9L, "NEW", d("2024-06-01"), None)))
  }

  test("scd2Apply: null attributes compare null-safely") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val dim = Seq((1L, Option.empty[String], d("2020-01-01"),
      Option.empty[java.sql.Date]))
      .toDF("k", "attr", "valid_from", "valid_to")
    // null -> null is a NO-OP; null -> value is a change
    val noop = Seq((1L, Option.empty[String], d("2024-06-01")))
      .toDF("k", "attr", "ts")
    assert(Merge.scd2Apply(dim, noop, "k", Seq("attr"), "ts").count() == 1)
    val change = Seq((1L, Option("X"), d("2024-06-01")))
      .toDF("k", "attr", "ts")
    val out = Merge.scd2Apply(dim, change, "k", Seq("attr"), "ts")
    assert(out.count() == 2)
    assert(out.filter($"valid_to".isNull).select($"attr")
      .as[String].collect().toSeq == Seq("X"))
  }

  test("scd2Apply: a null-KEYED open row is carried, not nulled out") {
    // a null key never joins, so presence must come from markers, not
    // from key nullability — the key.isNull formulation replaced this
    // row's attributes with the absent update side's nulls
    def d(s: String) = java.sql.Date.valueOf(s)
    val dim = Seq(
      (Option(1L), "A", d("2020-01-01"), Option.empty[java.sql.Date]),
      (Option.empty[Long], "ORPHAN", d("2020-01-01"),
        Option.empty[java.sql.Date]))
      .toDF("k", "attr", "valid_from", "valid_to")
    val updates = Seq((Option(1L), "B", d("2024-06-01")))
      .toDF("k", "attr", "ts")
    val out = Merge.scd2Apply(dim, updates, "k", Seq("attr"), "ts")
      .as[(Option[Long], String, java.sql.Date, Option[java.sql.Date])]
      .collect().toSet
    assert(out == Set(
      (Option(1L), "A", d("2020-01-01"), Option(d("2024-06-01"))),
      (Option(1L), "B", d("2024-06-01"), None),
      (None, "ORPHAN", d("2020-01-01"), None)))
  }

  test("scd2Apply: closed history stays out of the join") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val dim = Seq(
      (1L, "A", d("2019-01-01"), Option(d("2020-01-01"))),
      (1L, "B", d("2020-01-01"), None))
      .toDF("k", "attr", "valid_from", "valid_to")
    val updates = Seq((1L, "C", d("2024-06-01"))).toDF("k", "attr", "ts")
    val plan = Merge.scd2Apply(dim, updates, "k", Seq("attr"), "ts")
      .queryExecution.optimizedPlan.toString
    // the isNotNull(valid_to) branch unions in ABOVE the join, so cold
    // history rows never enter the exchange
    val joinIdx = plan.indexOf("Join FullOuter")
    assert(joinIdx >= 0, plan.take(800))
    assert(plan.take(joinIdx).contains("Union"), plan.take(800))
  }
}

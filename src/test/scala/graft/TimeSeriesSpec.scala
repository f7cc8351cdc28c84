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

  test("ewmaByGroup: maxGroupRows guard fails loudly naming the hot " +
    "group; disabled guard and null observations behave") {
    val hot = (1 to 20).map(i => (Option("hot"), i.toLong, Option(i.toDouble)))
    val df = (hot :+ ((Option("cold"), 1L, Option(1.0))))
      .toDF("g", "i", "v")
    interceptGuard("hot", "maxGroupRows") {
      TimeSeries.ewmaByGroup(df, "g", Seq("i"), "v", 0.5,
        maxGroupRows = 10).collect()
    }
    // disabling the guard skips it entirely
    assert(TimeSeries.ewmaByGroup(df, "g", Seq("i"), "v", 0.5,
      maxGroupRows = 0).count() == 2)
    // the cap counts OBSERVATIONS (what the agg buffer holds), so null
    // values — which the fold skips — don't trip it
    val nulls = (1 to 20).map(i => (Option("padded"), i.toLong,
      if (i <= 10) Option(i.toDouble) else None)).toDF("g", "i", "v")
    assert(TimeSeries.ewmaByGroup(nulls, "g", Seq("i"), "v", 0.5,
      maxGroupRows = 10).count() == 1)
  }

  test("ewmaByGroupChunked matches ewmaByGroup to rounding error, " +
    "and all-null chunks are the identity") {
    val ev = Tables.events(spark, sfDir)
    val flat = TimeSeries.ewmaByGroup(ev, "user_id",
      Seq("ts", "event_id"), "value", 0.3, maxGroupRows = 0)
      .as[(Long, Double)].collect().toMap
    val chunked = TimeSeries.ewmaByGroupChunked(ev, "user_id",
      Seq("ts", "event_id"), "value", 0.3,
      date_trunc("week", col("ts")))
      .as[(Long, Double)].collect().toMap
    assert(flat.keySet == chunked.keySet)
    flat.foreach { case (k, x) =>
      val y = chunked(k)
      assert(math.abs(x - y) <= 1e-9 * (1.0 + math.abs(x)),
        s"user $k: flat $x vs chunked $y")
    }
    // a chunk whose values are ALL null must pass the running state
    // through untouched — including when it PRECEDES the first data
    val df = Seq(
      (1L, 1L, Option.empty[Double]),  // chunk 0: all null, leading
      (1L, 11L, Option(10.0)),         // chunk 1: seeds
      (1L, 21L, Option.empty[Double]), // chunk 2: all null, interior
      (1L, 31L, Option(20.0))          // chunk 3: 0.5*10+0.5*20
    ).toDF("g", "i", "v")
    val out = TimeSeries.ewmaByGroupChunked(df, "g", Seq("i"), "v", 0.5,
      (col("i") / 10).cast("long")).as[(Long, Double)].collect().toMap
    assert(out(1L) == 15.0)
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

  test("intervalOverlap: strict overlap, exactly-once across bin " +
    "boundaries, touching endpoints excluded") {
    import graft.operators.RangeJoin
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // k=1: left spans 3 daily bins; right overlaps in 2 of them — the
    // pair must emit ONCE. Right "touch" starts exactly at left's end
    // (strict: no pair). k=2: disjoint.
    val l = Seq(
      (1L, "a", ts("2024-01-01 06:00:00"), ts("2024-01-03 18:00:00")),
      (2L, "b", ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("k", "l_id", "ls", "le")
    val r = Seq(
      (1L, "x", ts("2024-01-02 00:00:00"), ts("2024-01-04 00:00:00")),
      (1L, "touch", ts("2024-01-03 18:00:00"), ts("2024-01-05 00:00:00")),
      (2L, "y", ts("2024-01-02 00:00:00"), ts("2024-01-02 01:00:00")))
      .toDF("k", "r_id", "rs", "re")
    val out = RangeJoin.intervalOverlap(l, r, "k",
        $"ls", $"le", $"rs", $"re", binSeconds = 86400L)
      .select($"l_id", $"r_id").as[(String, String)].collect().toList
    assert(out == List(("a", "x"))) // once, despite 2 shared bins
  }

  test("intervalOverlap equals the theta join on real data for every " +
    "bin width (blocking is invisible to results)") {
    import graft.operators.RangeJoin
    val e = Tables.events(spark, sfDir)
    val l = e.groupBy($"user_id", to_date($"ts").as("l_day"))
      .agg(min($"ts").as("ls"), max($"ts").as("le"))
    val r = e.groupBy($"user_id", $"event_type")
      .agg(min($"ts").as("rs"), max($"ts").as("re"))
    val theta = l.join(r, Seq("user_id"))
      .filter($"ls" < $"re" && $"rs" < $"le")
      .select($"user_id", $"l_day", $"event_type")
      .collect().map(_.toString).sorted.toList
    for (bin <- Seq(3600L, 86400L, 7 * 86400L)) {
      val blocked = RangeJoin.intervalOverlap(l, r, "user_id",
          $"ls", $"le", $"rs", $"re", binSeconds = bin)
        .select($"user_id", $"l_day", $"event_type")
        .collect().map(_.toString).sorted.toList
      assert(blocked == theta, s"bin=$bin")
    }
  }

  test("range joins reject inputs whose columns collide with reserved " +
    "temp names instead of silently dropping them") {
    import graft.operators.RangeJoin
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"), 9L))
      .toDF("k", "ls", "le", "__bin")
    val r = Seq((1L, ts("2024-01-01 12:00:00"), ts("2024-01-03 00:00:00")))
      .toDF("k", "rs", "re")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(l, r, "k", $"ls", $"le", $"rs", $"re", 86400L)
    }
    assert(e.getMessage.contains("__bin"))
  }

  test("funnel: greedy strict-increase fold, hand-checked") {
    // user 1 completes all three; user 2 stalls after signup (its only
    // click is BEFORE the signup); user 3's click shares the signup's
    // timestamp (strictness: never advances); user 4 has no step events
    // at all (absent from the output).
    val ev = Seq(
      (1L, 10L, "signup"), (1L, 5L, "click"), (1L, 20L, "click"),
      (1L, 30L, "purchase"),
      (2L, 10L, "signup"), (2L, 5L, "click"),
      (3L, 10L, "signup"), (3L, 10L, "click"), (3L, 15L, "purchase"),
      (4L, 10L, "error"))
      .toDF("user_id", "t", "event_type")
    val out = TimeSeries.funnel(ev, "user_id", "t",
      Seq($"event_type" === "signup", $"event_type" === "click",
        $"event_type" === "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getLong(4)))).toMap
    assert(out(1L) == ((Some(10L), Some(20L), Some(30L), 3L)))
    assert(out(2L) == ((Some(10L), None, None, 1L)))
    assert(out(3L) == ((Some(10L), None, None, 1L)),
      "same-timestamp click must not advance; later purchase can't skip")
    assert(!out.contains(4L))
  }

  test("funnel: one event advances at most one step even when it " +
    "matches several") {
    val ev = Seq((1L, 10L, "both"), (1L, 20L, "both"))
      .toDF("user_id", "t", "event_type")
    val out = TimeSeries.funnel(ev, "user_id", "t",
      Seq($"event_type" === "both", $"event_type" === "both"))
      .collect().map(r => (Option(r.get(1)), Option(r.get(2)),
        r.getLong(3))).head
    assert(out == ((Some(10L), Some(20L), 2L)))
  }

  test("funnel plan: one aggregation, no window, no sort exchange") {
    val plan = TimeSeries.funnel(Tables.events(spark, sfDir), "user_id",
      "ts", Seq($"event_type" === "signup", $"event_type" === "click"),
      maxGroupRows = 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"),
      plan.take(600))
    assert(!plan.contains("Window"), plan.take(600))
    assert(!plan.contains("rangepartitioning"), plan.take(600))
  }

  test("funnel: maxGroupRows guard fails loudly on a hot entity") {
    val hot = spark.range(0, 500)
      .select(lit(7L).as("user_id"), $"id".as("t"),
        lit("signup").as("event_type"))
    interceptGuard("maxGroupRows", "step-matching") {
      TimeSeries.funnel(hot, "user_id", "t",
        Seq($"event_type" === "signup"), maxGroupRows = 100).collect()
    }
  }

  test("rollingZScore: hand-computed window, self-exclusion, null gates") {
    // group g, values 1..6 at positions 1..6; lookback 3, minPoints 2.
    val df = Seq((1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, 5.0),
      (6, 100.0)).map { case (p, v) => ("g", p, v) }
      .toDF("grp", "pos", "v")
    val out = TimeSeries.rollingZScore(df, "grp", Seq("pos"), "v",
      lookback = 3, minPoints = 2)
      .select($"pos", $"z_score").collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1).isEmpty, "no preceding rows")
    assert(out(2).isEmpty, "one preceding row < minPoints")
    // pos 3: window {1,2}: mu=1.5, sd=sqrt(0.5); z=(3-1.5)/0.7071=2.1213
    assert(out(3).contains(2.1213), s"pos3: ${out(3)}")
    // pos 4: window {1,2,3}: mu=2, sd=1; z=2
    assert(out(4).contains(2.0))
    // pos 6 is the spike: window {3,4,5} mu=4 sd=1 -> z=96; the spike
    // never sees itself, so it scores as the anomaly it is
    assert(out(6).contains(96.0))
  }

  test("rollingZScore: zero-variance window scores null, not infinity") {
    val df = Seq(("g", 1, 7.0), ("g", 2, 7.0), ("g", 3, 7.0),
      ("g", 4, 9.0)).toDF("grp", "pos", "v")
    val out = TimeSeries.rollingZScore(df, "grp", Seq("pos"), "v",
      lookback = 3, minPoints = 2)
      .select($"pos", $"z_score").collect()
      .map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(out(4), "window {7,7,7} has sd=0 -> null score")
  }

  test("rollingZScore: maxGroupRows guard fails loudly on a hot key") {
    val hot = spark.range(0, 1000)
      .select(lit("hot").as("grp"), $"id".as("pos"),
        ($"id" % 7).cast("double").as("v"))
    interceptGuard("hot", "maxGroupRows") {
      TimeSeries.rollingZScore(hot, "grp", Seq("pos"), "v",
        lookback = 20, minPoints = 5, maxGroupRows = 100).collect()
    }
  }

  test("rollingZScoreChunked reproduces the single-window scores " +
    "EXACTLY on the events corpus") {
    val ev = Tables.events(spark, sfDir)
    def key(r: org.apache.spark.sql.Row) = r.getLong(0)
    def score(r: org.apache.spark.sql.Row) =
      if (r.isNullAt(1)) None else Some(r.getDouble(1))
    val flat = TimeSeries.rollingZScore(ev, "user_id",
      Seq("ts", "event_id"), "value", lookback = 20, minPoints = 5,
      maxGroupRows = 0)
      .select($"event_id", $"z_score").collect()
      .map(r => key(r) -> score(r)).toMap
    val chunked = TimeSeries.rollingZScoreChunked(ev, "user_id",
      Seq("ts", "event_id"), "value", date_trunc("week", $"ts"),
      lookback = 20, minPoints = 5)
      .select($"event_id", $"z_score").collect()
      .map(r => key(r) -> score(r)).toMap
    assert(chunked.size == flat.size)
    assert(chunked == flat) // bit-exact: same frame rows, same fold
  }

  test("rollingZScoreChunked: thin chunks (smaller than lookback) " +
    "carry across MULTIPLE chunks and stay exact") {
    // chunks of 2 rows with lookback 5: a row's frame spans up to 3
    // chunks back — the single-overlap shortcut would be wrong here
    val df = (1 to 20).map(i => ("g", i.toLong, (i * i % 13).toDouble))
      .toDF("grp", "pos", "v")
    val flat = TimeSeries.rollingZScore(df, "grp", Seq("pos"), "v",
      lookback = 5, minPoints = 2, maxGroupRows = 0)
      .select($"pos", $"z_score").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val chunked = TimeSeries.rollingZScoreChunked(df, "grp", Seq("pos"),
      "v", ($"pos" / 2).cast("long"), lookback = 5, minPoints = 2)
      .select($"pos", $"z_score").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(chunked == flat)
  }

  test("rollingZScoreChunked plan: row-level shuffles partition by " +
    "(group, chunk); only the one-row-per-chunk summary hashes the " +
    "group alone") {
    val exch = TimeSeries.rollingZScoreChunked(
      Tables.events(spark, sfDir), "user_id", Seq("ts", "event_id"),
      "value", date_trunc("week", $"ts"))
      .queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("hashpartitioning(user_id"))
      .toSeq
    val groupOnly = exch.filterNot(l =>
      l.contains("__chunk") || l.contains("__cj"))
    assert(exch.exists(l => l.contains("__chunk") || l.contains("__cj")),
      s"no (group, chunk) shuffle found:\n${exch.mkString("\n")}")
    // at most one group-alone shuffle: the tiny one-row-per-chunk
    // summary's prefix-sum window — never the row-level data
    assert(groupOnly.size <= 1, groupOnly.mkString("\n"))
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

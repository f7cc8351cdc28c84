package graft

import graft.operators.{AsOfJoin, SkewJoin}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf picks the latest right row at or before each left time") {
    val left = Seq((1L, 10L, "e1"), (1L, 25L, "e2"), (1L, 20L, "e3"),
      (2L, 5L, "e4")).toDF("k", "t", "ev")
    val right = Seq((1L, 10L, "o1"), (1L, 20L, "o2"), (2L, 50L, "o3"))
      .toDF("k", "rt", "payload")
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("payload"))
      .as[(Long, Long, String, String)].collect()
      .map(r => r._3 -> r._4).toMap
    assert(out("e1") == "o1")   // equal time matches (inclusive <=)
    assert(out("e3") == "o2")   // equal time matches the just-arrived row
    assert(out("e2") == "o2")   // latest earlier
    assert(out("e4") == null)   // nothing at-or-before -> null (left join)
  }

  test("asOf keeps every left row exactly once") {
    val ev = Tables.events(spark, sfDir).select($"event_id", $"user_id", $"ts")
    val o = Tables.orders(spark, sfDir)
      .select($"o_custkey".as("user_id"), $"o_orderdate", $"o_orderkey")
    val out = AsOfJoin.asOf(ev, o, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey"))
    assert(out.count() == ev.count())
    assert(out.select("event_id").distinct().count() == ev.count())
  }

  test("asOf: maxGroupRows guard fails loudly naming the hot key " +
    "(left+right rows counted together); disabled guard passes") {
    val left = (1 to 15).map(i => (7L, i.toLong, s"e$i"))
      .toDF("k", "t", "ev")
    val right = (1 to 10).map(i => (7L, i.toLong, s"o$i"))
      .toDF("k", "rt", "payload")
    interceptGuard("'7'", "maxGroupRows") {
      AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("payload"),
        maxGroupRows = 20).collect() // 15 + 10 = 25 > 20
    }
    assert(AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("payload"),
      maxGroupRows = 0).count() == 15)
  }

  test("asOf with tolerance: a match older than the window nulls out " +
    "instead of falling back to an even older row") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-10 00:00:00"), "stale"), // last right is 9d old
      (1L, ts("2024-01-20 00:00:00"), "fresh"), // last right is 2d old
      (2L, ts("2024-01-10 00:00:00"), "never")  // no right rows at all
    ).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-18 00:00:00"), "b")
    ).toDF("k", "rt", "payload")
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("payload"),
      tolerance = Some("5 days"))
      .select($"ev", $"payload").as[(String, Option[String])]
      .collect().toMap
    assert(out("stale").isEmpty)     // carried 'a' is 9 days old -> null
    assert(out("fresh").contains("b"))
    assert(out("never").isEmpty)
    // boundary is inclusive: exactly tolerance-old still matches
    val edge = Seq((1L, ts("2024-01-23 00:00:00"), "edge"))
      .toDF("k", "t", "ev")
    val eo = AsOfJoin.asOf(edge, right, "k", "t", "rt", Seq("payload"),
      tolerance = Some("5 days"))
      .select($"payload").as[Option[String]].collect()
    assert(eo.toList == List(Some("b")))
  }

  test("saltedJoin equals the plain join") {
    val dim = Tables.part(spark, sfDir)
      .select($"p_partkey".as("l_partkey"), $"p_brand")
    val li = Tables.lineitem(spark, sfDir)
    val salted = SkewJoin.saltedJoin(li, dim, "l_partkey", buckets = 8)
      .groupBy("p_brand").count().as[(String, Long)].collect().toMap
    val plain = li.join(dim, "l_partkey")
      .groupBy("p_brand").count().as[(String, Long)].collect().toMap
    assert(salted == plain)
  }
}

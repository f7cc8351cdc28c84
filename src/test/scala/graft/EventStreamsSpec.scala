package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Streaming specs: the sf0.001 events parquet drives each streaming
  * query synchronously (file source -> memory sink,
  * processAllAvailable), and windowed results are cross-checked against
  * the identical batch aggregation. */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val eventsDir: String = {
    // stage the events file in a directory the file-stream source can list
    val dir = java.nio.file.Files.createTempDirectory("events_stream").toString
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(dir)
    dir
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame,
                          name: String,
                          mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  test("tumbling window stream matches the batch aggregation") {
    val streamed = runToMemory(
      EventStreams.eventTimeWindow(
        EventStreams.readEventStream(spark, eventsDir)),
      "win_out", mode = "complete")
      .select("w_start", "event_type", "n", "sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    val batch = Tables.events(spark, sfDir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .select($"window.start".as("w_start"), $"event_type", $"n", $"sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    assert(streamed == batch)
  }

  test("session windows produce per-user sessions") {
    val out = runToMemory(
      EventStreams.sessionWindow(EventStreams.readEventStream(spark, eventsDir)),
      "sess_out", mode = "complete")
    assert(out.count() > 0)
    // every (user, session) has at least one event
    assert(out.filter($"n_events" < 1).isEmpty)
  }

  test("stateful running totals accumulate across triggers") {
    import graft.streaming.EventStreams.{Event, UserTotals}
    val stream = EventStreams.readEventStream(spark, eventsDir).as[Event]
    val totals = EventStreams.userRunningTotals(spark, stream)
    val q = totals.writeStream.outputMode("update")
      .format("memory").queryName("tot_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("tot_out").as[UserTotals].collect()
      .groupBy(_.user_id).map { case (u, rows) => u -> rows.map(_.n_events).max }
    val expected = Tables.events(spark, sfDir)
      .groupBy($"user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("AvailableNow ETL drains the source once and is incremental") {
    val src = java.nio.file.Files.createTempDirectory("etl_src").toString
    val out = java.nio.file.Files.createTempDirectory("etl_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("etl_ckpt").toString
    val ev = Tables.events(spark, sfDir)
    ev.limit(400).write.mode("append").parquet(src)
    EventStreams.etlAvailableNow(spark, src, out, ckpt)
    val first = spark.read.parquet(s"$out/batch=*").count()
    assert(first == 400)
    // second drain with no new files: no new rows land
    EventStreams.etlAvailableNow(spark, src, out, ckpt)
    assert(spark.read.parquet(s"$out/batch=*").count() == first)
    // partitioned by event_type on disk
    val batchDir = new java.io.File(out).listFiles().head
    assert(batchDir.listFiles().exists(_.getName.startsWith("event_type=")))
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    // duplicate the stream directory content to force dups
    val dupDir = java.nio.file.Files.createTempDirectory("events_dup").toString
    val ev = Tables.events(spark, sfDir)
    ev.write.mode("overwrite").parquet(dupDir)
    ev.write.mode("append").parquet(dupDir)
    val out = runToMemory(
      EventStreams.dedupStream(EventStreams.readEventStream(spark, dupDir)),
      "dedup_out")
    val n = out.select("event_id").distinct().count()
    assert(out.count() == n) // no duplicate ids in the output
    assert(n == ev.count())
  }
}

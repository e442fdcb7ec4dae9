package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  private def eventsAsMicros = {
    // the shared events accessor already converts nanos→micros
    Tables.events(spark, sfDir)
  }

  test("streaming windowed counts equal the batch day aggregation") {
    val dir = Files.createTempDirectory("graft_stream").toString
    eventsAsMicros.write.parquet(s"$dir/in")

    val stream = EventStreams.windowedCounts(
      EventStreams.readEventStream(spark, s"$dir/in"),
      windowLength = "1 day",
      watermarkDelay = "1 hour"
    )
    val got = EventStreams
      .runBounded(stream, "win_counts", OutputMode.Complete())
      .select("day", "event_type", "n")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

    val expected = Queries
      .q19_events_day_agg(spark, sfDir)
      .select("day", "event_type", "n")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == expected)
  }

  test("watermarked stream dedup: a replayed input file changes nothing downstream") {
    val dir = Files.createTempDirectory("graft_stream3").toString
    // materialize ONE deterministic subset, then replay exactly that file
    // (an unordered limit() can pick different rows per action)
    eventsAsMicros.limit(500).write.parquet(s"$dir/stage")
    val evs = spark.read.parquet(s"$dir/stage")
    evs.write.parquet(s"$dir/in")
    evs.write.mode("append").parquet(s"$dir/in") // at-least-once replay: every event twice

    val stream = EventStreams
      .dedupedEvents(EventStreams.readEventStream(spark, s"$dir/in"))
      .groupBy("event_type")
      .count()
    val got = EventStreams
      .runBounded(stream, "dedup_counts", OutputMode.Complete())
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

    val expected = evs.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, "dedup must collapse the replayed copy exactly")
  }

  test("stream-static enrichment equals the equivalent batch broadcast join") {
    val dir = Files.createTempDirectory("graft_stream4").toString
    eventsAsMicros.limit(1000).write.parquet(s"$dir/in")
    val users = Tables.customer(spark, sfDir)

    val stream = EventStreams
      .enrichedByUser(EventStreams.readEventStream(spark, s"$dir/in"), users)
      .groupBy("c_mktsegment")
      .count()
    val got = EventStreams
      .runBounded(stream, "enriched_counts", OutputMode.Complete())
      .collect()
      .map(r => Option(r.getString(0)).getOrElse("<none>") -> r.getLong(1))
      .toMap

    val expected = EventStreams
      .enrichedByUser(spark.read.parquet(s"$dir/in"), users)
      .groupBy("c_mktsegment")
      .count()
      .collect()
      .map(r => Option(r.getString(0)).getOrElse("<none>") -> r.getLong(1))
      .toMap
    assert(got == expected)
    assert(got.values.sum == 1000L)
  }

  test("streaming gap sessions equal batch sessionize once the watermark closes them") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream5").toString
    val evs = eventsAsMicros.filter(col("user_id") < 40)
    evs.write.parquet(s"$dir/in")
    // a far-future sentinel (excluded user id) pushes the global watermark
    // past every real session's end + gap, so all of them close
    val maxTs = evs.agg(max($"ts")).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 10L * 3600 * 1000)
    Seq((-1L, sentinelTs, -1L, "sentinel", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .write.mode("append").parquet(s"$dir/in")

    val stream = EventStreams
      .gapSessions(
        EventStreams.readEventStream(spark, s"$dir/in").as[EventStreams.Event],
        gapMicros = 1800000000L)
      .toDF()
    val got = EventStreams
      .runBounded(stream, "gap_sessions", OutputMode.Append())
      .filter(col("user_id") >= 0) // drop the sentinel's own session
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val expected = graft.operators.Windows
      .sessionize(evs, key = "user_id", tsCol = "ts", tieBreak = "event_id",
        gapMicros = 1800000000L)
      .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(expected.nonEmpty)
    assert(got == expected, "stream sessions must equal the batch gap sessionization")
  }

  test("mapGroupsWithState accumulates per-user session state") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream2").toString
    eventsAsMicros.filter(org.apache.spark.sql.functions.col("user_id") < 8).limit(60)
      .write.parquet(s"$dir/in")

    val stream = EventStreams
      .readEventStream(spark, s"$dir/in")
      .as[EventStreams.Event]
    val sessions = EventStreams.userSessions(stream)
    val got = EventStreams
      .runBounded(sessions.toDF(), "sessions", OutputMode.Update())
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

    val expected = spark.read.parquet(s"$dir/in")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}

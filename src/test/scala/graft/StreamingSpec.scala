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

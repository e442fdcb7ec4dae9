package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bucketed range join equals the naive nested-loop reference") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir).select($"event_id", $"ts")
    val windows = ev
      .filter($"event_id" % 50 === 0)
      .select($"event_id".as("window_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 3 HOURS")).as("w_end"))
    val got = RangeJoin
      .pointInInterval(ev, windows, "ts", "w_start", "w_end", 3L * 3600L * 1000000L)
      .select($"window_id", $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = ev // reference-only BNLJ, never shipped in a query
      .join(windows, $"ts" >= $"w_start" && $"ts" <= $"w_end")
      .select($"window_id", $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    assert(got == naive)
  }

  test("intervals spanning several buckets and inclusive boundaries all match") {
    import spark.implicits._
    val points = Seq(
      (1L, "2024-01-01 00:00:00"), // == start of w10 (inclusive)
      (2L, "2024-01-01 04:30:00"), // mid-bucket inside w10
      (3L, "2024-01-01 09:00:00"), // == end of w10 (inclusive)
      (4L, "2024-01-01 09:00:00.000001"), // 1 micro past the end
      (5L, "2023-12-31 23:59:59.999999")  // 1 micro before the start
    ).toDF("id", "s").select($"id", $"s".cast("timestamp").as("ts"))
    // a 9-hour window over 2-hour buckets: spans 5+ bucket rows
    val w = Seq((10L, "2024-01-01 00:00:00", "2024-01-01 09:00:00"))
      .toDF("window_id", "a", "b")
      .select($"window_id", $"a".cast("timestamp").as("w_start"), $"b".cast("timestamp").as("w_end"))
    val got = RangeJoin
      .pointInInterval(points, w, "ts", "w_start", "w_end", 2L * 3600L * 1000000L)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L), s"inclusive-boundary semantics broken: $got")
  }

  test("the range-join plan is a bucket equi-join, never BroadcastNestedLoopJoin") {
    val plan = QueriesRel2
      .q64_range_join(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"range join degenerated to BNLJ:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"range join degenerated to cartesian:\n$plan")
  }
}

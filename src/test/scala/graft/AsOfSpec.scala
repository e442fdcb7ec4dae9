package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  test("joinSorted equals the range-join+max_by path on the q33 inputs") {
    import spark.implicits._
    val events = Tables.events(spark, sfDir).select($"event_id", $"user_id", $"ts")
    val orders = Tables
      .orders(spark, sfDir)
      .select($"o_custkey", $"o_orderdate", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("matched_dt"))
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, String, String,
                String, String, String, Seq[String]) => org.apache.spark.sql.DataFrame) =
      f(events, orders, "user_id", "o_custkey", "ts", "o_orderdate", "o_orderkey",
        Seq("o_orderkey", "matched_dt"))
        .orderBy("event_id")
        .collect()
        .map(_.toSeq)
        .toSeq
    val viaAgg    = run(AsOf.join)
    val viaSorted = run(AsOf.joinSorted)
    assert(viaAgg.nonEmpty)
    assert(viaSorted == viaAgg)
  }

  test("joinSorted: ties at equal time pick greatest tie-break; null key/time right rows never match") {
    import spark.implicits._
    val leftWithNullKey = Seq(
      (1L, Some(10L), 100L), // matches r2 (greatest tie at t=100)
      (2L, Some(10L), 99L),  // matches r1 (only t<=99)
      (3L, Some(10L), 50L),  // before all rights -> null
      (4L, Some(20L), 100L), // key with only null-time right rows -> null
      (5L, Option.empty[Long], 100L) // null left key never matches
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (Some(10L), Some(90L), 1L, "r1"),
      (Some(10L), Some(100L), 2L, "r2"),
      (Some(10L), Some(100L), 1L, "r2-low-tie"),
      (Some(20L), Option.empty[Long], 9L, "null-time"),
      (Option.empty[Long], Some(10L), 9L, "null-key")
    ).toDF("k", "rt", "tie", "tag")
    val out = AsOf
      .joinSorted(leftWithNullKey, right, "k", "k", "t", "rt", "tie", Seq("tie", "tag"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(4)).map(_.toString).orNull))
      .toMap
    assert(out(1L) == "r2")        // equal-time ties resolved by greatest tie-break
    assert(out(2L) == "r1")
    assert(out(3L) == null)        // no right row at or before t=50
    assert(out(4L) == null)        // null right time never matches
    assert(out(5L) == null)        // null left key never matches
  }

  test("joinSorted widens mixed date/timestamp time columns like join's comparison does") {
    import spark.implicits._
    val left = Seq((1L, 10L, "2024-03-05 13:00:00"), (2L, 10L, "2024-03-04 23:59:00"))
      .toDF("event_id", "k", "t")
      .select($"event_id", $"k", $"t".cast("timestamp").as("t"))
    val right = Seq((10L, "2024-03-05", 1L, "day5"), (10L, "2024-03-01", 2L, "day1"))
      .toDF("k", "rt", "tie", "tag")
      .select($"k", $"rt".cast("date").as("rt"), $"tie", $"tag")
    def collect(
        f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, String, String,
            String, String, String, Seq[String]) => org.apache.spark.sql.DataFrame) =
      f(left, right, "k", "k", "t", "rt", "tie", Seq("tag"))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    val viaSorted = collect(AsOf.joinSorted)
    val viaAgg    = collect(AsOf.join)
    // day5 midnight <= 13:00 on day 5 -> event 1 matches day5;
    // event 2 (day 4 23:59) precedes it -> matches day1
    assert(viaSorted == Seq((1L, "day5"), (2L, "day1")))
    assert(viaSorted == viaAgg, "mixed-type widening must match join's comparison semantics")
  }

  test("joinSorted preserves left multiplicity and a null payload FIELD in the matched row") {
    import spark.implicits._
    val left  = Seq((1L, 10L, 100L), (2L, 10L, 100L)).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, 90L, 1L, Some("older")),
      (10L, 95L, 2L, Option.empty[String]) // latest row carries a NULL field
    ).toDF("k", "rt", "tie", "tag")
    val out = AsOf
      .joinSorted(left, right, "k", "k", "t", "rt", "tie", Seq("tie", "tag"))
      .orderBy("event_id")
      .collect()
    assert(out.length == 2) // both identical-key left rows survive
    out.foreach { r =>
      assert(r.getLong(3) == 2L, "must pick the LATEST right row")
      assert(r.isNullAt(4), "the chosen row's null field must be preserved, not skipped")
    }
  }
}

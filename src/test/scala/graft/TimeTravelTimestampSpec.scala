package graft

import graft.sources.Warehouse
import java.nio.file.Files

/** Timestamp-addressed time travel (Delta `TIMESTAMP AS OF` /
  * `RESTORE TO TIMESTAMP` / CDF `startingTimestamp` parity): a
  * wall-clock instant resolves to the greatest ledger commit at or
  * before it, and the version machinery takes over from there.
  */
class TimeTravelTimestampSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("timestamp resolves to the version in effect; reads, restore and feed agree") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("graft_ttspec").toString, 3)
    wh.createOrReplace("silver", "tt", // version 0
      Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "payload", "v"))
    Thread.sleep(15) // ledger timestamps are millis — force distinct ones
    wh.upsert("silver", "tt", // version 1
      Seq((2L, "b2", 2), (3L, "c", 1)).toDF("k", "payload", "v"), Seq("k"), "v")
    Thread.sleep(15)
    wh.delete("silver", "tt", $"k" === 1L) // version 2

    val ts = wh.history("silver.tt").select("version", "ts_millis").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ts(0) < ts(1) && ts(1) < ts(2), "commits must carry distinct timestamps")

    // exact commit instants and midpoints both resolve to the version
    // in effect at that time
    assert(wh.versionAsOfTimestamp("silver", "tt", ts(0)) == 0L)
    assert(wh.versionAsOfTimestamp("silver", "tt", (ts(0) + ts(1)) / 2) == 0L)
    assert(wh.versionAsOfTimestamp("silver", "tt", ts(1)) == 1L)
    assert(wh.versionAsOfTimestamp("silver", "tt", System.currentTimeMillis() + 1000) == 2L)
    intercept[IllegalArgumentException](
      wh.versionAsOfTimestamp("silver", "tt", ts(0) - 1))

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows(wh.tableAsOfTimestamp("silver", "tt", ts(0))) ==
      Seq((1L, "a"), (2L, "b")))
    assert(rows(wh.tableAsOfTimestamp("silver", "tt", ts(1))) ==
      Seq((1L, "a"), (2L, "b2"), (3L, "c")))

    // the feed cursor is exclusive at the resolved instant's commit:
    // everything AFTER version 0 — the merge's rows and the delete's
    assert(wh.changeFeedSinceTimestamp("silver", "tt", ts(0))
      .select("_change_type").distinct().collect().map(_.getString(0)).toSet ==
      Set("insert", "update_preimage", "update_postimage", "delete"))
    assert(wh.changeFeedSinceTimestamp("silver", "tt", ts(2)).count() == 0)

    // RESTORE TO TIMESTAMP lands on the same state the read form shows
    wh.restoreToTimestamp("silver", "tt", ts(0))
    assert(rows(wh.table("silver", "tt")) == Seq((1L, "a"), (2L, "b")))
  }
}

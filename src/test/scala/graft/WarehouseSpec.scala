package graft

import graft.sources.Warehouse
import java.nio.file.Files

/** Warehouse generation semantics: time travel over retired
  * generations (Delta read-side parity: history ✓ compaction ✓ and now
  * tableAsOf ✓) and schema evolution on append/upsert (mergeSchema).
  */
class WarehouseSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def freshWh(keep: Int = 2) =
    new Warehouse(spark, Files.createTempDirectory("graft_whspec").toString, keep)

  test("tableAsOf reads the pre-merge snapshot after an upsert") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "dim", // version 0
      Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "payload", "v"))
    wh.upsert("silver", "dim", // version 1: update k=2, insert k=3
      Seq((2L, "b2", 2), (3L, "c", 1)).toDF("k", "payload", "v"), Seq("k"), "v")
    val now = wh.table("silver", "dim").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(now == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    val before = wh.tableAsOf("silver", "dim", 0L).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(before == Seq((1L, "a"), (2L, "b")), "version 0 must be the pre-merge table")
    // current version resolves to the live table
    assert(wh.tableAsOf("silver", "dim", 1L).count() == 3)
    // one ledger row per generation, versions strictly increasing
    val versions = wh.history("silver.dim").orderBy("version").collect().map(_.getAs[Long]("version"))
    assert(versions.toSeq == Seq(0L, 1L))
    intercept[IllegalArgumentException](wh.tableAsOf("silver", "dim", 9L))
  }

  test("keepGenerations bounds retention; oldest generations are pruned after swap") {
    import spark.implicits._
    val wh = freshWh(keep = 2)
    for (v <- 0 to 3)
      wh.createOrReplace("gold", "g", Seq((v, s"gen$v")).toDF("n", "tag"))
    // generations 2 and 1 retained, 0 pruned, 3 is live
    assert(wh.tableAsOf("gold", "g", 3L).head().getString(1) == "gen3")
    assert(wh.tableAsOf("gold", "g", 2L).head().getString(1) == "gen2")
    assert(wh.tableAsOf("gold", "g", 1L).head().getString(1) == "gen1")
    intercept[IllegalArgumentException](wh.tableAsOf("gold", "g", 0L))
    // retired generations are not tables
    assert(wh.listTables("gold") == Seq("g"))
  }

  test("restore rolls the table back to a past version and is itself restorable") {
    import spark.implicits._
    val wh = freshWh(keep = 3)
    wh.createOrReplace("silver", "r", // version 0
      Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "payload", "v"))
    wh.upsert("silver", "r", // version 1: update k=2, insert k=3
      Seq((2L, "b2", 2), (3L, "c", 1)).toDF("k", "payload", "v"), Seq("k"), "v")
    def snap = wh.table("silver", "r").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(snap == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    // version 2: back to the pre-merge state
    val rows = wh.restore("silver", "r", 0L)
    assert(rows == 2 && snap == Seq((1L, "a"), (2L, "b")))
    assert(wh.lastOperation("silver.r").get.getAs[String]("operation") == "RESTORE")
    // the pre-restore generation retired: the merge result is still readable...
    assert(wh.tableAsOf("silver", "r", 1L).count() == 3)
    // ...and a mistaken restore is undone by restoring to it
    wh.restore("silver", "r", 1L) // version 3
    assert(snap == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    assert(wh.currentVersion("silver", "r") == 3L)
    // a pruned version refuses rather than silently rebuilding from the wrong data
    intercept[IllegalArgumentException](wh.restore("silver", "r", 99L))
  }

  test("compact retires a readable generation and never deletes the live table in the swap") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "t",
      spark.range(100).select($"id", ($"id" % 7).as("grp")).repartition(20))
    val rowsBefore = wh.table("silver", "t").collect().map(_.getLong(0)).sorted.toSeq
    val delta = wh.compact("silver", "t")
    assert(delta > 0, "compaction should reduce file count")
    assert(wh.table("silver", "t").collect().map(_.getLong(0)).sorted.toSeq == rowsBefore)
    // the pre-compaction generation is time-travel readable
    assert(wh.tableAsOf("silver", "t", 0L).count() == 100)
  }

  test("change feed records exactly each merge's insert/update rows, tailable by version") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "cf", // version 0: no feed rows (a CTAS is a new base)
      Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "payload", "v"))
    wh.upsert("silver", "cf", // version 1: update k=2, lose k=1 (equal version), insert k=3
      Seq((1L, "a2", 1), (2L, "b2", 2), (3L, "c", 1)).toDF("k", "payload", "v"), Seq("k"), "v")
    wh.upsert("silver", "cf", // version 2: update k=3
      Seq((3L, "c2", 2)).toDF("k", "payload", "v"), Seq("k"), "v")
    val all = wh.changeFeed("silver", "cf")
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("payload"),
        r.getAs[String]("_change_type"), r.getAs[Long]("_commit_version"))).toSet
    assert(all == Set(
      (2L, "b", "update_preimage", 1L), // the replaced row — what a consumer subtracts
      (2L, "b2", "update_postimage", 1L),
      (3L, "c", "insert", 1L),
      (3L, "c", "update_preimage", 2L),
      (3L, "c2", "update_postimage", 2L)
    ), s"got $all") // k=1's non-winning source row must NOT appear (no pre OR post)
    // incremental tail: a consumer that saw version 1 gets only version 2
    val tail = wh.changeFeed("silver", "cf", sinceVersion = 1L)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("payload"),
        r.getAs[String]("_change_type"))).toSet
    assert(tail == Set((3L, "c", "update_preimage"), (3L, "c2", "update_postimage")))
    intercept[IllegalArgumentException](wh.changeFeed("silver", "nope"))
  }

  test("change-feed tail is a partition-pruned read, not scan-all-then-filter") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "pp", Seq((1L, "a", 1)).toDF("k", "payload", "v"))
    for (i <- 1 to 3)
      wh.upsert("silver", "pp",
        Seq((1L, s"a$i", i)).toDF("k", "payload", "v"), Seq("k"), "v")
    val plan = wh.changeFeed("silver", "pp", sinceVersion = 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_commit_part"),
      s"feed tail must prune on _commit_part, plan:\n$plan")
    // and the pruned read returns exactly the post-cursor commits
    val vs = wh.changeFeed("silver", "pp", sinceVersion = 2L)
      .select($"_commit_version").distinct().collect().map(_.getLong(0)).toSet
    assert(vs == Set(3L))
  }

  test("changeFeed migrates a legacy root-file feed layout once, keeping the pruned tail") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "lg", Seq((1L, "a", 1)).toDF("k", "payload", "v"))
    // simulate a feed written before the partitioned layout: data files
    // at the sidecar ROOT, no _commit_part directories
    val feedPath = wh.tablePath("silver", "lg") + ".__changes"
    Seq((2L, "b", "insert", 5L), (3L, "c", "insert", 6L))
      .toDF("k", "payload", "_change_type", "_commit_version")
      .write.parquet(feedPath)
    // first read migrates: full history visible with correct versions
    val all = wh.changeFeed("silver", "lg")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("_commit_version"))).toSet
    assert(all == Set((2L, 5L), (3L, 6L)))
    // root data files are gone (migration ran once, not per read)
    val fs = new org.apache.hadoop.fs.Path(feedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootFiles = fs.listStatus(new org.apache.hadoop.fs.Path(feedPath))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    assert(rootFiles.isEmpty, s"legacy files must be migrated away, found ${rootFiles.toSeq}")
    // the migrated history is partition-pruned like natively-written commits
    val tail = wh.changeFeed("silver", "lg", sinceVersion = 5L)
    assert(tail.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(tail.collect().map(_.getAs[Long]("k")).toSeq == Seq(3L))
  }

  test("incremental MV refresh from the feed equals a full recompute; cursor makes re-refresh a no-op") {
    import graft.operators.MaterializedAgg
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "fact",
      Seq((1L, 10L, 5.0, 0L), (2L, 10L, 7.0, 0L), (3L, 20L, 1.0, 0L), (4L, 20L, 2.0, 0L))
        .toDF("id", "grp", "v", "ver"))
    MaterializedAgg.build(wh, "silver", "fact", "gold", "mv", Seq("grp"), "v")
    // update id=1 (5.0 -> 8.0), insert id=5 into a NEW group, then
    // delete ALL of group 20 — its key must leave the MV entirely
    wh.upsert("silver", "fact",
      Seq((1L, 10L, 8.0, 1L), (5L, 30L, 4.0, 1L)).toDF("id", "grp", "v", "ver"),
      Seq("id"), "ver")
    wh.delete("silver", "fact", $"grp" === 20L)
    val applied = MaterializedAgg.refresh(wh, "silver", "fact", "gold", "mv", Seq("grp"), "v")
    assert(applied > 0)
    def snap = wh.table("gold", "mv")
      .collect().map(r => (r.getLong(0), r.getDecimal(1).doubleValue(), r.getLong(2))).toSet
    assert(snap == Set((10L, 15.0, 2L), (30L, 4.0, 1L)), s"got $snap")
    // and it equals the full recompute from the live table
    val full = wh.table("silver", "fact").groupBy($"grp")
      .agg(sum($"v".cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1).doubleValue(), r.getLong(2))).toSet
    assert(snap == full)
    // the cursor advanced: nothing new to apply
    assert(MaterializedAgg.refresh(wh, "silver", "fact", "gold", "mv", Seq("grp"), "v") == 0L)
  }

  test("append evolves the target schema: new columns null-backfill old rows") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "ev", Seq((1L, "a")).toDF("k", "payload"))
    // widened batch: new column `extra`
    wh.append("silver", "ev", Seq((2L, "b", "x")).toDF("k", "payload", "extra"))
    // narrowed batch: missing `payload`
    wh.append("silver", "ev", Seq((3L, "y")).toDF("k", "extra"))
    val rows = wh.table("silver", "ev").orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("payload")), Option(r.getAs[String]("extra"))))
    assert(rows.toSeq == Seq(
      (1L, Some("a"), None),
      (2L, Some("b"), Some("x")),
      (3L, None, Some("y"))))
  }

  test("upsert evolves the target schema like Delta mergeSchema") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "up", Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "payload", "v"))
    // widened source: new column `extra`; also missing nothing
    val m = wh.upsert("silver", "up",
      Seq((2L, "b2", 2, "x"), (3L, "c", 1, "y")).toDF("k", "payload", "v", "extra"),
      Seq("k"), "v")
    assert(m.inserted == 1 && m.updated == 1)
    val rows = wh.table("silver", "up").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getAs[String]("extra"))))
    assert(rows.toSeq == Seq(
      (1L, "a", None),       // old row: evolved column null-backfilled
      (2L, "b2", Some("x")), // updated from widened source
      (3L, "c", Some("y")))) // inserted from widened source
    // a source missing a tracked column is tolerated (null-backfilled)
    wh.upsert("silver", "up", Seq((4L, 1)).toDF("k", "v"), Seq("k"), "v")
    val r4 = wh.table("silver", "up").filter($"k" === 4L).head()
    assert(r4.isNullAt(r4.fieldIndex("payload")) && r4.isNullAt(r4.fieldIndex("extra")))
  }

  test("delete removes matching rows, records them in the change feed, keeps the old generation") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "d",
      Seq((1L, "keep"), (2L, "drop"), (3L, "keep"), (4L, "drop")).toDF("k", "tag"))
    val n = wh.delete("silver", "d", $"tag" === "drop")
    assert(n == 2)
    assert(wh.table("silver", "d").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // CDC: consumers must see deletions to forget the rows downstream
    val feed = wh.changeFeed("silver", "d")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("_change_type"))).toSet
    assert(feed == Set((2L, "delete"), (4L, "delete")))
    // pre-delete snapshot retained; ledger records the op
    assert(wh.tableAsOf("silver", "d", 0L).count() == 4)
    assert(wh.lastOperation("silver.d").get.getAs[String]("operation") == "DELETE")
  }

  test("update rewrites matching rows in place with both feed images") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "u",
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0)).toDF("k", "tag", "v"))
    val n = wh.update("silver", "u", $"tag" === "a",
      Map("v" -> ($"v" * 2), "tag" -> lit("A")))
    assert(n == 2)
    val rows = wh.table("silver", "u").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, "A", 20.0), (2L, "b", 20.0), (3L, "A", 60.0)))
    val feed = wh.changeFeed("silver", "u")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Double]("v"),
        r.getAs[String]("_change_type"))).toSet
    assert(feed == Set(
      (1L, 10.0, "update_preimage"), (1L, 20.0, "update_postimage"),
      (3L, 30.0, "update_preimage"), (3L, 60.0, "update_postimage")))
    assert(wh.lastOperation("silver.u").get.getAs[String]("operation") == "UPDATE")
    // unknown assignment column refused; schema unchanged by casts
    intercept[IllegalArgumentException] {
      wh.update("silver", "u", $"tag" === "A", Map("nope" -> lit(1)))
    }
  }

  test("zorder shrinks per-file min/max spans on every clustered dimension") {
    import spark.implicits._
    val wh = freshWh()
    // two independent uniform dims; natural layout sorted by a — the
    // worst case for predicates on b (every file spans b's full range)
    val n  = 100000L
    val df = spark.range(n).select(
      ($"id" % 1000).as("a"),
      pmod(xxhash64($"id"), lit(1000)).as("b"))
    wh.createOrReplace("gold", "z", df.orderBy("a").repartitionByRange(16, $"a"))
    def avgSpan(colName: String): Double = {
      val spans = wh.table("gold", "z")
        .groupBy(input_file_name())
        .agg((max(col(colName)) - min(col(colName))).as("span"))
        .collect().map(_.getAs[Long]("span").toDouble)
      spans.sum / spans.length
    }
    val naiveB = avgSpan("b")
    assert(naiveB > 900, s"sorted-by-a layout should span b fully per file, got $naiveB")
    wh.zorder("gold", "z", Seq("a", "b"), targetRowsPerFile = n / 16)
    // values untouched, layout only
    assert(wh.table("gold", "z").count() == n)
    val (za, zb) = (avgSpan("a"), avgSpan("b"))
    info(f"per-file avg span after zorder: a=$za%.0f b=$zb%.0f (naive b=$naiveB%.0f)")
    // a 16-file z-layout ~ 4x4 grid: each dim's span ~ range/4; allow 2x slack
    assert(zb < naiveB / 2, s"zorder must shrink b's per-file span ($naiveB -> $zb)")
    assert(za < 1000 / 2, s"zorder must keep a's per-file span bounded too ($za)")
    // the rewrite is a ledger op and the pre-zorder generation is readable
    assert(wh.lastOperation("gold.z").get.getAs[String]("operation") == "ZORDER")
    assert(wh.tableAsOf("gold", "z", 0L).count() == n)
  }

  test("fixture-once DML queries (q80/q82/q83/q84) are call-invariant within a session") {
    // the bench times these repeatedly against session-memoized base
    // tables; the second call's merge loses by version rule / deletes
    // nothing / nets the MV to zero / repriced-flag gates the update —
    // output must be identical
    for (q <- Seq(
        QueriesRel2.q80_change_feed _,
        QueriesRel2.q82_delete_rows _,
        QueriesRel2.q83_incremental_mv _,
        QueriesRel2.q84_update_rows _)) {
      val a = q(spark, sfDir).collect().map(_.toSeq).toSeq
      val b = q(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(a.nonEmpty && a == b, "repeated call must reproduce the first call's output exactly")
    }
  }

  test("schema evolution refuses a column type change") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "tc", Seq((1L, 10)).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      wh.append("silver", "tc", Seq((2L, "not an int")).toDF("k", "v"))
    }
  }
}

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

  test("maintenance ops (compact, zorder, incremental zorder) are invisible to the change feed") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "mi",
      (0L until 400L).map(i => (i, i % 7, 1)).toDF("k", "g", "v")
        .repartition(8))
    wh.upsert("silver", "mi", // version 1: the only DML — the only feed source
      Seq((1L, 5L, 2), (500L, 2L, 1)).toDF("k", "g", "v"), Seq("k"), "v")
    def feed() = wh.changeFeed("silver", "mi")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("_change_type"),
        r.getAs[Long]("_commit_version"))).toSet
    val feedAfterDml = feed()
    assert(feedAfterDml.nonEmpty)
    val sumBefore = wh.table("silver", "mi").agg(sum($"g")).head().getLong(0)
    // layout-only rewrites: none may write feed rows — a CDF consumer
    // (incremental MV, downstream sync) must see zero changes from them
    assert(wh.compact("silver", "mi", targetRowsPerFile = 100L) > 0L)
    assert(wh.zorder("silver", "mi", Seq("g"), targetRowsPerFile = 100L) > 0L)
    // append is feed-invisible by the documented CDF contract (a base
    // extension, not a change a consumer could have seen differently);
    // it also plants the wide-span file the incremental pass rewrites
    val tail    = (600L until 650L).map(j => (j, j % 7, 1)).toDF("k", "g", "v").coalesce(1)
    val tailSum = (600L until 650L).map(_ % 7).sum
    wh.append("silver", "mi", tail)
    assert(wh.zorderIncremental("silver", "mi", Seq("g"), spanThreshold = 0.5,
      targetRowsPerFile = 100L) > 0L)
    assert(feed() == feedAfterDml,
      "a maintenance op leaked rows into the change feed")
    assert(wh.table("silver", "mi").agg(sum($"g")).head().getLong(0) == sumBefore + tailSum)
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
    // versions 0..6 so the fabricated legacy feed rows (versions 5, 6)
    // sit at or below the committed ledger version — feed partitions
    // BEYOND the ledger are phantom by definition and hidden/purged
    for (i <- 0 to 6)
      wh.createOrReplace("silver", "lg", Seq((1L, s"a$i", 1)).toDF("k", "payload", "v"))
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
        QueriesRel2.q84_update_rows _,
        QueriesRel2.q94_delete_partitioned _,
        QueriesRel2.q95_update_partitioned _,
        QueriesRel2.q96_merge_partitioned _,
        QueriesRel2.q97_feed_partitioned _,
        QueriesRel2.q98_data_skipping _,
        QueriesRel2.q101_incremental_mv_partitioned _)) {
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

  // ---- partition-scoped DML ----

  private def hfs =
    new org.apache.hadoop.fs.Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (path, length, mtime) of every file under `path` — byte-identity
    * evidence for the untouched-partition contract.
    */
  private def sig(path: String): Seq[(String, Long, Long)] = {
    def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long, Long)] =
      if (!hfs.exists(p)) Seq.empty
      else
        hfs.listStatus(p).toSeq.flatMap { s =>
          if (s.isDirectory) walk(s.getPath)
          else Seq((s.getPath.toString, s.getLen, s.getModificationTime))
        }
    walk(new org.apache.hadoop.fs.Path(path)).sortBy(_._1)
  }

  test("partitioned delete rewrites only touched partitions; untouched files byte-identical") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplacePartitioned("silver", "pd",
      Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C")).toDF("k", "seg"), Seq("seg"))
    val beforeB = sig(wh.tablePath("silver", "pd") + "/seg=B")
    val beforeC = sig(wh.tablePath("silver", "pd") + "/seg=C")
    assert(beforeB.nonEmpty && beforeC.nonEmpty)
    val n = wh.delete("silver", "pd", $"k" === 2L)
    assert(n == 1)
    assert(wh.table("silver", "pd").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 4L))
    // the op rewrote seg=A only: B and C files are the SAME files
    assert(sig(wh.tablePath("silver", "pd") + "/seg=B") == beforeB)
    assert(sig(wh.tablePath("silver", "pd") + "/seg=C") == beforeC)
    // CDC + ledger + overlay time travel all cover the partitioned path
    val feed = wh.changeFeed("silver", "pd")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("_change_type"))).toSet
    assert(feed == Set((2L, "delete")))
    assert(wh.lastOperation("silver.pd").get.getAs[String]("operation") == "DELETE")
    assert(wh.tableAsOf("silver", "pd", 0L).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L, 4L))
  }

  test("high-cardinality touched set: semi-join prune path ≡ inline predicate on every partitioned DML") {
    import spark.implicits._
    // 40 partitions, every one touched — force the threshold to 0 so
    // the touched set rides as a broadcast DataFrame (the 10⁵-dir
    // shape where a literal InSet would bloat every task's plan), then
    // re-run the same ops under the default inline path and pin
    // equality
    def mk(wh: graft.sources.Warehouse): Unit =
      wh.createOrReplacePartitioned("silver", "hc",
        (1L to 120L).map(k => (k, k % 3, s"p${k % 40}")).toDF("k", "v", "seg"), Seq("seg"))
    def runOps(wh: graft.sources.Warehouse): Seq[(Long, Long, String)] = {
      assert(wh.delete("silver", "hc", $"k" % 5L === 0L) == 24L)
      wh.update("silver", "hc", $"k" % 7L === 0L, Map("v" -> lit(99L)))
      wh.upsert("silver", "hc",
        Seq((1L, 50L, "p1"), (200L, 7L, "pNew")).toDF("k", "v", "seg"),
        Seq("k", "seg"), "v")
      wh.table("silver", "hc")
        .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("v"), r.getAs[String]("seg")))
        .sortBy(t => (t._1, t._3)).toSeq
    }
    val whA = freshWh()
    mk(whA)
    val saved = whA.inlineTouchedThreshold
    val joined =
      try { whA.inlineTouchedThreshold = 0; runOps(whA) }
      finally whA.inlineTouchedThreshold = saved
    val whB = freshWh()
    mk(whB)
    val inline = runOps(whB)
    assert(joined == inline, "prune representations must be result-identical")
    assert(joined.exists(_._3 == "pNew") && joined.count(_._2 == 99L) > 0)
  }

  test("partitioned delete that empties a partition retires its directory") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplacePartitioned("silver", "pe",
      Seq((1L, "A"), (2L, "B")).toDF("k", "seg"), Seq("seg"))
    assert(wh.delete("silver", "pe", $"seg" === "A") == 1)
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(wh.tablePath("silver", "pe"), "seg=A")),
      "an emptied partition's directory must retire, not linger")
    assert(wh.table("silver", "pe").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((2L, "B")))
  }

  test("partitioned merge moves rows across partitions and creates partitions, no duplication") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplacePartitioned("silver", "pm",
      Seq((1L, "a1", 0L, "A"), (2L, "b1", 0L, "B"), (3L, "c1", 0L, "D"))
        .toDF("k", "payload", "v", "seg"),
      Seq("seg"))
    val beforeD = sig(wh.tablePath("silver", "pm") + "/seg=D")
    // k=1 moves A -> B; k=9 inserts into a NEW partition C; D untouched
    val m = wh.upsert("silver", "pm",
      Seq((1L, "a2", 1L, "B"), (9L, "i1", 1L, "C")).toDF("k", "payload", "v", "seg"),
      Seq("k"), "v")
    assert(m.inserted == 1 && m.updated == 1)
    val rows = wh.table("silver", "pm")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("payload"), r.getAs[String]("seg")))
      .sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a2", "B"), (2L, "b1", "B"), (3L, "c1", "D"), (9L, "i1", "C")),
      s"got $rows") // k=1 must exist ONCE, in its new partition
    assert(sig(wh.tablePath("silver", "pm") + "/seg=D") == beforeD, "untouched partition rewritten")
    assert(wh.tableAsOf("silver", "pm", 0L).collect().map(_.getAs[Long]("k")).sorted.toSeq
      == Seq(1L, 2L, 3L))
  }

  test("partitioned update rewrites touched partitions in place; partition assignment refused") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplacePartitioned("silver", "pu",
      Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "A")).toDF("k", "x", "seg"), Seq("seg"))
    val beforeB = sig(wh.tablePath("silver", "pu") + "/seg=B")
    val n = wh.update("silver", "pu", $"seg" === "A" && $"k" =!= 1L, Map("x" -> ($"x" * 2)))
    assert(n == 1)
    val rows = wh.table("silver", "pu")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Double]("x"))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, 10.0), (2L, 20.0), (3L, 60.0)))
    assert(sig(wh.tablePath("silver", "pu") + "/seg=B") == beforeB)
    val feed = wh.changeFeed("silver", "pu")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Double]("x"),
        r.getAs[String]("_change_type"))).toSet
    assert(feed == Set((3L, 30.0, "update_preimage"), (3L, 60.0, "update_postimage")))
    intercept[IllegalArgumentException] {
      wh.update("silver", "pu", $"k" === 1L, Map("seg" -> lit("B")))
    }
  }

  test("zero-padded partition spellings retire under inference (day=05 read as int 5)") {
    import spark.implicits._
    val wh = freshWh()
    // a STRING source column whose values are zero-padded digits: the
    // writer lays out day=05, the reader infers int 5 — the spelling
    // does not round-trip through values, only through the dir listing
    wh.createOrReplacePartitioned("silver", "zp",
      Seq((1L, "05"), (2L, "05"), (3L, "06")).toDF("k", "day"), Seq("day"))
    assert(hfs.exists(new org.apache.hadoop.fs.Path(wh.tablePath("silver", "zp"), "day=05")))
    val n = wh.delete("silver", "zp", $"k" === 1L)
    assert(n == 1)
    val rows = wh.table("silver", "zp")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Number]("day").intValue())).sortBy(_._1).toSeq
    // the old day=05 directory must have retired: k=2 appears ONCE and
    // k=1 is gone (the compute-the-name design left both alive: k=1
    // undeleted and k=2 duplicated)
    assert(rows == Seq((2L, 5), (3L, 6)), s"got $rows")
  }

  test("no-op DML logs a zero-metric commit, rewrites nothing, and folds on time travel") {
    import spark.implicits._
    val wh = freshWh()
    // partitioned table: a losing merge re-run must leave EVERY
    // partition file byte-identical (no touched-slice rewrite, no
    // empty feed partition, no retired generation) while still
    // recording a MERGE 0/0 ledger commit — Delta logs a MERGE commit
    // even at zero changed rows, and the reference reads DESCRIBE
    // HISTORY after every run
    wh.createOrReplacePartitioned("silver", "np", // version 0
      Seq((1L, "a", 1L, "A"), (2L, "b", 1L, "B")).toDF("k", "payload", "v", "seg"), Seq("seg"))
    val src = Seq((1L, "a2", 2L, "A"), (3L, "c", 2L, "B")).toDF("k", "payload", "v", "seg")
    val m1  = wh.upsert("silver", "np", src, Seq("k"), "v") // version 1: real merge
    assert(m1.inserted == 1 && m1.updated == 1)
    val before     = sig(wh.tablePath("silver", "np"))
    val feedBefore = sig(wh.tablePath("silver", "np") + ".__changes")
    val m2         = wh.upsert("silver", "np", src, Seq("k"), "v") // version 2: loses by version rule
    assert(m2.inserted == 0 && m2.updated == 0)
    assert(sig(wh.tablePath("silver", "np")) == before,
      "a zero-change merge must not rewrite any partition file")
    assert(sig(wh.tablePath("silver", "np") + ".__changes") == feedBefore,
      "a zero-change merge must not write feed rows or an empty feed partition")
    val last = wh.lastOperation("silver.np").get
    assert(last.getAs[String]("operation") == "MERGE")
    assert(last.getAs[Long]("version") == 2L)
    assert(last.getAs[Long]("num_inserted") == 0L && last.getAs[Long]("num_updated") == 0L)
    // the no-op version folds into its predecessor: both read the live
    // table, and the version BEFORE the no-op stays reconstructable
    assert(wh.tableAsOf("silver", "np", 2L).count() == 3)
    assert(wh.tableAsOf("silver", "np", 1L).count() == 3)
    assert(wh.tableAsOf("silver", "np", 0L).count() == 2)

    // unpartitioned: delete/update with zero matches follow the SAME
    // convention — zero-metric commit with a version bump, no rewrite
    wh.createOrReplace("silver", "nu", Seq((1L, "x"), (2L, "y")).toDF("k", "tag")) // v0
    val liveBefore = sig(wh.tablePath("silver", "nu"))
    assert(wh.delete("silver", "nu", $"tag" === "absent") == 0L) // v1
    assert(wh.update("silver", "nu", $"tag" === "absent", Map("tag" -> lit("z"))) == 0L) // v2
    assert(sig(wh.tablePath("silver", "nu")) == liveBefore, "no-op DML must not rewrite")
    val ops = wh.history("silver.nu").orderBy("version").collect()
      .map(r => (r.getAs[Long]("version"), r.getAs[String]("operation"),
        r.getAs[Long]("num_deleted"), r.getAs[Long]("num_updated"))).toSeq
    assert(ops == Seq((0L, "CREATE OR REPLACE", 0L, 0L),
      (1L, "DELETE", 0L, 0L), (2L, "UPDATE", 0L, 0L)))
    // time travel folds through the trailing no-ops to the live table
    for (v <- 0L to 2L) assert(wh.tableAsOf("silver", "nu", v).count() == 2)
    // a real delete logs num_deleted (Delta's numDeletedRows) — the
    // metric that distinguishes a rewrite from a no-op in the ledger
    assert(wh.delete("silver", "nu", $"tag" === "x") == 1L) // v3: real rewrite
    assert(wh.lastOperation("silver.nu").get.getAs[Long]("num_deleted") == 1L)
    // pre-rewrite state is retained; the no-op versions fold into it
    for (v <- 0L to 2L)
      assert(wh.tableAsOf("silver", "nu", v).count() == 2, s"version $v must fold to the v0 snapshot")
    assert(wh.tableAsOf("silver", "nu", 3L).count() == 1)
  }

  test("decimal-spelled partition directories (x=1.50) retire under inference") {
    import spark.implicits._
    val wh   = freshWh()
    val root = wh.tablePath("silver", "dp")
    // externally-written layout with trailing-zero decimal spellings
    Seq((1L, "a")).toDF("k", "payload").write.parquet(s"$root/x=1.50")
    Seq((2L, "b")).toDF("k", "payload").write.parquet(s"$root/x=2.50")
    hfs.createNewFile(new org.apache.hadoop.fs.Path(root, "_SUCCESS"))
    val n = wh.delete("silver", "dp", $"k" === 1L)
    assert(n == 1)
    val rows = wh.table("silver", "dp").collect().map(_.getAs[Long]("k")).toSeq
    assert(rows == Seq(2L), s"got $rows")
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(root, "x=1.50")),
      "the touched spelled directory must retire")
  }

  test("chaos: whole-table swap crash at every failpoint rolls back to the committed version") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "cw", // version 0
      Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("k", "payload", "v"))
    def snap = wh.table("silver", "cw").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val v0 = Seq((1L, "a"), (2L, "b"))
    for (point <- Seq("after-stage-write", "after-retire", "after-swap")) {
      wh.failpoint = point
      val e = intercept[RuntimeException] {
        wh.upsert("silver", "cw",
          Seq((2L, "b2", 1L), (3L, "c", 1L)).toDF("k", "payload", "v"), Seq("k"), "v")
      }
      assert(e.getMessage.contains(point))
      // phantom feed rows (written before the swap) are invisible
      assert(wh.changeFeed("silver", "cw").count() == 0, s"phantom feed rows after $point")
      assert(wh.repairCrashedSwap("silver", "cw"), s"nothing repaired after $point")
      assert(snap == v0, s"table corrupted by crash at $point")
      assert(wh.currentVersion("silver", "cw") == 0L)
    }
    // the retried op lands cleanly, feed holds exactly one copy
    val m = wh.upsert("silver", "cw",
      Seq((2L, "b2", 1L), (3L, "c", 1L)).toDF("k", "payload", "v"), Seq("k"), "v")
    assert(m.inserted == 1 && m.updated == 1)
    assert(snap == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    val feed = wh.changeFeed("silver", "cw")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("_change_type"))).toSeq
    assert(feed.sorted == Seq((2L, "update_postimage"), (2L, "update_preimage"),
      (3L, "insert")), s"feed must hold exactly one copy, got $feed")
  }

  test("chaos: partitioned swap crash rolls back, including insert-created partitions") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplacePartitioned("silver", "cp",
      Seq((1L, "a", 0L, "A"), (2L, "b", 0L, "B")).toDF("k", "payload", "v", "seg"), Seq("seg"))
    def snap = wh.table("silver", "cp").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[String]("seg"))).toSeq
    val v0   = Seq((1L, "a", "A"), (2L, "b", "B"))
    val segC = new org.apache.hadoop.fs.Path(wh.tablePath("silver", "cp"), "seg=C")
    for (point <- Seq("after-stage-write", "after-retire", "after-swap")) {
      wh.failpoint = point
      intercept[RuntimeException] {
        wh.upsert("silver", "cp",
          Seq((1L, "a2", 1L, "A"), (9L, "i", 1L, "C")).toDF("k", "payload", "v", "seg"),
          Seq("k"), "v")
      }
      assert(wh.changeFeed("silver", "cp").count() == 0, s"phantom feed rows after $point")
      assert(wh.repairCrashedSwap("silver", "cp"), s"nothing repaired after $point")
      assert(snap == v0, s"table corrupted by crash at $point")
      assert(!hfs.exists(segC),
        s"insert-created partition must roll back after crash at $point")
    }
    val m = wh.upsert("silver", "cp",
      Seq((1L, "a2", 1L, "A"), (9L, "i", 1L, "C")).toDF("k", "payload", "v", "seg"),
      Seq("k"), "v")
    assert(m.inserted == 1 && m.updated == 1)
    assert(snap == Seq((1L, "a2", "A"), (2L, "b", "B"), (9L, "i", "C")))
    assert(wh.changeFeed("silver", "cp").count() == 3) // one pre, one post, one insert
  }

  test("overlay time travel reconstructs versions across sparse generations; vacuumed refuses") {
    import spark.implicits._
    val wh = freshWh(keep = 5)
    wh.createOrReplacePartitioned("silver", "ot", // version 0
      Seq((1L, 10.0, "A"), (2L, 20.0, "A"), (3L, 30.0, "B")).toDF("k", "x", "seg"), Seq("seg"))
    wh.delete("silver", "ot", $"k" === 2L)                         // version 1 (touches A)
    wh.update("silver", "ot", $"k" === 3L, Map("x" -> ($"x" * 2))) // version 2 (touches B)
    def at(v: Long) = wh.tableAsOf("silver", "ot", v)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Double]("x"))).sortBy(_._1).toSeq
    assert(at(2L) == Seq((1L, 10.0), (3L, 60.0)))
    assert(at(1L) == Seq((1L, 10.0), (3L, 30.0)), "v1 = post-delete, pre-update overlay")
    assert(at(0L) == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)), "v0 = both sparse overlays")
    // vacuumed: keep=1 prunes the sparse pre-images — refuse, never
    // silently serve too-new data
    val wv = freshWh(keep = 1)
    wv.createOrReplacePartitioned("silver", "ov",
      Seq((1L, "A"), (2L, "B")).toDF("k", "seg"), Seq("seg"))
    wv.delete("silver", "ov", $"k" === 1L)
    wv.delete("silver", "ov", $"k" === 2L)
    intercept[IllegalArgumentException](wv.tableAsOf("silver", "ov", 0L))
  }

  test("append to a partitioned table keeps the hive layout") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplacePartitioned("silver", "pa",
      Seq((1L, "A")).toDF("k", "seg"), Seq("seg"))
    wh.append("silver", "pa", Seq((2L, "B")).toDF("k", "seg"))
    assert(wh.partitionColumns("silver", "pa") == Seq("seg"))
    assert(wh.table("silver", "pa").collect().map(r => (r.getLong(0), r.getAs[String]("seg")))
      .sortBy(_._1).toSeq == Seq((1L, "A"), (2L, "B")))
  }

  test("scanPruned reads a strict file subset after zorder, values exact; stale stats recompute") {
    import spark.implicits._
    val wh = freshWh()
    val n  = 100000L
    val df = spark.range(n).select(
      ($"id" % 1000).as("a"),
      pmod(xxhash64($"id"), lit(1000)).as("b"))
    // worst-case layout for predicates on b: sorted by a
    wh.createOrReplace("gold", "sk", df.orderBy("a").repartitionByRange(16, $"a"))
    wh.zorder("gold", "sk", Seq("a", "b"), targetRowsPerFile = n / 16)
    wh.collectStats("gold", "sk", Seq("a", "b"))
    val allFiles = wh.table("gold", "sk").inputFiles.length
    val pruned   = wh.scanPruned("gold", "sk", "b", 100L, 150L)
    assert(pruned.inputFiles.length < allFiles,
      s"selective range must skip files (${pruned.inputFiles.length} of $allFiles read)")
    val expect = wh.table("gold", "sk").filter($"b".between(100L, 150L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq == expect)
    // rewrite invalidates: stats recompute automatically, result stays exact
    wh.compact("gold", "sk", targetRowsPerFile = n / 4)
    val after = wh.scanPruned("gold", "sk", "b", 100L, 150L)
    assert(after.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq == expect)
    // empty-range fast path
    assert(wh.scanPruned("gold", "sk", "b", 5000L, 6000L).count() == 0)
  }

  test("scanPrunedEq blooms a strict file subset for point lookups, values exact; stale recompute") {
    import spark.implicits._
    val wh = freshWh()
    val n  = 100000L
    // high-cardinality unique key in RANDOM layout: every file's
    // [min, max] span covers any probe, so range stats prune nothing --
    // exactly the case bloom skipping exists for
    val df = spark.range(n).select(
      xxhash64($"id").as("key"),
      ($"id" % 97).as("payload"))
    wh.createOrReplace("gold", "bl", df.repartition(20))
    wh.collectStats("gold", "bl", Seq("key"))
    wh.collectBloom("gold", "bl", "key")
    val allFiles = wh.table("gold", "bl").inputFiles.length
    assert(allFiles >= 20)
    val probes = Seq(5L, 4242L, 77777L).map { id =>
      spark.range(id, id + 1).select(xxhash64($"id")).head().getLong(0)
    }
    // min/max stats are useless here (probe inside every file's span)...
    val ranged = wh.scanPruned("gold", "bl", "key", probes.min, probes.min)
    assert(ranged.inputFiles.length == allFiles,
      "random layout should defeat range stats (else this spec tests nothing)")
    // ...the bloom prunes hard: 3 keys live in at most 3 files (+ rare FPs)
    val pruned = wh.scanPrunedEq("gold", "bl", "key", probes)
    assert(pruned.inputFiles.length < allFiles / 2,
      s"bloom must skip most files (${pruned.inputFiles.length} of $allFiles read)")
    val expect = wh.table("gold", "bl").filter($"key".isin(probes: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(expect.length == 3)
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq == expect)
    // an Int literal probing a bigint column must hash like the build did
    val intProbe = wh.scanPrunedEq("gold", "bl", "payload", Seq(42))
    assert(intProbe.count() == wh.table("gold", "bl").filter($"payload" === 42).count())
    // rewrite invalidates: the sidecar recomputes, result stays exact
    wh.compact("gold", "bl", targetRowsPerFile = n / 4)
    val after = wh.scanPrunedEq("gold", "bl", "key", probes)
    assert(after.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq == expect)
    // absent key: typically zero files survive, always zero rows
    assert(wh.scanPrunedEq("gold", "bl", "key", Seq(-1L)).count() == 0)
  }

  test("DataFrame-keyed scanPrunedEq + deleteMorKeys: a request list too big for isin, never collected") {
    import spark.implicits._
    val wh = freshWh()
    val n  = 100000L
    val df = spark.range(n).select(
      xxhash64($"id").as("key"),
      ($"id" % 97).as("payload"))
    wh.createOrReplace("gold", "blk", df.repartition(20))
    wh.collectBloom("gold", "blk", "key")
    val allFiles = wh.table("gold", "blk").inputFiles.length

    // 5000 keys — far past any sane isin literal list — as a DataFrame
    val keys = spark.range(0, n, 20).select(xxhash64($"id").as("key"))
    val pruned = wh.scanPrunedEq("gold", "blk", "key", keys)
    val expect = wh.table("gold", "blk")
      .join(keys, Seq("key"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(expect.length == 5000)
    assert(pruned.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq == expect)

    // a FEW DataFrame keys must still prune hard, like the literal form
    val few = spark.range(5, 6).select(xxhash64($"id").as("key"))
    val fewScan = wh.scanPrunedEq("gold", "blk", "key", few)
    assert(fewScan.inputFiles.length < allFiles / 2,
      s"bloom must skip most files (${fewScan.inputFiles.length} of $allFiles read)")
    assert(fewScan.count() == 1)

    // null keys match nothing; an all-null key frame scans nothing
    val withNull = few.unionByName(Seq(Option.empty[Long]).toDF("key"))
    assert(wh.scanPrunedEq("gold", "blk", "key", withNull).count() == 1)
    assert(wh.scanPrunedEq("gold", "blk", "key",
      Seq(Option.empty[Long]).toDF("key")).count() == 0)

    // the semi-join delete forgets exactly the request, O(matched) tombstones
    val deleted = wh.deleteMorKeys("gold", "blk", "key", keys)
    assert(deleted == 5000L)
    assert(wh.table("gold", "blk").count() == n - 5000)
    assert(wh.table("gold", "blk").join(keys, Seq("key"), "left_semi").count() == 0)
    // re-run: nothing left to forget, unified no-op convention
    assert(wh.deleteMorKeys("gold", "blk", "key", keys) == 0L)
  }

  test("sidecar refresh after COW DML is incremental: carried files keep their rows verbatim") {
    import spark.implicits._
    val wh = freshWh(keep = 3)
    val base = spark.range(0, 4000).select($"id".as("k"), ($"id" % 7).cast("long").as("v"))
      .coalesce(1).sortWithinPartitions($"k")
    val prevMax = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", 1000L)
    try wh.createOrReplace("gold", "inc", base)
    finally prevMax match {
      case Some(vv) => spark.conf.set("spark.sql.files.maxRecordsPerFile", vv)
      case None     => spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }
    wh.collectStats("gold", "inc", Seq("k"))
    wh.collectBloom("gold", "inc", "k")
    val statsP = wh.tablePath("gold", "inc") + ".__stats"
    val bloomP = wh.tablePath("gold", "inc") + ".__bloom_k"
    // doctor the stats row of a file the delete will NOT touch: widen
    // its min conservatively — a full recompute would erase this marker,
    // verbatim retention preserves it
    val doctored = spark.read.parquet(statsP).collect().map { r =>
      val f = r.getAs[String]("file")
      if (r.getAs[Long]("min_k") == 2000L) (f, -999999L, r.getAs[Long]("max_k"))
      else (f, r.getAs[Long]("min_k"), r.getAs[Long]("max_k"))
    }.toSeq
    assert(doctored.exists(_._2 == -999999L), "expected a file starting at k=2000")
    val tmp = doctored.toDF("file", "min_k", "max_k")
    tmp.write.mode("overwrite").parquet(statsP + ".__doctor")
    spark.read.parquet(statsP + ".__doctor").write.mode("overwrite").parquet(statsP)
    // capture the bloom row of the same carried file
    val carriedFile = doctored.find(_._2 == -999999L).get._1
    val bloomBefore = spark.read.parquet(bloomP)
      .filter($"file" === carriedFile).select($"m", $"k", $"bitmap").head()

    // COW delete hits only the first range file; 3 files carry over
    assert(wh.delete("gold", "inc", $"k" < 500) == 500L)

    // stale sidecars refresh incrementally inside the pruned scans
    val expect = wh.table("gold", "inc").filter($"k".between(2100, 2200))
      .collect().map(_.getLong(0)).sorted.toSeq
    val got = wh.scanPruned("gold", "inc", "k", 2100, 2200)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expect && expect.length == 101)
    val statsAfter = spark.read.parquet(statsP).collect()
      .map(r => r.getAs[String]("file") -> r.getAs[Long]("min_k")).toMap
    assert(statsAfter(carriedFile) == -999999L,
      "carried file's doctored stats row must survive verbatim (no recompute)")
    assert(statsAfter.size == wh.table("gold", "inc").inputFiles.length,
      "sidecar must cover exactly the current files")
    assert(statsAfter.values.exists(_ >= 500L), "the rewritten file gets a fresh row")

    val probe = wh.scanPrunedEq("gold", "inc", "k", Seq(2150L))
    assert(probe.collect().map(_.getLong(0)).toSeq == Seq(2150L))
    val bloomAfter = spark.read.parquet(bloomP)
      .filter($"file" === carriedFile).select($"m", $"k", $"bitmap").head()
    assert(bloomAfter == bloomBefore,
      "carried file's bloom row must survive verbatim (no recompute)")

    // edge: an UPDATE touching EVERY file leaves zero retained rows —
    // the refresh degenerates to a full rebuild and stays exact
    assert(wh.update("gold", "inc", $"k" >= 0L, Map("v" -> ($"v" + 1L))) == 3500L)
    val expect2 = wh.table("gold", "inc").filter($"k".between(2100, 2200))
      .collect().map(_.getLong(0)).sorted.toSeq
    val got2 = wh.scanPruned("gold", "inc", "k", 2100, 2200)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got2 == expect2 && expect2.length == 101)
    val statsAll = spark.read.parquet(statsP).collect()
      .map(r => r.getAs[String]("file") -> r.getAs[Long]("min_k")).toMap
    assert(statsAll.size == wh.table("gold", "inc").inputFiles.length)
    assert(!statsAll.values.exists(_ == -999999L),
      "all files rewritten: the doctored row must be gone (fresh profile)")
  }

  test("explicit vacuum drops retired generations; detail reports physical facts") {
    import spark.implicits._
    val wh = freshWh(keep = 3)
    for (v <- 0 to 3)
      wh.createOrReplace("gold", "vd", Seq((v, s"gen$v")).toDF("n", "tag"))
    val d0 = wh.detail("gold", "vd").head()
    assert(d0.getAs[String]("name") == "gold.vd")
    assert(d0.getAs[Long]("num_files") > 0 && d0.getAs[Long]("size_in_bytes") > 0)
    assert(d0.getAs[String]("partition_columns").isEmpty)
    assert(d0.getAs[Long]("retained_generations") == 3L)
    assert(d0.getAs[Long]("current_version") == 3L)
    // drop all but the newest retired generation, NOW
    assert(wh.vacuum("gold", "vd", retainGenerations = 1) == 2L)
    assert(wh.lastOperation("gold.vd").get.getAs[String]("operation") == "VACUUM")
    assert(wh.detail("gold", "vd").head().getAs[Long]("retained_generations") == 1L)
    // the retained snapshot still reads; vacuumed ones refuse
    assert(wh.tableAsOf("gold", "vd", 2L).head().getString(1) == "gen2")
    intercept[IllegalArgumentException](wh.tableAsOf("gold", "vd", 1L))
    intercept[IllegalArgumentException](wh.tableAsOf("gold", "vd", 0L))
    // the VACUUM commit itself folds on time travel (it rewrote nothing):
    // version 3 (pre-vacuum live state) still resolves through it
    assert(wh.tableAsOf("gold", "vd", 3L).head().getString(1) == "gen3")
    // partitioned table reports its partition columns
    wh.createOrReplacePartitioned("silver", "vp",
      Seq((1L, "a", "p0"), (2L, "b", "p1")).toDF("k", "v", "pt"), Seq("pt"))
    val dp = wh.detail("silver", "vp").head()
    assert(dp.getAs[String]("partition_columns") == "pt")
    assert(dp.getAs[Long]("num_files") >= 2)
  }

  test("incremental zorder rewrites only wide-span files; clustered files byte-copy") {
    import spark.implicits._
    val wh = freshWh()
    val n  = 40000L
    // clustered base: 4 range files, each covering a thin slice of k
    wh.createOrReplace("gold", "zi",
      spark.range(n).select($"id".as("k"), ($"id" % 7).as("v"))
        .repartitionByRange(4, $"k").sortWithinPartitions("k"))
    // an append tail spanning the WHOLE key range (the daily-ingest shape)
    wh.append("gold", "zi",
      spark.range(0, n, 10).select($"id".as("k"), lit(9L).as("v")).repartition(1))
    def fileNames() = wh.table("gold", "zi").inputFiles.map(_.split('/').last).toSet
    val before    = fileNames()
    val thinFiles = before.size - 1
    // the health gauge flags exactly the wide append file pre-rewrite
    val h0 = wh.clusterHealth("gold", "zi", Seq("k"), spanThreshold = 0.5).head()
    assert(h0.getAs[Long]("wide_files") == 1L)
    assert(h0.getAs[Double]("max_span_frac") > 0.9)
    // file target sized so the rewritten tail splits into ~4 range
    // files (each a thin span); the carried base files keep their size
    val rewritten = wh.zorderIncremental("gold", "zi", Seq("k"),
      spanThreshold = 0.5, targetRowsPerFile = n / 40)
    assert(rewritten == 1L, s"only the wide append file should rewrite, got $rewritten")
    // the 4 clustered files byte-copied under their original names
    assert(before.intersect(fileNames()).size == thinFiles)
    assert(wh.table("gold", "zi").count() == n + n / 10)
    assert(wh.lastOperation("gold.zi").get.getAs[String]("operation") == "ZORDER")
    // converged: a second call finds no wide files → zero-rewrite no-op
    assert(wh.zorderIncremental("gold", "zi", Seq("k"),
      spanThreshold = 0.5, targetRowsPerFile = n / 40) == 0L)
    assert(wh.lastOperation("gold.zi").get.getAs[Long]("num_output_rows") == 0L)
    // ... and reports a healthy layout afterwards
    assert(wh.clusterHealth("gold", "zi", Seq("k"), spanThreshold = 0.5)
      .head().getAs[Long]("wide_files") == 0L)
    // values unchanged through both calls
    assert(wh.table("gold", "zi").agg(sum($"v")).head().getLong(0) ==
      (0L until n).map(_ % 7).sum + 9L * (n / 10))
  }

  test("time-based vacuum (RETAIN n HOURS) drops by retiring-commit age") {
    import spark.implicits._
    val wh = freshWh(keep = 10)
    val t0 = System.currentTimeMillis()
    for (v <- 0 to 2)
      wh.createOrReplace("gold", "vt", Seq((v, s"gen$v")).toDF("n", "tag"))
    // every retiring commit just happened: a 1-hour window keeps all
    assert(wh.vacuumRetainHours("gold", "vt", retainHours = 1.0, nowMillis = t0) == 0L)
    assert(wh.tableAsOf("gold", "vt", 0L).head().getString(1) == "gen0")
    assert(wh.detail("gold", "vt").head().getAs[Long]("oldest_retained_version") == 0L)
    // two hours later the same window removes both retired generations
    val later = t0 + 2 * 3600 * 1000L
    assert(wh.vacuumRetainHours("gold", "vt", retainHours = 1.0, nowMillis = later) == 2L)
    assert(wh.lastOperation("gold.vt").get.getAs[String]("operation") == "VACUUM")
    intercept[IllegalArgumentException](wh.tableAsOf("gold", "vt", 0L))
    intercept[IllegalArgumentException](wh.tableAsOf("gold", "vt", 1L))
    // the live table is untouched and DESCRIBE DETAIL reflects the floor
    assert(wh.table("gold", "vt").head().getString(1) == "gen2")
    val d = wh.detail("gold", "vt").head()
    assert(d.getAs[Long]("retained_generations") == 0L)
    assert(d.getAs[Long]("oldest_retained_version") ==
      d.getAs[Long]("current_version"))
    // a re-run finds nothing left to remove
    assert(wh.vacuumRetainHours("gold", "vt", retainHours = 1.0, nowMillis = later) == 0L)
  }

  test("history migrates legacy 7-column ledger files (pre-num_deleted era)") {
    import spark.implicits._
    val wh = freshWh()
    // current-schema ledger row (8 columns, from a real op)
    wh.createOrReplace("silver", "leg", Seq((1L, "a")).toDF("k", "v"))
    // hand-append a legacy-era file WITHOUT num_deleted, as a pre-upgrade
    // engine wrote it: a CTAS then a real DELETE for another table
    Seq(
      ("silver.old", "CTAS", 5L, 0L, 5L, 1000L, 0L),
      ("silver.old", "DELETE", 0L, 0L, 3L, 2000L, 1L))
      .toDF("table_name", "operation", "num_inserted", "num_updated",
        "num_output_rows", "ts_millis", "version")
      .write.mode("append").parquet(wh.tablePath("_ops", "ledger"))
    // mixed 7/8-column ledger must resolve; legacy rows backfill:
    // DELETE → 1 (always rewrote pre-convention), everything else → 0
    val old = wh.history("silver.old").orderBy("version").collect()
      .map(r => (r.getAs[String]("operation"), r.getAs[Long]("num_deleted")))
    assert(old.toSeq == Seq(("CTAS", 0L), ("DELETE", 1L)))
    // current-schema rows are untouched and lastOperation still resolves
    assert(wh.lastOperation("silver.leg").get.getAs[Long]("num_deleted") == 0L)
    assert(wh.lastOperation("silver.old").get.getAs[String]("operation") == "DELETE")
    // the live table's time travel still works over the mixed ledger
    // (appends fold forward into the predecessor per the engine contract)
    wh.append("silver", "leg", Seq((2L, "b")).toDF("k", "v"))
    assert(wh.tableAsOf("silver", "leg", 0L).count() == 2L)
  }

  test("DELETE/UPDATE rewrite only the files containing matched rows (file-granular COW)") {
    import spark.implicits._
    val wh = freshWh(keep = 3)
    // range-partitioned layout: 4 files, each holding a disjoint key range
    val base = spark.range(0, 4000)
      .select($"id".as("k"), ($"id" % 7).cast("long").as("v"))
      .repartitionByRange(4, $"k")
    wh.createOrReplace("silver", "cow", base)
    val gen0 = wh.table("silver", "cow").inputFiles.map(f => f.split('/').last).toSet
    assert(gen0.size == 4, s"expected 4 files, got ${gen0.size}")

    // delete keys < 500: they live in exactly one range file
    val deleted = wh.delete("silver", "cow", $"k" < 500)
    assert(deleted == 500L)
    val gen1 = wh.table("silver", "cow").inputFiles.map(f => f.split('/').last).toSet
    assert((gen0 intersect gen1).size == 3,
      s"3 untouched files must carry over byte-identical (names preserved); " +
        s"carried=${(gen0 intersect gen1).size}")
    assert(wh.table("silver", "cow").count() == 3500L)
    assert(wh.table("silver", "cow").filter($"k" < 500).count() == 0L)
    // ledger records the true surviving row count across both file sets
    assert(wh.lastOperation("silver.cow").get.getAs[Long]("num_output_rows") == 3500L)
    // feed carries exactly the deleted rows
    assert(wh.changeFeed("silver", "cow", 0L)
      .filter($"_change_type" === "delete").count() == 500L)
    // time travel to the pre-delete generation still sees everything
    assert(wh.tableAsOf("silver", "cow", 0L).count() == 4000L)

    // update a slice of a single file: only that file is rewritten
    val updated = wh.update("silver", "cow",
      $"k" >= 3500 && $"k" < 3600, Map("v" -> lit(99L)))
    assert(updated == 100L)
    val gen2 = wh.table("silver", "cow").inputFiles.map(f => f.split('/').last).toSet
    assert((gen1 intersect gen2).size == gen1.size - 1,
      "exactly one file (the touched range) must be rewritten by the UPDATE")
    assert(wh.table("silver", "cow").filter($"v" === 99L).count() == 100L)
    assert(wh.table("silver", "cow").count() == 3500L)
    assert(wh.lastOperation("silver.cow").get.getAs[Long]("num_output_rows") == 3500L)
    // both feed images recorded for the touched rows only
    val imgs = wh.changeFeed("silver", "cow", 1L)
      .groupBy($"_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(imgs == Map("update_preimage" -> 100L, "update_postimage" -> 100L))
  }

  test("partitioned DELETE/UPDATE carry untouched files of touched partitions (COW within the slice)") {
    import spark.implicits._
    val wh = freshWh(keep = 3)
    // 2 partitions × 4 deterministic range files each: one writer task,
    // sorted by (pt, k), split every 1000 rows — so file i of a dir
    // holds exactly k-range [i*1000, (i+1)*1000) and a narrow predicate
    // touches one file of one dir
    val base = spark.range(0, 8000)
      .select($"id".as("k"), when($"id" < 4000, "0").otherwise("1").as("pt"),
        ($"id" % 7).cast("long").as("v"))
      .coalesce(1).sortWithinPartitions($"pt", $"k")
    val prevMax = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", 1000L)
    try wh.createOrReplacePartitioned("silver", "pcow", base, Seq("pt"))
    finally prevMax match {
      case Some(v) => spark.conf.set("spark.sql.files.maxRecordsPerFile", v)
      case None    => spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }
    def files(pt: String) = wh.table("silver", "pcow").inputFiles
      .filter(_.contains(s"pt=$pt")).map(f => f.split('/').last).toSet
    val p0gen0 = files("0"); val p1gen0 = files("1")
    assert(p0gen0.size == 4 && p1gen0.size == 4,
      s"expected 4 files per partition, got ${p0gen0.size}/${p1gen0.size}")

    // delete keys < 1000: partition pt=0 only, and only its lowest range file
    val deleted = wh.delete("silver", "pcow", $"k" < 1000 && $"pt" === "0")
    assert(deleted == 1000L)
    val p0gen1 = files("0"); val p1gen1 = files("1")
    assert(p1gen1 == p1gen0, "untouched partition must be untouched")
    assert((p0gen0 intersect p0gen1).size == 3,
      s"3 of 4 files in the touched partition must carry over; carried=${(p0gen0 intersect p0gen1).size}")
    assert(wh.table("silver", "pcow").count() == 7000L)
    // ledger outputRows = surviving rows of the touched SLICE (pt=0)
    assert(wh.lastOperation("silver.pcow").get.getAs[Long]("num_output_rows") == 3000L)
    assert(wh.changeFeed("silver", "pcow", 0L)
      .filter($"_change_type" === "delete").count() == 1000L)
    assert(wh.tableAsOf("silver", "pcow", 0L).count() == 8000L)

    // update a slice localized to one file of pt=1
    val updated = wh.update("silver", "pcow",
      $"k" >= 7000 && $"k" < 7100 && $"pt" === "1", Map("v" -> lit(42L)))
    assert(updated == 100L)
    val p1gen2 = files("1")
    assert((p1gen1 intersect p1gen2).size == 3,
      "exactly one file of the touched partition must be rewritten by the UPDATE")
    assert(files("0") == p0gen1, "the other partition stays untouched")
    assert(wh.table("silver", "pcow").filter($"v" === 42L).count() == 100L)
    assert(wh.table("silver", "pcow").count() == 7000L)
    val imgs = wh.changeFeed("silver", "pcow", 1L)
      .groupBy($"_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(imgs == Map("update_preimage" -> 100L, "update_postimage" -> 100L))
  }

  test("MERGE rewrites only files holding matched keys (file-granular COW)") {
    import spark.implicits._
    val wh = freshWh(keep = 3)
    val base = spark.range(0, 4000)
      .select($"id".as("k"), ($"id" % 7).cast("long").as("v"), lit(0L).as("ver"))
      .repartitionByRange(4, $"k")
    wh.createOrReplace("silver", "mcow", base)
    val gen0 = wh.table("silver", "mcow").inputFiles.map(_.split('/').last).toSet
    assert(gen0.size == 4)
    // source: update two keys that sit in ONE range file, insert one new key
    val src = Seq((10L, 100L, 1L), (20L, 200L, 1L), (99999L, 1L, 1L)).toDF("k", "v", "ver")
    val m = wh.upsert("silver", "mcow", src, Seq("k"), "ver")
    assert(m.inserted == 1 && m.updated == 2)
    val gen1 = wh.table("silver", "mcow").inputFiles.map(_.split('/').last).toSet
    assert((gen0 intersect gen1).size == 3,
      s"files without matched keys must carry over; carried=${(gen0 intersect gen1).size}")
    val t = wh.table("silver", "mcow")
    assert(t.count() == 4001L)
    assert(t.filter($"k" === 10L).head().getLong(1) == 100L)
    assert(t.filter($"k" === 99999L).count() == 1L)
    // ledger output rows span rewritten + carried
    assert(wh.lastOperation("silver.mcow").get.getAs[Long]("num_output_rows") == 4001L)
    // feed: 1 insert, 2 update pairs
    val imgs = wh.changeFeed("silver", "mcow", 0L)
      .groupBy($"_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(imgs == Map("insert" -> 1L, "update_postimage" -> 2L, "update_preimage" -> 2L))
    assert(wh.tableAsOf("silver", "mcow", 0L).count() == 4000L)
  }

  test("partitioned MERGE carries unmatched files of touched partitions") {
    import spark.implicits._
    val wh = freshWh(keep = 3)
    val base = spark.range(0, 8000)
      .select($"id".as("k"), when($"id" < 4000, "a").otherwise("b").as("pt"),
        ($"id" % 7).cast("long").as("v"), lit(0L).as("ver"))
      .coalesce(1).sortWithinPartitions($"pt", $"k")
    val prevMax = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", 1000L)
    try wh.createOrReplacePartitioned("silver", "mpcow", base, Seq("pt"))
    finally prevMax match {
      case Some(vv) => spark.conf.set("spark.sql.files.maxRecordsPerFile", vv)
      case None     => spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }
    def files(pt: String) = wh.table("silver", "mpcow").inputFiles
      .filter(_.contains(s"pt=$pt")).map(_.split('/').last).toSet
    val p0gen0 = files("a"); val p1gen0 = files("b")
    assert(p0gen0.size == 4 && p1gen0.size == 4)
    // update keys 100/200 (pt=a, first range file); insert a fresh key into pt=b
    val src = Seq((100L, "a", 1L, 1L), (200L, "a", 2L, 1L), (90000L, "b", 3L, 1L))
      .toDF("k", "pt", "v", "ver")
    val m = wh.upsert("silver", "mpcow", src, Seq("k"), "ver")
    assert(m.inserted == 1 && m.updated == 2)
    val p0gen1 = files("a"); val p1gen1 = files("b")
    assert((p0gen0 intersect p0gen1).size == 3,
      s"pt=a must carry its 3 unmatched files; carried=${(p0gen0 intersect p0gen1).size}")
    assert((p1gen0 intersect p1gen1).size == 4,
      s"pt=b holds no matched keys: all 4 files carry, plus the insert's new file; " +
        s"carried=${(p1gen0 intersect p1gen1).size}")
    assert(wh.table("silver", "mpcow").count() == 8001L)
    assert(wh.table("silver", "mpcow").filter($"k" === 100L).head().getAs[Long]("v") == 1L)
    assert(wh.lastOperation("silver.mpcow").get.getAs[Long]("num_output_rows") == 8001L)
    assert(wh.tableAsOf("silver", "mpcow", 0L).count() == 8000L)
  }

  test("zero-change merge with a source-only column still evolves the schema") {
    import spark.implicits._
    val wh = freshWh()
    // unpartitioned: idempotent re-run (same keys, same versions) that
    // carries a NEW column → 0/0 metrics, but the column must land
    wh.createOrReplace("silver", "ev", Seq((1L, "a", 1), (2L, "b", 1)).toDF("k", "payload", "v"))
    val m = wh.upsert("silver", "ev",
      Seq((1L, "a", 1, "x")).toDF("k", "payload", "v", "extra"), Seq("k"), "v")
    assert(m.inserted == 0 && m.updated == 0)
    val t = wh.table("silver", "ev")
    assert(t.columns.contains("extra"), "new source column must evolve the table schema")
    // kept rows do not take source values (Delta: unmatched-by-condition)
    assert(t.filter($"extra".isNotNull).count() == 0)
    // the forced rewrite retired a generation → time travel to v0 reads it
    assert(!wh.tableAsOf("silver", "ev", 0L).columns.contains("extra"))
    // a plain 0/0 re-run with NO new column stays a true no-op commit
    val before = wh.table("silver", "ev").inputFiles.toSet
    val m2 = wh.upsert("silver", "ev",
      Seq((1L, "a", 1, "x")).toDF("k", "payload", "v", "extra"), Seq("k"), "v")
    assert(m2.inserted == 0 && m2.updated == 0)
    assert(wh.table("silver", "ev").inputFiles.toSet == before, "no-op must not rewrite files")

    // partitioned path: same contract
    wh.createOrReplacePartitioned("silver", "pe",
      Seq((1L, "p0", "a", 1), (2L, "p1", "b", 1)).toDF("k", "pt", "payload", "v"), Seq("pt"))
    val pm = wh.upsert("silver", "pe",
      Seq((1L, "p0", "a", 1, 9.5)).toDF("k", "pt", "payload", "v", "score"), Seq("k"), "v")
    assert(pm.inserted == 0 && pm.updated == 0)
    val pt = wh.table("silver", "pe")
    assert(pt.columns.contains("score"), "partitioned merge must evolve schema too")
    assert(pt.filter($"score".isNotNull).count() == 0)
    assert(pt.count() == 2L)
  }
}

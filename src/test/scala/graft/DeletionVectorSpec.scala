package graft

import graft.sources.Warehouse
import java.nio.file.Files
import org.apache.hadoop.fs.Path

/** Deletion vectors — Delta merge-on-read DML parity. Pins the core
  * contract: a MOR DELETE/UPDATE commits O(matched rows) of sidecar
  * state and ZERO rewritten data files, reads subtract tombstones
  * exactly, time travel between MOR commits reconstructs bit-exactly
  * (including hiding UPDATE_MOR's appended post-image files), REORG
  * folds tombstones back into files touching only the files that
  * carry them, every COW op materializes live tombstones first, and
  * a crash between a MOR op's sidecar writes and its ledger commit
  * rolls the whole commit back.
  */
class DeletionVectorSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def freshWh() =
    new Warehouse(spark, Files.createTempDirectory("graft_dvspec").toString)

  private def fs(wh: Warehouse, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFileNames(dir: String): Set[String] = {
    val p  = new Path(dir)
    val hf = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(d: Path): Seq[String] =
      hf.listStatus(d).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else if (!s.getPath.getName.startsWith("_")) Seq(s.getPath.getName)
        else Seq.empty
      }
    walk(p).toSet
  }

  test("deleteMor removes exactly the predicate rows without touching a single data file") {
    import spark.implicits._
    val wh   = freshWh()
    val base = (1L to 1000L).map(k => (k, k % 7, s"r$k")).toDF("k", "grp", "payload")
    wh.createOrReplace("silver", "t", base.repartition(3))
    val root    = wh.tablePath("silver", "t")
    val before  = dataFileNames(root)
    val deleted = wh.deleteMor("silver", "t", col("grp") === 3)
    assert(deleted == base.where("k % 7 = 3").count())
    // zero data files created, removed, or renamed — the commit is sidecar-only
    assert(dataFileNames(root) == before)
    // visible rows are exactly the survivors
    val got = wh.table("silver", "t").select("k").as[Long].collect().sorted
    val exp = (1L to 1000L).filter(_ % 7 != 3).toArray
    assert(got.sameElements(exp))
    // ledger: a DELETE_MOR commit with the deleted count and a version bump
    val last = wh.lastOperation("silver.t").get
    assert(last.getAs[String]("operation") == "DELETE_MOR")
    assert(last.getAs[Long]("num_deleted") == deleted)
    // feed: delete rows for downstream consumers, same as the COW path
    val feed = wh.changeFeed("silver", "t", sinceVersion = 0L)
    assert(feed.filter(col("_change_type") === "delete").count() == deleted)
  }

  test("stacked MOR deletes: already-tombstoned rows are not re-deleted or re-recorded") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "t", (1L to 100L).toDF("k"))
    val d1 = wh.deleteMor("silver", "t", col("k") <= 30)
    // overlapping predicate: rows 1-30 are already gone, only 31-50 match
    val d2 = wh.deleteMor("silver", "t", col("k") <= 50)
    assert(d1 == 30 && d2 == 20)
    assert(wh.table("silver", "t").count() == 50)
    // the second commit's feed partition carries ONLY the newly deleted rows
    val v2 = wh.currentVersion("silver", "t")
    val feedV2 = wh.changeFeed("silver", "t", sinceVersion = v2 - 1)
    assert(feedV2.count() == 20)
    assert(feedV2.agg(min("k"), max("k")).head() match {
      case r => r.getLong(0) == 31L && r.getLong(1) == 50L
    })
  }

  test("NULL predicate keeps the row; zero-match commit follows the no-op convention") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "t",
      Seq((1L, "a"), (2L, null), (3L, "b")).toDF("k", "tag"))
    // tag = 'a' evaluates NULL for row 2 — Delta DELETE keeps it
    assert(wh.deleteMor("silver", "t", col("tag") === "a") == 1L)
    assert(wh.table("silver", "t").count() == 2)
    val v = wh.currentVersion("silver", "t")
    assert(wh.deleteMor("silver", "t", col("tag") === "zzz") == 0L)
    val last = wh.lastOperation("silver.t").get
    assert(last.getAs[String]("operation") == "DELETE_MOR")
    assert(last.getAs[Long]("num_deleted") == 0L)
    assert(last.getAs[Long]("version") == v + 1, "no-op still bumps the version")
    assert(wh.table("silver", "t").count() == 2)
  }

  test("time travel reconstructs every state between MOR deletes, before and after reorg") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "t", (1L to 100L).toDF("k")) // v0
    wh.deleteMor("silver", "t", col("k") <= 10)               // v1
    wh.deleteMor("silver", "t", col("k") > 90)                // v2
    def ks(df: org.apache.spark.sql.DataFrame) =
      df.select("k").as[Long].collect().sorted.toSeq
    assert(ks(wh.tableAsOf("silver", "t", 0)) == (1L to 100L))
    assert(ks(wh.tableAsOf("silver", "t", 1)) == (11L to 100L))
    assert(ks(wh.tableAsOf("silver", "t", 2)) == (11L to 90L))
    val rewritten = wh.reorg("silver", "t")                   // v3
    assert(rewritten > 0)
    assert(wh.lastOperation("silver.t").get.getAs[String]("operation") == "REORG")
    // current read identical, and the pre-reorg states stay exact
    assert(ks(wh.table("silver", "t")) == (11L to 90L))
    assert(ks(wh.tableAsOf("silver", "t", 0)) == (1L to 100L))
    assert(ks(wh.tableAsOf("silver", "t", 1)) == (11L to 100L))
    assert(ks(wh.tableAsOf("silver", "t", 3)) == (11L to 90L))
  }

  test("reorg rewrites ONLY the files carrying tombstones; clean files byte-carry") {
    import spark.implicits._
    val wh = freshWh()
    // k clusters per file via repartitionByRange, so one predicate
    // lands all its tombstones in one file
    val base = (1L to 900L).toDF("k")
    wh.createOrReplace("silver", "t",
      base.repartitionByRange(3, col("k")).sortWithinPartitions("k"))
    val root   = wh.tablePath("silver", "t")
    val before = dataFileNames(root)
    assert(before.size == 3)
    wh.deleteMor("silver", "t", col("k") === 5L) // one file's rows only
    // which file is tombstoned, straight from the sidecar
    val dvFiles = spark.read.parquet(root + ".__dv")
      .select("file_name").distinct().as[String].collect().toSet
    assert(dvFiles.size == 1)
    wh.reorg("silver", "t")
    val after = dataFileNames(root)
    // the clean files survive with their exact names; the touched one is replaced
    assert(after.intersect(before) == before -- dvFiles)
    assert(!after.contains(dvFiles.head))
    assert(wh.table("silver", "t").count() == 899)
  }

  test("copy-on-write ops materialize live tombstones first (the barrier)") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "t",
      (1L to 100L).map(k => (k, 0L)).toDF("k", "v")) // v0
    wh.deleteMor("silver", "t", col("k") <= 20)      // v1
    // COW UPDATE must first fold the tombstones (REORG v2), then update (v3)
    wh.update("silver", "t", col("k") === 50L, Map("v" -> lit(9L)))
    val ops = wh.history("silver.t").orderBy("version")
      .select("operation").as[String].collect().toSeq
    assert(ops == Seq("CREATE OR REPLACE", "DELETE_MOR", "REORG", "UPDATE"),
      s"unexpected op sequence $ops")
    val t = wh.table("silver", "t")
    assert(t.count() == 80)
    assert(t.filter(col("k") === 50L).select("v").as[Long].head() == 9L)
    // a merge after a MOR delete must not resurrect deleted keys
    wh.deleteMor("silver", "t", col("k") === 60L)
    wh.upsert("silver", "t",
      Seq((70L, 1L)).toDF("k", "v"), Seq("k"), "v")
    assert(wh.table("silver", "t").filter(col("k") === 60L).count() == 0)
  }

  test("updateMor: tombstone old positions, append post-images, exact time travel") {
    import spark.implicits._
    val wh = freshWh()
    val base = (1L to 300L).map(k => (k, k.toDouble)).toDF("k", "price")
    wh.createOrReplace("silver", "t", base.repartition(3)) // v0
    val root   = wh.tablePath("silver", "t")
    val before = dataFileNames(root)
    val n = wh.updateMor("silver", "t", col("k") % 3 === 0,
      Map("price" -> (col("price") * 2)))                  // v1
    assert(n == 100)
    // original files all still present (no rewrite), new post-image files appended
    val after = dataFileNames(root)
    assert(before.subsetOf(after) && after.size > before.size)
    // visible state: updated rows exactly once
    val t = wh.table("silver", "t")
    assert(t.count() == 300)
    assert(t.filter(col("k") % 3 === 0 && col("price") =!= col("k") * 2.0).count() == 0)
    assert(t.filter(col("k") % 3 =!= 0 && col("price") =!= col("k").cast("double")).count() == 0)
    // time travel to v0 hides the appended files AND skips the
    // tombstones — the pre-update rows, no duplicates
    val asOf = wh.tableAsOf("silver", "t", 0)
    assert(asOf.count() == 300)
    assert(asOf.filter(col("price") =!= col("k").cast("double")).count() == 0)
    // feed carries both images
    val feed = wh.changeFeed("silver", "t", sinceVersion = 0L)
    assert(feed.filter(col("_change_type") === "update_preimage").count() == 100)
    assert(feed.filter(col("_change_type") === "update_postimage").count() == 100)
    // ledger row
    val last = wh.lastOperation("silver.t").get
    assert(last.getAs[String]("operation") == "UPDATE_MOR")
    assert(last.getAs[Long]("num_updated") == 100)
  }

  test("updateMor refuses a constraint-violating batch with nothing landed") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "t", Seq((1L, 5.0), (2L, 7.0)).toDF("k", "price"))
    wh.addCheckConstraint("silver", "t", "price_pos", "price >= 0")
    val ver    = wh.currentVersion("silver", "t")
    val root   = wh.tablePath("silver", "t")
    val before = dataFileNames(root)
    intercept[Warehouse.ConstraintViolationException] {
      wh.updateMor("silver", "t", col("k") === 1L, Map("price" -> lit(-1.0)))
    }
    assert(wh.currentVersion("silver", "t") == ver)
    assert(dataFileNames(root) == before)
    assert(!fs(wh, root).exists(new Path(root + ".__dv")), "no tombstones may land")
    assert(wh.table("silver", "t").filter(col("price") < 0).count() == 0)
  }

  test("partitioned table: MOR delete + update + partition-scoped reorg") {
    import spark.implicits._
    val wh = freshWh()
    val base = (1L to 400L).map(k => (k, s"p${k % 4}", k.toDouble)).toDF("k", "pt", "v")
    wh.createOrReplacePartitioned("silver", "t", base, Seq("pt"))   // v0
    val root = wh.tablePath("silver", "t")
    wh.deleteMor("silver", "t", col("pt") === "p1" && col("k") < 100) // v1
    wh.updateMor("silver", "t", col("pt") === "p2" && col("k") < 50,
      Map("v" -> lit(0.0)))                                          // v2
    val t      = wh.table("silver", "t")
    val tCount = t.count() // materialized NOW — t's plan pins pre-reorg files
    assert(tCount == 400 - base.where("pt = 'p1' and k < 100").count())
    assert(t.filter(col("pt") === "p2" && col("k") < 50 && col("v") =!= 0.0).count() == 0)
    // untouched partitions carry byte-identical through reorg
    val p0Before = dataFileNames(s"$root/pt=p0")
    val p3Before = dataFileNames(s"$root/pt=p3")
    wh.reorg("silver", "t")                                          // v3
    assert(dataFileNames(s"$root/pt=p0") == p0Before)
    assert(dataFileNames(s"$root/pt=p3") == p3Before)
    val t2 = wh.table("silver", "t")
    assert(t2.count() == tCount)
    assert(t2.filter(col("pt") === "p2" && col("k") < 50 && col("v") =!= 0.0).count() == 0)
    // time travel across the partitioned overlay still reconstructs v0/v1
    assert(wh.tableAsOf("silver", "t", 0).count() == 400)
    assert(wh.tableAsOf("silver", "t", 0)
      .filter(col("v") =!= col("k").cast("double")).count() == 0)
    assert(wh.tableAsOf("silver", "t", 1).count() == tCount)
  }

  test("crash between sidecar writes and ledger commit rolls the whole MOR commit back") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "t", (1L to 50L).toDF("k"))
    val root = wh.tablePath("silver", "t")
    val hf   = fs(wh, root)
    val cur  = wh.currentVersion("silver", "t")
    // forge the phantom state an UPDATE_MOR crash leaves: a DV
    // partition beyond the committed version, tombstoning real rows,
    // with a manifest listing an appended (planted) post-image file
    val phantomVer = cur + 1
    val phantomDir = new Path(root + ".__dv", f"_commit_part=$phantomVer%010d")
    val victim = spark.read.parquet(root)
      .select(col("_metadata.file_name").as("file_name"),
        col("_metadata.row_index").as("pos"))
      .limit(5)
    victim.write.parquet(phantomDir.toString)
    val planted = "part-phantom-postimage.parquet"
    spark.range(1).select(lit(999L).as("k")).write
      .parquet(root + ".__phantom_tmp")
    val tmpFile = hf.listStatus(new Path(root + ".__phantom_tmp"))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")).head.getPath
    hf.rename(tmpFile, new Path(root, planted))
    hf.delete(new Path(root + ".__phantom_tmp"), true)
    val out = hf.create(new Path(phantomDir, "_GRAFT_FILES"), true)
    out.write(planted.getBytes("UTF-8")); out.close()
    // an unlocked read ignores the phantom commit on BOTH sides: its
    // tombstones don't subtract (version cap) AND its manifest-listed
    // appended file stays hidden — exactly the 50 committed rows, no
    // resurrections, no duplicates, no planted post-image
    assert(wh.table("silver", "t").count() == 50,
      "phantom MOR state must be invisible before repair")
    assert(wh.table("silver", "t").filter(col("k") === 999L).count() == 0,
      "the phantom post-image file must be hidden from reads")
    // ...and repair removes tombstones AND the planted post-image file
    assert(wh.repairCrashedSwap("silver", "t"))
    assert(!hf.exists(phantomDir))
    assert(!hf.exists(new Path(root, planted)))
    assert(wh.table("silver", "t").count() == 50)
    assert(wh.currentVersion("silver", "t") == cur)
  }

  test("scanPruned and scanPrunedEq subtract tombstones like a plain table read") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "t",
      (1L to 500L).toDF("k").repartitionByRange(5, col("k")))
    wh.collectStats("silver", "t", Seq("k"))
    wh.collectBloom("silver", "t", "k")
    wh.deleteMor("silver", "t", col("k") % 10 === 0)
    val ranged = wh.scanPruned("silver", "t", "k", 100L, 200L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(ranged == (100L to 200L).filterNot(_ % 10 == 0))
    val eq = wh.scanPrunedEq("silver", "t", "k", Seq(90L, 91L))
      .select("k").as[Long].collect().sorted.toSeq
    assert(eq == Seq(91L), "90 is tombstoned and must not surface")
  }

  test("encodable partition values: tombstones, updates, reorg and travel in the URI domain") {
    import spark.implicits._
    val wh = freshWh()
    // 'a b' (URI-encodes to a%20b) and 'a%b' (hive-escapes on disk to
    // a%25b, URI-encodes to a%2525b) — the spellings that made
    // decoded-domain keys silently miss
    val base = (1L to 300L).map(k =>
      (k, Seq("a b", "a%b", "plain")((k % 3).toInt), k.toDouble)).toDF("k", "pt", "v")
    wh.createOrReplacePartitioned("silver", "t", base, Seq("pt"))      // v0
    val del = wh.deleteMor("silver", "t", col("pt") === "a b" && col("k") <= 150)
    assert(del == base.where("pt = 'a b' and k <= 150").count() && del > 0)
    val t1 = wh.table("silver", "t")
    assert(t1.count() == 300 - del, "tombstones must apply on the encoded partition")
    assert(t1.filter(col("pt") === "a b" && col("k") <= 150).count() == 0)
    val upd = wh.updateMor("silver", "t", col("pt") === "a%b" && col("k") <= 60,
      Map("v" -> lit(-1.0)))                                           // v2
    assert(upd > 0)
    val t2 = wh.table("silver", "t")
    assert(t2.count() == 300 - del, "no duplicates from the MOR update")
    assert(t2.filter(col("pt") === "a%b" && col("k") <= 60 && col("v") =!= -1.0).count() == 0)
    // time travel reconstructs both pre-states exactly
    assert(wh.tableAsOf("silver", "t", 0).count() == 300)
    assert(wh.tableAsOf("silver", "t", 1).count() == 300 - del)
    assert(wh.tableAsOf("silver", "t", 1)
      .filter(col("v") === -1.0).count() == 0, "pre-update travel hides post-images")
    // reorg folds on the encoded layout and the result is unchanged
    assert(wh.reorg("silver", "t") > 0)
    val t3 = wh.table("silver", "t")
    assert(t3.count() == 300 - del)
    assert(t3.filter(col("pt") === "a%b" && col("k") <= 60 && col("v") =!= -1.0).count() == 0)
  }

  test("DV read plans as a broadcast anti-join with data filters still pushed to the scan") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "t", (1L to 1000L).toDF("k"))
    wh.deleteMor("silver", "t", col("k") === 1L)
    val q    = wh.table("silver", "t").filter(col("k") > 500L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected broadcast LeftAnti in:\n$plan")
    assert(plan.contains("BroadcastExchange"), "tombstones must broadcast")
    assert(!plan.contains("Exchange hashpartitioning"),
      "the corpus side must NOT shuffle for DV application")
    assert(plan.contains("GreaterThan(k,500)"),
      "the data predicate must still reach PushedFilters through the anti-join")
    // after reorg the current read is the bare scan again — no join at all
    wh.reorg("silver", "t")
    val plan2 = wh.table("silver", "t").queryExecution.executedPlan.toString
    assert(!plan2.contains("LeftAnti"),
      "post-reorg current reads must not carry the anti-join")
  }

  test("upsertMor equals the COW merge's final state without touching a single file") {
    import spark.implicits._
    val wh   = freshWh()
    val base = (1L to 500L).map(k => (k, s"v$k", 0L)).toDF("k", "payload", "ver")
    // twin tables, same base; one merges COW, one merge-on-read
    wh.createOrReplace("silver", "cow", base.repartition(3))
    wh.createOrReplace("silver", "mor", base.repartition(3))
    val batch = ((100L to 120L).map(k => (k, s"NEW$k", 1L)) ++       // updates
      (1000L to 1010L).map(k => (k, s"INS$k", 1L)) ++               // inserts
      Seq((130L, "LOSER", 0L))).toDF("k", "payload", "ver")         // conditional keep
    val mCow = wh.upsert("silver", "cow", batch, Seq("k"), "ver")
    val before = dataFileNames(wh.tablePath("silver", "mor"))
    val mMor = wh.upsertMor("silver", "mor", batch, Seq("k"), "ver")
    assert((mMor.inserted, mMor.updated) == (mCow.inserted, mCow.updated))
    assert((mMor.inserted, mMor.updated) == (11L, 21L))
    // every original file untouched — new files only
    val after = dataFileNames(wh.tablePath("silver", "mor"))
    assert(before.subsetOf(after) && after.size > before.size)
    // identical final states
    def state(t: String) = wh.table("silver", t)
      .as[(String, Long, Long)].collect().sortBy(r => r._2).toSeq
    assert(wh.table("silver", "mor").as[(Long, String, Long)].collect().sorted.toSeq ==
      wh.table("silver", "cow").as[(Long, String, Long)].collect().sorted.toSeq)
    // feed parity: same change rows both mechanics
    def feed(t: String) = wh.changeFeed("silver", t, 0L)
      .select($"_change_type", $"k", $"payload").as[(String, Long, String)]
      .collect().sorted.toSeq
    assert(feed("mor") == feed("cow"))
    // ledger + time travel to the pre-merge state
    assert(wh.lastOperation("silver.mor").get.getAs[String]("operation") == "MERGE_MOR")
    assert(wh.tableAsOf("silver", "mor", 0).count() == 500)
    assert(wh.tableAsOf("silver", "mor", 0)
      .filter($"payload".startsWith("NEW") || $"payload".startsWith("INS")).count() == 0)
    // re-run is a zero-change no-op commit
    val again = wh.upsertMor("silver", "mor", batch, Seq("k"), "ver")
    assert(again.inserted == 0 && again.updated == 0)
    // duplicate source keys matching one target row raise, like COW
    intercept[Exception] {
      wh.upsertMor("silver", "mor",
        Seq((200L, "a", 5L), (200L, "b", 5L)).toDF("k", "payload", "ver"), Seq("k"), "ver")
    }
  }

  test("upsertMor: rewrite-free schema evolution and partitioned layout") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplacePartitioned("silver", "t",
      (1L to 200L).map(k => (k, s"p${k % 2}", 0L)).toDF("k", "pt", "ver"), Seq("pt"))
    val before = dataFileNames(wh.tablePath("silver", "t"))
    // source carries a NEW column: evolution lands in the appended
    // files only, old files surface it as null via the merged read
    val batch = Seq((5L, "p1", 1L, "tagged"), (300L, "p0", 1L, "fresh"))
      .toDF("k", "pt", "ver", "note")
    val m = wh.upsertMor("silver", "t", batch, Seq("k"), "ver")
    assert(m.inserted == 1 && m.updated == 1)
    assert(before.subsetOf(dataFileNames(wh.tablePath("silver", "t"))))
    val t = wh.table("silver", "t")
    assert(t.count() == 201)
    assert(t.filter($"k" === 5L).select("note").as[String].head() == "tagged")
    assert(t.filter($"k" === 6L).select("note").as[String].head() == null)
    assert(t.filter($"k" === 300L && $"pt" === "p0").count() == 1)
    // reorg folds the update's tombstone; state unchanged
    wh.reorg("silver", "t")
    assert(wh.table("silver", "t").count() == 201)
    assert(wh.table("silver", "t").filter($"k" === 5L)
      .select("note").as[String].head() == "tagged")
  }

  test("detail reports the live-tombstone gauge; reorg resets it") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "t", (1L to 100L).toDF("k"))
    assert(wh.detail("silver", "t").head().getAs[Long]("live_tombstones") == 0L)
    wh.deleteMor("silver", "t", col("k") <= 7)
    wh.deleteMor("silver", "t", col("k") === 50L)
    assert(wh.detail("silver", "t").head().getAs[Long]("live_tombstones") == 8L)
    wh.reorg("silver", "t")
    assert(wh.detail("silver", "t").head().getAs[Long]("live_tombstones") == 0L)
    assert(wh.table("silver", "t").count() == 92)
  }
}

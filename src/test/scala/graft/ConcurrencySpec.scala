package graft

import graft.sources.Warehouse
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** Multi-writer semantics of the warehouse's per-table writer lock
  * (Delta multi-writer parity, expressed pessimistically — see the
  * design note in Warehouse): concurrent writers to the SAME table
  * serialize (ledger versions stay unique and dense, no lost updates),
  * writers to DIFFERENT tables stay parallel, a waiter that cannot get
  * the lock throws ConcurrentWriteException, and a dead writer's stale
  * lock is broken (with crash repair) instead of wedging the table
  * forever.
  */
class ConcurrencySpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def freshWh(waitMs: Long = 60_000L, staleMs: Long = 600_000L) = {
    val root = Files.createTempDirectory("graft_ccspec").toString
    (new Warehouse(spark, root, 2, waitMs, staleMs), root)
  }

  /** Run `body` in a named thread, returning the thread and a slot the
    * body's failure lands in (assertions in bare threads are otherwise
    * silently swallowed).
    */
  private def fork(name: String)(body: => Unit): (Thread, Array[Throwable]) = {
    val err = Array[Throwable](null)
    val t = new Thread(
      () => try body catch { case e: Throwable => err(0) = e }, name)
    t.start()
    (t, err)
  }

  test("concurrent appends to one table serialize: no lost rows, unique dense versions") {
    import spark.implicits._
    val (wh, _) = freshWh()
    wh.createOrReplace("silver", "cc_app", Seq((0L, "base")).toDF("k", "s"))
    val threads = (1 to 2).map { tid =>
      fork(s"appender-$tid") {
        for (i <- 1 to 4)
          wh.append("silver", "cc_app",
            Seq.tabulate(10)(j => (tid * 1000L + i * 10L + j, s"t$tid")).toDF("k", "s"))
      }
    }
    threads.foreach(_._1.join(120_000))
    threads.foreach(t => assert(t._2(0) == null, s"writer failed: ${t._2(0)}"))
    assert(wh.table("silver", "cc_app").count() == 1 + 80)
    val versions = wh.history("silver.cc_app")
      .orderBy("version").collect().map(_.getAs[Long]("version")).toSeq
    // 1 CTAS + 8 APPENDs, each a distinct contiguous version — the
    // exact corruption an unlocked race produces is two writers both
    // logging version N+1
    assert(versions == (0L to 8L), s"ledger versions corrupted: $versions")
  }

  test("concurrent upserts on disjoint keys serialize to the sequential result") {
    import spark.implicits._
    val (wh, _) = freshWh()
    wh.createOrReplace("silver", "cc_ups",
      (1L to 100L).map(k => (k, "orig", 0)).toDF("k", "payload", "v"))
    val a = fork("upserter-a") {
      wh.upsert("silver", "cc_ups",
        (1L to 50L).map(k => (k, "A", 1)).toDF("k", "payload", "v"), Seq("k"), "v")
    }
    val b = fork("upserter-b") {
      wh.upsert("silver", "cc_ups",
        (51L to 100L).map(k => (k, "B", 1)).toDF("k", "payload", "v"), Seq("k"), "v")
    }
    Seq(a, b).foreach(_._1.join(120_000))
    Seq(a, b).foreach(t => assert(t._2(0) == null, s"writer failed: ${t._2(0)}"))
    val got = wh.table("silver", "cc_ups").groupBy("payload").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // an unlocked race loses one side's whole merge (the later swap
    // retires the earlier writer's generation)
    assert(got == Map("A" -> 50L, "B" -> 50L), s"lost update: $got")
    assert(wh.currentVersion("silver", "cc_ups") == 2L)
  }

  test("a waiter that cannot take the lock throws ConcurrentWriteException and changes nothing") {
    import spark.implicits._
    val (wh, _) = freshWh(waitMs = 300L)
    wh.createOrReplace("silver", "cc_to", Seq((1L, "x")).toDF("k", "s"))
    val locked   = new CountDownLatch(1)
    val release  = new CountDownLatch(1)
    val holder = fork("holder") {
      wh.withWriterLock("silver", "cc_to") {
        locked.countDown()
        release.await(60, TimeUnit.SECONDS)
        ()
      }
    }
    assert(locked.await(30, TimeUnit.SECONDS))
    val e = intercept[Warehouse.ConcurrentWriteException] {
      wh.append("silver", "cc_to", Seq((2L, "y")).toDF("k", "s"))
    }
    assert(e.getMessage.contains("silver.cc_to"))
    release.countDown()
    holder._1.join(60_000)
    assert(holder._2(0) == null)
    // the refused append changed nothing: same row count, same version
    assert(wh.table("silver", "cc_to").count() == 1)
    assert(wh.currentVersion("silver", "cc_to") == 0L)
  }

  test("locks are per table: a held lock on one table does not block another") {
    import spark.implicits._
    // waitMs is short on purpose — if t2's append had to wait for t1's
    // lock it would throw instead of succeeding
    val (wh, _) = freshWh(waitMs = 500L)
    wh.createOrReplace("silver", "cc_t2", Seq((1L, "x")).toDF("k", "s"))
    val release = new CountDownLatch(1)
    val locked  = new CountDownLatch(1)
    val holder = fork("holder-t1") {
      wh.withWriterLock("silver", "cc_t1") {
        locked.countDown()
        release.await(60, TimeUnit.SECONDS)
        ()
      }
    }
    assert(locked.await(30, TimeUnit.SECONDS))
    assert(wh.append("silver", "cc_t2", Seq((2L, "y")).toDF("k", "s")) == 1L)
    release.countDown()
    holder._1.join(60_000)
    assert(holder._2(0) == null)
  }

  test("a dead writer's stale lock is broken and the table stays writable") {
    import spark.implicits._
    val (wh, root) = freshWh(waitMs = 10_000L, staleMs = 200L)
    wh.createOrReplace("silver", "cc_stale", Seq((1L, "x")).toDF("k", "s"))
    // simulate a writer that died holding the lock: the marker exists
    // but no process will ever release it
    val lock = Paths.get(s"$root/_graft_locks/silver.cc_stale.lock")
    Files.createDirectories(lock.getParent)
    Files.createDirectory(lock)
    Thread.sleep(350) // let it age past staleMs
    assert(wh.append("silver", "cc_stale", Seq((2L, "y")).toDF("k", "s")) == 1L)
    assert(wh.table("silver", "cc_stale").count() == 2)
    assert(!Files.exists(lock), "broken+reacquired lock must be released after the op")
  }

  test("two Warehouse instances on one root (the two-driver-JVM shape) serialize through the marker") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ccspec2").toString
    val whA  = new Warehouse(spark, root)
    val whB  = new Warehouse(spark, root) // no shared in-process state
    whA.createOrReplace("silver", "cc_two", Seq((0L, "base")).toDF("k", "s"))
    val a = fork("inst-a") {
      for (i <- 1 to 4)
        whA.append("silver", "cc_two", Seq((100L + i, "a")).toDF("k", "s"))
    }
    val b = fork("inst-b") {
      for (i <- 1 to 4)
        whB.append("silver", "cc_two", Seq((200L + i, "b")).toDF("k", "s"))
    }
    Seq(a, b).foreach(_._1.join(120_000))
    Seq(a, b).foreach(t => assert(t._2(0) == null, s"writer failed: ${t._2(0)}"))
    assert(whA.table("silver", "cc_two").count() == 9)
    val versions = whA.history("silver.cc_two")
      .orderBy("version").collect().map(_.getAs[Long]("version")).toSeq
    assert(versions == (0L to 8L), s"cross-instance ledger corrupted: $versions")
  }

  test("cross-JVM writers: a real second driver JVM contending on upsert loses no update") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ccxjvm").toString
    val wh = new Warehouse(spark, root,
      keepGenerations = 2, lockWaitMs = 120_000L, lockStaleMs = 600_000L)
    wh.createOrReplace("silver", "xjvm",
      Seq((0L, 0L, "base")).toDF("k", "version", "writer"))

    // spawn the second driver as a REAL process: separate heap, separate
    // ThreadLocals, separate lock cache — only the filesystem marker
    // serializes it against this JVM (the in-process two-instance test
    // above cannot prove that; this one does)
    val nOps  = 4
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp    = System.getProperty("java.class.path")
    val log   = Files.createTempFile("graft_xjvm", ".log").toFile
    val pb    = new ProcessBuilder(javaBin, "-cp", cp, "-Xmx3g",
      "graft.CrossJvmWriter", root, "9", nOps.toString)
    pb.redirectErrorStream(true)
    pb.redirectOutput(log) // drain to a file: Spark's stderr would fill the pipe
    val proc = pb.start()
    try {
      // barrier: wait for the child's session, then release both writers
      val ready    = Paths.get(root, "_xjvm_ready_9")
      val deadline = System.currentTimeMillis() + 120_000L
      while (!Files.exists(ready) && proc.isAlive && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(Files.exists(ready),
        s"child JVM never became ready (alive=${proc.isAlive}):\n" +
          new String(java.nio.file.Files.readAllBytes(log.toPath)))
      Files.write(Paths.get(root, "_xjvm_go"), Array.emptyByteArray)
      for (i <- 1 to nOps) {
        val src = Seq.tabulate(5)(j => (8L * 1000L + j, i.toLong, "parent"))
          .toDF("k", "version", "writer")
        wh.upsert("silver", "xjvm", src, keys = Seq("k"), versionCol = "version")
      }
      assert(proc.waitFor(180, TimeUnit.SECONDS),
        "child JVM did not finish within 180s")
      assert(proc.exitValue() == 0,
        s"child JVM failed:\n${new String(java.nio.file.Files.readAllBytes(log.toPath))}")
    } finally if (proc.isAlive) proc.destroyForcibly()

    // no lost update: both writers' keys sit at their FINAL version
    val rows = wh.table("silver", "xjvm")
      .select($"k", $"version", $"writer").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(rows.size == 1 + 10, s"row count: ${rows.size}")
    for (j <- 0 until 5) {
      assert(rows(8000L + j) == ((nOps.toLong, "parent")), s"parent key $j: ${rows(8000L + j)}")
      assert(rows(9000L + j) == ((nOps.toLong, "jvm9")), s"child key $j: ${rows(9000L + j)}")
    }
    // serialization proof: ledger versions strictly ordered and dense
    // (two writers both claiming N+1 is exactly what the lock prevents)
    val versions = wh.history("silver.xjvm")
      .orderBy("version").collect().map(_.getAs[Long]("version")).toSeq
    assert(versions == (0L to (2L * nOps)),
      s"cross-JVM ledger corrupted: $versions")
  }

  /** Spawn the second driver JVM in `mode` against `root`; returns the
    * process and its log file. Caller must wait for `_xjvm_ready_<tid>`
    * then write `_xjvm_go` (the barrier), and destroy on failure.
    */
  private def spawnChild(root: String, tid: Int, nOps: Int, mode: String) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp  = System.getProperty("java.class.path")
    val log = Files.createTempFile("graft_xjvm", ".log").toFile
    val pb  = new ProcessBuilder(javaBin, "-cp", cp, "-Xmx3g",
      "graft.CrossJvmWriter", root, tid.toString, nOps.toString, mode)
    pb.redirectErrorStream(true)
    pb.redirectOutput(log)
    (pb.start(), log)
  }

  private def awaitReadyThenGo(root: String, tid: Int, proc: Process, log: java.io.File): Unit = {
    val ready    = Paths.get(root, s"_xjvm_ready_$tid")
    val deadline = System.currentTimeMillis() + 120_000L
    while (!Files.exists(ready) && proc.isAlive && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(Files.exists(ready),
      s"child JVM never became ready (alive=${proc.isAlive}):\n" +
        new String(java.nio.file.Files.readAllBytes(log.toPath)))
    Files.write(Paths.get(root, "_xjvm_go"), Array.emptyByteArray)
  }

  test("cross-JVM compaction vs writer: snapshot reads stay consistent, no row lost or duplicated") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ccxjvmc").toString
    val wh = new Warehouse(spark, root,
      keepGenerations = 2, lockWaitMs = 120_000L, lockStaleMs = 600_000L)
    // many small files so every compaction pass genuinely rewrites:
    // 200 rows in ~40 files of 5
    wh.createOrReplace("silver", "xjvm",
      (1L to 200L).map(k => (k, 0L, "base")).toDF("k", "version", "writer")
        .repartition(40))
    val (proc, log) = spawnChild(root, 9, nOps = 4, mode = "compact")
    try {
      awaitReadyThenGo(root, 9, proc, log)
      // interleave appends (fresh fragmentation for the compactor) with
      // snapshot reads. The ONLY concurrent writer is count-preserving
      // compaction, so every read between our own writes must see
      // exactly the rows we have committed — a deviation is a torn
      // read against a half-swapped generation or a lost update.
      var expected = 200L
      for (i <- 1 to 4) {
        wh.append("silver", "xjvm",
          (1L to 20L).map(j => (1000L * i + j, 0L, s"round$i"))
            .toDF("k", "version", "writer").repartition(10))
        expected += 20
        for (_ <- 1 to 5)
          assert(wh.table("silver", "xjvm").count() == expected,
            s"torn snapshot read mid-compaction (expected $expected)")
      }
      assert(proc.waitFor(180, TimeUnit.SECONDS), "child JVM did not finish within 180s")
      assert(proc.exitValue() == 0,
        s"child JVM failed:\n${new String(java.nio.file.Files.readAllBytes(log.toPath))}")
      // no lost or duplicated row across 4 full rewrites racing 4 appends
      val t = wh.table("silver", "xjvm")
      assert(t.count() == expected)
      assert(t.select("k").distinct().count() == expected, "compaction duplicated rows")
      // serialization proof: CTAS + 4 APPENDs + 4 COMPACTs, dense versions
      val versions = wh.history("silver.xjvm")
        .orderBy("version").collect().map(_.getAs[Long]("version")).toSeq
      assert(versions == (0L to 8L), s"ledger versions corrupted: $versions")
    } finally if (proc.isAlive) proc.destroyForcibly()
  }

  test("cross-JVM clone vs writer: every clone is a consistent committed snapshot, no lost update") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ccxjvmk").toString
    val wh = new Warehouse(spark, root,
      keepGenerations = 2, lockWaitMs = 120_000L, lockStaleMs = 600_000L)
    wh.createOrReplace("silver", "xjvm",
      Seq((0L, 0L, "base")).toDF("k", "version", "writer"))
    val nClones = 4
    val (proc, log) = spawnChild(root, 9, nOps = nClones, mode = "clone")
    try {
      awaitReadyThenGo(root, 9, proc, log)
      // every parent upsert commits ALL 5 keys at version i in ONE
      // commit — so any consistent snapshot has the 5 keys at ONE
      // uniform version; a clone torn across generations would mix them
      val nOps = 6
      for (i <- 1 to nOps) {
        val src = Seq.tabulate(5)(j => (8000L + j, i.toLong, "parent"))
          .toDF("k", "version", "writer")
        wh.upsert("silver", "xjvm", src, keys = Seq("k"), versionCol = "version")
      }
      assert(proc.waitFor(180, TimeUnit.SECONDS), "child JVM did not finish within 180s")
      assert(proc.exitValue() == 0,
        s"child JVM failed:\n${new String(java.nio.file.Files.readAllBytes(log.toPath))}")
      // the writer lost nothing to the 4 concurrent clones
      val fin = wh.table("silver", "xjvm").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fin.size == 6 && (0 until 5).forall(j => fin(8000L + j) == nOps.toLong),
        s"lost update under clone race: $fin")
      for (i <- 1 to nClones) {
        val c = wh.table("silver", s"xjvm_clone_$i").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        assert(c.map(_._1).distinct.length == c.length,
          s"clone $i carries duplicated keys (torn across generations): $c")
        val parentVs = c.filter(_._1 >= 8000L).map(_._2).distinct
        assert(parentVs.length <= 1,
          s"clone $i mixes generations: parent keys at versions $parentVs")
        assert(c.length == 1 || c.length == 6,
          s"clone $i is not a committed snapshot: ${c.length} rows")
      }
    } finally if (proc.isAlive) proc.destroyForcibly()
  }

  test("withWriterLocks: overlapping multi-table writers acquire in sorted order and never deadlock") {
    import spark.implicits._
    val (wh, _) = freshWh()
    wh.createOrReplace("silver", "cc_m1", Seq((0L, "x")).toDF("k", "s"))
    wh.createOrReplace("silver", "cc_m2", Seq((0L, "x")).toDF("k", "s"))
    // both threads take BOTH locks, declared in opposite orders — an
    // unsorted implementation deadlocks here almost every run
    val a = fork("multi-a") {
      for (_ <- 1 to 3)
        wh.withWriterLocks(Seq(("silver", "cc_m1"), ("silver", "cc_m2"))) {
          wh.append("silver", "cc_m1", Seq((1L, "a")).toDF("k", "s"))
          wh.append("silver", "cc_m2", Seq((1L, "a")).toDF("k", "s"))
        }
    }
    val b = fork("multi-b") {
      for (_ <- 1 to 3)
        wh.withWriterLocks(Seq(("silver", "cc_m2"), ("silver", "cc_m1"))) {
          wh.append("silver", "cc_m2", Seq((2L, "b")).toDF("k", "s"))
          wh.append("silver", "cc_m1", Seq((2L, "b")).toDF("k", "s"))
        }
    }
    Seq(a, b).foreach(_._1.join(120_000))
    Seq(a, b).foreach(t => assert(t._2(0) == null, s"writer failed: ${t._2(0)}"))
    assert(wh.table("silver", "cc_m1").count() == 7)
    assert(wh.table("silver", "cc_m2").count() == 7)
  }

  test("reentrancy: upsert's bootstrap CTAS runs under the already-held lock") {
    import spark.implicits._
    val (wh, _) = freshWh(waitMs = 500L) // short: a self-deadlock would throw
    val m = wh.upsert("silver", "cc_boot",
      Seq((1L, "a", 1)).toDF("k", "payload", "v"), Seq("k"), "v")
    assert(m.inserted == 1L)
    // and an explicit nested hold is a no-op rather than a deadlock
    wh.withWriterLock("silver", "cc_boot") {
      wh.withWriterLock("silver", "cc_boot") {
        wh.append("silver", "cc_boot", Seq((2L, "b", 1)).toDF("k", "payload", "v"))
      }
    }
    assert(wh.table("silver", "cc_boot").count() == 2)
  }
}

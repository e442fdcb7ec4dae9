package graft.sources

import graft.operators.Upsert
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parquet-backed table layer — the engine's replacement for the
  * reference's Unity-Catalog-managed Delta tables (SURVEY §2.1 S3/S4/
  * S7/S8/S9/S11/S12). Tables live at `<root>/<layer>/<table>` and the
  * write path records per-operation metrics to an ops ledger, replacing
  * Delta `DESCRIBE HISTORY` (reference silver_arxiv.py:175-184).
  *
  * Scale notes: every write goes through a staging directory + rename so
  * re-runs are idempotent (SURVEY §7.4.1); `upsert` is one shuffle join
  * (see [[graft.operators.Upsert]]); nothing here collects data to the
  * driver except the ledger's single-row metric append.
  */
final class Warehouse(
    spark: SparkSession,
    root: String,
    keepGenerations: Int = 2,
    lockWaitMs: Long = 60_000L,
    lockStaleMs: Long = 600_000L
) {

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- single-writer concurrency control (Delta multi-writer parity) --
  //
  // Every mutating public op runs under a per-table writer lock, so
  // concurrent writers — other threads of this JVM or other driver JVMs
  // sharing the warehouse root — serialize per table instead of
  // corrupting the ledger (two racers both claiming version N+1) or the
  // swap (one racer retiring the other's freshly-committed generation).
  // Delta resolves multi-writer optimistically (commit file N+1 is
  // claimed atomically, conflicts re-checked, transaction retried); the
  // snapshot-dir model's rename-based swap cannot be re-checked after
  // the rename, so the engine is pessimistic: one writer per table at a
  // time. What matters at cluster scale is unchanged — writes to
  // DIFFERENT tables stay fully parallel (the lock is per table), and a
  // single table's write throughput is bounded by its one swap anyway.
  // Readers never lock: the rename design already gives a mid-plan
  // reader snapshot stability.
  //
  // The lock is an atomically-created marker at
  // `<root>/_graft_locks/<layer>.<table>.lock`: exclusive-create FILE on
  // cluster filesystems (HDFS `create(overwrite=false)` is atomic at the
  // NameNode; object stores with conditional PUT likewise), atomic
  // MKDIR on the local scheme (POSIX mkdir fails EEXIST, whereas
  // RawLocalFileSystem's create(overwrite=false) is check-then-act).
  // A writer that dies mid-op leaves its lock behind: a later writer
  // breaks locks older than `lockStaleMs` and rolls the dead writer's
  // partial swap back ([[repairCrashedSwap]]) before taking over — so
  // `lockStaleMs` must exceed the longest expected write. Acquisition
  // waits up to `lockWaitMs` with backoff, then throws
  // [[Warehouse.ConcurrentWriteException]] (the caller decides whether
  // to retry — Delta surfaces the same decision). Reentrant per thread:
  // upsert's first-merge bootstrap delegates to createOrReplace under
  // the already-held lock.

  private val heldLocks = new ThreadLocal[java.util.HashSet[String]] {
    override def initialValue(): java.util.HashSet[String] =
      new java.util.HashSet[String]()
  }

  /** Latest ledger version, cached ONLY while this thread holds the
    * table's writer lock: invalidated at acquire (so the op's first
    * lookup re-reads the ledger and sees other writers' commits),
    * advanced by [[logOp]] at commit, dropped at release. A single
    * warehouse op consults the version several times (crash repair,
    * claim, retire naming) — each was a full O(commits) ledger scan
    * (a Spark job); under the lock the ledger cannot move, so one
    * scan per op is enough. Unlocked readers never touch the cache.
    */
  private val lockedVersionCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def lockPath(name: String): Path =
    new Path(s"$root/_graft_locks/$name.lock")

  /** Atomic claim of the lock marker; false = somebody else holds it. */
  private def tryClaimLock(p: Path): Boolean =
    if (fs.getScheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      try { java.nio.file.Files.createDirectory(local); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      fs.mkdirs(p.getParent)
      try { fs.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
    }

  /** Age of the held lock; -1 if it vanished (holder just released). */
  private def lockAgeMs(p: Path): Long =
    try System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
    catch { case _: java.io.FileNotFoundException => -1L }

  /** Run `body` as the table's exclusive writer (see the design note
    * above). Public so an orchestrator can pin a multi-op transaction
    * (e.g. DELETE + COMPACT as one critical section) to a single hold.
    */
  def withWriterLock[T](layer: String, table: String)(body: => T): T = {
    val name = s"$layer.$table"
    val held = heldLocks.get()
    if (held.contains(name)) return body
    val p        = lockPath(name)
    val deadline = System.currentTimeMillis() + lockWaitMs
    var backoff  = 5L
    var claimed  = false
    var brokeStale = false
    while (!claimed) {
      if (tryClaimLock(p)) claimed = true
      else {
        val age = lockAgeMs(p)
        if (age >= lockStaleMs) {
          // holder is presumed dead — break the lock; the loop re-claims
          // (racing breakers are fine: delete is idempotent, claim is
          // atomic, and the winner repairs before writing)
          fs.delete(p, true)
          brokeStale = true
        } else if (System.currentTimeMillis() > deadline) {
          throw new Warehouse.ConcurrentWriteException(
            s"writer lock on $name still held after ${lockWaitMs}ms " +
              s"(holder age ${age}ms) — another writer is active; retry, " +
              "or raise lockWaitMs")
        } else {
          Thread.sleep(backoff)
          backoff = math.min(backoff * 2, 100L)
        }
      }
    }
    held.add(name)
    lockedVersionCache.remove(name) // re-read the ledger under OUR hold
    try {
      if (brokeStale) repairCrashedSwap(layer, table)
      body
    } finally {
      held.remove(name)
      lockedVersionCache.remove(name)
      fs.delete(p, true)
      ()
    }
  }

  /** Test-only crash injection for the swap-safety specs: set to a
    * failpoint name ("after-stage-write" | "after-retire" |
    * "after-swap") and the next swap throws there ONCE — pinning that a
    * crash before, between, or after the renames never loses data and
    * always rolls back to the last committed version (WarehouseSpec
    * "chaos:" cases exercise all three points on both the whole-table
    * and partition-scoped swaps).
    */
  @volatile private[graft] var failpoint: String = null
  private def maybeFail(point: String): Unit =
    if (failpoint == point) {
      failpoint = null
      throw new RuntimeException(s"chaos: injected failure at $point")
    }

  def tablePath(layer: String, table: String): String = s"$root/$layer/$table"

  /** Hive partition columns of the live table layout, outermost first;
    * empty for an unpartitioned table. Detected from the directory
    * names (`col=value`), the same discovery Spark's reader runs — no
    * extra metadata to keep in sync.
    */
  def partitionColumns(layer: String, table: String): Seq[String] = {
    val cols = scala.collection.mutable.ArrayBuffer[String]()
    var cur  = new Path(tablePath(layer, table))
    var go   = fs.exists(cur)
    while (go) {
      val entries = fs.listStatus(cur).filterNot(_.getPath.getName.startsWith("_"))
      val dirs    = entries.filter(s => s.isDirectory && s.getPath.getName.contains("="))
      val names   = dirs.map(_.getPath.getName.split("=", 2)(0)).distinct
      if (entries.nonEmpty && dirs.length == entries.length && names.length == 1) {
        cols += names.head
        cur = dirs.head.getPath
      } else go = false
    }
    cols.toSeq
  }

  def tableExists(layer: String, table: String): Boolean =
    fs.exists(new Path(tablePath(layer, table), "_SUCCESS"))

  def table(layer: String, table: String): DataFrame =
    // mergeSchema: an evolved table's older files lack the newer
    // columns — the merged read surfaces them as nulls. Cost is one
    // footer read per file at planning (parallelized), not data I/O.
    // Tables with live deletion vectors additionally subtract their
    // tombstones (a broadcast anti-join — see the DV section); for
    // everything else applyDv is a free pass-through.
    applyDv(rawTable(layer, table), layer, table, Long.MaxValue,
      partitionColumns(layer, table).length)

  /** The raw merged file scan, tombstones NOT subtracted. Internal
    * paths that do per-file math (`inputFiles` freshness checks, stats
    * profiling, COW planning behind the [[materializeDv]] barrier)
    * need the bare scan — an anti-join in the plan would pollute
    * `inputFiles` with the sidecar's own files.
    */
  private def rawTable(layer: String, table: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(tablePath(layer, table))

  // ---- schema evolution (Delta `mergeSchema` semantics) ----

  /** Union of two schemas by column name: existing columns keep their
    * type and order, genuinely new source columns append. A shared
    * name with a CONFLICTING type raises — silent coercion is how a
    * drifted upstream corrupts 100 TB; type widening is the caller's
    * explicit cast.
    */
  private def unionSchema(
      tgt: org.apache.spark.sql.types.StructType,
      src: org.apache.spark.sql.types.StructType
  ): org.apache.spark.sql.types.StructType = {
    src.fields.foreach { f =>
      tgt.fields.find(_.name == f.name).foreach { t =>
        require(
          t.dataType == f.dataType,
          s"schema evolution cannot change column type: ${f.name} ${t.dataType} -> ${f.dataType}")
      }
    }
    org.apache.spark.sql.types.StructType(
      tgt.fields ++ src.fields.filterNot(f => tgt.fieldNames.contains(f.name)))
  }

  /** Project df onto `schema`, null-backfilling columns it lacks. */
  private def alignTo(
      df: DataFrame,
      schema: org.apache.spark.sql.types.StructType
  ): DataFrame =
    df.select(schema.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name) else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)

  def listTables(layer: String): Seq[String] = {
    val p = new Path(s"$root/$layer")
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p)
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        // retired generations (`t.__v3`) and in-flight staging dirs
        // live beside the live table — they are not tables
        .filterNot(_.contains(".__"))
        .toSeq
        .sorted
  }

  /** Swap a fully-written staging dir into place. The outgoing
    * generation is RENAMED aside (`<table>.__v<version>`), never
    * deleted in the swap path, so (a) there is no window in which the
    * table is missing — a crash between the two renames leaves the old
    * generation recoverable, and a concurrent reader mid-plan keeps
    * its input files — and (b) retired generations are readable via
    * [[tableAsOf]] (Delta time travel). The oldest generations beyond
    * `keepGenerations` are pruned AFTER the new one is live (Delta
    * VACUUM).
    */
  private def retireAndSwap(layer: String, table: String, staging: Path): Unit = {
    maybeFail("after-stage-write")
    val target = new Path(tablePath(layer, table))
    if (fs.exists(target)) {
      val prev    = latestVersion(s"$layer.$table")
      val retired = new Path(tablePath(layer, table) + s".__v$prev")
      fs.delete(retired, true) // idempotent re-run of the same version
      if (!fs.rename(target, retired))
        throw new java.io.IOException(s"rename $target -> $retired failed")
    }
    maybeFail("after-retire")
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"rename $staging -> $target failed")
    maybeFail("after-swap")
    pruneGenerations(layer, table)
  }

  // ---- partition-scoped DML (Delta file-granular rewrite parity) ----
  //
  // A partitioned table's upsert/update/delete rewrites ONLY the
  // partition directories holding touched rows: one column-pruned pass
  // finds the touched partitions (the "find touched files" scan Delta
  // runs against its stats), the touched SLICE is rewritten to staging,
  // and each touched directory stage-swaps individually. Untouched
  // directories are never listed, read, or rewritten — a daily merge
  // touching 0.1 % of a 100 TB table's run_dates costs O(touched
  // partitions), not O(table). Pre-images retire into a SPARSE
  // generation (marker `_GRAFT_SPARSE`) holding only the replaced
  // directories plus a `_GRAFT_CREATED` manifest of the directories the
  // op CREATED (no pre-image) — what lets [[repairCrashedSwap]] roll an
  // interrupted op back to exactly the last committed version, inserts
  // included. [[tableAsOf]] overlays sparse generations onto the live
  // table to reconstruct past versions exactly.
  //
  // Directory names are never recomputed from values: the touched set
  // is matched back against the ACTUAL on-disk leaf directories in the
  // inferred-type string domain ([[retireDirsFor]]). A spelling that
  // does not round-trip through partition-value inference (`day=05`
  // read as int 5, `x=1.50` as decimal) therefore still retires — the
  // previous compute-the-name design staged `day=5` while live `day=05`
  // survived: silent row duplication (chaos + spelling cases pinned in
  // WarehouseSpec).

  /** Distinct partition-value tuples among `rows`, in the string domain
    * of the table's INFERRED partition types. The select prunes the scan
    * to the feeding predicate + partition columns; a predicate that
    * constrains partition columns directly prunes directories too.
    * Collected to the driver — bounded by the partition count, the same
    * cardinality every partition-pruning planner holds in memory.
    */
  private def touchedPartitions(rows: DataFrame, pcols: Seq[String]): Seq[Seq[String]] =
    rows
      .select(pcols.map(c => col(c).cast("string")): _*)
      .distinct()
      .collect()
      .map(r => pcols.indices.map(i => r.getString(i)).toSeq)
      .toSeq

  /** Predicate selecting exactly the given partition tuples. References
    * only partition columns, so Catalyst evaluates it against discovered
    * partition VALUES at planning (PartitionFilters) — zero data I/O
    * outside the touched directories. One encoded key per tuple feeding
    * a single `isin` (InSet at scale): a merge touching 10k run_dates is
    * one set-membership expression, not a 10k-term OR-of-ANDs tree.
    */
  private def partitionPredicate(touched: Seq[Seq[String]], pcols: Seq[String]): Column = {
    val nullMark = "\u0000"
    if (pcols.lengthCompare(1) == 0) {
      val vals = touched.map(_.head)
      val c    = col(pcols.head).cast("string")
      val in   = vals.filter(_ != null) match {
        case Seq()    => lit(false)
        case nonNull  => c.isin(nonNull: _*)
      }
      if (vals.contains(null)) in || c.isNull else in
    } else {
      val key = concat_ws("\u0001",
        pcols.map(c => coalesce(col(c).cast("string"), lit(nullMark))): _*)
      key.isin(touched.map(_.map(v => if (v == null) nullMark else v).mkString("\u0001")): _*)
    }
  }

  /** Normalize a raw directory-name value into the inferred type's
    * string form with Spark's own cast (driver-side literal eval — no
    * job): `"05"` under an int-inferred column → `"5"`, matching what
    * [[touchedPartitions]] reads back from the same directory.
    */
  private def normalizePartitionValue(
      raw: String,
      t: org.apache.spark.sql.types.DataType
  ): String = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    if (raw == null) return null
    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    try {
      val parsed = Cast(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(raw),
        org.apache.spark.sql.types.StringType), t, tz).eval(null)
      if (parsed == null) raw
      else Cast(Literal.create(parsed, t), org.apache.spark.sql.types.StringType, tz)
        .eval(null).toString
    } catch { case _: Exception => raw } // unparseable ⇒ inference kept strings
  }

  /** The live leaf directories whose parsed partition values match a
    * touched tuple — the RETIRE set of a partition-scoped swap. Both
    * sides compare in the inferred-type string domain, so every on-disk
    * spelling of a touched value (zero-padded ints, trailing-zero
    * decimals, escaped specials, `__HIVE_DEFAULT_PARTITION__`) is found
    * and replaced. Driver-side work is O(partition count).
    */
  private def retireDirsFor(
      target: Path,
      pcols: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      touched: Seq[Seq[String]]
  ): Seq[String] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val ptypes     = pcols.map(c => schema(c).dataType)
    val touchedSet = touched.map(_.toList).toSet
    leafPartitionDirs(target, pcols.length).filter { rel =>
      val parsed = rel.split("/").toList.zip(ptypes).map { case (seg, t) =>
        val raw = ExternalCatalogUtils.unescapePathName(seg.split("=", 2)(1))
        if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
        else normalizePartitionValue(raw, t)
      }
      touchedSet.contains(parsed)
    }
  }

  /** Relative paths of the hive leaf directories under `base`. */
  private def leafPartitionDirs(base: Path, depth: Int): Seq[String] = {
    def walk(p: Path, d: Int): Seq[String] =
      if (d == 0) Seq("")
      else if (!fs.exists(p)) Seq.empty
      else
        fs.listStatus(p)
          .filter(s => s.isDirectory && s.getPath.getName.contains("="))
          .toSeq
          .flatMap(s =>
            walk(s.getPath, d - 1).map(rest =>
              if (rest.isEmpty) s.getPath.getName else s.getPath.getName + "/" + rest))
    walk(base, depth).filter(_.nonEmpty)
  }

  /** Stage-swap ONLY the given partition directories — the partition-
    * scoped composition of [[retireAndSwap]]. `retireDirs` are the live
    * directories being replaced ([[retireDirsFor]]); the staged
    * directories are listed from the staging tree itself. A retired
    * partition the staging lacks simply retires (a delete emptied it);
    * a staged partition the live table lacks renames in with nothing to
    * retire (an insert created it — recorded in the generation's
    * `_GRAFT_CREATED` manifest so [[repairCrashedSwap]] can remove it
    * on rollback). Crash safety matches the whole-table swap: every
    * pre-image renames aside before any replacement lands, so no data
    * is deleted mid-op and a crash at any failpoint (after-stage-write /
    * after-retire / after-swap) rolls back to exactly the last
    * committed version (chaos-pinned in WarehouseSpec).
    */
  private def swapPartitions(
      layer: String,
      table: String,
      staging: Path,
      retireDirs: Seq[String],
      depth: Int
  ): Unit = {
    maybeFail("after-stage-write")
    val target    = new Path(tablePath(layer, table))
    val stageDirs = leafPartitionDirs(staging, depth)
    val prev      = latestVersion(s"$layer.$table")
    val retired   = new Path(tablePath(layer, table) + s".__v$prev")
    fs.delete(retired, true) // idempotent re-run of the same version
    fs.mkdirs(retired)
    // marker FIRST: a half-built generation must never be mistaken for
    // a whole-table one (repair would swap it over the live table)
    fs.createNewFile(new Path(retired, "_GRAFT_SPARSE"))
    val created =
      stageDirs.filterNot(retireDirs.contains).filterNot(rel => fs.exists(new Path(target, rel)))
    if (created.nonEmpty) {
      val out = fs.create(new Path(retired, "_GRAFT_CREATED"), true)
      try out.write(created.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    retireDirs.foreach { rel =>
      val live = new Path(target, rel)
      if (fs.exists(live)) {
        val ret = new Path(retired, rel)
        fs.mkdirs(ret.getParent)
        if (!fs.rename(live, ret))
          throw new java.io.IOException(s"rename $live -> $ret failed")
      }
    }
    maybeFail("after-retire")
    stageDirs.foreach { rel =>
      val dst = new Path(target, rel)
      if (fs.exists(dst)) {
        // a live spelling the retire matching missed — take its
        // pre-image rather than nesting the rename inside it
        val ret = new Path(retired, rel)
        fs.mkdirs(ret.getParent)
        if (!fs.rename(dst, ret))
          throw new java.io.IOException(s"rename $dst -> $ret failed")
      }
      fs.mkdirs(dst.getParent)
      if (!fs.rename(new Path(staging, rel), dst))
        throw new java.io.IOException(s"rename ${new Path(staging, rel)} -> $dst failed")
    }
    maybeFail("after-swap")
    fs.delete(staging, true)
    pruneGenerations(layer, table)
  }

  /** Depth of the hive directory tree under `p` (0 = unpartitioned). */
  private def partitionDepth(p: Path): Int = {
    var cur = p
    var d   = 0
    var go  = fs.exists(cur)
    while (go) {
      val dirs = fs.listStatus(cur).filter(s => s.isDirectory && s.getPath.getName.contains("="))
      if (dirs.nonEmpty) { d += 1; cur = dirs.head.getPath }
      else go = false
    }
    d
  }

  /** Roll back a swap that crashed mid-op. A COMPLETED op's newest
    * retired generation is always `.__v{current-1}`, so finding
    * `.__v{current}` means an op died between its renames before its
    * ledger commit. Every pre-image that generation holds moves back
    * into the live table, any directory the op CREATED (the sparse
    * generation's `_GRAFT_CREATED` manifest — an insert-made partition
    * has no pre-image to restore) is deleted, and any half-swapped
    * replacement is discarded — the op never committed, so its output
    * is re-derivable by re-running it.
    *
    * Separately, EVERY change-feed partition newer than the committed
    * ledger version is purged: ops write their feed rows before their
    * swap commits, so a crash in that window leaves committed-looking
    * feed rows for a version the ledger never records — with no `.__v`
    * directory to betray them. A retry would append the same rows
    * again and CDC consumers would double-apply ([[changeFeed]] also
    * hides them read-side). Table, feed, and ledger return to exactly
    * the last committed version. Runs automatically at the head of
    * every mutating op; idempotent; returns whether anything was
    * repaired.
    */
  def repairCrashedSwap(layer: String, table: String): Boolean =
    withWriterLock(layer, table)(repairCrashedSwapImpl(layer, table))

  private def repairCrashedSwapImpl(layer: String, table: String): Boolean = {
    val cur      = latestVersion(s"$layer.$table")
    val target   = new Path(tablePath(layer, table))
    val gen      = new Path(tablePath(layer, table) + s".__v$cur")
    var repaired = false
    if (cur >= 0 && fs.exists(gen)) {
      repaired = true
      if (fs.exists(new Path(gen, "_GRAFT_SPARSE"))) {
        val manifest = new Path(gen, "_GRAFT_CREATED")
        if (fs.exists(manifest)) {
          val in = fs.open(manifest)
          val created =
            try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
            finally in.close()
          created.filter(_.nonEmpty).foreach(rel => fs.delete(new Path(target, rel), true))
        }
        leafPartitionDirs(gen, partitionDepth(gen)).foreach { rel =>
          val live = new Path(target, rel)
          fs.delete(live, true) // uncommitted replacement, if the swap got that far
          fs.mkdirs(live.getParent)
          if (!fs.rename(new Path(gen, rel), live))
            throw new java.io.IOException(s"rollback rename ${new Path(gen, rel)} -> $live failed")
        }
        fs.delete(gen, true)
      } else {
        fs.delete(target, true) // uncommitted replacement, if the swap got that far
        if (!fs.rename(gen, target))
          throw new java.io.IOException(s"rollback rename $gen -> $target failed")
      }
    }
    // phantom feed rows: any feed partition beyond the committed
    // version is an uncommitted op's output — a pre-swap crash leaves
    // no generation, so this check is unconditional
    val feed = new Path(tablePath(layer, table) + ".__changes")
    if (fs.exists(feed)) {
      fs.listStatus(feed)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("_commit_part="))
        .foreach { s =>
          s.getPath.getName.stripPrefix("_commit_part=").toLongOption.foreach { v =>
            if (v > cur) { fs.delete(s.getPath, true); repaired = true }
          }
        }
    }
    // phantom deletion-vector partitions: a MOR op writes tombstones —
    // and, for UPDATE_MOR, moves its appended post-image files in
    // under the partition's _GRAFT_FILES manifest — BEFORE its ledger
    // commit. A crash in that window must roll ALL of it back:
    // purging the tombstones alone would resurrect the pre-images
    // NEXT TO the already-landed post-images (silent duplication).
    val dvp = dvPath(layer, table)
    if (fs.exists(dvp)) {
      fs.listStatus(dvp)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("_commit_part="))
        .foreach { s =>
          s.getPath.getName.stripPrefix("_commit_part=").toLongOption.foreach { v =>
            if (v > cur) {
              val manifest = new Path(s.getPath, "_GRAFT_FILES")
              if (fs.exists(manifest)) {
                val in = fs.open(manifest)
                val appended =
                  try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
                    .filter(_.nonEmpty).toList
                  finally in.close()
                // manifest entries are encoded; the filesystem wants
                // the on-disk (decoded) spelling
                appended.foreach(rel =>
                  fs.delete(new Path(target, decodeDvRel(rel)), false))
              }
              fs.delete(s.getPath, true)
              repaired = true
            }
          }
        }
    }
    fs.delete(new Path(tablePath(layer, table) + ".__mor_staging"), true)
    repaired
  }

  /** Partition-scoped DELETE — see the section comment above. Returns
    * the deleted-row count; a predicate matching nothing skips the
    * rewrite/feed/generation but still logs a `DELETE 0` ledger commit
    * with a version bump (Delta records a DELETE commit even at zero
    * matched rows — the one no-op convention across all six DML entry
    * points; a version with no generation folds into its predecessor
    * on time travel, like APPEND). Ledger `num_output_rows` records
    * the rows REWRITTEN (the touched slice's survivors), not the table.
    */
  private def deletePartitioned(
      layer: String,
      table: String,
      predicate: Column,
      pcols: Seq[String]
  ): Long = {
    val target = tablePath(layer, table)
    val df     = spark.read.option("mergeSchema", "true").parquet(target)
    val hit    = coalesce(predicate, lit(false))
    val touched = touchedPartitions(df.filter(hit), pcols)
    if (touched.isEmpty) {
      logOp(layer, table, "DELETE", inserted = 0, updated = 0, outputRows = 0)
      return 0L
    }
    val ver     = nextVersion(s"$layer.$table")
    val slice   = df.filter(partitionPredicate(touched, pcols))
    val staging = new Path(target + ".__staging")
    fs.delete(staging, true)
    // file-granular COW *within* the touched partitions, compounding
    // the partition scoping: only files that contain matched rows are
    // decoded and rewritten; the other files of the touched dirs
    // byte-copy into the staged leaf dirs (untouched partitions were
    // never in scope at all). basePath keeps the hive partition
    // columns inferable on the touched-file read.
    val retireDirs = retireDirsFor(new Path(target), pcols, df.schema, touched)
    val touchedF   = touchedFiles(slice, hit)
    val carryPairs = dataFilesUnder(new Path(target), retireDirs)
      .filterNot(p => touchedF.contains(p._1))
    val touchedDf = readFilesAligned(touchedF.toSeq, df.schema, basePath = Some(target))
    val keptObs = org.apache.spark.sql.Observation()
    touchedDf.filter(!hit).observe(keptObs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).partitionBy(pcols: _*).parquet(staging.toString)
    copyFilesInto(carryPairs, staging)
    val keptRewritten = keptObs.get("n").asInstanceOf[Long]
    val keptCarried =
      if (carryPairs.isEmpty) 0L
      else footerRowCount(carryPairs.map(_._1), Some(target))
    val obs = org.apache.spark.sql.Observation()
    touchedDf.filter(hit)
      .withColumn("_change_type", lit("delete"))
      .withColumn("_commit_version", lit(ver))
      .withColumn("_commit_part", lit(f"$ver%010d"))
      .observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Append).partitionBy("_commit_part")
      .parquet(target + ".__changes")
    val deleted = obs.get("n").asInstanceOf[Long]
    swapPartitions(layer, table, staging, retireDirs, pcols.length)
    logOp(layer, table, "DELETE", inserted = 0, updated = 0,
      outputRows = keptRewritten + keptCarried, version = ver, deleted = deleted)
    deleted
  }

  /** Partition-scoped UPDATE. Partition-column assignments are refused:
    * they would move rows across directories, which is MERGE semantics
    * ([[upsert]] handles moves correctly via its matched-key partition
    * set). Returns the updated-row count; zero matches skips the
    * rewrite but logs an `UPDATE 0` commit (the unified no-op
    * convention — see [[deletePartitioned]]).
    */
  private def updatePartitioned(
      layer: String,
      table: String,
      predicate: Column,
      assignments: Map[String, Column],
      pcols: Seq[String]
  ): Long = {
    require(
      !assignments.keys.exists(pcols.contains),
      s"partition-scoped UPDATE cannot assign partition columns (${pcols.mkString(",")}): " +
        "rows would move between partitions — use upsert (MERGE) instead")
    val target = tablePath(layer, table)
    val df     = spark.read.option("mergeSchema", "true").parquet(target)
    assignments.keys.foreach(c =>
      require(df.columns.contains(c), s"UPDATE assigns unknown column $c"))
    val hit     = coalesce(predicate, lit(false))
    val touched = touchedPartitions(df.filter(hit), pcols)
    if (touched.isEmpty) {
      logOp(layer, table, "UPDATE", inserted = 0, updated = 0, outputRows = 0)
      return 0L
    }
    val ver     = nextVersion(s"$layer.$table")
    val slice   = df.filter(partitionPredicate(touched, pcols))
    val staging = new Path(target + ".__staging")
    fs.delete(staging, true)
    // file-granular COW within the touched partitions (see
    // [[deletePartitioned]]): decode only the files holding matched
    // rows, byte-copy the rest of the touched dirs
    val retireDirs = retireDirsFor(new Path(target), pcols, df.schema, touched)
    val touchedF   = touchedFiles(slice, hit)
    val carryPairs = dataFilesUnder(new Path(target), retireDirs)
      .filterNot(p => touchedF.contains(p._1))
    val touchedDf = readFilesAligned(touchedF.toSeq, df.schema, basePath = Some(target))
    val rewritten = touchedDf.select(df.schema.fields.toSeq.map { f =>
      assignments.get(f.name) match {
        case Some(a) => when(hit, a.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
        case None    => col(f.name)
      }
    }: _*)
    val rowsObs = org.apache.spark.sql.Observation()
    rewritten.observe(rowsObs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).partitionBy(pcols: _*).parquet(staging.toString)
    copyFilesInto(carryPairs, staging)
    val rewrittenRows = rowsObs.get("n").asInstanceOf[Long]
    val carriedRows =
      if (carryPairs.isEmpty) 0L
      else footerRowCount(carryPairs.map(_._1), Some(target))
    val pre = touchedDf.filter(hit).withColumn("_change_type", lit("update_preimage"))
    val post = touchedDf.filter(hit)
      .select(df.schema.fields.toSeq.map { f =>
        assignments.get(f.name) match {
          case Some(a) => a.cast(f.dataType).as(f.name)
          case None    => col(f.name)
        }
      }: _*)
      .withColumn("_change_type", lit("update_postimage"))
    val obs = org.apache.spark.sql.Observation()
    pre.unionByName(post)
      .withColumn("_commit_version", lit(ver))
      .withColumn("_commit_part", lit(f"$ver%010d"))
      .observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Append).partitionBy("_commit_part")
      .parquet(target + ".__changes")
    val updated = obs.get("n").asInstanceOf[Long] / 2
    swapPartitions(layer, table, staging, retireDirs, pcols.length)
    logOp(layer, table, "UPDATE", inserted = 0, updated = updated,
      outputRows = rewrittenRows + carriedRows, version = ver)
    updated
  }

  /** Partition-scoped MERGE. Touched = the source rows' partitions (the
    * insert/update destinations) ∪ the partitions of target rows whose
    * keys the source carries (the matched rows' CURRENT homes) — so a
    * source row that changes a matched row's partition value rewrites
    * BOTH directories and the row moves without duplication. The merge
    * itself runs only over the touched slice.
    */
  private def upsertPartitioned(
      layer: String,
      table: String,
      src: DataFrame,
      keys: Seq[String],
      versionCol: String,
      pcols: Seq[String]
  ): Upsert.WriteMetrics = {
    require(
      pcols.forall(src.columns.contains),
      s"partitioned MERGE source must carry the partition columns (${pcols.mkString(",")})")
    val tgt0       = this.table(layer, table)
    val unioned    = unionSchema(tgt0.schema, src.schema)
    val srcAligned = alignTo(src, unioned)
    val srcParts   = touchedPartitions(srcAligned, pcols)
    val srcKeys    = srcAligned.select(keys.map(col): _*).distinct()
    // ONE semi-join pass yields both the matched partitions (the
    // matched rows' current homes) and the matched FILES (the COW
    // rewrite set) — `input_file_name()` rides along the same scan, so
    // file-granular COW costs no extra pass over the pre-COW plan
    val tgtF = tgt0.withColumn("__graft_file", input_file_name())
    val matchedRows = tgtF
      .join(srcKeys, keys.map(k => tgtF(k) <=> srcKeys(k)).reduce(_ && _), "left_semi")
      .select((pcols.map(c => col(c).cast("string")) :+ col("__graft_file")): _*)
      .distinct().collect()
    val matchedParts: Seq[Seq[String]] =
      matchedRows.map(r => pcols.indices.map(r.getString).toSeq).toSeq.distinct
    val matchedKeyFiles: Set[String] =
      matchedRows.map(r => normDataFile(r.getString(pcols.length))).toSet
    val touched = (srcParts ++ matchedParts).distinct
    if (touched.isEmpty) {
      // touched empty ⟺ the source has zero rows. Documented divergence:
      // a ZERO-ROW source carrying a new column does not evolve the
      // schema here (Delta would update metadata); with no rows there is
      // no partition slice to rewrite the column into, and rewriting the
      // whole table for an empty source is the wrong trade at scale.
      // Any nonzero-row source with a new column DOES evolve (below).
      logOp(layer, table, "MERGE", inserted = 0, updated = 0, outputRows = 0)
      return Upsert.WriteMetrics(inserted = 0, updated = 0, kept = 0)
    }
    val slicePred = partitionPredicate(touched, pcols)
    val sliceTgt  = tgt0.filter(slicePred)
    // File-granular COW within the touched slice (see the unpartitioned
    // path): only slice files holding a source key enter the merge —
    // a matched row that MOVES partition is in such a file, so both its
    // old home (rewritten without it) and its new home (insert into the
    // staged dir) commit correctly. The rest of the touched dirs
    // byte-copy. A source-only NEW column forces a full slice rewrite.
    val newCols    = unioned.fieldNames.filterNot(tgt0.columns.contains)
    val retireDirs = retireDirsFor(new Path(tablePath(layer, table)), pcols, tgt0.schema, touched)
    val sliceFilePairs = dataFilesUnder(new Path(tablePath(layer, table)), retireDirs)
    val matchedFiles: Set[String] =
      if (newCols.nonEmpty) sliceFilePairs.map(_._1).toSet
      else matchedKeyFiles
    val carryPairs = sliceFilePairs.filterNot(p => matchedFiles.contains(p._1))
    val touchedTgt =
      if (matchedFiles.isEmpty) sliceTgt.limit(0)
      else readFilesAligned(matchedFiles.toSeq, tgt0.schema,
        basePath = Some(tablePath(layer, table)))
    val mr = Upsert.mergeWithMetrics(alignTo(touchedTgt, unioned), srcAligned, keys, versionCol,
      insertOnlyCols = identityColumns(layer, table).map(_._1).toSet)
    val m  = mr.metrics
    // zero-change early exit (the unified no-op convention, same as the
    // unpartitioned path): the metrics pass is a narrow column-pruned
    // aggregation, so a re-run where every source row loses the version
    // rule is detected cheaply — skip the touched-slice rewrite, the empty
    // feed partition, and the swap entirely; every partition file stays
    // byte-identical. Still log a MERGE 0/0 commit with a version bump
    // (Delta records a MERGE commit even at zero changed rows; the
    // reference reads DESCRIBE HISTORY after every run).
    // (the newCols probe above also forces the slice rewrite on a
    // zero-change merge with a source-only column — mergeSchema on
    // table() then surfaces the evolved column table-wide)
    if (m.inserted == 0 && m.updated == 0 && newCols.isEmpty) {
      mr.unpersist()
      logOp(layer, table, "MERGE", inserted = 0, updated = 0, outputRows = 0)
      return m
    }
    val staging = new Path(tablePath(layer, table) + ".__staging")
    fs.delete(staging, true)
    val ver = nextVersion(s"$layer.$table")
    // footer-only count BEFORE the feed write (minimal commit window —
    // see WarehouseStreams.mvRefreshSink)
    val carried =
      if (carryPairs.isEmpty) 0L
      else footerRowCount(carryPairs.map(_._1), Some(tablePath(layer, table)))
    try {
      mr.result.write.mode(SaveMode.Overwrite).partitionBy(pcols: _*).parquet(staging.toString)
      copyFilesInto(carryPairs, staging)
      val post = mr.merged
        .filter(col(Upsert.ActionCol) =!= "keep")
        .withColumn("_change_type",
          when(col(Upsert.ActionCol) === "insert", lit("insert"))
            .otherwise(lit("update_postimage")))
        .drop(Upsert.ActionCol)
      val updatedKeys = mr.merged
        .filter(col(Upsert.ActionCol) === "update")
        .select(keys.map(col): _*)
      val pre = touchedTgt
        .join(updatedKeys,
          keys.map(k => touchedTgt(k) <=> updatedKeys(k)).reduce(_ && _), "left_semi")
        .select(unioned.fieldNames.map(n =>
          if (tgt0.columns.contains(n)) col(n)
          else lit(null).cast(unioned(n).dataType).as(n)): _*)
        .withColumn("_change_type", lit("update_preimage"))
      post.unionByName(pre)
        .withColumn("_commit_version", lit(ver))
        .withColumn("_commit_part", lit(f"$ver%010d"))
        .write.mode(SaveMode.Append).partitionBy("_commit_part")
        .parquet(tablePath(layer, table) + ".__changes")
    } finally mr.unpersist()
    // retire = live dirs matching the touched tuples; the staged dirs
    // (what the merge actually wrote) are listed inside the swap itself
    swapPartitions(layer, table, staging, retireDirs, pcols.length)
    logOp(layer, table, "MERGE", m.inserted, m.updated,
      outputRows = m.outputRows + carried, version = ver)
    m
  }

  /** Partition-scoped full-clause MERGE (the [[upsertPartitioned]]
    * machinery for [[mergeClauses]]): touched partitions = source
    * rows' partitions ∪ matched target rows' current homes, so matched
    * UPDATEs/DELETEs rewrite only their slice and partition moves
    * commit in both homes. A BY SOURCE clause can modify any target
    * row, so its presence widens the slice to every partition — the
    * same all-files rule as the flat layout, expressed as dirs.
    * Delete-action rows leave the slice rewrite and land in the feed
    * as `delete` pre-images.
    */
  private def mergeClausesPartitioned(
      layer: String,
      table: String,
      src: DataFrame,
      keys: Seq[String],
      matched: Seq[graft.operators.MergeClause.Matched],
      notMatched: Seq[graft.operators.MergeClause.NotMatched],
      bySource: Seq[graft.operators.MergeClause.BySource],
      pcols: Seq[String]
  ): Upsert.MergeClauseMetrics = {
    require(
      pcols.forall(src.columns.contains),
      s"partitioned MERGE source must carry the partition columns (${pcols.mkString(",")})")
    val tgt0       = this.table(layer, table)
    val unioned    = unionSchema(tgt0.schema, src.schema)
    validateClauseAssignments(layer, table, unioned.fieldNames.toSeq,
      matched, notMatched, bySource)
    val srcAligned = alignTo(src, unioned)
    val tgtF = tgt0.withColumn("__graft_file", input_file_name())
    val srcKeys = srcAligned.select(keys.map(col): _*).distinct()
    val matchedRows = tgtF
      .join(srcKeys, keys.map(k => tgtF(k) <=> srcKeys(k)).reduce(_ && _), "left_semi")
      .select((pcols.map(c => col(c).cast("string")) :+ col("__graft_file")): _*)
      .distinct().collect()
    val matchedParts: Seq[Seq[String]] =
      matchedRows.map(r => pcols.indices.map(r.getString).toSeq).toSeq.distinct
    val matchedKeyFiles: Set[String] =
      matchedRows.map(r => normDataFile(r.getString(pcols.length))).toSet
    val touched: Seq[Seq[String]] =
      if (bySource.nonEmpty) touchedPartitions(tgt0, pcols)
      else (touchedPartitions(srcAligned, pcols) ++ matchedParts).distinct
    if (touched.isEmpty) {
      logOp(layer, table, "MERGE", inserted = 0, updated = 0, outputRows = 0)
      return Upsert.MergeClauseMetrics(0, 0, 0, 0)
    }
    val newCols    = unioned.fieldNames.filterNot(tgt0.columns.contains)
    val retireDirs = retireDirsFor(new Path(tablePath(layer, table)), pcols, tgt0.schema, touched)
    val sliceFilePairs = dataFilesUnder(new Path(tablePath(layer, table)), retireDirs)
    val matchedFiles: Set[String] =
      if (newCols.nonEmpty || bySource.nonEmpty) sliceFilePairs.map(_._1).toSet
      else matchedKeyFiles
    val carryPairs = sliceFilePairs.filterNot(p => matchedFiles.contains(p._1))
    val sliceTgt   = tgt0.filter(partitionPredicate(touched, pcols))
    val touchedTgt =
      if (matchedFiles.isEmpty) sliceTgt.limit(0)
      else readFilesAligned(matchedFiles.toSeq, tgt0.schema,
        basePath = Some(tablePath(layer, table)))
    val idCols = identityColumns(layer, table).map(_._1).toSet
    val merged = Upsert.planClauses(alignTo(touchedTgt, unioned), srcAligned,
      keys, matched, notMatched, bySource, insertOnlyCols = idCols)
    // Action counts AND the output rows' partition tuples in one job: a
    // clause expression may ASSIGN a partition column (UPDATE SET pcol=…,
    // INSERT (…, pcol) VALUES(…, expr)), landing rows in a partition
    // outside `touched`. Such a partition must join the slice BEFORE
    // retireDirs/carry are fixed, or the swap would replace its live
    // directory with only the merged rows (silent data loss).
    val actionParts = merged
      .groupBy((col(Upsert.ActionCol) +: pcols.map(c => col(c).cast("string"))): _*)
      .count().collect()
    val counts = actionParts
      .groupBy(_.getString(0)).map { case (a, rs) => a -> rs.map(_.getLong(pcols.length + 1)).sum }
    val ins = counts.getOrElse("insert", 0L)
    val upd = counts.getOrElse("update", 0L)
    val del = counts.getOrElse("delete", 0L)
    val keptPlan = counts.getOrElse("keep", 0L)
    if (ins == 0 && upd == 0 && del == 0 && newCols.isEmpty) {
      logOp(layer, table, "MERGE", inserted = 0, updated = 0, outputRows = 0)
      val carried0 =
        if (carryPairs.isEmpty) 0L
        else footerRowCount(carryPairs.map(_._1), Some(tablePath(layer, table)))
      return Upsert.MergeClauseMetrics(0, 0, 0, keptPlan + carried0)
    }
    // Widen the slice with any partition the merged OUTPUT lands in that
    // the source/matched-homes scan missed (partition-column assignment).
    // Those partitions' target rows can never be key-matched (all matched
    // homes are already in `touched`), so the plan above is unaffected —
    // their live files simply byte-carry into the staging tree.
    val outParts: Seq[Seq[String]] = actionParts.toSeq
      .filter(r => r.getString(0) == "insert" || r.getString(0) == "update")
      .map(r => pcols.indices.map(i => r.getString(i + 1)).toSeq)
      .distinct
    val touchedAll = (touched ++ outParts).distinct
    val (retireAll, carryAll) =
      if (touchedAll.lengthCompare(touched.length) == 0) (retireDirs, carryPairs)
      else {
        val rd = retireDirsFor(new Path(tablePath(layer, table)), pcols, tgt0.schema, touchedAll)
        (rd, dataFilesUnder(new Path(tablePath(layer, table)), rd)
          .filterNot(p => matchedFiles.contains(p._1)))
      }
    val staging = new Path(tablePath(layer, table) + ".__staging")
    fs.delete(staging, true)
    val ver = nextVersion(s"$layer.$table")
    val carried =
      if (carryAll.isEmpty) 0L
      else footerRowCount(carryAll.map(_._1), Some(tablePath(layer, table)))
    merged.filter(col(Upsert.ActionCol) =!= "delete").drop(Upsert.ActionCol)
      .write.mode(SaveMode.Overwrite).partitionBy(pcols: _*).parquet(staging.toString)
    copyFilesInto(carryAll, staging)
    val post = merged
      .filter(col(Upsert.ActionCol).isin("insert", "update"))
      .withColumn("_change_type",
        when(col(Upsert.ActionCol) === "insert", lit("insert"))
          .otherwise(lit("update_postimage")))
      .drop(Upsert.ActionCol)
    val updatedKeys = merged
      .filter(col(Upsert.ActionCol) === "update")
      .select(keys.map(col): _*)
    val pre = touchedTgt
      .join(updatedKeys,
        keys.map(k => touchedTgt(k) <=> updatedKeys(k)).reduce(_ && _), "left_semi")
      .select(unioned.fieldNames.map(n =>
        if (tgt0.columns.contains(n)) col(n)
        else lit(null).cast(unioned(n).dataType).as(n)): _*)
      .withColumn("_change_type", lit("update_preimage"))
    val delRows = merged
      .filter(col(Upsert.ActionCol) === "delete")
      .drop(Upsert.ActionCol)
      .withColumn("_change_type", lit("delete"))
    post.unionByName(pre).unionByName(delRows)
      .withColumn("_commit_version", lit(ver))
      .withColumn("_commit_part", lit(f"$ver%010d"))
      .write.mode(SaveMode.Append).partitionBy("_commit_part")
      .parquet(tablePath(layer, table) + ".__changes")
    swapPartitions(layer, table, staging, retireAll, pcols.length)
    logOp(layer, table, "MERGE", ins, upd,
      outputRows = ins + upd + keptPlan + carried, version = ver, deleted = del)
    Upsert.MergeClauseMetrics(ins, upd, del, keptPlan + carried)
  }

  private def pruneGenerations(layer: String, table: String): Unit = {
    pruneGenerationsTo(layer, table, keepGenerations); ()
  }

  private def pruneGenerationsTo(layer: String, table: String, retain: Int): Long = {
    val layerDir = new Path(s"$root/$layer")
    val prefix   = table + ".__v"
    if (!fs.exists(layerDir)) return 0L
    val gens = fs
      .listStatus(layerDir)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(prefix) => n.stripPrefix(prefix).toLongOption.map((n, _)) }
      .flatten
      .sortBy(-_._2)
    val victims = gens.drop(retain)
    victims.foreach { case (n, _) =>
      fs.delete(new Path(s"$root/$layer/$n"), true)
    }
    victims.length.toLong
  }

  /** Explicit VACUUM (Delta `VACUUM` parity in the snapshot-dir model):
    * drop all but the newest `retainGenerations` retired generations
    * NOW, instead of waiting for the automatic per-write pruning bound.
    * Time travel to a vacuumed version refuses (never silently serves
    * wrong data — pinned in WarehouseSpec); the change feed is
    * unaffected (it is append-only history, Delta keeps CDF through
    * VACUUM too). Records a `VACUUM` ledger commit with the number of
    * generations removed; returns that count.
    */
  def vacuum(layer: String, table: String, retainGenerations: Int = 0): Long =
    withWriterLock(layer, table)(vacuumImpl(layer, table, retainGenerations))

  private def vacuumImpl(layer: String, table: String, retainGenerations: Int): Long = {
    require(retainGenerations >= 0, "retainGenerations must be >= 0")
    val removed = pruneGenerationsTo(layer, table, retainGenerations)
    logOp(layer, table, "VACUUM", inserted = 0, updated = 0, outputRows = removed)
    removed
  }

  /** VACUUM with Delta's time-based contract (`VACUUM t RETAIN n
    * HOURS`): drop retired generations whose RETIRING commit — the
    * first rewriting commit after the generation's version, i.e. the
    * ledger moment the snapshot stopped being current — is older than
    * `nowMillis - retainHours`. Generations retired inside the window
    * stay readable for time travel, exactly Delta's
    * deletedFileRetentionDuration semantics; a generation whose
    * retiring commit cannot be located in the ledger is never removed
    * (fail-safe: retention must not break the newest snapshots). The
    * live table and the append-only change feed are untouched, as in
    * [[vacuum]]. Returns the number of generations removed; the
    * `nowMillis` parameter exists for deterministic tests.
    */
  def vacuumRetainHours(
      layer: String,
      table: String,
      retainHours: Double,
      nowMillis: Long = System.currentTimeMillis()
  ): Long =
    withWriterLock(layer, table)(
      vacuumRetainImpl(layer, table, retainHours, nowMillis))

  private def vacuumRetainImpl(
      layer: String,
      table: String,
      retainHours: Double,
      nowMillis: Long
  ): Long = {
    require(retainHours >= 0, "retainHours must be >= 0")
    val name     = s"$layer.$table"
    val horizon  = nowMillis - (retainHours * 3600_000L).toLong
    val layerDir = new Path(s"$root/$layer")
    val prefix   = table + ".__v"
    if (!fs.exists(layerDir)) return 0L
    val gens = fs.listStatus(layerDir).map(_.getPath.getName)
      .collect { case n if n.startsWith(prefix) =>
        n.stripPrefix(prefix).toLongOption.map((n, _)) }
      .flatten
    if (gens.isEmpty) {
      logOp(layer, table, "VACUUM", inserted = 0, updated = 0, outputRows = 0)
      return 0L
    }
    // one ledger read serves both lookups: the rewriting commits (what
    // retires a generation) and every commit's timestamp
    val rewriting = rewritingAfter(name, -1L)
    val tsByVer = history(name).select(col("version"), col("ts_millis")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val victims = gens.filter { case (_, k) =>
      val retiringVer = rewriting.filter(_ > k).minOption
      retiringVer.flatMap(tsByVer.get) match {
        case Some(retiredTs) => retiredTs < horizon
        case None            => false
      }
    }
    victims.foreach { case (n, _) =>
      fs.delete(new Path(s"$root/$layer/$n"), true)
    }
    logOp(layer, table, "VACUUM", inserted = 0, updated = 0,
      outputRows = victims.length.toLong)
    victims.length.toLong
  }

  /** Replace a 1-row, 1-column BIGINT state table (an MV's feed
    * cursor, a watermark) entirely DRIVER-SIDE: the row writes with
    * parquet-java (no Spark job — a 1-row `toDF.write` pays ~200 ms of
    * scheduler latency, and DML-heavy bodies pay it per commit),
    * through the same staged swap + ledger commit as
    * [[createOrReplace]], so locking, crash repair, time travel and
    * `table()` reads are unchanged. [[readScalarLong]] is the matching
    * jobless read; both interoperate with Spark-written generations of
    * the same table.
    */
  def writeScalarLong(layer: String, table: String, colName: String, value: Long): Unit =
    withWriterLock(layer, table) {
      repairCrashedSwap(layer, table)
      val staging = new Path(tablePath(layer, table) + ".__staging")
      fs.delete(staging, true)
      fs.mkdirs(staging)
      val schema = org.apache.parquet.schema.MessageTypeParser.parseMessageType(
        s"message scalar { required int64 $colName; }")
      val file = new Path(staging, s"part-graft-${java.util.UUID.randomUUID()}.snappy.parquet")
      val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
        .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
          file, spark.sparkContext.hadoopConfiguration))
        .withType(schema)
        .withCompressionCodec(
          org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
        .build()
      try {
        val g = new org.apache.parquet.example.data.simple.SimpleGroup(schema)
        g.append(colName, value)
        writer.write(g)
      } finally writer.close()
      retireAndSwap(layer, table, staging)
      logOp(layer, table, "CREATE OR REPLACE", inserted = 1, updated = 0, outputRows = 1)
    }

  /** Jobless read of a [[writeScalarLong]]-shaped state table: the
    * single BIGINT of its single row, straight from the data files.
    */
  def readScalarLong(layer: String, table: String): Long = {
    val dir = new Path(tablePath(layer, table))
    require(fs.exists(dir), s"$layer.$table does not exist")
    val rows = fs.listStatus(dir)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .flatMap { st =>
        val reader = org.apache.parquet.hadoop.ParquetReader
          .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), st.getPath)
          .withConf(spark.sparkContext.hadoopConfiguration)
          .build()
        try {
          Iterator.continually(reader.read()).takeWhile(_ != null)
            .map(g => g.getLong(0, 0)).toArray
        } finally reader.close()
      }
    require(rows.length == 1, s"$layer.$table is not a 1-row scalar table (${rows.length} rows)")
    rows.head
  }

  /** DESCRIBE DETAIL parity: one row of physical table facts —
    * format, file count, total bytes, partition columns, retained
    * generation count, and the current ledger version. All from
    * driver-side listings (O(files)), no data read.
    */
  def detail(layer: String, table: String): DataFrame = {
    import spark.implicits._
    val live  = new Path(tablePath(layer, table))
    require(fs.exists(live), s"$layer.$table does not exist")
    def walkBytes(p: Path): (Long, Long) = {
      val st = fs.listStatus(p)
      val files = st.filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      val dirs  = st.filter(_.isDirectory)
      val sub   = dirs.map(d => walkBytes(d.getPath))
      (files.length.toLong + sub.map(_._1).sum, files.map(_.getLen).sum + sub.map(_._2).sum)
    }
    val (numFiles, bytes) = walkBytes(live)
    val layerDir = new Path(s"$root/$layer")
    val prefix   = table + ".__v"
    val gens =
      if (!fs.exists(layerDir)) 0L
      else fs.listStatus(layerDir).count(s =>
        s.getPath.getName.startsWith(prefix) &&
          s.getPath.getName.stripPrefix(prefix).toLongOption.nonEmpty).toLong
    // the deletion-vector gauge: tombstones current reads broadcast —
    // the number an operator watches to schedule [[reorg]] (zero
    // without DV state, at zero jobs; a KB-sized sidecar count when
    // tombstones are live)
    val tombstones = dvRowsFor(layer, table, Long.MaxValue)
      .map(_.count()).getOrElse(0L)
    // the effective time-travel horizon: the smallest version still
    // servable (oldest retained generation, or the live version when
    // no generation is retained) — what VACUUM / vacuumRetainHours
    // advances, surfaced so an operator can see the retention floor
    val cur = latestVersion(s"$layer.$table")
    val oldestRetained =
      if (!fs.exists(layerDir)) cur
      else fs.listStatus(layerDir).map(_.getPath.getName)
        .collect { case n if n.startsWith(prefix) =>
          n.stripPrefix(prefix).toLongOption }
        .flatten.minOption.getOrElse(cur)
    Seq((s"$layer.$table", "parquet", numFiles, bytes,
      partitionColumns(layer, table).mkString(","), gens,
      cur, tombstones, oldestRetained))
      .toDF("name", "format", "num_files", "size_in_bytes",
        "partition_columns", "retained_generations", "current_version",
        "live_tombstones", "oldest_retained_version")
  }

  /** Drop the table's entire physical state: live data, retired
    * generations, and every sidecar (`.__changes` feed, stats, blooms,
    * constraints) — a dropped-then-recreated table must not inherit a
    * stale change feed or contract. Ledger history rows remain as the
    * audit trail, so a recreated table's versions continue rather than
    * restart (time travel across the drop refuses — the generations
    * are gone).
    */
  def dropTable(layer: String, table: String): Unit =
    withWriterLock(layer, table) {
      val layerDir = new Path(s"$root/$layer")
      if (fs.exists(layerDir))
        fs.listStatus(layerDir)
          .map(_.getPath)
          .filter(p => p.getName == table || p.getName.startsWith(table + ".__"))
          .foreach(fs.delete(_, true))
      ()
    }


  /** Row count of parquet `files` from footer metadata only. Small
    * sets read DRIVER-SIDE (a per-file `getRecordCount` is one footer
    * fetch — no Spark job, no ~200 ms scheduler latency, which every
    * COW op paid once per commit for its carried-file count); large
    * sets fall back to the distributed zero-column count so a
    * million-file table never serializes footer fetches through the
    * driver.
    */
  private def footerRowCount(files: Seq[String], basePath: Option[String] = None): Long = {
    if (files.isEmpty) return 0L
    if (files.length > 256) {
      val reader = basePath.foldLeft(spark.read)((r, bp) => r.option("basePath", bp))
      return reader.parquet(files: _*).count()
    }
    val conf = spark.sparkContext.hadoopConfiguration
    files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(f), conf)
      val r  = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Normalize a data-file path string to its decoded hadoop form.
    * `input_file_name()` / `Dataset.inputFiles` return URL-ENCODED
    * paths (a hive partition value with a space arrives as `%20`),
    * while `FileStatus.getPath` and the read API work in the decoded
    * domain — so decode once when the string parses as a URI, and take
    * it raw otherwise (a raw path with an unencoded space fails URI
    * parsing, which is exactly the already-decoded case).
    */
  private def normDataFile(s: String): String =
    try new Path(new java.net.URI(s)).toString
    catch { case _: java.net.URISyntaxException => new Path(s).toString }

  /** File-granular copy-on-write support: the set of data files that
    * contain at least one predicate-matching row, from one
    * pushed-predicate scan (`input_file_name()` is evaluated at the
    * scan, before any shuffle, so it is exact). Decoded-domain paths.
    */
  private def touchedFiles(df: DataFrame, hit: Column): Set[String] =
    df.filter(hit).select(input_file_name().as("f")).distinct()
      .collect().map(r => normDataFile(r.getString(0))).toSet

  /** Byte-copy files into `staging` on the EXECUTORS — a distributed
    * server-side copy with zero decode/shuffle/encode, the cheap half
    * of file-granular COW (the untouched files of a DELETE/UPDATE).
    * Each element is (absolute source file, relative destination dir
    * under staging — "" for the root, "pt=v/…" for a hive leaf).
    * Basenames are preserved; Spark's fresh-UUID part names for the
    * rewritten files make collisions impossible. The driver's Hadoop
    * conf ships to the executors (broadcast, like every file task) so
    * object-store credentials and fs settings resolve identically.
    */
  private def copyFilesInto(files: Seq[(String, String)], staging: Path): Unit = {
    if (files.isEmpty) return
    // dirs are created on the driver once, not raced from executors
    files.map(_._2).distinct.foreach { rel =>
      fs.mkdirs(if (rel.isEmpty) staging else new Path(staging, rel)); ()
    }
    val dst = staging.toString
    // Configuration is not Serializable — ship its effective entries
    // and rebuild per task (what Spark's own SerializableConfiguration
    // does, which is private[spark])
    val confEntries: Array[(String, String)] = {
      val it  = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += e.getKey -> e.getValue }
      buf.toArray
    }
    val confBc = spark.sparkContext.broadcast(confEntries)
    spark.sparkContext
      .parallelize(files, math.min(files.size, 32).max(1))
      .foreach { case (f, rel) =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confBc.value.foreach { case (k, v) => conf.set(k, v) }
        val src  = new Path(f)
        val dir  = if (rel.isEmpty) new Path(dst) else new Path(dst, rel)
        val sfs  = src.getFileSystem(conf)
        val dfs  = dir.getFileSystem(conf)
        org.apache.hadoop.fs.FileUtil.copy(
          sfs, src, dfs, new Path(dir, src.getName), false, conf)
        ()
      }
  }

  /** Read exactly `files` of the table, aligned to the table's full
    * (merged) schema — older files may predate evolved columns, which
    * surface as typed nulls, the same contract as a whole-table read.
    * `basePath` (the table root) keeps hive partition columns inferable
    * when the files sit in partition leaf dirs.
    */
  private def readFilesAligned(
      files: Seq[String],
      full: StructType,
      basePath: Option[String] = None
  ): DataFrame = {
    val reader = basePath.foldLeft(spark.read.option("mergeSchema", "true"))(
      (r, bp) => r.option("basePath", bp))
    val raw = reader.parquet(files: _*)
    raw.select(full.fields.toSeq.map { f =>
      if (raw.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Data files (with their relative leaf dir) under the given hive
    * leaf dirs of `target` — the COW carry-over candidates of a
    * partition-scoped DML op.
    */
  private def dataFilesUnder(target: Path, relDirs: Seq[String]): Seq[(String, String)] =
    relDirs.flatMap { rel =>
      val dir = new Path(target, rel)
      if (!fs.exists(dir)) Seq.empty
      else
        fs.listStatus(dir)
          .filter { s =>
            val n = s.getPath.getName
            s.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
          .map(s => (new Path(s.getPath.toString).toString, rel))
          .toSeq
    }

  /** CREATE OR REPLACE TABLE AS SELECT (reference bronze_arxiv.py:102).
    * Writes to a staging dir first, then swaps — safe when `df` reads
    * from the table being replaced (a plain overwrite would delete its
    * own input mid-plan) and idempotent on re-run.
    */
  def createOrReplace(layer: String, table: String, df: DataFrame): Long =
    withWriterLock(layer, table)(createOrReplaceImpl(layer, table, df))

  private def createOrReplaceImpl(layer: String, table: String, df0: DataFrame): Long = {
    repairCrashedSwap(layer, table)
    val gen = applyGenerated(layer, table, df0, "CREATE OR REPLACE")
    // a REPLACE may legitimately carry the identity column (it is a
    // table redefinition — the engine's own DDL rewrites route here)
    val (df, idHighs) = applyIdentity(layer, table, gen, allowCarry = true)
    commitIdentity(layer, table, idHighs)
    enforceConstraints(layer, table, df, "CREATE OR REPLACE")
    val staging = new Path(tablePath(layer, table) + ".__staging")
    fs.delete(staging, true)
    // row count as an observe() metric from the write job itself — a
    // staging re-read would scan every written byte a second time,
    // doubling CTAS read I/O at any scale (same one-pass contract as
    // [[append]])
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val rows = obs.get("n").asInstanceOf[Long]
    retireAndSwap(layer, table, staging)
    logOp(layer, table, "CREATE OR REPLACE", inserted = rows, updated = 0, outputRows = rows)
    rows
  }

  /** CTAS partitioned by the given columns (hive-style directories).
    * Partitioning silver/gold by run_date gives dynamic partition
    * pruning on date-filtered reads for free (SURVEY §4) — the scan
    * shows PartitionFilters instead of reading every file.
    */
  def createOrReplacePartitioned(
      layer: String,
      table: String,
      df: DataFrame,
      partitionCols: Seq[String]
  ): Long =
    withWriterLock(layer, table)(
      createOrReplacePartitionedImpl(layer, table, df, partitionCols))

  private def createOrReplacePartitionedImpl(
      layer: String,
      table: String,
      df0: DataFrame,
      partitionCols: Seq[String]
  ): Long = {
    repairCrashedSwap(layer, table)
    val gen = applyGenerated(layer, table, df0, "CREATE OR REPLACE")
    // identity hook, exactly like the unpartitioned CTAS (carry allowed
    // on a redefinition; omitted columns assigned; high water advanced)
    val (df, idHighs) = applyIdentity(layer, table, gen, allowCarry = true)
    commitIdentity(layer, table, idHighs)
    enforceConstraints(layer, table, df, "CREATE OR REPLACE")
    val staging = new Path(tablePath(layer, table) + ".__staging")
    fs.delete(staging, true)
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(staging.toString)
    val rows = obs.get("n").asInstanceOf[Long]
    retireAndSwap(layer, table, staging)
    logOp(layer, table, "CREATE OR REPLACE", inserted = rows, updated = 0, outputRows = rows)
    rows
  }

  /** Compact a table's small files (the OPTIMIZE / bin-packing half of
    * Delta's table maintenance): rewrite the table so each output file
    * targets `targetRowsPerFile` rows. Steady appends (one file per
    * micro-batch per partition) degrade a 100 TB table into millions
    * of KB-sized files whose open/footer overhead dominates scans —
    * periodic compaction is what keeps scan cost ∝ bytes, not ∝ files.
    * Values are untouched (asserted in PipelineSpec): same staged
    * rename as every other write, ledger op `COMPACT` records the
    * file-count delta.
    */
  def compact(layer: String, table: String, targetRowsPerFile: Long = 1_000_000L): Long =
    withWriterLock(layer, table)(compactImpl(layer, table, targetRowsPerFile))

  private def compactImpl(layer: String, table: String, targetRowsPerFile: Long): Long = {
    materializeDv(layer, table) // rewrite never runs against live tombstones
    repairCrashedSwap(layer, table)
    val target = tablePath(layer, table)
    // mergeSchema: an evolved table's older files lack the newer
    // columns — a plain read takes one footer's schema and the compact
    // rewrite would silently DROP the evolved columns' data
    val before = spark.read.option("mergeSchema", "true").parquet(target)
    val rows   = before.count()
    val filesBefore = before.inputFiles.length.toLong
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile)
    val staging = new Path(target + ".__staging")
    fs.delete(staging, true)
    val pcols = partitionColumns(layer, table) // preserve the live layout
    val obs = org.apache.spark.sql.Observation()
    val writer = before
      .repartition(nFiles.toInt)
      .observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite)
    (if (pcols.nonEmpty) writer.partitionBy(pcols: _*) else writer).parquet(staging.toString)
    val back = obs.get("n").asInstanceOf[Long]
    require(back == rows, s"compaction changed row count: $rows -> $back")
    retireAndSwap(layer, table, staging)
    logOp(layer, table, "COMPACT", inserted = 0, updated = 0, outputRows = rows)
    filesBefore - spark.read.parquet(target).inputFiles.length
  }

  /** Auto-compaction — Delta's `autoOptimize.autoCompact` policy as an
    * explicit call a pipeline runs after its write wave: compact
    * exactly the partitions whose data-file count exceeds
    * `maxFilesPerPartition` (driver-side listing finds offenders — no
    * data I/O; [[compactWhere]] rewrites only them), or the whole
    * table when unpartitioned and fragmented past the bound. Appends
    * fragment partitions one small file per writer task per day; this
    * is the bounded-cost cleanup that keeps scan file counts O(data),
    * not O(commits), at 100 TB. Returns the number of partitions
    * compacted (1 for an unpartitioned whole-table pass, 0 for a
    * no-op).
    */
  def autoCompact(layer: String, table: String, maxFilesPerPartition: Int = 8): Long =
    withWriterLock(layer, table) {
      require(maxFilesPerPartition >= 1, "maxFilesPerPartition must be >= 1")
      val pcols = partitionColumns(layer, table)
      if (pcols.isEmpty) {
        val files = rawTable(layer, table).inputFiles.length
        if (files > maxFilesPerPartition) { compactImpl(layer, table, 1_000_000L); 1L }
        else 0L
      } else {
        import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        val target = new Path(tablePath(layer, table))
        val ptypes = {
          val schema = rawTable(layer, table).schema
          pcols.map(c => schema(c).dataType)
        }
        val offenders = leafPartitionDirs(target, pcols.length)
          .filter(rel => dataFilesUnder(target, Seq(rel)).lengthCompare(maxFilesPerPartition) > 0)
        if (offenders.isEmpty) 0L
        else {
          val tuples: Seq[Seq[String]] = offenders.map { rel =>
            rel.split("/").toSeq.zip(ptypes).map { case (seg, t) =>
              val raw = ExternalCatalogUtils.unescapePathName(seg.split("=", 2)(1))
              if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
              else normalizePartitionValue(raw, t)
            }
          }
          compactWhereImpl(layer, table, partitionPredicate(tuples, pcols))
          offenders.length.toLong
        }
      }
    }

  /** Partition-scoped compaction — Delta's `OPTIMIZE t WHERE
    * <partition predicate>`: only the partitions the predicate selects
    * rewrite (one file per touched directory via a hash repartition on
    * the partition columns); everything else is untouched on disk. The
    * predicate must reference partition columns only — at 100 TB you
    * compact the recent ingest partitions after a merge wave, never
    * the whole table, and this is the primitive that keeps OPTIMIZE
    * O(churn) instead of O(table). Same staged partition swap (and the
    * same crash repair) as the partition-scoped DML family. Returns
    * the net file-count reduction.
    */
  def compactWhere(layer: String, table: String, predicate: Column): Long =
    withWriterLock(layer, table)(compactWhereImpl(layer, table, predicate))

  private def compactWhereImpl(layer: String, table: String, predicate: Column): Long = {
    materializeDv(layer, table)
    repairCrashedSwap(layer, table)
    val pcols = partitionColumns(layer, table)
    require(pcols.nonEmpty, "OPTIMIZE ... WHERE needs a hive-partitioned table")
    val target = tablePath(layer, table)
    val df     = spark.read.option("mergeSchema", "true").parquet(target)
    // partition-columns-only enforcement: inspect the ANALYZED filter's
    // references (the analyzer's resolve-missing-references rule would
    // silently satisfy a data-column predicate through the projection —
    // this must refuse, never promote to a whole-table rewrite)
    val hit = df.filter(predicate)
    val refs: Set[String] = hit.queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.references.map(_.name.toLowerCase).toSet
    }.flatten.toSet
    require(refs.subsetOf(pcols.map(_.toLowerCase).toSet),
      s"OPTIMIZE ... WHERE must reference partition columns only (${pcols.mkString(",")}); " +
        s"got: ${refs.mkString(",")}")
    val touched = touchedPartitions(hit, pcols)
    if (touched.isEmpty) {
      logOp(layer, table, "COMPACT", inserted = 0, updated = 0, outputRows = 0)
      return 0L
    }
    val slicePred   = partitionPredicate(touched, pcols)
    val filesBefore = df.filter(slicePred).inputFiles.length.toLong
    val slice       = df.filter(slicePred)
    val staging     = new Path(target + ".__staging")
    fs.delete(staging, true)
    val obs  = org.apache.spark.sql.Observation()
    val rows = slice.count()
    slice
      .repartition(touched.length, pcols.map(col): _*)
      .observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).partitionBy(pcols: _*).parquet(staging.toString)
    val back = obs.get("n").asInstanceOf[Long]
    require(back == rows, s"partition-scoped compaction changed row count: $rows -> $back")
    val retireDirs = retireDirsFor(new Path(target), pcols, df.schema, touched)
    swapPartitions(layer, table, staging, retireDirs, pcols.length)
    logOp(layer, table, "COMPACT", inserted = 0, updated = 0, outputRows = rows)
    filesBefore - spark.read.parquet(target).filter(slicePred).inputFiles.length
  }

  /** DELETE FROM ... WHERE (Delta parity — and the right-to-be-
    *-forgotten primitive a training-data warehouse is legally required
    * to have): file-granular copy-on-write through the same staged
    * swap as every other write — only files containing matched rows
    * are decoded and rewritten, the rest byte-copy into the new
    * generation (Delta's rewrite-touched-files-only, expressed in the
    * snapshot-dir model) — so the pre-delete generation stays
    * [[tableAsOf]]-readable until pruned and a crash never loses the
    * table. Deleted rows are recorded in the change feed as
    * `_change_type = 'delete'` (Delta CDF does the same) — a
    * downstream consumer must SEE deletions to forget the rows too;
    * a feed that only carries upserts silently re-leaks deleted data
    * from derived tables. Returns the deleted-row count.
    */
  def delete(layer: String, table: String, predicate: Column): Long =
    withWriterLock(layer, table)(deleteImpl(layer, table, predicate))

  private def deleteImpl(layer: String, table: String, predicate: Column): Long = {
    repairCrashedSwap(layer, table)
    materializeDv(layer, table) // rewrite never runs against live tombstones
    val pcols = partitionColumns(layer, table)
    if (pcols.nonEmpty) return deletePartitioned(layer, table, predicate, pcols)
    val target  = tablePath(layer, table)
    val df      = spark.read.option("mergeSchema", "true").parquet(target)
    val staging = new Path(target + ".__staging")
    fs.delete(staging, true)
    val ver = nextVersion(s"$layer.$table")
    // NULL predicate keeps the row (Delta DELETE semantics): a bare
    // !predicate would silently drop NULL-evaluating rows from BOTH
    // the survivors and the feed — rows vanishing unrecorded
    val hit = coalesce(predicate, lit(false))
    // File-granular copy-on-write (Delta's rewrite-touched-files-only,
    // in the snapshot-dir model): one pushed-predicate scan finds the
    // files that contain matching rows — it doubles as the zero-match
    // existence probe. Only those files are decoded and rewritten;
    // every other file is byte-copied into the staging generation on
    // the executors (no decode, no shuffle). With a clustered layout
    // (z-order + a selective predicate) a 100 TB DELETE rewrites the
    // touched percent and streams the rest — against a table whose
    // predicate spans every file this degenerates to exactly the old
    // full rewrite, copies included... minus none (touched = all).
    val touched = touchedFiles(df, hit)
    if (touched.isEmpty) {
      // zero-match no-op: a `DELETE 0` ledger commit with a version
      // bump, no rewrite, no feed rows (unified no-op convention)
      logOp(layer, table, "DELETE", inserted = 0, updated = 0, outputRows = 0)
      return 0L
    }
    val untouched = df.inputFiles.map(normDataFile).filterNot(touched).toSeq
    val touchedDf = readFilesAligned(touched.toSeq, df.schema)
    val keptObs = org.apache.spark.sql.Observation()
    touchedDf.filter(!hit).observe(keptObs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    copyFilesInto(untouched.map((_, "")), staging)
    val keptRewritten = keptObs.get("n").asInstanceOf[Long]
    // untouched rows never decode: their count comes from parquet
    // footer metadata (a zero-column scan), not a data read
    val keptCarried =
      if (untouched.isEmpty) 0L
      else footerRowCount(untouched)
    val deletedRows = touchedDf.filter(hit)
      .withColumn("_change_type", lit("delete"))
      .withColumn("_commit_version", lit(ver))
    val obs = org.apache.spark.sql.Observation()
    deletedRows
      .withColumn("_commit_part", lit(f"$ver%010d"))
      .observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Append).partitionBy("_commit_part")
      .parquet(target + ".__changes")
    val deleted = obs.get("n").asInstanceOf[Long]
    retireAndSwap(layer, table, staging)
    logOp(layer, table, "DELETE", inserted = 0, updated = 0,
      outputRows = keptRewritten + keptCarried, version = ver, deleted = deleted)
    deleted
  }

  /** UPDATE ... SET ... WHERE (the last of the Delta DML triad next to
    * MERGE and DELETE): staged rewrite applying `assignments` to the
    * predicate's rows — NULL predicate keeps the row unchanged, like
    * DELETE. Both change-feed images are recorded (update_preimage /
    * update_postimage), so downstream incremental consumers subtract
    * the old row and add the new one. Assignments are cast to the
    * column's existing type — an UPDATE never changes the schema.
    * Returns the updated-row count.
    */
  def update(
      layer: String,
      table: String,
      predicate: Column,
      assignments: Map[String, Column]
  ): Long =
    withWriterLock(layer, table)(updateImpl(layer, table, predicate, assignments))

  private def updateImpl(
      layer: String,
      table: String,
      predicate: Column,
      assignments: Map[String, Column]
  ): Long = {
    repairCrashedSwap(layer, table)
    materializeDv(layer, table) // rewrite never runs against live tombstones
    identityColumns(layer, table).foreach { case (c, _, _) =>
      require(!assignments.keys.exists(_.equalsIgnoreCase(c)),
        s"cannot UPDATE identity column $c (GENERATED ALWAYS AS IDENTITY)")
    }
    val gens = generatedColumns(layer, table)
    if (gens.nonEmpty) {
      // assignments evaluate against PRE-update rows (one projection,
      // SQL UPDATE semantics) — an inline generated-column recompute
      // would read stale sources, so derivation-touching updates are
      // refused; rewrite via createOrReplace to change a derivation
      val keys = assignments.keySet.map(_.toLowerCase)
      gens.foreach { case (c, e) =>
        require(!keys.contains(c.toLowerCase),
          s"cannot UPDATE generated column $c (GENERATED ALWAYS AS $e)")
        val overlap = exprDeps(e).intersect(keys)
        require(overlap.isEmpty,
          s"UPDATE assigns ${overlap.mkString(", ")}, which generated column " +
            s"$c derives from — rewrite via createOrReplace to keep $c consistent")
      }
    }
    if (constraints(layer, table).nonEmpty) {
      // post-images of the matched slice — the only new row images an
      // UPDATE introduces; checked before either rewrite path stages
      val base = spark.read.option("mergeSchema", "true")
        .parquet(tablePath(layer, table))
      val post = assignments.foldLeft(base.filter(coalesce(predicate, lit(false)))) {
        case (d, (c, v)) => d.withColumn(c, v.cast(base.schema(c).dataType))
      }
      enforceConstraints(layer, table, post, "UPDATE")
    }
    val pcols = partitionColumns(layer, table)
    if (pcols.nonEmpty) return updatePartitioned(layer, table, predicate, assignments, pcols)
    val target = tablePath(layer, table)
    val df     = spark.read.option("mergeSchema", "true").parquet(target)
    assignments.keys.foreach(c =>
      require(df.columns.contains(c), s"UPDATE assigns unknown column $c"))
    val hit = coalesce(predicate, lit(false))
    // file-granular COW, exactly like DELETE: the touched-file probe is
    // the zero-match existence probe, untouched files byte-copy into
    // the staging generation without ever decoding
    val touched = touchedFiles(df, hit)
    if (touched.isEmpty) {
      logOp(layer, table, "UPDATE", inserted = 0, updated = 0, outputRows = 0)
      return 0L
    }
    val staging = new Path(target + ".__staging")
    fs.delete(staging, true)
    val ver = nextVersion(s"$layer.$table")
    val untouched = df.inputFiles.map(normDataFile).filterNot(touched).toSeq
    val touchedDf = readFilesAligned(touched.toSeq, df.schema)
    val rewritten = touchedDf.select(df.schema.fields.toSeq.map { f =>
      assignments.get(f.name) match {
        case Some(a) => when(hit, a.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
        case None    => col(f.name)
      }
    }: _*)
    val rowsObs = org.apache.spark.sql.Observation()
    rewritten.observe(rowsObs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    copyFilesInto(untouched.map((_, "")), staging)
    val rewrittenRows = rowsObs.get("n").asInstanceOf[Long]
    val carriedRows =
      if (untouched.isEmpty) 0L
      else footerRowCount(untouched)
    val pre = touchedDf.filter(hit).withColumn("_change_type", lit("update_preimage"))
    val post = touchedDf.filter(hit)
      .select(df.schema.fields.toSeq.map { f =>
        assignments.get(f.name) match {
          case Some(a) => a.cast(f.dataType).as(f.name)
          case None    => col(f.name)
        }
      }: _*)
      .withColumn("_change_type", lit("update_postimage"))
    val obs = org.apache.spark.sql.Observation()
    pre.unionByName(post)
      .withColumn("_commit_version", lit(ver))
      .withColumn("_commit_part", lit(f"$ver%010d"))
      .observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Append).partitionBy("_commit_part")
      .parquet(target + ".__changes")
    val updated = obs.get("n").asInstanceOf[Long] / 2
    retireAndSwap(layer, table, staging)
    logOp(layer, table, "UPDATE", inserted = 0, updated = updated,
      outputRows = rewrittenRows + carriedRows, version = ver)
    updated
  }

  // ---- deletion vectors (Delta merge-on-read DML parity) ----
  //
  // Copy-on-write DML (delete/update/upsert above) pays O(touched file
  // bytes) per commit: every file holding one matched row decodes and
  // rewrites. Delta's deletion vectors invert the cost: a DELETE writes
  // only the POSITIONS of the deleted rows (a per-file bitmap sidecar)
  // and the scan subtracts them — commit cost O(matched rows), zero
  // data rewritten. The engine's equivalent: a `<table>.__dv` sidecar,
  // hive-partitioned by zero-padded commit version like the change
  // feed, one row per deleted position — (file_name, pos) in the
  // domain of parquet `_metadata.file_name` / `_metadata.row_index`.
  // Positions are stable because data files are immutable: COW carries
  // files by byte-copy (same basename, same bytes) and rewrites under
  // FRESH part-file names (per-job UUID), so a DV row either still
  // matches its file exactly or matches nothing at all — never a
  // different row.
  //
  // Read-side application is one BROADCAST left-anti join on
  // (file_name, row_index) against the corpus scan: the corpus side
  // never shuffles, data filters still push to the parquet scan, and
  // the build side is bounded by the rows deleted since the last
  // rewrite — Delta's own DV regime (accumulate smallish tombstone
  // sets, REORG when they grow). The version-bounded rule that makes
  // this compose with time travel:
  //
  //   visible(asOf) = files(asOf) MINUS dv rows in (lastRewrite(asOf), asOf]
  //
  // where lastRewrite(asOf) is the last REWRITING commit at or before
  // `asOf`. Every rewriting op materializes live DVs first (the
  // [[materializeDv]] barrier at the head of delete/update/upsert/
  // compact/zorder — REPLACE and RESTORE produce all-new files, which
  // achieves the same), so DV partitions at or before a rewrite are
  // CONSUMED by it: current reads broadcast only the post-rewrite
  // tail, never the table's whole deletion history, and a retired
  // generation read at `asOf` applies exactly the tombstones that
  // were live then. DV partitions are append-only and never deleted
  // (retired generations need them); their dead weight after a REORG
  // is one directory listing, not a broadcast.
  //
  // [[updateMor]] extends the scheme to UPDATE the way Delta DVs do:
  // old positions tombstone, post-image rows append as NEW files. The
  // appended basenames are recorded in a `_GRAFT_FILES` manifest
  // inside the commit's DV partition, which buys two properties COW
  // gets from staging: crash rollback ([[repairCrashedSwap]] purges a
  // phantom DV partition AND deletes its manifest's files), and EXACT
  // time travel (a read at `asOf` hides files appended by MOR commits
  // after `asOf` — no append-style fold-forward for MOR updates).

  private def dvPath(layer: String, table: String): Path =
    new Path(tablePath(layer, table) + ".__dv")

  /** DV partition versions present on disk, ascending. */
  private def dvVersions(layer: String, table: String): Seq[Long] = {
    val p = dvPath(layer, table)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("_commit_part="))
        .flatMap(_.getPath.getName.stripPrefix("_commit_part=").toLongOption)
        .toSeq
        .sorted
  }

  private def dvPartDir(layer: String, table: String, v: Long): Path =
    new Path(dvPath(layer, table), f"_commit_part=$v%010d")

  /** A DV partition can be manifest-only (a MOR merge that inserted
    * but updated nothing writes appended-file bookkeeping and zero
    * tombstone rows) — reading it as parquet would fail on schema
    * inference, so tombstone reads take only partitions with data.
    */
  private def dvPartHasRows(layer: String, table: String, v: Long): Boolean = {
    val d = dvPartDir(layer, table, v)
    fs.exists(d) && fs.listStatus(d).exists { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Ledger predicate for commits that REWROTE table data (retired a
    * generation) — shared by [[rewritingAfter]] and the DV version
    * bounds. APPEND/VACUUM and the merge-on-read ops never rewrite;
    * DML commits rewrite iff their metrics (or an evolution-forced
    * rewrite's kept-row count) are non-zero.
    */
  private def rewritingOpPred: Column =
    !col("operation").isin("APPEND", "VACUUM", "DELETE_MOR", "UPDATE_MOR", "MERGE_MOR",
      "SET TBLPROPERTIES", "UNSET TBLPROPERTIES") &&
      (!col("operation").isin("MERGE", "DELETE", "UPDATE") ||
        col("num_inserted") + col("num_updated") + col("num_deleted") > 0 ||
        col("num_output_rows") > 0)

  /** (last rewriting commit ≤ asOf, last committed version ≤ asOf) in
    * one ledger scan; (-1, -1) before the first commit. The cap keeps
    * an unlocked reader from applying a crashed writer's phantom DV
    * partition (version claimed, ledger row never written) — the same
    * read-side hiding [[changeFeed]] does for phantom feed partitions.
    */
  private def dvBounds(tableName: String, asOf: Long): (Long, Long) = {
    val h = history(tableName)
      .filter(col("version") <= asOf)
      .agg(
        max(when(rewritingOpPred, col("version"))).as("floor"),
        max(col("version")).as("cap"))
      .head()
    (if (h.isNullAt(0)) -1L else h.getLong(0), if (h.isNullAt(1)) -1L else h.getLong(1))
  }

  /** Tombstone rows applicable at `asOf` — (file_name, pos) of DV
    * partitions in (lastRewrite(asOf), min(asOf, committed)] — or None
    * when nothing applies (the overwhelmingly common case: one driver
    * directory listing, zero jobs).
    */
  private def dvRowsFor(layer: String, table: String, asOf: Long): Option[DataFrame] = {
    val all = dvVersions(layer, table)
    if (all.isEmpty) return None
    val (floor, cap) = dvBounds(s"$layer.$table", asOf)
    val vs = all.filter(v => v > floor && v <= math.min(asOf, cap))
      .filter(dvPartHasRows(layer, table, _))
    if (vs.isEmpty) None
    else {
      val p = dvPath(layer, table)
      Some(
        spark.read
          .option("basePath", p.toString)
          .parquet(vs.map(v => dvPartDir(layer, table, v).toString): _*)
          .select(col("file_name").as("__dv_file"), col("pos").as("__dv_pos")))
    }
  }

  /** Table-relative keys of data files APPENDED by MOR commits strictly
    * after `asOf` (each DV partition's `_GRAFT_FILES` manifest) — what
    * a time-travel read must hide to show the pre-update state exactly.
    */
  private def dvFilesAfter(layer: String, table: String, asOf: Long): Seq[String] =
    dvVersions(layer, table).filter(_ > asOf).flatMap { v =>
      val m = new Path(dvPartDir(layer, table, v), "_GRAFT_FILES")
      if (!fs.exists(m)) Seq.empty
      else {
        val in = fs.open(m)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toList
        finally in.close()
      }
    }

  /** Anti-join `withMeta` (carrying __dv_f/__dv_p metadata columns)
    * against tombstones; keeps the metadata columns for callers that
    * still need positions (deleteMor/updateMor write them back out).
    */
  private def dvAntiJoin(withMeta: DataFrame, dv: DataFrame): DataFrame =
    withMeta.join(
      broadcast(dv),
      col("__dv_f") === col("__dv_file") && col("__dv_p") === col("__dv_pos"),
      "left_anti")

  /** DV file key: the trailing `depth + 1` path segments of the file —
    * `pt=a/part-XXX.parquet` for one partition level, the bare
    * basename unpartitioned. Basenames alone are NOT unique on a
    * partitioned table (one write job reuses its task file names
    * across partition directories), but the partition-relative path
    * is — and it is exactly what survives a byte-copy carry and a
    * generation swap (both preserve the leaf dirs, only the table
    * ROOT changes), while any rewrite issues fresh names.
    *
    * DOMAIN: keys live in the URL-ENCODED URI path domain —
    * `_metadata.file_path` and raw `Dataset.inputFiles` strings agree
    * there (an on-disk dir `pt=a b` is `pt=a%20b` in both), while
    * `FileStatus.getPath` and the read API are DECODED. Every
    * driver-side key therefore derives from a RAW inputFiles string
    * or a `Path.toUri.getRawPath`, never from a decoded listing —
    * mixing domains makes tombstones silently miss on any partition
    * value with an encodable character.
    */
  private def withDvMeta(df: DataFrame, depth: Int): DataFrame =
    df.withColumn("__dv_f",
        substring_index(col("_metadata.file_path"), "/", -(depth + 1)))
      .withColumn("__dv_p", col("_metadata.row_index"))

  /** The DV file key of a RAW (URL-encoded) file path, driver-side. */
  private def dvFileKey(rawFile: String, depth: Int): String =
    rawFile.split('/').takeRight(depth + 1).mkString("/")

  /** Decode a manifest/sidecar rel path (encoded domain) back to the
    * on-disk spelling for filesystem operations.
    */
  private def decodeDvRel(rel: String): String =
    try {
      val p = new java.net.URI(rel).getPath
      if (p == null) rel else p
    } catch { case _: java.net.URISyntaxException => rel }

  /** Rows of `df` (a direct file-source scan of this table, with hive
    * leaf dirs `depth` deep) visible at `asOf`: tombstoned positions
    * subtracted, MOR-appended files from after `asOf` hidden. Schema
    * is unchanged. No-op (zero jobs, the original scan plan) when the
    * table has no applicable DV state.
    *
    * Cost contract (Delta's DV regime): read overhead is proportional
    * to the TOMBSTONED files, not the table. The scan splits driver-
    * side on the sidecar's file keys — clean files read bare (zero
    * per-row overhead, metadata-fast counts intact), only the files
    * actually carrying tombstones materialize position columns and
    * probe the broadcast anti-join — then the branches union. Without
    * the split, a table with one tombstoned file out of thousands
    * would pay the metadata-column + probe cost on EVERY row
    * (measured 33× on a 60M-row count, SCALE.md).
    */
  private def applyDv(
      df: DataFrame,
      layer: String,
      table: String,
      asOf: Long,
      depth: => Int // by-name: only computed when DV state exists
  ): DataFrame = {
    val allVs = dvVersions(layer, table)
    if (allVs.isEmpty) return df
    // ONE ledger scan bounds everything: tombstones apply in
    // (lastRewrite, eff] and MOR-appended files HIDE beyond eff, where
    // eff caps at the last COMMITTED version — so an in-flight (or
    // crashed) MOR commit is invisible on BOTH sides: its tombstones
    // don't subtract AND its post-image files don't surface (a
    // one-sided cap would show pre- and post-images together)
    val (floor, cap) = dvBounds(s"$layer.$table", asOf)
    val eff          = math.min(asOf, cap)
    val hideKeys     = dvFilesAfter(layer, table, eff).toSet
    val tombVs = allVs.filter(v => v > floor && v <= eff)
      .filter(dvPartHasRows(layer, table, _))
    val tombstones =
      if (tombVs.isEmpty) None
      else {
        val p = dvPath(layer, table)
        Some(
          spark.read
            .option("basePath", p.toString)
            .parquet(tombVs.map(v => dvPartDir(layer, table, v).toString): _*)
            .select(col("file_name").as("__dv_file"), col("pos").as("__dv_pos")))
      }
    if (hideKeys.isEmpty && tombstones.isEmpty) return df
    val d = depth
    // file keys actually tombstoned — one KB-sized sidecar collect
    val tombKeys = tombstones
      .map(_.select("__dv_file").distinct().collect().map(_.getString(0)).toSet)
      .getOrElse(Set.empty[String])
    // keys from the RAW (encoded) listing; reads use the decoded twin
    val all   = df.inputFiles.toSeq.map(raw => (normDataFile(raw), dvFileKey(raw, d)))
    val kept  = all.filterNot { case (_, k) => hideKeys.contains(k) }
    val dirty = kept.filter { case (_, k) => tombKeys.contains(k) }.map(_._1)
    val clean = kept.filterNot { case (_, k) => tombKeys.contains(k) }.map(_._1)
    if (dirty.isEmpty && kept.length == all.length) return df
    val schema = df.schema
    val bp     = tablePathForFiles(layer, table, all.headOption.map(_._1), d)
    def readAligned(files: Seq[String]): DataFrame = {
      val reader = spark.read.option("mergeSchema", "true")
      val r      = bp.foldLeft(reader)((r, p) => r.option("basePath", p))
      val raw    = r.parquet(files: _*)
      // bare scan when the subset already carries the full schema (the
      // no-evolution common case) — an align projection on top would
      // block the parquet metadata-only count fast path for the clean
      // branch, re-pricing count() from footer reads to a data scan
      if (raw.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
          schema.fields.map(f => (f.name, f.dataType)).toSeq) raw
      else raw.select(schema.fields.toSeq.map { f =>
        if (raw.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }
    val cleanDf =
      if (clean.isEmpty) None else Some(readAligned(clean))
    val dirtyDf =
      if (dirty.isEmpty) None
      else {
        val filtered = dvAntiJoin(withDvMeta(readAligned(dirty), d), tombstones.get)
          .drop("__dv_f", "__dv_p")
        Some(filtered)
      }
    (cleanDf, dirtyDf) match {
      case (Some(c), Some(t)) => c.unionByName(t)
      case (Some(c), None)    => c
      case (None, Some(t))    => t
      case (None, None)       => df.limit(0)
    }
  }

  /** basePath for re-reading a subset of `anyFile`'s snapshot: the
    * directory `depth` levels above the file — the live table root, a
    * retired generation root, whatever the original scan read from —
    * so hive partition columns materialize exactly as before.
    */
  private def tablePathForFiles(
      layer: String,
      table: String,
      anyFile: Option[String],
      depth: Int
  ): Option[String] =
    anyFile.map { f =>
      var p = new Path(f)
      (0 to depth).foreach(_ => p = p.getParent)
      p.toString
    }

  /** Materialization barrier: every copy-on-write op calls this first,
    * so a rewrite never runs against live tombstones — the invariant
    * behind the (lastRewrite, asOf] read rule. One directory probe
    * when the table has no DV state.
    */
  private def materializeDv(layer: String, table: String): Unit =
    if (dvVersions(layer, table).nonEmpty) { reorgImpl(layer, table); () }

  /** DELETE via deletion vectors (Delta merge-on-read DELETE): one
    * pushed-predicate scan finds the matched positions; only those
    * (file, pos) tombstones and the change-feed delete rows are
    * written — no file is decoded-and-rewritten, no generation
    * retires, commit cost is O(matched rows) where [[delete]] pays
    * O(touched file bytes). The read side subtracts tombstones with a
    * broadcast anti-join (see the section note). Call [[reorg]] to
    * fold accumulated tombstones back into the files when their
    * broadcast grows past comfort. NULL predicate keeps the row, the
    * zero-match commit follows the unified no-op convention, and
    * deletions land in the change feed exactly like the COW path —
    * downstream consumers cannot tell which mechanics ran.
    */
  def deleteMor(layer: String, table: String, predicate: Column): Long =
    withWriterLock(layer, table)(deleteMorImpl(layer, table, predicate))

  private def deleteMorImpl(layer: String, table: String, predicate: Column): Long = {
    repairCrashedSwap(layer, table)
    val target = tablePath(layer, table)
    val raw    = spark.read.option("mergeSchema", "true").parquet(target)
    val hit    = coalesce(predicate, lit(false))
    val depth  = partitionColumns(layer, table).length
    val visible = dvRowsFor(layer, table, Long.MaxValue) match {
      case Some(dv) => dvAntiJoin(withDvMeta(raw, depth), dv)
      case None     => withDvMeta(raw, depth)
    }
    val matched = visible.filter(hit)
    if (matched.isEmpty) {
      logOp(layer, table, "DELETE_MOR", inserted = 0, updated = 0, outputRows = 0)
      return 0L
    }
    val ver = nextVersion(s"$layer.$table")
    val m   = matched.persist()
    try {
      val obs = org.apache.spark.sql.Observation()
      m.select(col("__dv_f").as("file_name"), col("__dv_p").as("pos"))
        .withColumn("_commit_part", lit(f"$ver%010d"))
        .observe(obs, count(lit(1)).as("n"))
        .write.mode(SaveMode.Append).partitionBy("_commit_part")
        .parquet(dvPath(layer, table).toString)
      val deleted = obs.get("n").asInstanceOf[Long]
      m.drop("__dv_f", "__dv_p")
        .withColumn("_change_type", lit("delete"))
        .withColumn("_commit_version", lit(ver))
        .withColumn("_commit_part", lit(f"$ver%010d"))
        .write.mode(SaveMode.Append).partitionBy("_commit_part")
        .parquet(target + ".__changes")
      logOp(layer, table, "DELETE_MOR", inserted = 0, updated = 0,
        outputRows = 0, version = ver, deleted = deleted)
      deleted
    } finally { m.unpersist(); () }
  }

  /** UPDATE via deletion vectors (Delta merge-on-read UPDATE): matched
    * rows tombstone at their old positions and their post-images
    * append as NEW part files — commit cost O(matched rows), no
    * existing file rewritten (where [[update]] rewrites every touched
    * file). The appended file list rides in the commit's DV-partition
    * manifest, so a crash rolls the whole commit back and time travel
    * hides the new files exactly (see section note). Same feed images,
    * constraint enforcement, generated-column guards, NULL-predicate
    * and no-op conventions as the COW path.
    */
  def updateMor(
      layer: String,
      table: String,
      predicate: Column,
      assignments: Map[String, Column]
  ): Long =
    withWriterLock(layer, table)(updateMorImpl(layer, table, predicate, assignments))

  private def updateMorImpl(
      layer: String,
      table: String,
      predicate: Column,
      assignments: Map[String, Column]
  ): Long = {
    repairCrashedSwap(layer, table)
    identityColumns(layer, table).foreach { case (c, _, _) =>
      require(!assignments.keys.exists(_.equalsIgnoreCase(c)),
        s"cannot UPDATE identity column $c (GENERATED ALWAYS AS IDENTITY)")
    }
    val gens = generatedColumns(layer, table)
    if (gens.nonEmpty) {
      val keys = assignments.keySet.map(_.toLowerCase)
      gens.foreach { case (c, e) =>
        require(!keys.contains(c.toLowerCase),
          s"cannot UPDATE generated column $c (GENERATED ALWAYS AS $e)")
        val overlap = exprDeps(e).intersect(keys)
        require(overlap.isEmpty,
          s"UPDATE assigns ${overlap.mkString(", ")}, which generated column " +
            s"$c derives from — rewrite via createOrReplace to keep $c consistent")
      }
    }
    val target = tablePath(layer, table)
    val raw    = spark.read.option("mergeSchema", "true").parquet(target)
    assignments.keys.foreach(c =>
      require(raw.columns.contains(c), s"UPDATE assigns unknown column $c"))
    val hit   = coalesce(predicate, lit(false))
    val depth = partitionColumns(layer, table).length
    val visible = dvRowsFor(layer, table, Long.MaxValue) match {
      case Some(dv) => dvAntiJoin(withDvMeta(raw, depth), dv)
      case None     => withDvMeta(raw, depth)
    }
    val matched = visible.filter(hit)
    if (matched.isEmpty) {
      logOp(layer, table, "UPDATE_MOR", inserted = 0, updated = 0, outputRows = 0)
      return 0L
    }
    val ver = nextVersion(s"$layer.$table")
    val m   = matched.persist()
    try {
      val pre  = m.drop("__dv_f", "__dv_p")
      val post = pre.select(raw.schema.fields.toSeq.map { f =>
        assignments.get(f.name) match {
          case Some(a) => a.cast(f.dataType).as(f.name)
          case None    => col(f.name)
        }
      }: _*)
      // new row images validated BEFORE anything lands — a violating
      // batch changes nothing, the COW contract
      enforceConstraints(layer, table, post, "UPDATE")
      // 1. tombstones first: until the ledger row commits, everything
      // this op wrote is identifiable (phantom DV partition + its
      // manifest) and [[repairCrashedSwap]] rolls all of it back
      val obs = org.apache.spark.sql.Observation()
      m.select(col("__dv_f").as("file_name"), col("__dv_p").as("pos"))
        .withColumn("_commit_part", lit(f"$ver%010d"))
        .observe(obs, count(lit(1)).as("n"))
        .write.mode(SaveMode.Append).partitionBy("_commit_part")
        .parquet(dvPath(layer, table).toString)
      val updated = obs.get("n").asInstanceOf[Long]
      // 2. post-images land via the shared MOR machinery: scratch dir,
      // manifest (rollback + time-travel hiding), then rename in
      morLandFiles(layer, table, ver, post)
      // 3. feed images, 4. ledger commit
      pre.withColumn("_change_type", lit("update_preimage"))
        .unionByName(post.withColumn("_change_type", lit("update_postimage")))
        .withColumn("_commit_version", lit(ver))
        .withColumn("_commit_part", lit(f"$ver%010d"))
        .write.mode(SaveMode.Append).partitionBy("_commit_part")
        .parquet(target + ".__changes")
      logOp(layer, table, "UPDATE_MOR", inserted = 0, updated = updated,
        outputRows = 0, version = ver)
      updated
    } finally { m.unpersist(); () }
  }

  // ---- identity columns (GENERATED ALWAYS AS IDENTITY parity) ----
  //
  // Delta identity semantics, re-expressed for the snapshot-dir
  // engine: writers OMIT the column and the write assigns values that
  // are unique and strictly beyond every previously-assigned value;
  // explicitly writing the column REFUSES (the ALWAYS contract);
  // MERGE inserts get fresh values while updates keep the target
  // row's (stable for a row's life); values are NOT contiguous —
  // like Delta, which reserves per-task ranges, the engine derives
  // ids from `monotonically_increasing_id()` (partition-id-prefixed),
  // so gaps are large and normal. The high-water mark lives in a
  // `<table>.__identity` sidecar updated under the writer lock, and
  // is advanced BEFORE the data write: a refused or crashed batch
  // burns its ids (Delta loses rolled-back identity values the same
  // way) — which is exactly what makes the scheme crash-safe without
  // coordination. At cluster scale assignment is pure map work: no
  // shuffle, no global sort, no driver sequence bottleneck.

  private def identityPath(layer: String, table: String): Path =
    new Path(tablePath(layer, table) + ".__identity")

  /** Declared identity columns: (column, step, highWater). */
  def identityColumns(layer: String, table: String): Seq[(String, Long, Long)] = {
    val p = identityPath(layer, table)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.split('\n').iterator.filter(_.nonEmpty).map { line =>
        val f = line.split('\t')
        require(f.length == 3, s"corrupt identity sidecar line: $line")
        (unescField(f(0)), f(1).toLong, f(2).toLong)
      }.toSeq
    }
  }

  private def writeIdentitySidecar(
      layer: String, table: String, ids: Seq[(String, Long, Long)]): Unit =
    if (ids.isEmpty) { fs.delete(identityPath(layer, table), false); () }
    else {
      val out = fs.create(identityPath(layer, table), true)
      try out.write(ids.map { case (c, s, hw) => s"${escField(c)}\t$s\t$hw" }
        .mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
    }

  /** Declare `colName` GENERATED ALWAYS AS IDENTITY (START WITH
    * `startWith` INCREMENT BY `step`). On a populated table: an
    * EXISTING column is adopted (its values keep, future ids start
    * beyond its max — the migration path); an absent column backfills
    * via one staged rewrite.
    */
  def addIdentityColumn(
      layer: String,
      table: String,
      colName: String,
      startWith: Long = 1L,
      step: Long = 1L
  ): Unit =
    withWriterLock(layer, table) {
      require(step > 0, "identity step must be positive")
      val existing = identityColumns(layer, table)
      require(!existing.exists(_._1.equalsIgnoreCase(colName)),
        s"identity column '$colName' already declared")
      require(!generatedColumns(layer, table).exists(_._1.equalsIgnoreCase(colName)),
        s"$colName is already GENERATED ALWAYS AS an expression")
      val base = startWith - step // highWater such that the next id is startWith
      val hw =
        if (!tableExists(layer, table)) base
        else {
          val df = rawTable(layer, table)
          if (df.columns.exists(_.equalsIgnoreCase(colName))) {
            val mx = df.agg(max(col(colName).cast("long"))).head()
            if (mx.isNullAt(0)) base else math.max(mx.getLong(0), base)
          } else {
            materializeDv(layer, table) // backfill is a rewrite
            val filled = rawTable(layer, table).withColumn(colName,
              lit(startWith) + lit(step) * monotonically_increasing_id())
            val pcols = partitionColumns(layer, table)
            if (pcols.nonEmpty) createOrReplacePartitionedImpl(layer, table, filled, pcols)
            else createOrReplaceImpl(layer, table, filled)
            val mx = rawTable(layer, table).agg(max(col(colName))).head()
            if (mx.isNullAt(0)) base else mx.getLong(0)
          }
        }
      writeIdentitySidecar(layer, table, existing :+ ((colName, step, hw)))
    }

  /** Drop an identity declaration (the column and its values stay). */
  def dropIdentityColumn(layer: String, table: String, colName: String): Boolean =
    withWriterLock(layer, table) {
      val existing = identityColumns(layer, table)
      val kept     = existing.filterNot(_._1.equalsIgnoreCase(colName))
      if (kept.size != existing.size) { writeIdentitySidecar(layer, table, kept); true }
      else false
    }

  /** Assign identity values to a batch that omits the columns (refuse
    * a batch that carries one unless `allowCarry` — table
    * redefinitions like CTAS/backfill legitimately carry). Returns the
    * batch (PINNED via localCheckpoint when anything was assigned:
    * `monotonically_increasing_id` is stable only for one execution,
    * and merge consumers re-run the plan) plus the new high-water
    * marks to commit.
    */
  private def applyIdentity(
      layer: String,
      table: String,
      df: DataFrame,
      allowCarry: Boolean
  ): (DataFrame, Seq[(String, Long)]) = {
    val ids = identityColumns(layer, table)
    if (ids.isEmpty) return (df, Seq.empty)
    val (carried, absent) =
      ids.partition { case (c, _, _) => df.columns.exists(_.equalsIgnoreCase(c)) }
    carried.foreach { case (c, _, _) =>
      require(allowCarry,
        s"cannot write identity column $c (GENERATED ALWAYS AS IDENTITY) — omit it")
    }
    val out = absent.foldLeft(df) { case (d, (c, step, hw)) =>
      d.withColumn(c, lit(hw + step) + lit(step) * monotonically_increasing_id())
    }
    // pin only when something was assigned — carried values are the
    // caller's deterministic data
    val pinned = if (absent.isEmpty) out else out.localCheckpoint(true)
    // high waters advance for BOTH populations: an allowed CARRY (a
    // REPLACE carrying explicit ids) must raise the mark past its own
    // values, or the next omitted-column append would re-assign them
    val tracked = absent ++ carried
    val maxRow = pinned
      .agg(max(col(tracked.head._1).cast("long")).as("m0"),
        tracked.tail.map { case (c, _, _) => max(col(c).cast("long")).as(s"m_$c") }: _*)
      .head()
    val highs = tracked.zipWithIndex.map { case ((c, _, hw), i) =>
      c -> (if (maxRow.isNullAt(i)) hw else maxRow.getLong(i)) // empty batch keeps hw
    }
    (pinned, highs)
  }

  /** Advance the high-water marks — called BEFORE the data write (see
    * the section note: a failed batch burns its ids, never reuses).
    */
  private def commitIdentity(
      layer: String, table: String, highs: Seq[(String, Long)]): Unit =
    if (highs.nonEmpty) {
      val updated = identityColumns(layer, table).map { case (c, s, hw) =>
        highs.collectFirst { case (`c`, nh) => (c, s, math.max(hw, nh)) }
          .getOrElse((c, s, hw))
      }
      writeIdentitySidecar(layer, table, updated)
    }

  // ---- CREATE TABLE ... CLONE (deep clone) ----

  /** CREATE [OR REPLACE] TABLE dst DEEP CLONE src. The clone is an
    * executor-parallel BYTE-COPY of the source's live snapshot — no
    * decode, no shuffle, no encode; cost is raw copy bandwidth, the
    * same class as the COW carry path (Delta's SHALLOW clone is
    * metadata-only, which a physical-dir engine cannot express; DEEP
    * clone is the portable equivalent and what crosses storage roots
    * anyway). The clone inherits the source's CONTRACT (CHECK /
    * NOT NULL constraints and generated-column declarations) but NOT
    * its history: like Delta CLONE, the new table starts its own
    * version line (one CLONE commit), and the source's feed, retired
    * generations, and ledger stay behind. Completely independent
    * afterwards — writes to either side never touch the other.
    *
    * A source with LIVE deletion vectors cannot byte-copy (the clone
    * carries no DV state, so tombstoned rows would resurrect) — it
    * falls back to materializing the visible rows through one real
    * write, the same cost as CTAS. Runs under BOTH tables' writer
    * locks (sorted acquisition, deadlock-free). Returns the cloned
    * row count.
    */
  def cloneTable(
      srcLayer: String,
      srcTable: String,
      dstLayer: String,
      dstTable: String
  ): Long =
    withWriterLocks(Seq((srcLayer, srcTable), (dstLayer, dstTable))) {
      require(!(srcLayer == dstLayer && srcTable == dstTable),
        "cannot clone a table onto itself")
      repairCrashedSwap(srcLayer, srcTable)
      repairCrashedSwap(dstLayer, dstTable)
      require(tableExists(srcLayer, srcTable), s"$srcLayer.$srcTable does not exist")
      val target  = tablePath(dstLayer, dstTable)
      val staging = new Path(target + ".__staging")
      fs.delete(staging, true)
      val pcols = partitionColumns(srcLayer, srcTable)
      val rows =
        if (dvRowsFor(srcLayer, srcTable, Long.MaxValue).isDefined) {
          val obs = org.apache.spark.sql.Observation()
          val w = this.table(srcLayer, srcTable)
            .observe(obs, count(lit(1)).as("n"))
            .write.mode(SaveMode.Overwrite)
          (if (pcols.nonEmpty) w.partitionBy(pcols: _*) else w).parquet(staging.toString)
          obs.get("n").asInstanceOf[Long]
        } else {
          val srcRoot = new Path(tablePath(srcLayer, srcTable))
          val pairs =
            if (pcols.isEmpty)
              fs.listStatus(srcRoot)
                .filter { s =>
                  val n = s.getPath.getName
                  s.isFile && !n.startsWith("_") && !n.startsWith(".")
                }
                .map(s => (s.getPath.toString, ""))
                .toSeq
            else dataFilesUnder(srcRoot, leafPartitionDirs(srcRoot, pcols.length))
          copyFilesInto(pairs, staging)
          fs.createNewFile(new Path(staging, "_SUCCESS")) // the existence marker
          // footer-only count of the staged copy — no data decode
          spark.read.parquet(staging.toString).count()
        }
      retireAndSwap(dstLayer, dstTable, staging)
      writeConstraintsSidecar(dstLayer, dstTable, constraints(srcLayer, srcTable))
      writeGeneratedSidecar(dstLayer, dstTable, generatedColumns(srcLayer, srcTable))
      writeIdentitySidecar(dstLayer, dstTable, identityColumns(srcLayer, srcTable))
      logOp(dstLayer, dstTable, "CLONE", inserted = rows, updated = 0, outputRows = rows)
      rows
    }

  // ---- column DDL (ALTER TABLE RENAME/DROP COLUMN parity) ----
  //
  // Delta supports RENAME/DROP COLUMN as metadata-only operations via
  // column mapping (columns addressed by id, physical names never
  // change). The snapshot-dir engine addresses columns by their
  // parquet names, so both ops are ONE layout-preserving staged
  // rewrite — the cost class Delta charges WITHOUT column mapping
  // enabled, and the same machinery as COMPACT. What the engine keeps
  // from the Delta contract: the operation is atomic (staged swap),
  // history is version-addressed (time travel to a pre-rename version
  // shows the old schema, exactly like Delta), recorded contracts
  // refuse the change when they reference the column (drop the
  // constraint / generated declaration first — silent breakage of a
  // CHECK expression is worse than a refusal), and partition columns
  // refuse (the directory layout IS the column).

  private def requireColumnUnreferenced(
      layer: String, table: String, colName: String, op: String): Unit = {
    val lower = colName.toLowerCase
    constraints(layer, table).foreach { case (name, kind, exprStr) =>
      require(!exprDeps(exprStr).contains(lower) && !(exprStr.toLowerCase == lower),
        s"cannot $op column $colName: $kind constraint '$name' references it — " +
          "drop the constraint first")
    }
    generatedColumns(layer, table).foreach { case (c, e) =>
      require(!c.equalsIgnoreCase(colName),
        s"cannot $op column $colName: it is GENERATED ALWAYS AS ($e) — " +
          "drop the generated declaration first")
      require(!exprDeps(e).contains(lower),
        s"cannot $op column $colName: generated column $c derives from it — " +
          "drop the generated declaration first")
    }
    identityColumns(layer, table).foreach { case (c, _, _) =>
      require(!c.equalsIgnoreCase(colName),
        s"cannot $op column $colName: it is GENERATED ALWAYS AS IDENTITY — " +
          "drop the identity declaration first")
    }
  }

  /** ALTER TABLE ... RENAME COLUMN from TO to. */
  def renameColumn(layer: String, table: String, from: String, to: String): Unit =
    withWriterLock(layer, table) {
      repairCrashedSwap(layer, table)
      materializeDv(layer, table) // rewrite never runs against live tombstones
      val df = rawTable(layer, table)
      require(df.columns.exists(_.equalsIgnoreCase(from)), s"no such column $from")
      require(!df.columns.exists(_.equalsIgnoreCase(to)),
        s"cannot rename $from to $to: $to already exists")
      val pcols = partitionColumns(layer, table)
      require(!pcols.exists(_.equalsIgnoreCase(from)),
        s"cannot rename partition column $from — the directory layout is the column; " +
          "rewrite via createOrReplacePartitioned")
      requireColumnUnreferenced(layer, table, from, "rename")
      val target  = tablePath(layer, table)
      val staging = new Path(target + ".__staging")
      fs.delete(staging, true)
      val obs = org.apache.spark.sql.Observation()
      val w = df.withColumnRenamed(from, to)
        .observe(obs, count(lit(1)).as("n"))
        .write.mode(SaveMode.Overwrite)
      (if (pcols.nonEmpty) w.partitionBy(pcols: _*) else w).parquet(staging.toString)
      val rows = obs.get("n").asInstanceOf[Long]
      retireAndSwap(layer, table, staging)
      // the old name's bloom sidecar is now unreachable — remove it;
      // stats refresh incrementally off the new file set on next use
      fs.delete(bloomPath(layer, table, from), true)
      logOp(layer, table, "RENAME COLUMN", inserted = 0, updated = 0, outputRows = rows)
      ()
    }

  /** ALTER TABLE ... DROP COLUMN colName. */
  def dropColumn(layer: String, table: String, colName: String): Unit =
    withWriterLock(layer, table) {
      repairCrashedSwap(layer, table)
      materializeDv(layer, table) // rewrite never runs against live tombstones
      val df = rawTable(layer, table)
      require(df.columns.exists(_.equalsIgnoreCase(colName)), s"no such column $colName")
      require(df.columns.length > 1, s"cannot drop $colName: it is the only column")
      val pcols = partitionColumns(layer, table)
      require(!pcols.exists(_.equalsIgnoreCase(colName)),
        s"cannot drop partition column $colName — the directory layout is the column; " +
          "rewrite via createOrReplacePartitioned")
      requireColumnUnreferenced(layer, table, colName, "drop")
      val target  = tablePath(layer, table)
      val staging = new Path(target + ".__staging")
      fs.delete(staging, true)
      val obs = org.apache.spark.sql.Observation()
      val w = df.drop(colName)
        .observe(obs, count(lit(1)).as("n"))
        .write.mode(SaveMode.Overwrite)
      (if (pcols.nonEmpty) w.partitionBy(pcols: _*) else w).parquet(staging.toString)
      val rows = obs.get("n").asInstanceOf[Long]
      retireAndSwap(layer, table, staging)
      fs.delete(bloomPath(layer, table, colName), true)
      logOp(layer, table, "DROP COLUMN", inserted = 0, updated = 0, outputRows = rows)
      ()
    }

  /** Shared validation for the full-clause MERGE paths: explicit SET /
    * INSERT assignments must name real columns, never identity columns
    * (GENERATED ALWAYS AS IDENTITY values are engine-owned), never
    * generated columns nor their derivation sources (the same
    * stale-read rule [[update]] enforces — assignments evaluate
    * against pre-merge rows, so an inline recompute would read stale
    * sources).
    */
  private def validateClauseAssignments(
      layer: String,
      table: String,
      columns: Seq[String],
      matched: Seq[graft.operators.MergeClause.Matched],
      notMatched: Seq[graft.operators.MergeClause.NotMatched],
      bySource: Seq[graft.operators.MergeClause.BySource]
  ): Unit = {
    import graft.operators.MergeClause._
    val assigned: Set[String] = (
      matched.collect { case UpdateMatched(_, Some(set)) => set.keys } ++
        notMatched.collect { case InsertNotMatched(_, Some(vs)) => vs.keys } ++
        bySource.collect { case UpdateBySource(_, set) => set.keys }
    ).flatten.toSet
    val colsLower = columns.map(_.toLowerCase).toSet
    assigned.foreach(c =>
      require(colsLower.contains(c.toLowerCase), s"MERGE assigns unknown column $c"))
    val assignedLower = assigned.map(_.toLowerCase)
    identityColumns(layer, table).foreach { case (c, _, _) =>
      require(!assignedLower.contains(c.toLowerCase),
        s"cannot MERGE-assign identity column $c (GENERATED ALWAYS AS IDENTITY)")
    }
    generatedColumns(layer, table).foreach { case (c, e) =>
      require(!assignedLower.contains(c.toLowerCase),
        s"cannot MERGE-assign generated column $c (GENERATED ALWAYS AS $e)")
      val overlap = exprDeps(e).intersect(assignedLower)
      require(overlap.isEmpty,
        s"MERGE assigns ${overlap.mkString(", ")}, which generated column " +
          s"$c derives from — rewrite via createOrReplace to keep $c consistent")
    }
  }

  /** MERGE with the full Delta clause surface (what [[upsert]]'s fixed
    * version-rule shape cannot express): any number of WHEN MATCHED
    * [AND cond] THEN UPDATE-SET-star / DELETE clauses, conditional WHEN NOT
    * MATCHED inserts, and WHEN NOT MATCHED BY SOURCE THEN UPDATE/DELETE
    * — routed through [[graft.operators.Upsert.planClauses]] (one
    * full-outer shuffle, per-column CASE chains, duplicate-source
    * raise) and written with the same machinery as [[upsert]]:
    * file-granular COW (only files holding a source-matched key are
    * decoded; the rest byte-copy — except when a BY SOURCE clause
    * exists, which can touch ANY target row, so every file rewrites),
    * staged swap, change-feed rows for every image (insert /
    * update_preimage / update_postimage / delete), zero-change no-op
    * commits, schema evolution via union-align. Hive-partitioned
    * tables route to [[mergeClausesPartitioned]] — the partition-
    * scoped slice machinery with the same BY-SOURCE widening rule
    * (any target row may change → every partition in the slice).
    * Conditions and
    * assignment expressions reference the sides as `t.`/`s.` — see
    * [[graft.operators.MergeClause]].
    */
  def mergeClauses(
      layer: String,
      table: String,
      src: DataFrame,
      keys: Seq[String],
      matched: Seq[graft.operators.MergeClause.Matched],
      notMatched: Seq[graft.operators.MergeClause.NotMatched],
      bySource: Seq[graft.operators.MergeClause.BySource] = Seq.empty
  ): Upsert.MergeClauseMetrics =
    withWriterLock(layer, table)(
      mergeClausesImpl(layer, table, src, keys, matched, notMatched, bySource))

  private def mergeClausesImpl(
      layer: String,
      table: String,
      src0: DataFrame,
      keys: Seq[String],
      matched: Seq[graft.operators.MergeClause.Matched],
      notMatched: Seq[graft.operators.MergeClause.NotMatched],
      bySource: Seq[graft.operators.MergeClause.BySource]
  ): Upsert.MergeClauseMetrics = {
    repairCrashedSwap(layer, table)
    materializeDv(layer, table) // rewrite never runs against live tombstones
    if (!tableExists(layer, table)) {
      // same bootstrap as [[upsert]]: an absent target means every
      // unconditionally-insertable source row seeds the table
      require(bySource.isEmpty && matched.isEmpty,
        s"$layer.$table does not exist — only INSERT clauses can seed a new table")
      require(notMatched.forall {
        case graft.operators.MergeClause.InsertNotMatched(_, values) => values.isEmpty
      }, s"$layer.$table does not exist — INSERT (cols) VALUES seeding needs a schema; use INSERT *")
      val seed = notMatched.foldRight(lit(false): Column)((c, els) =>
        c.cond.map(_ || els).getOrElse(lit(true)))
      val n = createOrReplace(layer, table,
        src0.alias("s").filter(seed))
      return Upsert.MergeClauseMetrics(inserted = n, updated = 0, deleted = 0, kept = 0)
    }
    val gen = applyGenerated(layer, table, src0, "MERGE")
    require(!keys.exists(k => identityColumns(layer, table).exists(_._1.equalsIgnoreCase(k))),
      "cannot MERGE on a GENERATED ALWAYS AS IDENTITY column — sources cannot carry it")
    val (src, idHighs) = applyIdentity(layer, table, gen, allowCarry = false)
    commitIdentity(layer, table, idHighs) // ids burn even if the merge refuses
    enforceConstraints(layer, table, src, "MERGE")
    val pcols = partitionColumns(layer, table)
    if (pcols.nonEmpty)
      return mergeClausesPartitioned(layer, table, src, keys,
        matched, notMatched, bySource, pcols)
    val tgt0    = this.table(layer, table)
    val unioned = unionSchema(tgt0.schema, src.schema)
    validateClauseAssignments(layer, table, unioned.fieldNames.toSeq,
      matched, notMatched, bySource)
    val newCols = unioned.fieldNames.filterNot(tgt0.columns.contains)
    val allFiles = tgt0.inputFiles.map(normDataFile).toSeq
    // file-granular COW applies only when no BY SOURCE clause exists
    // (a by-source clause can modify rows in ANY file); evolution
    // forces the full rewrite as in [[upsert]]
    val matchedFiles: Set[String] =
      if (newCols.nonEmpty || bySource.nonEmpty) allFiles.toSet
      else {
        val srcKeys = src.select(keys.map(col): _*).distinct()
        val tgtF    = tgt0.withColumn("__graft_file", input_file_name())
        tgtF
          .join(srcKeys, keys.map(k => tgtF(k) <=> srcKeys(k)).reduce(_ && _), "left_semi")
          .select(col("__graft_file")).distinct()
          .collect().map(r => normDataFile(r.getString(0))).toSet
      }
    val untouched = allFiles.filterNot(matchedFiles)
    val touchedTgt =
      if (matchedFiles.isEmpty) tgt0.limit(0)
      else readFilesAligned(matchedFiles.toSeq, tgt0.schema)
    val idCols = identityColumns(layer, table).map(_._1).toSet
    val merged = Upsert.planClauses(alignTo(touchedTgt, unioned), alignTo(src, unioned),
      keys, matched, notMatched, bySource, insertOnlyCols = idCols)
    // narrow classification pass (Catalyst prunes the join to keys +
    // clause-condition columns + marks), exactly like [[upsert]]'s
    val counts = merged.groupBy(col(Upsert.ActionCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ins = counts.getOrElse("insert", 0L)
    val upd = counts.getOrElse("update", 0L)
    val del = counts.getOrElse("delete", 0L)
    val keptPlan = counts.getOrElse("keep", 0L)
    if (ins == 0 && upd == 0 && del == 0 && newCols.isEmpty) {
      // zero-change no-op commit (unified convention); kept = in-plan
      // keeps + footer-counted carried rows
      logOp(layer, table, "MERGE", inserted = 0, updated = 0, outputRows = 0)
      val carried0 =
        if (untouched.isEmpty) 0L else footerRowCount(untouched)
      return Upsert.MergeClauseMetrics(0, 0, 0, keptPlan + carried0)
    }
    val staging = new Path(tablePath(layer, table) + ".__staging")
    fs.delete(staging, true)
    val ver = nextVersion(s"$layer.$table")
    // footer-only count of the carried files, before the feed write
    // (minimal feed-to-ledger commit window, see [[upsert]])
    val carried =
      if (untouched.isEmpty) 0L
      else footerRowCount(untouched)
    merged.filter(col(Upsert.ActionCol) =!= "delete").drop(Upsert.ActionCol)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    copyFilesInto(untouched.map((_, "")), staging)
    // change feed: post-images for inserts/updates, pre-images for
    // updates (semi-join of the pre-merge touched files against the
    // updated keys), and the deleted rows (which already carry the
    // target pre-image values)
    val post = merged
      .filter(col(Upsert.ActionCol).isin("insert", "update"))
      .withColumn("_change_type",
        when(col(Upsert.ActionCol) === "insert", lit("insert"))
          .otherwise(lit("update_postimage")))
      .drop(Upsert.ActionCol)
    val updatedKeys = merged
      .filter(col(Upsert.ActionCol) === "update")
      .select(keys.map(col): _*)
    val pre = touchedTgt
      .join(updatedKeys,
        keys.map(k => touchedTgt(k) <=> updatedKeys(k)).reduce(_ && _), "left_semi")
      .select(unioned.fieldNames.toSeq.map(n =>
        if (tgt0.columns.contains(n)) col(n)
        else lit(null).cast(unioned(n).dataType).as(n)): _*)
      .withColumn("_change_type", lit("update_preimage"))
    val delRows = merged
      .filter(col(Upsert.ActionCol) === "delete")
      .drop(Upsert.ActionCol)
      .withColumn("_change_type", lit("delete"))
    post.unionByName(pre).unionByName(delRows)
      .withColumn("_commit_version", lit(ver))
      .withColumn("_commit_part", lit(f"$ver%010d"))
      .write.mode(SaveMode.Append).partitionBy("_commit_part")
      .parquet(tablePath(layer, table) + ".__changes")
    retireAndSwap(layer, table, staging)
    logOp(layer, table, "MERGE", ins, upd,
      outputRows = ins + upd + keptPlan + carried, version = ver, deleted = del)
    Upsert.MergeClauseMetrics(ins, upd, del, keptPlan + carried)
  }

  /** Merge-on-read twin of [[mergeClauses]] (the full clause surface
    * at O(delta) commit cost, like [[upsertMor]] for the upsert
    * shape): updated AND deleted target rows tombstone at their old
    * positions, post-images and inserts append under the commit's
    * rollback manifest, no existing file rewrites — tombstones are the
    * natural delete-action mechanism, a MOR MERGE DELETE writes
    * positions only. Feed rows cover every image (insert /
    * update_preimage / update_postimage / delete). Works on any
    * layout; BY SOURCE clauses classify against the whole visible
    * table (the join must see every target row) but still commit
    * O(changes).
    */
  def mergeClausesMor(
      layer: String,
      table: String,
      src: DataFrame,
      keys: Seq[String],
      matched: Seq[graft.operators.MergeClause.Matched],
      notMatched: Seq[graft.operators.MergeClause.NotMatched],
      bySource: Seq[graft.operators.MergeClause.BySource] = Seq.empty
  ): Upsert.MergeClauseMetrics =
    withWriterLock(layer, table)(
      mergeClausesMorImpl(layer, table, src, keys, matched, notMatched, bySource))

  private def mergeClausesMorImpl(
      layer: String,
      table: String,
      src0: DataFrame,
      keys: Seq[String],
      matched: Seq[graft.operators.MergeClause.Matched],
      notMatched: Seq[graft.operators.MergeClause.NotMatched],
      bySource: Seq[graft.operators.MergeClause.BySource]
  ): Upsert.MergeClauseMetrics = {
    repairCrashedSwap(layer, table)
    if (!tableExists(layer, table)) {
      require(bySource.isEmpty && matched.isEmpty,
        s"$layer.$table does not exist — only INSERT clauses can seed a new table")
      require(notMatched.forall {
        case graft.operators.MergeClause.InsertNotMatched(_, values) => values.isEmpty
      }, s"$layer.$table does not exist — INSERT (cols) VALUES seeding needs a schema; use INSERT *")
      val seed = notMatched.foldRight(lit(false): Column)((c, els) =>
        c.cond.map(_ || els).getOrElse(lit(true)))
      val n = createOrReplace(layer, table, src0.alias("s").filter(seed))
      return Upsert.MergeClauseMetrics(inserted = n, updated = 0, deleted = 0, kept = 0)
    }
    val gen = applyGenerated(layer, table, src0, "MERGE")
    require(!keys.exists(k => identityColumns(layer, table).exists(_._1.equalsIgnoreCase(k))),
      "cannot MERGE on a GENERATED ALWAYS AS IDENTITY column — sources cannot carry it")
    val (src, idHighs) = applyIdentity(layer, table, gen, allowCarry = false)
    commitIdentity(layer, table, idHighs)
    enforceConstraints(layer, table, src, "MERGE")
    val target = tablePath(layer, table)
    val raw    = spark.read.option("mergeSchema", "true").parquet(target)
    val depth  = partitionColumns(layer, table).length
    val tombstoneRows = dvRowsFor(layer, table, Long.MaxValue)
    val visible = tombstoneRows match {
      case Some(dv) => dvAntiJoin(withDvMeta(raw, depth), dv)
      case None     => withDvMeta(raw, depth)
    }
    val unioned    = unionSchema(raw.schema, src.schema)
    validateClauseAssignments(layer, table, unioned.fieldNames.toSeq,
      matched, notMatched, bySource)
    val srcAligned = alignTo(src, unioned)
    val tgtAligned = visible.select(
      unioned.fields.toSeq.map { f =>
        if (visible.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      } ++ Seq(col("__dv_f"), col("__dv_p")): _*)
    val changes = Upsert.planMorChangesClauses(tgtAligned, srcAligned, keys,
      matched, notMatched, bySource, metaCols = Seq("__dv_f", "__dv_p"),
      insertOnlyCols = identityColumns(layer, table).map(_._1).toSet)
    val counts = changes.groupBy(col(Upsert.ActionCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val inserted = counts.getOrElse("insert", 0L)
    val updated  = counts.getOrElse("update", 0L)
    val deleted  = counts.getOrElse("delete", 0L)
    def visibleCount(): Long =
      raw.count() - tombstoneRows.map(_.count()).getOrElse(0L)
    if (inserted == 0 && updated == 0 && deleted == 0) {
      logOp(layer, table, "MERGE_MOR", inserted = 0, updated = 0, outputRows = 0)
      return Upsert.MergeClauseMetrics(0, 0, 0, visibleCount())
    }
    val kept = visibleCount() - updated - deleted
    val ver  = nextVersion(s"$layer.$table")
    val dataCols = unioned.fields.toSeq.map(f => col(f.name))
    // 1. tombstones for the updated AND deleted rows' old positions
    changes.filter(col(Upsert.ActionCol).isin("update", "delete"))
      .select(col("__dv_f").as("file_name"), col("__dv_p").as("pos"))
      .withColumn("_commit_part", lit(f"$ver%010d"))
      .write.mode(SaveMode.Append).partitionBy("_commit_part")
      .parquet(dvPath(layer, table).toString)
    // 2. post-images + inserts land as new files (manifest rollback);
    //    deletes land nothing — their tombstone IS the commit, so a
    //    delete-only merge appends zero data files (like [[deleteMor]])
    if (inserted + updated > 0)
      morLandFiles(layer, table, ver,
        changes.filter(col(Upsert.ActionCol).isin("insert", "update"))
          .select(dataCols: _*))
    // 3. feed: insert / update_preimage / update_postimage / delete
    val ins = changes.filter(col(Upsert.ActionCol) === "insert")
      .select(dataCols: _*).withColumn("_change_type", lit("insert"))
    val preImg = changes.filter(col(Upsert.ActionCol).isin("update", "delete"))
      .select(unioned.fields.toSeq.map(f => col(s"__pre_${f.name}").as(f.name)) :+
        when(col(Upsert.ActionCol) === "update", lit("update_preimage"))
          .otherwise(lit("delete")).as("_change_type"): _*)
    val postImg = changes.filter(col(Upsert.ActionCol) === "update")
      .select(dataCols: _*).withColumn("_change_type", lit("update_postimage"))
    ins.unionByName(preImg).unionByName(postImg)
      .withColumn("_commit_version", lit(ver))
      .withColumn("_commit_part", lit(f"$ver%010d"))
      .write.mode(SaveMode.Append).partitionBy("_commit_part")
      .parquet(target + ".__changes")
    logOp(layer, table, "MERGE_MOR", inserted = inserted, updated = updated,
      outputRows = 0, version = ver, deleted = deleted)
    Upsert.MergeClauseMetrics(inserted, updated, deleted, kept)
  }

  /** MERGE via deletion vectors (completing the merge-on-read DML
    * triad with [[deleteMor]] and [[updateMor]]): the same conditional
    * upsert semantics as [[upsert]] — version-rule updates, inserts,
    * duplicate-source raise — at O(delta) commit cost: updated target
    * rows TOMBSTONE at their old positions, post-images and inserts
    * APPEND as new files under the commit's rollback manifest, and
    * not one existing file is decoded or rewritten, on any layout
    * (the hive-partitioned case needs no partition-scoped machinery —
    * tombstones are positional and appends partition themselves).
    * Schema evolution is rewrite-free too: appended files carry the
    * unioned schema and older files surface the new columns as null
    * through the merged read. Feed rows (insert / update_preimage /
    * update_postimage), constraints, generated and identity columns
    * behave exactly as the COW path; a zero-change merge follows the
    * unified no-op convention (note: unlike the COW path, a
    * zero-change merge whose source carries a new column does NOT
    * evolve the schema — nothing is appended to carry it).
    * `WriteMetrics.kept` counts the visible target rows not updated,
    * derived from footer counts + the tombstone ledger, not a scan.
    */
  def upsertMor(
      layer: String,
      table: String,
      src: DataFrame,
      keys: Seq[String],
      versionCol: String
  ): Upsert.WriteMetrics =
    withWriterLock(layer, table)(upsertMorImpl(layer, table, src, keys, versionCol))

  private def upsertMorImpl(
      layer: String,
      table: String,
      src0: DataFrame,
      keys: Seq[String],
      versionCol: String
  ): Upsert.WriteMetrics = {
    repairCrashedSwap(layer, table)
    if (!tableExists(layer, table)) {
      val n = createOrReplace(layer, table, src0) // generates + enforces itself
      return Upsert.WriteMetrics(inserted = n, updated = 0, kept = 0)
    }
    val gen = applyGenerated(layer, table, src0, "MERGE")
    require(!keys.exists(k => identityColumns(layer, table).exists(_._1.equalsIgnoreCase(k))),
      "cannot MERGE on a GENERATED ALWAYS AS IDENTITY column — sources cannot carry it")
    val (src, idHighs) = applyIdentity(layer, table, gen, allowCarry = false)
    commitIdentity(layer, table, idHighs)
    enforceConstraints(layer, table, src, "MERGE")
    val target = tablePath(layer, table)
    val raw    = spark.read.option("mergeSchema", "true").parquet(target)
    val depth  = partitionColumns(layer, table).length
    val tombstoneRows = dvRowsFor(layer, table, Long.MaxValue)
    val visible = tombstoneRows match {
      case Some(dv) => dvAntiJoin(withDvMeta(raw, depth), dv)
      case None     => withDvMeta(raw, depth)
    }
    val unioned    = unionSchema(raw.schema, src.schema)
    val srcAligned = alignTo(src, unioned)
    val tgtAligned = visible.select(
      unioned.fields.toSeq.map { f =>
        if (visible.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      } ++ Seq(col("__dv_f"), col("__dv_p")): _*)
    val changes = Upsert.planMorChanges(tgtAligned, srcAligned, keys, versionCol,
      metaCols = Seq("__dv_f", "__dv_p"),
      insertOnlyCols = identityColumns(layer, table).map(_._1).toSet)
    // metrics: one narrow O(delta) classification pass (Catalyst prunes
    // the join to keys + version + marks, like the COW metrics pass)
    val counts = changes.groupBy(col(Upsert.ActionCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val inserted = counts.getOrElse("insert", 0L)
    val updated  = counts.getOrElse("update", 0L)
    // kept from metadata only: physical rows minus applicable
    // tombstones minus the rows this merge updates
    def visibleCount(): Long =
      raw.count() - tombstoneRows.map(_.count()).getOrElse(0L)
    if (inserted == 0 && updated == 0) {
      logOp(layer, table, "MERGE_MOR", inserted = 0, updated = 0, outputRows = 0)
      return Upsert.WriteMetrics(inserted = 0, updated = 0, kept = visibleCount())
    }
    val kept = visibleCount() - updated
    val ver  = nextVersion(s"$layer.$table")
    val dataCols = unioned.fields.toSeq.map(f => col(f.name))
    // 1. tombstones for the updated rows' old positions
    changes.filter(col(Upsert.ActionCol) === "update")
      .select(col("__dv_f").as("file_name"), col("__dv_p").as("pos"))
      .withColumn("_commit_part", lit(f"$ver%010d"))
      .write.mode(SaveMode.Append).partitionBy("_commit_part")
      .parquet(dvPath(layer, table).toString)
    // 2. post-images + inserts land as new files (manifest rollback)
    morLandFiles(layer, table, ver, changes.select(dataCols: _*))
    // 3. feed: insert / update_preimage / update_postimage
    val ins = changes.filter(col(Upsert.ActionCol) === "insert")
      .select(dataCols: _*).withColumn("_change_type", lit("insert"))
    val preImg = changes.filter(col(Upsert.ActionCol) === "update")
      .select(unioned.fields.toSeq.map(f => col(s"__pre_${f.name}").as(f.name)): _*)
      .withColumn("_change_type", lit("update_preimage"))
    val postImg = changes.filter(col(Upsert.ActionCol) === "update")
      .select(dataCols: _*).withColumn("_change_type", lit("update_postimage"))
    ins.unionByName(preImg).unionByName(postImg)
      .withColumn("_commit_version", lit(ver))
      .withColumn("_commit_part", lit(f"$ver%010d"))
      .write.mode(SaveMode.Append).partitionBy("_commit_part")
      .parquet(target + ".__changes")
    logOp(layer, table, "MERGE_MOR", inserted = inserted, updated = updated,
      outputRows = 0, version = ver)
    Upsert.WriteMetrics(inserted = inserted, updated = updated, kept = kept)
  }

  /** Land a MOR commit's new row images as appended files: write to a
    * scratch dir, record every destination (ENCODED key domain — see
    * [[dvFileKey]]) in the commit's DV-partition `_GRAFT_FILES`
    * manifest, THEN rename into the live tree — files are only
    * reachable after their names are durably listed, so
    * [[repairCrashedSwap]] can roll the whole commit back and time
    * travel can hide the files exactly.
    */
  private def morLandFiles(
      layer: String,
      table: String,
      ver: Long,
      rows: DataFrame
  ): Unit = {
    val target  = tablePath(layer, table)
    val pcols   = partitionColumns(layer, table)
    val scratch = new Path(target + ".__mor_staging")
    fs.delete(scratch, true)
    val w = rows.write.mode(SaveMode.Overwrite)
    (if (pcols.nonEmpty) w.partitionBy(pcols: _*) else w).parquet(scratch.toString)
    val staged = (if (pcols.nonEmpty) leafPartitionDirs(scratch, pcols.length)
                  else Seq("")).flatMap { rel =>
      val dir = if (rel.isEmpty) scratch else new Path(scratch, rel)
      fs.listStatus(dir)
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        .map(s => (s.getPath, if (rel.isEmpty) s.getPath.getName else s"$rel/${s.getPath.getName}"))
    }
    val manifest = new Path(dvPartDir(layer, table, ver), "_GRAFT_FILES")
    val out      = fs.create(manifest, true)
    try out.write(staged
      .map { case (_, rel) =>
        dvFileKey(new Path(target, rel).toUri.getRawPath, pcols.length)
      }
      .mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    staged.foreach { case (src, rel) =>
      val dst = new Path(target, rel)
      fs.mkdirs(dst.getParent)
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"rename $src -> $dst failed")
    }
    fs.delete(scratch, true)
    ()
  }

  /** REORG TABLE ... APPLY (PURGE) — fold accumulated deletion vectors
    * back into the data: ONLY files carrying tombstones rewrite (DV
    * rows subtracted), every clean file byte-copies, staged swap, the
    * pre-image generation retires for time travel. After a reorg the
    * current-read anti-join disappears entirely (the rewrite is the
    * new lastRewrite floor); the DV partitions stay on disk for
    * retired-generation reads but are never broadcast again. Returns
    * the number of files rewritten; no-op (no commit) when no
    * tombstones are live.
    */
  def reorg(layer: String, table: String): Long =
    withWriterLock(layer, table)(reorgImpl(layer, table))

  private def reorgImpl(layer: String, table: String): Long = {
    repairCrashedSwap(layer, table)
    val tombstones = dvRowsFor(layer, table, Long.MaxValue)
    if (tombstones.isEmpty) return 0L
    val dv      = tombstones.get
    val target  = tablePath(layer, table)
    val raw     = spark.read.option("mergeSchema", "true").parquet(target)
    val pcols   = partitionColumns(layer, table)
    val depth   = pcols.length
    val dvNames = dv.select("__dv_file").distinct().collect().map(_.getString(0)).toSet
    // match in the RAW (encoded) key domain, read via the decoded twin
    val allPairs = raw.inputFiles.toSeq.map(r => (normDataFile(r), dvFileKey(r, depth)))
    val allFiles = allPairs.map(_._1)
    val touched  = allPairs.filter(p => dvNames.contains(p._2)).map(_._1)
    if (touched.isEmpty) return 0L // tombstones all point at already-rewritten files
    val staging = new Path(target + ".__staging")
    fs.delete(staging, true)
    // touched files re-read as a direct scan (metadata columns live
    // only there), tombstones subtracted, aligned to the full schema
    val reader = spark.read.option("mergeSchema", "true")
    val touchedRaw =
      (if (pcols.nonEmpty) reader.option("basePath", target) else reader)
        .parquet(touched: _*)
    val survivors0 = dvAntiJoin(withDvMeta(touchedRaw, depth), dv).drop("__dv_f", "__dv_p")
    val survivors = survivors0.select(raw.schema.fields.toSeq.map { f =>
      if (survivors0.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    val keptObs = org.apache.spark.sql.Observation()
    val w = survivors.observe(keptObs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite)
    (if (pcols.nonEmpty) w.partitionBy(pcols: _*) else w).parquet(staging.toString)
    val touchedSet = touched.toSet
    if (pcols.isEmpty) {
      val carry = allFiles.filterNot(touchedSet)
      copyFilesInto(carry.map((_, "")), staging)
      val keptRewritten = keptObs.get("n").asInstanceOf[Long]
      val keptCarried =
        if (carry.isEmpty) 0L else spark.read.parquet(carry: _*).count()
      retireAndSwap(layer, table, staging)
      logOp(layer, table, "REORG", inserted = 0, updated = 0,
        outputRows = keptRewritten + keptCarried)
    } else {
      // partition-scoped: only the directories holding touched files
      // swap; untouched directories are never listed or copied.
      // Compare in the scheme-less URI path domain — inputFiles carry
      // a `file:`/`hdfs:` scheme, tablePath may not
      val targetP    = new Path(target)
      val targetNorm = targetP.toUri.getPath
      val retireDirs = touched.map { f =>
        val rel = new Path(f).toUri.getPath.stripPrefix(targetNorm).stripPrefix("/")
        rel.substring(0, rel.lastIndexOf('/'))
      }.distinct
      val carryPairs = dataFilesUnder(targetP, retireDirs)
        .filterNot(p => touchedSet.contains(p._1))
      copyFilesInto(carryPairs, staging)
      val keptRewritten = keptObs.get("n").asInstanceOf[Long]
      val keptCarried =
        if (carryPairs.isEmpty) 0L
        else footerRowCount(carryPairs.map(_._1), Some(target))
      swapPartitions(layer, table, staging, retireDirs, pcols.length)
      logOp(layer, table, "REORG", inserted = 0, updated = 0,
        outputRows = keptRewritten + keptCarried)
    }
    touched.size.toLong
  }

  /** Multi-dimensional clustering (Delta `OPTIMIZE ... ZORDER BY`
    * replacement): rewrite the table ordered along a Z-curve over
    * `cols`, so parquet footer min/max stats make predicates on ANY of
    * the columns file-skippable — a linear sort serves one column and
    * leaves every other dimension spanning the full range per file.
    *
    * Mechanics: each dimension is scaled to a `bits`-bit bucket id —
    * numerics equi-width on (min, max) (one agg pass; codegen
    * arithmetic, no per-row search), strings by hash (equality
    * skipping only) — and the ids are bit-interleaved into the
    * Z-value the rewrite range-partitions and sorts by. Equi-width
    * buckets are skew-sensitive where Delta samples range boundaries;
    * the trade is a fully codegen per-row expression and no sampled
    * state. Same staged swap as compact — the previous generation is
    * retained for [[tableAsOf]]; ledger op `ZORDER`.
    */
  def zorder(
      layer: String,
      table: String,
      cols: Seq[String],
      targetRowsPerFile: Long = 1_000_000L,
      bits: Int = 8
  ): Long =
    withWriterLock(layer, table)(zorderImpl(layer, table, cols, targetRowsPerFile, bits))

  /** Numeric-ish columns scale to equi-width buckets; everything else
    * hashes (equality skipping only) — shared by [[zorder]] and
    * [[zorderIncremental]].
    */
  private def zIsNumeric(df: DataFrame, c: String): Boolean =
    df.schema(c).dataType match {
      case _: org.apache.spark.sql.types.NumericType   => true
      case _: org.apache.spark.sql.types.DateType      => true
      case _: org.apache.spark.sql.types.TimestampType => true
      case _                                           => false
    }

  /** Global (min, max) per numeric z-column — one aggregation pass. */
  private def zStats(df: DataFrame, cols: Seq[String]): Map[String, (Double, Double)] = {
    val numCols = cols.filter(zIsNumeric(df, _))
    if (numCols.isEmpty) Map.empty
    else {
      val aggs = numCols.flatMap(c =>
        Seq(min(col(c).cast("double")).as(s"__min_$c"), max(col(c).cast("double")).as(s"__max_$c")))
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      numCols.map(c => c -> (r.getAs[Double](s"__min_$c"), r.getAs[Double](s"__max_$c"))).toMap
    }
  }

  /** The bit-interleaved Z-value expression over `cols` with the given
    * global stats — fully codegen per-row arithmetic, no sampled state.
    */
  private def zExpr(df: DataFrame, cols: Seq[String], bits: Int,
      stats: Map[String, (Double, Double)]): Column = {
    val maxB = (1 << bits) - 1
    def bucket(c: String): Column =
      if (zIsNumeric(df, c)) {
        val (lo, hi) = stats(c)
        if (hi <= lo) lit(0)
        else least(
          lit(maxB),
          floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(maxB + 1))).cast("int")
      } else pmod(xxhash64(col(c)), lit(maxB + 1)).cast("int")
    val buckets = cols.map(bucket)
    (0 until bits)
      .flatMap(i => buckets.zipWithIndex.map { case (b, j) =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1)), i * cols.size + j)
      })
      .reduce(_.bitwiseOR(_))
  }

  private def zorderImpl(
      layer: String,
      table: String,
      cols: Seq[String],
      targetRowsPerFile: Long,
      bits: Int
  ): Long = {
    repairCrashedSwap(layer, table)
    materializeDv(layer, table) // rewrite never runs against live tombstones
    require(cols.nonEmpty && cols.size <= 4, "zorder supports 1-4 columns")
    val target = tablePath(layer, table)
    val df     = spark.read.option("mergeSchema", "true").parquet(target)
    val rows   = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val z      = zExpr(df, cols, bits, zStats(df, cols))
    val staging = new Path(target + ".__staging")
    fs.delete(staging, true)
    val pcols = partitionColumns(layer, table) // preserve the live layout
    val obs = org.apache.spark.sql.Observation()
    val writer = df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite)
    (if (pcols.nonEmpty) writer.partitionBy(pcols: _*) else writer).parquet(staging.toString)
    val back = obs.get("n").asInstanceOf[Long]
    require(back == rows, s"zorder changed row count: $rows -> $back")
    retireAndSwap(layer, table, staging)
    logOp(layer, table, "ZORDER", inserted = 0, updated = 0, outputRows = rows)
    rows
  }

  /** Liquid-clustering-shaped incremental Z-order: re-cluster ONLY the
    * files whose key span is wide relative to the table's — freshly
    * appended files cover the whole key range (span fraction ≈ 1),
    * already-clustered files cover a thin slice — and byte-copy the
    * rest. [[zorder]] rewrites 100% of the table on every call; on a
    * 100 TB table that went through one full cluster pass and daily
    * appends, this variant rewrites only the append tail (the Delta
    * Liquid Clustering / OPTIMIZE-incremental idea).
    *
    * A file is a victim when, for ANY numeric clustering column, its
    * (max - min) exceeds `spanThreshold` × the table's global span.
    * Per-file min/max come from ONE column-pruned aggregation keyed by
    * `input_file_name` (footer-stat-driven at scan time); the same
    * pass yields the global stats the Z-expression scales by, so the
    * incremental rewrite lands victims' rows on the SAME Z-curve the
    * full pass used — ranges stay compatible across calls. Requires at
    * least one numeric column (string spans are unmeasurable — hash
    * buckets have no order). No victims → a zero-rewrite `ZORDER`
    * no-op commit. Partitioned layouts delegate to the full rewrite.
    * Returns the number of files rewritten.
    */
  def zorderIncremental(
      layer: String,
      table: String,
      cols: Seq[String],
      spanThreshold: Double = 0.5,
      targetRowsPerFile: Long = 1_000_000L,
      bits: Int = 8
  ): Long =
    withWriterLock(layer, table)(
      zorderIncrementalImpl(layer, table, cols, spanThreshold, targetRowsPerFile, bits))

  /** Clustering-health gauge (the [[zorderIncremental]] twin of the
    * simhash bucket-occupancy dashboard): one row per numeric
    * clustering column — file count, average and maximum per-file span
    * fraction of the global range, and the count of files whose span
    * exceeds `spanThreshold` (exactly the files an incremental pass
    * would rewrite). What an operator watches to SCHEDULE reclustering
    * instead of discovering a degraded layout from slow scans. Two
    * aggregation passes (per-file min/max keyed by `input_file_name`,
    * then the summary), no per-file driver collect — O(files) rows
    * reduce to |cols| rows.
    */
  def clusterHealth(
      layer: String,
      table: String,
      cols: Seq[String],
      spanThreshold: Double = 0.5
  ): DataFrame = {
    val df      = spark.read.option("mergeSchema", "true").parquet(tablePath(layer, table))
    val numCols = cols.filter(zIsNumeric(df, _))
    require(numCols.nonEmpty, "clusterHealth needs numeric/date/timestamp columns")
    val perFileAggs = numCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c")))
    val perFile = df.groupBy(input_file_name().as("__f"))
      .agg(perFileAggs.head, perFileAggs.tail: _*)
    val gAggs = numCols.flatMap(c => Seq(
      min(col(s"__min_$c")).as(s"__glo_$c"),
      max(col(s"__max_$c")).as(s"__ghi_$c")))
    val g = perFile.agg(gAggs.head, gAggs.tail: _*).head()
    numCols.map { c =>
      val (lo, hi) = (g.getAs[Double](s"__glo_$c"), g.getAs[Double](s"__ghi_$c"))
      val span = hi - lo
      val frac =
        if (span <= 0) lit(0.0)
        else (col(s"__max_$c") - col(s"__min_$c")) / lit(span)
      perFile.agg(
        lit(c).as("column"),
        count(lit(1)).as("n_files"),
        avg(frac).as("avg_span_frac"),
        max(frac).as("max_span_frac"),
        sum(when(frac > spanThreshold, 1L).otherwise(0L)).as("wide_files"))
    }.reduce(_.unionByName(_))
  }


  private def zorderIncrementalImpl(
      layer: String,
      table: String,
      cols: Seq[String],
      spanThreshold: Double,
      targetRowsPerFile: Long,
      bits: Int
  ): Long = {
    repairCrashedSwap(layer, table)
    materializeDv(layer, table) // rewrite never runs against live tombstones
    require(cols.nonEmpty && cols.size <= 4, "zorder supports 1-4 columns")
    require(spanThreshold > 0 && spanThreshold <= 1, "spanThreshold must be in (0, 1]")
    if (partitionColumns(layer, table).nonEmpty) {
      zorderImpl(layer, table, cols, targetRowsPerFile, bits)
      return spark.read.parquet(tablePath(layer, table)).inputFiles.length.toLong
    }
    val target  = tablePath(layer, table)
    val df      = spark.read.option("mergeSchema", "true").parquet(target)
    val numCols = cols.filter(zIsNumeric(df, _))
    require(numCols.nonEmpty,
      "zorderIncremental needs at least one numeric/date/timestamp column to measure spans")
    // one pass: per-file min/max/count for every numeric z-column
    val perFileAggs = numCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c"))) :+ count(lit(1)).as("__rows")
    val perFile = df
      .groupBy(input_file_name().as("__f"))
      .agg(perFileAggs.head, perFileAggs.tail: _*)
      .collect()
    val stats: Map[String, (Double, Double)] = numCols.map { c =>
      c -> (perFile.map(_.getAs[Double](s"__min_$c")).min,
            perFile.map(_.getAs[Double](s"__max_$c")).max)
    }.toMap
    val victims = perFile.filter { r =>
      numCols.exists { c =>
        val (lo, hi) = stats(c)
        val span = hi - lo
        span > 0 && (r.getAs[Double](s"__max_$c") - r.getAs[Double](s"__min_$c")) >
          spanThreshold * span
      }
    }
    if (victims.isEmpty) {
      logOp(layer, table, "ZORDER", inserted = 0, updated = 0, outputRows = 0)
      return 0L
    }
    val victimFiles = victims.map(r => normDataFile(r.getAs[String]("__f"))).toSet
    val untouched   = df.inputFiles.map(normDataFile).filterNot(victimFiles).toSeq
    val victimRows  = victims.map(_.getAs[Long]("__rows")).sum
    val nFiles = math.max(1L, (victimRows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val z = zExpr(df, cols, bits, stats)
    val staging = new Path(target + ".__staging")
    fs.delete(staging, true)
    val obs = org.apache.spark.sql.Observation()
    readFilesAligned(victimFiles.toSeq, df.schema)
      .withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    copyFilesInto(untouched.map((_, "")), staging)
    val back = obs.get("n").asInstanceOf[Long]
    require(back == victimRows, s"zorder changed row count: $victimRows -> $back")
    val carried =
      if (untouched.isEmpty) 0L else footerRowCount(untouched)
    retireAndSwap(layer, table, staging)
    logOp(layer, table, "ZORDER", inserted = 0, updated = 0,
      outputRows = back + carried)
    victimFiles.size.toLong
  }

  /** Hold several tables' writer locks at once — the closest thing the
    * snapshot-dir model has to a multi-table transaction (one thing
    * Delta itself does not give you): e.g. refresh a fact and its MV
    * under one critical section so no competing writer interleaves
    * between the two commits. Locks are acquired in sorted name order,
    * so two multi-table writers with overlapping sets can never
    * deadlock (the classic resource-ordering argument); reentrant like
    * [[withWriterLock]]. Readers still never block — what this
    * serializes is writer-vs-writer interleaving only.
    */
  def withWriterLocks[T](tables: Seq[(String, String)])(body: => T): T = {
    val sorted = tables.distinct.sortBy { case (l, t) => s"$l.$t" }
    def loop(rest: List[(String, String)]): T = rest match {
      case Nil            => body
      case (l, t) :: tail => withWriterLock(l, t)(loop(tail))
    }
    loop(sorted.toList)
  }

  // ---- constraints (Delta CHECK / NOT NULL invariant parity) ----
  //
  // `ALTER TABLE ADD CONSTRAINT` semantics: adding a constraint
  // validates the EXISTING data first (refuses to record if any row
  // violates, like Delta), and every later write validates its incoming
  // row images BEFORE any data lands — strictly before the staged swap,
  // so a violating batch changes nothing (no version bump, no feed
  // rows). CHECK follows the SQL standard: a row violates only when the
  // predicate evaluates to FALSE — NULL passes (use a NOT NULL
  // constraint for null rejection, the same split Delta makes between
  // CHECK constraints and column invariants). Enforcement covers the
  // ops that introduce new row images: CTAS/replace (full data), APPEND
  // and MERGE (the incoming batch — existing rows were validated when
  // the constraint was added), and UPDATE (the assigned post-images).
  // DELETE cannot violate; COMPACT / ZORDER / RESTORE are
  // value-preserving.
  //
  // Storage is a tiny driver-side sidecar `<table>.__constraints`
  // (escaped tab-separated name/kind/expr) — O(constraints) bytes read
  // once per write, the same cost class as the ledger lookup. Like the
  // stats sidecar it lives BESIDE the table dir, so a generation swap
  // or full REPLACE keeps the table's contract (Delta keeps constraints
  // in table properties through REPLACE too); [[dropTable]] removes it.

  private def constraintsPath(layer: String, table: String): Path =
    new Path(tablePath(layer, table) + ".__constraints")

  private def escField(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '\t' => "\\t"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case c    => c.toString
  }

  private def unescField(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b += '\\'
          case 't'  => b += '\t'
          case 'n'  => b += '\n'
          case 'r'  => b += '\r'
          case o    => b += o
        }
        i += 2
      } else { b += c; i += 1 }
    }
    b.toString
  }

  /** The table's recorded constraints as (name, kind, expression);
    * kind ∈ {CHECK, NOT NULL} (expression holds the column name for
    * NOT NULL).
    */
  def constraints(layer: String, table: String): Seq[(String, String, String)] = {
    val p = constraintsPath(layer, table)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.split('\n').iterator.filter(_.nonEmpty).map { line =>
        val f = line.split('\t') // fields are escaped; raw tabs never appear
        require(f.length == 3, s"corrupt constraints sidecar line: $line")
        (unescField(f(0)), unescField(f(1)), unescField(f(2)))
      }.toSeq
    }
  }

  private def writeConstraintsSidecar(
      layer: String, table: String, cs: Seq[(String, String, String)]): Unit =
    if (cs.isEmpty) { fs.delete(constraintsPath(layer, table), false); () }
    else {
      val out = fs.create(constraintsPath(layer, table), true)
      try out.write(cs.map { case (n, k, e) =>
        s"${escField(n)}\t${escField(k)}\t${escField(e)}"
      }.mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
    }

  // ── Table properties ──────────────────────────────────────────────
  // Delta TBLPROPERTIES parity: free-form key/value metadata that
  // survives REPLACE / generation swaps (same `.__` sidecar lifecycle
  // as constraints — dropTable's prefix delete removes it). Properties
  // are metadata only; nothing in the engine interprets them, exactly
  // like Delta's user-facing property bag.

  private def propertiesPath(layer: String, table: String): Path =
    new Path(tablePath(layer, table) + ".__properties")

  /** The table's recorded properties, insertion-ordered. */
  def tableProperties(layer: String, table: String): Seq[(String, String)] = {
    val p = propertiesPath(layer, table)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.split('\n').iterator.filter(_.nonEmpty).map { line =>
        val f = line.split('\t')
        require(f.length == 2, s"corrupt properties sidecar line: $line")
        (unescField(f(0)), unescField(f(1)))
      }.toSeq
    }
  }

  private def writePropertiesSidecar(
      layer: String, table: String, ps: Seq[(String, String)]): Unit =
    if (ps.isEmpty) { fs.delete(propertiesPath(layer, table), false); () }
    else {
      val out = fs.create(propertiesPath(layer, table), true)
      try out.write(ps.map { case (k, v) => s"${escField(k)}\t${escField(v)}" }
        .mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
    }

  /** Upsert properties (Delta `ALTER TABLE SET TBLPROPERTIES`); an
    * existing key is overwritten in place, new keys append. Logged as
    * a zero-metric commit so DESCRIBE HISTORY shows the change, like
    * Delta's SET TBLPROPERTIES commit.
    */
  def setTableProperties(layer: String, table: String, props: Seq[(String, String)]): Unit =
    withWriterLock(layer, table) {
      require(fs.exists(new Path(tablePath(layer, table))),
        s"$layer.$table does not exist")
      val cur   = tableProperties(layer, table)
      val byKey = props.toMap
      val merged = cur.map { case (k, v) => k -> byKey.getOrElse(k, v) } ++
        props.filterNot { case (k, _) => cur.exists(_._1 == k) }
      writePropertiesSidecar(layer, table, merged)
      logOp(layer, table, "SET TBLPROPERTIES", inserted = 0, updated = 0, outputRows = 0)
    }

  /** Remove properties by key (Delta `ALTER TABLE UNSET TBLPROPERTIES`);
    * unknown keys are ignored unless `ifExists` is false.
    */
  def unsetTableProperties(
      layer: String, table: String, keys: Seq[String], ifExists: Boolean = true): Unit =
    withWriterLock(layer, table) {
      val cur = tableProperties(layer, table)
      if (!ifExists) keys.foreach(k =>
        require(cur.exists(_._1 == k), s"table property $k is not set on $layer.$table"))
      writePropertiesSidecar(layer, table, cur.filterNot(p => keys.contains(p._1)))
      logOp(layer, table, "UNSET TBLPROPERTIES", inserted = 0, updated = 0, outputRows = 0)
    }

  /** Record a CHECK constraint after validating the existing data
    * against it (Delta `ALTER TABLE ADD CONSTRAINT`): throws
    * [[Warehouse.ConstraintViolationException]] and records nothing if
    * any current row evaluates the predicate to FALSE.
    */
  def addCheckConstraint(layer: String, table: String, name: String, sqlExpr: String): Unit =
    withWriterLock(layer, table) {
      require(name.nonEmpty && sqlExpr.nonEmpty, "constraint needs a name and an expression")
      val existing = constraints(layer, table)
      require(!existing.exists(_._1 == name), s"constraint '$name' already exists")
      if (tableExists(layer, table))
        // also analysis-validates the expression against the live schema
        failOnViolations(s"$layer.$table", "ADD CONSTRAINT",
          this.table(layer, table), Seq(name -> expr(sqlExpr)))
      writeConstraintsSidecar(layer, table, existing :+ ((name, "CHECK", sqlExpr)))
    }

  /** Record a NOT NULL invariant on a column (validating existing
    * data first). Unlike CHECK, a later write that omits the column
    * entirely VIOLATES it (the stored rows would hold NULL), matching
    * Delta's column-invariant behavior.
    */
  def addNotNullConstraint(layer: String, table: String, colName: String): Unit =
    withWriterLock(layer, table) {
      require(colName.nonEmpty, "NOT NULL constraint needs a column")
      val existing = constraints(layer, table)
      val name     = s"$colName IS NOT NULL"
      require(!existing.exists(_._1 == name), s"constraint '$name' already exists")
      if (tableExists(layer, table)) {
        val live = this.table(layer, table)
        require(live.columns.contains(colName),
          s"NOT NULL constraint on unknown column $colName")
        failOnViolations(s"$layer.$table", "ADD CONSTRAINT", live,
          Seq(name -> col(colName).isNotNull))
      }
      writeConstraintsSidecar(layer, table, existing :+ ((name, "NOT NULL", colName)))
    }

  /** Drop a constraint by name; true if it existed. */
  def dropConstraint(layer: String, table: String, name: String): Boolean =
    withWriterLock(layer, table) {
      val existing = constraints(layer, table)
      val kept     = existing.filterNot(_._1 == name)
      if (kept.size != existing.size) { writeConstraintsSidecar(layer, table, kept); true }
      else false
    }

  /** Validate incoming row images against the table's recorded
    * constraints in ONE aggregate pass; throws naming every violated
    * constraint, BEFORE the caller stages any data. A CHECK whose
    * columns this write doesn't carry passes vacuously (schema
    * evolution null-backfills them, and NULL satisfies CHECK); an
    * absent NOT NULL column is an outright violation.
    */
  private def enforceConstraints(
      layer: String, table: String, rows: DataFrame, op: String): Unit = {
    val cs = constraints(layer, table)
    if (cs.isEmpty) return
    val missingNotNull = cs.collect {
      case (n, "NOT NULL", c) if !rows.columns.contains(c) => n
    }
    if (missingNotNull.nonEmpty)
      throw new Warehouse.ConstraintViolationException(
        s"$op on $layer.$table violates: ${missingNotNull.mkString(", ")} " +
          "(column absent from the written batch — stored rows would be NULL)")
    val checks: Seq[(String, Column)] = cs.flatMap {
      case (n, "NOT NULL", c) => Some(n -> col(c).isNotNull)
      case (n, _, e) =>
        // a CHECK over columns this batch doesn't carry passes vacuously
        try { rows.select(expr(e)); Some(n -> expr(e)) }
        catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
    if (checks.nonEmpty) failOnViolations(s"$layer.$table", op, rows, checks)
  }

  /** One aggregate over `rows` counting, per constraint, rows whose
    * predicate is FALSE (NULL passes — SQL CHECK semantics; NOT NULL
    * predicates never evaluate to NULL).
    */
  private def failOnViolations(
      tableName: String, op: String, rows: DataFrame,
      checks: Seq[(String, Column)]): Unit = {
    val aggs = checks.map { case (_, ok) =>
      sum(when(ok === false, 1L).otherwise(0L)) }
    val r = rows.agg(aggs.head, aggs.tail: _*).head()
    val bad = checks.zipWithIndex.collect {
      case ((n, _), i) if !r.isNullAt(i) && r.getLong(i) > 0 =>
        s"$n (${r.getLong(i)} rows)"
    }
    if (bad.nonEmpty)
      throw new Warehouse.ConstraintViolationException(
        s"$op on $tableName violates: ${bad.mkString("; ")} — nothing was written")
  }

  /** DLT-style "expect or drop" append (the third leg of the
    * expectations triad: [[append]] under constraints is
    * expect-or-fail, no constraints is expect): rows passing every
    * recorded constraint append to the table; violating rows, tagged
    * with the comma-joined names of the constraints they violate
    * (`_violated`, in constraint-declaration order), append to
    * `<table>__quarantine` in the same layer — a REAL table: list it,
    * query it, replay it after fixing upstream. The 100 TB posture: a
    * handful of bad rows must not fail a day's ingest, but silently
    * dropping them loses the quality signal — the quarantine table IS
    * the data-quality ledger. One classification pass over the batch
    * (each constraint one codegen'd predicate), then the two appends;
    * cost scales with the delta, never the table. Returns
    * (appended, quarantined).
    */
  def appendOrQuarantine(layer: String, table: String, df0: DataFrame): (Long, Long) =
    withWriterLock(layer, table) {
      // generated columns materialize BEFORE classification, so a
      // constraint over a generated column sees real values (a carried
      // mismatch still refuses the whole batch — it is writer error,
      // not data quality)
      val df = applyGenerated(layer, table, df0, "APPEND")
      val cs = constraints(layer, table)
      if (cs.isEmpty) (appendImpl(layer, table, df), 0L)
      else {
        // same per-constraint semantics as enforceConstraints: CHECK
        // violates on FALSE (NULL passes; absent columns vacuous),
        // NOT NULL violates on null values or a wholly absent column
        val checks: Seq[(String, Column)] = cs.map {
          case (n, "NOT NULL", c) =>
            n -> (if (df.columns.contains(c)) col(c).isNotNull else lit(false))
          case (n, _, e) =>
            n -> (try { df.select(expr(e)); coalesce(expr(e), lit(true)) }
                  catch { case _: org.apache.spark.sql.AnalysisException => lit(true) })
        }
        val tags = array(checks.map { case (n, ok) => when(ok === false, lit(n)) }: _*)
        val tagged = df.withColumn("_violated", filter(tags, x => x.isNotNull))
        val good = tagged.filter(size(col("_violated")) === 0).drop("_violated")
        val bad = tagged.filter(size(col("_violated")) > 0)
          .withColumn("_violated", concat_ws(",", col("_violated")))
        // good rows pass by construction; appendImpl's own enforcement
        // re-proves it (one extra agg over the delta — cheap insurance)
        val nGood = appendImpl(layer, table, good)
        val nBad =
          if (bad.isEmpty) 0L // don't materialize an empty quarantine
          else append(layer, table + "__quarantine", bad)
        (nGood, nBad)
      }
    }

  // ---- generated columns (Delta generated-column parity) ----
  //
  // A column declared as `GENERATED ALWAYS AS (expr)`: writers may omit
  // it (the engine computes it during the write) or carry it (the
  // carried values are validated against the expression and a mismatch
  // refuses the batch — Delta's exact contract). Declared via
  // [[addGeneratedColumn]] at any point, not just CREATE: if the live
  // table lacks the column the declaration BACKFILLS it through one
  // staged rewrite (safe under the swap protocol, one extra commit);
  // if the column exists its values must already match. UPDATEs that
  // assign a generated column, or any column its expression derives
  // from, are refused — the projection evaluates assignments against
  // pre-update rows, so an inline recompute would read stale sources;
  // a derivation-changing rewrite goes through createOrReplace, which
  // recomputes. Stored in a `<table>.__generated` sidecar (same
  // escaped-TSV, same lifecycle as `.__constraints`).

  private def generatedPath(layer: String, table: String): Path =
    new Path(tablePath(layer, table) + ".__generated")

  /** The table's generated columns as (name, expression), in
    * declaration order.
    */
  def generatedColumns(layer: String, table: String): Seq[(String, String)] = {
    val p = generatedPath(layer, table)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.split('\n').iterator.filter(_.nonEmpty).map { line =>
        val f = line.split('\t')
        require(f.length == 2, s"corrupt generated sidecar line: $line")
        (unescField(f(0)), unescField(f(1)))
      }.toSeq
    }
  }

  private def writeGeneratedSidecar(
      layer: String, table: String, gens: Seq[(String, String)]): Unit =
    if (gens.isEmpty) { fs.delete(generatedPath(layer, table), false); () }
    else {
      val out = fs.create(generatedPath(layer, table), true)
      try out.write(gens.map { case (n, e) => s"${escField(n)}\t${escField(e)}" }
        .mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
    }

  /** Column names a SQL expression references (pre-analysis — the
    * UPDATE guard needs them before any plan is resolved).
    */
  private def exprDeps(e: String): Set[String] =
    spark.sessionState.sqlParser.parseExpression(e).collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.name.toLowerCase
    }.toSet

  /** Declare `colName` as GENERATED ALWAYS AS (sqlExpr). Existing
    * column → values must already match (refused otherwise, nothing
    * recorded); absent column → backfilled via one staged rewrite
    * preserving the partition layout.
    */
  def addGeneratedColumn(layer: String, table: String, colName: String, sqlExpr: String): Unit =
    withWriterLock(layer, table) {
      require(colName.nonEmpty && sqlExpr.nonEmpty,
        "generated column needs a name and an expression")
      val existing = generatedColumns(layer, table)
      require(!existing.exists(_._1 == colName),
        s"generated column '$colName' already declared")
      require(!exprDeps(sqlExpr).contains(colName.toLowerCase),
        s"generated column $colName cannot derive from itself")
      if (tableExists(layer, table)) {
        val live = this.table(layer, table)
        if (live.columns.contains(colName))
          failOnViolations(s"$layer.$table", "ADD GENERATED COLUMN", live,
            Seq(s"generated $colName mismatch" -> (col(colName) <=> expr(sqlExpr))))
        else {
          val pcols = partitionColumns(layer, table)
          val filled = live.withColumn(colName, expr(sqlExpr))
          if (pcols.nonEmpty)
            createOrReplacePartitionedImpl(layer, table, filled, pcols)
          else createOrReplaceImpl(layer, table, filled)
        }
      }
      writeGeneratedSidecar(layer, table, existing :+ ((colName, sqlExpr)))
    }

  /** Drop a generated-column declaration (the data column stays, it
    * just stops being maintained); true if it existed.
    */
  def dropGeneratedColumn(layer: String, table: String, colName: String): Boolean =
    withWriterLock(layer, table) {
      val existing = generatedColumns(layer, table)
      val kept     = existing.filterNot(_._1 == colName)
      if (kept.size != existing.size) { writeGeneratedSidecar(layer, table, kept); true }
      else false
    }

  /** Materialize the table's generated columns on an incoming batch:
    * omitted columns are computed, carried columns are validated
    * against their expression in one aggregate pass (null-safe
    * equality) and a mismatch refuses the batch.
    */
  private def applyGenerated(
      layer: String, table: String, df: DataFrame, op: String): DataFrame = {
    val gens = generatedColumns(layer, table)
    if (gens.isEmpty) return df
    val out = gens.foldLeft(df) { case (d, (c, e)) =>
      if (d.columns.contains(c)) d else d.withColumn(c, expr(e))
    }
    val carried = gens.filter { case (c, _) => df.columns.contains(c) }
    if (carried.nonEmpty)
      failOnViolations(s"$layer.$table", op, out,
        carried.map { case (c, e) =>
          s"generated $c mismatch" -> (col(c) <=> expr(e))
        })
    out
  }

  // ---- data-skipping file pruning (Delta file-stats parity) ----

  private def statsPath(layer: String, table: String): Path =
    new Path(tablePath(layer, table) + ".__stats")

  private def normFile(s: String): String = new Path(s).toUri.getPath

  /** Build the per-file min/max statistics sidecar (`<table>.__stats`):
    * one row per data file with `min_<col>`/`max_<col>` for each given
    * column — the engine's answer to Delta's per-file stats in the
    * transaction log, and what makes [[zorder]] PAY OFF: clustering
    * shrinks each file's value span, so a selective predicate's range
    * intersects few files and [[scanPruned]] plans a scan over exactly
    * those, instead of relying on row-group-level skipping inside a
    * full file listing. One pass over the stat columns (the
    * `input_file_name` groupBy shuffles file-count rows, not data);
    * the sidecar swaps in via staging like every other write. Returns
    * the number of files profiled.
    */
  def collectStats(layer: String, table: String, cols: Seq[String]): Long =
    withWriterLock(layer, table) {
      require(cols.nonEmpty, "collectStats needs at least one column")
      writeSidecar(statsPath(layer, table), statsFor(rawTable(layer, table), cols))
    }

  /** Per-file min/max stats rows for an arbitrary slice of the table
    * (the whole table on a full build, only the DML-rewritten files on
    * an incremental [[refreshStats]]).
    */
  private def statsFor(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
  }

  /** Stage-swap a sidecar table into place; returns its row count. */
  private def writeSidecar(p: Path, rows: DataFrame): Long = {
    val staging = new Path(p.toString + ".__staging")
    fs.delete(staging, true)
    val obs = org.apache.spark.sql.Observation()
    rows.observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    fs.delete(p, true)
    if (!fs.rename(staging, p))
      throw new java.io.IOException(s"rename $staging -> $p failed")
    obs.get("n").asInstanceOf[Long]
  }

  /** Incrementally refresh the stats sidecar: rows for files still
    * present are retained VERBATIM (file-granular COW keeps their
    * bytes, so their stats stay true), stats are computed only for
    * files the sidecar has never seen (a DML's rewritten output), and
    * rows for vanished files drop. Cost O(changed files' rows), not
    * O(table) — the piece that keeps the skipping layer cheap under a
    * steady DML stream at 100 TB. Falls back to a full
    * [[collectStats]] when the sidecar is missing or lacks one of the
    * requested columns (a new column must be profiled in every file).
    */
  def refreshStats(layer: String, table: String, cols: Seq[String]): Long =
    withWriterLock(layer, table)(refreshStatsImpl(layer, table, cols))

  private def refreshStatsImpl(layer: String, table: String, cols: Seq[String]): Long = {
    require(cols.nonEmpty, "refreshStats needs at least one column")
    val p = statsPath(layer, table)
    if (!fs.exists(p)) return collectStats(layer, table, cols)
    val existing  = spark.read.parquet(p.toString)
    val priorCols = existing.columns.collect {
      case n if n.startsWith("min_") => n.stripPrefix("min_")
    }.toSeq
    val allCols = (priorCols ++ cols).distinct
    if (!cols.forall(priorCols.contains)) return collectStats(layer, table, allCols)
    val df            = rawTable(layer, table)
    val existingFiles = existing.select(col("file")).collect().map(_.getString(0))
    val existingNorm  = existingFiles.map(normFile).toSet
    val currentRaw    = df.inputFiles.toSeq
    val currentNorm   = currentRaw.map(normFile).toSet
    val retainedRaw   = existingFiles.filter(f => currentNorm.contains(normFile(f))).toSeq
    val missingRaw    = currentRaw.filterNot(f => existingNorm.contains(normFile(f)))
    if (missingRaw.isEmpty && retainedRaw.length == existingFiles.length)
      return existingFiles.length.toLong // already fresh
    val retained = existing.filter(col("file").isin(retainedRaw: _*))
    if (missingRaw.isEmpty) return writeSidecar(p, retained)
    val fresh = statsFor(
      readFilesAligned(missingRaw, df.schema, basePath = Some(tablePath(layer, table))),
      allCols)
    writeSidecar(p, retained.unionByName(fresh))
  }

  /** Data-skipping scan: rows with `colName` BETWEEN lo AND hi, read
    * from ONLY the files whose [min, max] intersects the range — the
    * read side of [[collectStats]] and the piece that turns a z-ordered
    * layout into skipped I/O (a selective range after [[zorder]] reads
    * a strict file subset — spec-asserted). Stale or missing stats
    * (file set changed since [[collectStats]], or the column was never
    * profiled) recompute automatically, so the result is ALWAYS exactly
    * `table.filter(between)` — pruning is a plan property, never a
    * correctness property. Files whose stats row is all-null (no
    * non-null values of the column) are skipped: NULL never matches a
    * range predicate.
    */
  def scanPruned(layer: String, table: String, colName: String, lo: Any, hi: Any): DataFrame = {
    // raw scan for file-set math: stats rows describe physical files
    // (tombstoned rows included — conservative, pruning stays safe);
    // the RESULT is tombstone-subtracted below, so the contract
    // `scanPruned ≡ table.filter(between)` holds under live DVs too
    val df      = rawTable(layer, table)
    val p       = statsPath(layer, table)
    val current = df.inputFiles.map(normFile).toSet
    def stats() = spark.read.parquet(p.toString)
    // one sidecar job answers BOTH freshness (full file set must match
    // the live listing) and the prune (per-file intersect flag) — the
    // file list must come to the driver either way, so a second
    // read-and-collect would be pure overhead on the probe path
    def tryPrune(): Option[IndexedSeq[String]] = {
      if (!fs.exists(p)) return None
      val s = stats()
      if (!s.columns.contains(s"min_$colName")) return None
      val rows = s
        .select(col("file"),
          (!(col(s"max_$colName") < lit(lo) || col(s"min_$colName") > lit(hi))).as("s"))
        .collect()
      if (rows.map(r => normFile(r.getString(0))).toSet != current) None
      else Some(rows.filter(_.getBoolean(1)).map(_.getString(0)).toIndexedSeq)
    }
    val surviving = tryPrune().getOrElse {
      // incremental: COW DMLs leave most files (and their stats rows)
      // intact — only never-seen files are profiled; a brand-new
      // column or missing sidecar falls back to the full build inside
      refreshStats(layer, table, Seq(colName))
      tryPrune().getOrElse(
        throw new IllegalStateException(s"stats sidecar $p stale immediately after rebuild"))
    }
    val pred = col(colName).between(lit(lo), lit(hi))
    if (surviving.isEmpty) df.filter(lit(false))
    else
      applyDv(
        spark.read
          .option("mergeSchema", "true")
          // basePath so a partitioned table's directory columns
          // materialize exactly as a whole-table read would
          .option("basePath", tablePath(layer, table))
          .parquet(surviving: _*),
        layer, table, Long.MaxValue, partitionColumns(layer, table).length)
        .filter(pred)
  }

  // ---- bloom-filter file skipping (Delta bloom-index parity) ----

  private def bloomPath(layer: String, table: String, colName: String): Path =
    new Path(tablePath(layer, table) + s".__bloom_$colName")

  /** Build a per-file BLOOM sidecar over `colName` — the equality twin
    * of [[collectStats]]: min/max ranges cannot prune a point lookup on
    * a high-cardinality key that every file's span covers (the GDPR
    * find-this-user shape), a bloom filter can. One row per data file:
    * (file, m bits, k hashes, sparse bitmap as `map<word -> long>`).
    *
    * Built entirely from codegen'd SQL primitives — no UDF, no
    * driver-side sketch objects: each row explodes to its k hash
    * positions (chained `xxhash64(i, v)`), positions fold into 64-bit
    * words via `bit_or`, and map-side partial aggregation collapses a
    * partition's contribution to at most m/64 words per file BEFORE the
    * shuffle — the shuffle carries O(files x m/64) words, never O(rows).
    * `m` is sized per file from its row count (~`bitsPerKey` bits each,
    * pow-2 for cheap masking), so small and large files both hit the
    * designed false-positive rate (~1% at the default 10 bits/key,
    * k = 7); the sidecar is ~m/8 bytes per file — KBs — and swaps in
    * via staging like every write. Returns the number of files profiled.
    */
  def collectBloom(layer: String, table: String, colName: String, bitsPerKey: Int = 10): Long =
    withWriterLock(layer, table) {
      require(bitsPerKey >= 1, "bitsPerKey must be >= 1")
      writeSidecar(bloomPath(layer, table, colName),
        bloomFor(rawTable(layer, table), colName, bitsPerKey))
    }

  /** Per-file bloom rows for an arbitrary slice of the table (whole
    * table on a full build, only rewritten files on [[refreshBloom]]).
    */
  private def bloomFor(df: DataFrame, colName: String, bitsPerKey: Int): DataFrame = {
    val k = math.max(1, math.round(bitsPerKey * math.log(2)).toInt)
    // per-file m: one small driver-side file->rows map (file-count rows,
    // the same cardinality every planner holds), rejoined by broadcast
    val fileRows = df
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"))
      .select(col("file"),
        call_function("shiftleft", lit(1L),
          ceil(log2(greatest(col("rows") * bitsPerKey, lit(1024)))).cast("int")).as("m"))
    val rows = df
      .select(input_file_name().as("file"), col(colName).as("v"))
      .join(broadcast(fileRows), "file")
    val words = rows
      .select(col("file"), col("m"),
        explode(array((0 until k).map(i => pmod(xxhash64(lit(i), col("v")), col("m"))): _*))
          .as("pos"))
      .select(col("file"), col("m"),
        shiftright(col("pos"), 6).cast("int").as("word"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("bit"))
      .groupBy(col("file"), col("m"), col("word"))
      .agg(bit_or(col("bit")).as("bits"))
    words
      .groupBy(col("file"), col("m"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("bits")))).as("bitmap"))
      .select(col("file"), col("m"), lit(k).as("k"), col("bitmap"))
  }

  /** Incremental bloom-sidecar refresh — the [[refreshStats]] twin:
    * COW-carried files keep their rows verbatim, only never-seen files
    * build blooms, vanished files drop. Falls back to a full
    * [[collectBloom]] on a missing sidecar or a changed hash count
    * (different `bitsPerKey`).
    */
  def refreshBloom(layer: String, table: String, colName: String, bitsPerKey: Int = 10): Long =
    withWriterLock(layer, table)(refreshBloomImpl(layer, table, colName, bitsPerKey))

  private def refreshBloomImpl(layer: String, table: String, colName: String, bitsPerKey: Int): Long = {
    val p = bloomPath(layer, table, colName)
    if (!fs.exists(p)) return collectBloom(layer, table, colName, bitsPerKey)
    val k        = math.max(1, math.round(bitsPerKey * math.log(2)).toInt)
    val existing = spark.read.parquet(p.toString)
    val kPrior = existing.select(max(col("k"))).head() match {
      case r if r.isNullAt(0) => return collectBloom(layer, table, colName, bitsPerKey)
      case r                  => r.getInt(0)
    }
    if (kPrior != k) return collectBloom(layer, table, colName, bitsPerKey)
    val df            = rawTable(layer, table)
    val existingFiles = existing.select(col("file")).collect().map(_.getString(0))
    val existingNorm  = existingFiles.map(normFile).toSet
    val currentRaw    = df.inputFiles.toSeq
    val currentNorm   = currentRaw.map(normFile).toSet
    val retainedRaw   = existingFiles.filter(f => currentNorm.contains(normFile(f))).toSeq
    val missingRaw    = currentRaw.filterNot(f => existingNorm.contains(normFile(f)))
    if (missingRaw.isEmpty && retainedRaw.length == existingFiles.length)
      return existingFiles.length.toLong
    val retained = existing.filter(col("file").isin(retainedRaw: _*))
    if (missingRaw.isEmpty) return writeSidecar(p, retained)
    val fresh = bloomFor(
      readFilesAligned(missingRaw, df.schema, basePath = Some(tablePath(layer, table))),
      colName, bitsPerKey)
    writeSidecar(p, retained.unionByName(fresh))
  }

  /** Point-lookup scan: rows with `colName` in `values`, read from ONLY
    * the files whose bloom filter admits at least one of the values —
    * the read side of [[collectBloom]]. The probe evaluates the SAME
    * `xxhash64` chain the build used, as SQL expressions over the
    * KB-sized sidecar (literals cast to the column type so an `Int`
    * probe of a `bigint` column hashes identically); a missing word in
    * the sparse bitmap is zero bits. Stale or missing sidecars (file
    * set changed, column never profiled) rebuild automatically, and the
    * surviving files re-filter with the real predicate — so the result
    * is ALWAYS exactly `table.filter(col isin values)`: bloom false
    * positives cost I/O, never correctness. At 100 TB this turns
    * find-these-keys (GDPR lookup/delete pre-scan, CDC key audit) from
    * read-every-file into read-~1%-of-files.
    */
  def scanPrunedEq(layer: String, table: String, colName: String, values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "scanPrunedEq needs at least one probe value")
    val df      = rawTable(layer, table) // file-set math on the bare scan; result DV-filtered below
    val vtype   = df.schema(colName).dataType
    val p       = bloomPath(layer, table, colName)
    val current = df.inputFiles.map(normFile).toSet
    def sidecar() = spark.read.parquet(p.toString)
    def admits(k: Int)(v: Any): Column =
      (0 until k)
        .map { i =>
          val pos = pmod(xxhash64(lit(i), lit(v).cast(vtype)), col("m"))
          coalesce(try_element_at(col("bitmap"), shiftright(pos, 6).cast("int")), lit(0L))
            .bitwiseAND(call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!= 0L
        }
        .reduce(_ && _)
    // two KB-sized sidecar jobs total: one row-peek for k (needed at
    // expression-build time), then a single pass computing the per-file
    // admit flag AND the file list the freshness comparison needs
    // driver-side anyway (see scanPruned)
    def tryPrune(): Option[IndexedSeq[String]] = {
      if (!fs.exists(p)) return None
      val s = sidecar()
      val kMax = s.select(max(col("k"))).head() match {
        case r if r.isNullAt(0) => return None // empty sidecar
        case r                  => r.getInt(0)
      }
      val rows =
        if (values.lengthCompare(16) <= 0)
          // few probes: one flat OR expression, zero extra operators
          s.select(col("file"), values.map(admits(kMax)).reduce(_ || _).as("s"))
            .collect()
        else {
          // MANY probes (a GDPR request of hundreds/thousands of keys):
          // an OR of |values|·k bloom probes is a codegen-exploding
          // expression tree (measured: seconds of compile per run at
          // ~1500 keys). Go relational instead — explode the probe
          // values against the KB-sized sidecar (|files|·|values|
          // intermediate rows, trivial next to any data scan),
          // evaluate ONE O(k) admit expression per pair, fold per
          // file. The literal array constant-folds, so the plan stays
          // O(k) expression nodes no matter how long the request is.
          val probe = col("__probe")
          val admitCol = (0 until kMax)
            .map { i =>
              val pos = pmod(xxhash64(lit(i), probe), col("m"))
              coalesce(try_element_at(col("bitmap"), shiftright(pos, 6).cast("int")), lit(0L))
                .bitwiseAND(call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!= 0L
            }
            .reduce(_ && _)
          s.select(col("file"), col("m"), col("bitmap"),
              explode(array(values.distinct.map(v => lit(v).cast(vtype)): _*)).as("__probe"))
            .select(col("file"), admitCol.as("a"))
            .groupBy(col("file"))
            .agg(max(when(col("a"), 1).otherwise(0)).as("ai"))
            .select(col("file"), (col("ai") === 1).as("s"))
            .collect()
        }
      if (rows.map(r => normFile(r.getString(0))).toSet != current) None
      else Some(rows.filter(_.getBoolean(1)).map(_.getString(0)).toIndexedSeq)
    }
    val surviving = tryPrune().getOrElse {
      refreshBloom(layer, table, colName) // incremental; full build inside when needed
      tryPrune().getOrElse(
        throw new IllegalStateException(s"bloom sidecar $p stale immediately after rebuild"))
    }
    val pred = col(colName).isin(values: _*)
    if (surviving.isEmpty) df.filter(lit(false))
    else
      applyDv(
        spark.read
          .option("mergeSchema", "true")
          .option("basePath", tablePath(layer, table))
          .parquet(surviving: _*),
        layer, table, Long.MaxValue, partitionColumns(layer, table).length)
        .filter(pred)
  }

  /** INSERT INTO ... SELECT (reference silver_google_scholar.py:148).
    * The appended-row count is an `observe` metric collected from the
    * write job itself — one pass over the input, where a pre-count
    * would execute the whole plan twice (the reference's pre/post-count
    * reads Delta's commit metrics, which are likewise free).
    */
  def append(layer: String, table: String, df: DataFrame): Long =
    withWriterLock(layer, table)(appendImpl(layer, table, df))

  private def appendImpl(layer: String, table: String, df0: DataFrame): Long = {
    repairCrashedSwap(layer, table)
    val gen = applyGenerated(layer, table, df0, "APPEND")
    val (df, idHighs) = applyIdentity(layer, table, gen, allowCarry = false)
    commitIdentity(layer, table, idHighs) // ids burn even if the write refuses
    enforceConstraints(layer, table, df, "APPEND")
    // schema evolution: a widened source appends its new columns (old
    // files surface them as null via the merged read); a source missing
    // target columns is null-backfilled so every file carries the full
    // evolved schema
    val aligned =
      if (!tableExists(layer, table)) df
      else alignTo(df, unionSchema(rawTable(layer, table).schema, df.schema))
    val obs = org.apache.spark.sql.Observation()
    // a partitioned table keeps its layout: root-level data files in a
    // hive tree are a mixed layout Spark's discovery refuses to read
    val pcols  = partitionColumns(layer, table)
    val writer = aligned.observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Append)
    (if (pcols.nonEmpty) writer.partitionBy(pcols: _*) else writer)
      .parquet(tablePath(layer, table))
    val n = obs.get("n").asInstanceOf[Long]
    logOp(layer, table, "APPEND", inserted = n, updated = 0, outputRows = n)
    n
  }

  /** MERGE INTO (reference silver_arxiv.py:130-152) — conditional upsert
    * via [[Upsert.mergeWithMetrics]], staged overwrite, metrics to the
    * ledger exactly like Delta's operationMetrics
    * (numTargetRowsInserted/Updated/numOutputRows).
    *
    * Every merge also records its change rows (the Delta Change Data
    * Feed replacement): rows whose action is insert/update are
    * appended to `<table>.__changes` with `_change_type` ∈
    * {insert, update_postimage} and `_commit_version` — a filtered
    * re-run of the same deterministic merge plan the metrics came
    * from (column-pruned by Catalyst per pass; the plan is never
    * cached full-width — see [[Upsert.MergeResult]]). Kept rows are
    * never written (a consumer tails only what changed — the property
    * that makes incremental downstream refresh linear in the delta,
    * not the table). CTAS and APPEND don't write feed rows: a CTAS is
    * a new base (read it directly) and an append's delta IS its input;
    * only MERGE interleaves changes into existing data.
    */
  def upsert(
      layer: String,
      table: String,
      src: DataFrame,
      keys: Seq[String],
      versionCol: String
  ): Upsert.WriteMetrics =
    withWriterLock(layer, table)(upsertImpl(layer, table, src, keys, versionCol))

  private def upsertImpl(
      layer: String,
      table: String,
      src0: DataFrame,
      keys: Seq[String],
      versionCol: String
  ): Upsert.WriteMetrics = {
    repairCrashedSwap(layer, table)
    materializeDv(layer, table) // rewrite never runs against live tombstones
    if (!tableExists(layer, table)) {
      val n = createOrReplace(layer, table, src0) // generates + enforces itself
      return Upsert.WriteMetrics(inserted = n, updated = 0, kept = 0)
    }
    val gen = applyGenerated(layer, table, src0, "MERGE")
    require(!keys.exists(k => identityColumns(layer, table).exists(_._1.equalsIgnoreCase(k))),
      "cannot MERGE on a GENERATED ALWAYS AS IDENTITY column — sources cannot carry it")
    val (src, idHighs) = applyIdentity(layer, table, gen, allowCarry = false)
    commitIdentity(layer, table, idHighs) // ids burn even if the merge refuses
    // every new row image a merge can store comes from the incoming
    // batch (kept rows were validated when the constraint was added) —
    // validated whole, so a row a conditional merge would discard still
    // rejects the batch: stricter than Delta's written-rows-only check,
    // and cheaper than running the merge plan just to find the winners
    enforceConstraints(layer, table, src, "MERGE")
    val pcols = partitionColumns(layer, table)
    if (pcols.nonEmpty) return upsertPartitioned(layer, table, src, keys, versionCol, pcols)
    // schema evolution: both sides align to the union schema before
    // the merge (new source columns null-backfill old target rows,
    // missing source columns tolerated) — free here, since an upsert
    // rewrites the table generation anyway
    val tgt0    = this.table(layer, table)
    val unioned = unionSchema(tgt0.schema, src.schema)
    // File-granular COW for MERGE: a target file needs rewriting only
    // if it holds a row whose key the source carries — one narrow
    // (keys + file) semi-join pass finds them; every other file
    // byte-copies into the new generation and its rows never enter the
    // merge join (they would all be "keep"). Inserts write into the
    // fresh part files regardless. A source-only NEW column forces the
    // full rewrite instead: evolution must null-backfill every file.
    val newCols = unioned.fieldNames.filterNot(tgt0.columns.contains)
    val allFiles = tgt0.inputFiles.map(normDataFile).toSeq
    val matchedFiles: Set[String] =
      if (newCols.nonEmpty) allFiles.toSet
      else {
        val srcKeys = src.select(keys.map(col): _*).distinct()
        val tgtF    = tgt0.withColumn("__graft_file", input_file_name())
        tgtF
          .join(srcKeys, keys.map(k => tgtF(k) <=> srcKeys(k)).reduce(_ && _), "left_semi")
          .select(col("__graft_file")).distinct()
          .collect().map(r => normDataFile(r.getString(0))).toSet
      }
    val untouched = allFiles.filterNot(matchedFiles)
    val touchedTgt =
      if (matchedFiles.isEmpty) tgt0.limit(0)
      else readFilesAligned(matchedFiles.toSeq, tgt0.schema)
    val mr = Upsert.mergeWithMetrics(alignTo(touchedTgt, unioned), alignTo(src, unioned),
      keys, versionCol, insertOnlyCols = identityColumns(layer, table).map(_._1).toSet)
    val m  = mr.metrics
    // zero-change early exit: the metrics pass is a narrow column-pruned
    // aggregation, so a merge where every source row loses the version
    // rule (an idempotent re-run) is detected cheaply — skip the
    // rewrite, the feed append, and the retired generation, but STILL
    // record a MERGE 0/0 ledger commit with a version bump: Delta logs
    // a MERGE commit even when operationMetrics are all zero, and the
    // reference reads DESCRIBE HISTORY after every run
    // (silver_arxiv.py:175-184) — a re-run must report "inserted 0 /
    // updated 0", not surface the previous op as its last history row.
    // A version with no generation folds into its predecessor on
    // time travel, exactly like APPEND.
    // (the newCols check above also forces the rewrite on a zero-change
    // merge whose source carries a new column — Delta's MERGE commit
    // updates table metadata even at zero changed rows)
    if (m.inserted == 0 && m.updated == 0 && newCols.isEmpty) {
      mr.unpersist()
      logOp(layer, table, "MERGE", inserted = 0, updated = 0, outputRows = 0)
      return m
    }
    val staging = new Path(tablePath(layer, table) + ".__staging")
    fs.delete(staging, true)
    val ver = nextVersion(s"$layer.$table")
    // footer-only count BEFORE the feed write: the feed-to-ledger
    // commit window must stay minimal — a streaming feed consumer
    // waits on the commit (see WarehouseStreams.mvRefreshSink)
    val carried =
      if (untouched.isEmpty) 0L
      else footerRowCount(untouched)
    try {
      mr.result.write.mode(SaveMode.Overwrite).parquet(staging.toString)
      copyFilesInto(untouched.map((_, "")), staging)
      val post = mr.merged
        .filter(col(Upsert.ActionCol) =!= "keep")
        .withColumn("_change_type",
          when(col(Upsert.ActionCol) === "insert", lit("insert"))
            .otherwise(lit("update_postimage")))
        .drop(Upsert.ActionCol)
      // update_preimage (full Delta CDF semantics): the replaced
      // target rows, via a semi join of the pre-merge TOUCHED files
      // against the updated keys (small by definition — it
      // broadcasts; updated rows only live in touched files).
      // Without preimages a feed consumer cannot SUBTRACT an update,
      // which is what incremental aggregate maintenance needs.
      val updatedKeys = mr.merged
        .filter(col(Upsert.ActionCol) === "update")
        .select(keys.map(col): _*)
      val pre = touchedTgt
        .join(updatedKeys,
          keys.map(k => touchedTgt(k) <=> updatedKeys(k)).reduce(_ && _), "left_semi")
        .select(unioned.fieldNames.map(n =>
          if (tgt0.columns.contains(n)) col(n)
          else lit(null).cast(unioned(n).dataType).as(n)): _*)
        .withColumn("_change_type", lit("update_preimage"))
      post.unionByName(pre)
        .withColumn("_commit_version", lit(ver))
        .withColumn("_commit_part", lit(f"$ver%010d"))
        .write.mode(SaveMode.Append).partitionBy("_commit_part")
        .parquet(tablePath(layer, table) + ".__changes")
    } finally mr.unpersist()
    retireAndSwap(layer, table, staging)
    logOp(layer, table, "MERGE", m.inserted, m.updated,
      outputRows = m.outputRows + carried, version = ver)
    m
  }

  /** The table's change feed (Delta CDF `table_changes` replacement):
    * every merge's insert/update rows, tagged `_change_type` and
    * `_commit_version`, for versions AFTER `sinceVersion`. The feed is
    * append-only and survives generation pruning — a downstream
    * consumer can refresh incrementally from any version it last saw,
    * even after the matching snapshot is vacuumed.
    *
    * Layout: the sidecar is hive-partitioned by `_commit_part` (the
    * zero-padded version — Spark's partition-value inference reads it
    * back as an integral type, and the tail predicate casts it to long
    * explicitly, so the comparison is numeric at any digit count), so
    * a tail from version N is a PARTITION-PRUNED read of the commits
    * after N, not a scan-all-then-filter of a feed that only ever
    * grows — partition predicates evaluate against the discovered
    * partition VALUES at planning, never against data files. That is
    * what keeps incremental consumers O(delta) over the table's whole
    * life, not O(history). `_commit_version` stays a data column —
    * consumer schemas are unchanged.
    *
    * Feeds written by engine versions that predate the partitioned
    * layout hold their data files at the sidecar ROOT; Spark refuses
    * mixed root-files + partition-dirs discovery, so the first read
    * MIGRATES legacy files into `_commit_part=` directories (derived
    * from each row's `_commit_version`) once, then deletes them — no
    * history is lost and the pruned tail applies to the whole feed.
    */
  def changeFeed(layer: String, table: String, sinceVersion: Long = -1L): DataFrame = {
    val p = tablePath(layer, table) + ".__changes"
    require(fs.exists(new Path(p)), s"$layer.$table has no change feed (no merges recorded)")
    migrateLegacyFeed(p)
    // upper bound at the committed ledger version: ops write feed rows
    // BEFORE their swap commits, so a crashed op's phantom partition
    // (repaired away at the next op head) is invisible to readers too
    spark.read.option("mergeSchema", "true").parquet(p)
      .filter(col("_commit_part").cast("long") > sinceVersion &&
        col("_commit_part").cast("long") <= latestVersion(s"$layer.$table"))
      .drop("_commit_part")
  }

  /** Bounded change feed — Delta's two-arg
    * `table_changes(t, startVersion, endVersion)`: both bounds
    * INCLUSIVE, the end capped at the committed ledger head (Delta
    * errors past-head reads; capping serves the same
    * no-phantom-commits contract under the feed's write-before-swap
    * ordering). Same partition-pruned tail as [[changeFeed]]: the
    * range reads exactly the `_commit_part` directories it spans,
    * O(range), never O(history).
    */
  def changeFeedRange(
      layer: String,
      table: String,
      fromVersion: Long,
      toVersion: Long
  ): DataFrame = {
    require(fromVersion >= 0, s"fromVersion must be >= 0, got $fromVersion")
    require(toVersion >= fromVersion,
      s"table_changes range is inverted: [$fromVersion, $toVersion]")
    val p = tablePath(layer, table) + ".__changes"
    require(fs.exists(new Path(p)), s"$layer.$table has no change feed (no merges recorded)")
    migrateLegacyFeed(p)
    val cap = math.min(toVersion, latestVersion(s"$layer.$table"))
    spark.read.option("mergeSchema", "true").parquet(p)
      .filter(col("_commit_part").cast("long") >= fromVersion &&
        col("_commit_part").cast("long") <= cap)
      .drop("_commit_part")
  }

  /** Net effect of a version range — the review surface over
    * [[changeFeedRange]]: a row inserted AND deleted inside the range
    * cancels; a row updated is one removal of its pre-image and one
    * addition of its post-image. Grouped by the full data row
    * (additions = insert/update_postimage, removals =
    * delete/update_preimage), emitting only rows whose add/remove
    * counts don't balance, tagged with the surviving direction. One
    * shuffle keyed by the data columns — at 100 TB the feed slice is
    * O(range's churn), and the collapse is a single partial-aggregated
    * groupBy over it.
    */
  def changeFeedNet(
      layer: String,
      table: String,
      fromVersion: Long,
      toVersion: Long
  ): DataFrame = {
    val feed = changeFeedRange(layer, table, fromVersion, toVersion)
    val dataCols = feed.columns.filterNot(Set("_change_type", "_commit_version").contains).toSeq
    val added = col("_change_type").isin("insert", "update_postimage")
    feed
      .groupBy(dataCols.map(col): _*)
      .agg(
        sum(when(added, 1L).otherwise(0L)).as("n_added"),
        sum(when(added, 0L).otherwise(1L)).as("n_removed"))
      .withColumn("net", col("n_added") - col("n_removed"))
      .filter(col("net") =!= 0L)
      .withColumn("_change_type", when(col("net") > 0, lit("insert")).otherwise(lit("delete")))
  }

  /** The hive partition directories of a partitioned table, as their
    * relative `col=value[/col2=value2]` spellings (the SHOW PARTITIONS
    * surface). Driver-side listing, O(partition count) — no data I/O.
    */
  def partitions(layer: String, table: String): Seq[String] = {
    val pcols = partitionColumns(layer, table)
    require(pcols.nonEmpty, s"$layer.$table is not partitioned")
    leafPartitionDirs(new Path(tablePath(layer, table)), pcols.length).sorted
  }

  /** One-time upgrade of a pre-partitioned-layout feed: rewrite any
    * root-level data files under `_commit_part=` hive directories.
    *
    * Crash-idempotent via a rename manifest: migrated rows are staged
    * beside the feed, then a manifest listing every (staged file →
    * destination) move plus the legacy sources is committed BEFORE any
    * move runs. A crash before the manifest restarts from scratch
    * (staging is overwritten); a crash after it replays the manifest —
    * renames with fixed names and deletes are both idempotent — so
    * re-migration can never re-append rows it already moved (the naive
    * append-then-delete had exactly that duplication window).
    */
  private def migrateLegacyFeed(feedPath: String): Unit = {
    val manifest = new Path(feedPath + ".__migration_manifest")
    val staging  = new Path(feedPath + ".__migration_staging")
    def replay(): Unit = {
      val in = fs.open(manifest)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      lines.filter(_.nonEmpty).foreach { line =>
        line.split("\t", 3) match {
          case Array("mv", src, dst) =>
            val (s, d) = (new Path(src), new Path(dst))
            if (fs.exists(s)) { // absent ⇒ an earlier replay moved it
              fs.mkdirs(d.getParent)
              if (!fs.rename(s, d))
                throw new java.io.IOException(s"feed migration rename $s -> $d failed")
            }
          case Array("rm", p) => fs.delete(new Path(p), false); ()
          case _              => ()
        }
      }
      fs.delete(staging, true)
      fs.delete(manifest, false)
    }
    if (fs.exists(manifest)) { replay(); return }
    val legacy = fs
      .listStatus(new Path(feedPath))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    if (legacy.isEmpty) return
    fs.delete(staging, true)
    spark.read
      .parquet(legacy.map(_.getPath.toString).toIndexedSeq: _*)
      .withColumn("_commit_part", format_string("%010d", col("_commit_version")))
      .write.mode(SaveMode.Overwrite).partitionBy("_commit_part")
      .parquet(staging.toString)
    val moves = leafPartitionDirs(staging, 1).flatMap { rel =>
      fs.listStatus(new Path(staging, rel))
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        .map(s => s"mv\t${s.getPath}\t${new Path(s"$feedPath/$rel", s.getPath.getName)}")
    }
    val rms = legacy.map(s => s"rm\t${s.getPath}").toSeq
    val out = fs.create(manifest, true)
    try out.write((moves ++ rms).mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    replay()
  }

  // ---- ops ledger (replaces Delta DESCRIBE HISTORY, SURVEY §2.1 S12) ----

  private val ledgerLayer = "_ops"
  private val ledgerTable = "ledger"

  private def logOp(
      layer: String,
      table: String,
      op: String,
      inserted: Long,
      updated: Long,
      outputRows: Long,
      version: Long = -1L, // -1 = assign the next version here
      deleted: Long = 0L   // Delta's numDeletedRows — what makes a real
                           // DELETE distinguishable from a no-op commit
  ): Unit = {
    val ver = if (version >= 0) version else nextVersion(s"$layer.$table")
    // One metrics row per commit, written DRIVER-SIDE with parquet-java
    // (ExampleParquetWriter) instead of a Spark job: a 1-row toDF write
    // costs a full job submission (~100-200 ms of scheduler latency),
    // and a DML-heavy pipeline pays it on every commit. The file is
    // footer-compatible with the Spark-written ledger generations
    // (int64 / UTF8 binary), so history()'s mergeSchema read unions
    // both eras transparently; a UUID file name keeps concurrent
    // cross-table commits (different locks!) collision-free.
    val dir = new Path(tablePath(ledgerLayer, ledgerTable))
    fs.mkdirs(dir)
    val file = new Path(dir, s"part-graft-${java.util.UUID.randomUUID()}.snappy.parquet")
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        file, spark.sparkContext.hadoopConfiguration))
      .withType(Warehouse.LedgerSchema)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try {
      val g = new org.apache.parquet.example.data.simple.SimpleGroup(Warehouse.LedgerSchema)
      g.append("table_name", s"$layer.$table")
      g.append("operation", op)
      g.append("num_inserted", inserted)
      g.append("num_updated", updated)
      g.append("num_deleted", deleted)
      g.append("num_output_rows", outputRows)
      g.append("ts_millis", System.currentTimeMillis())
      g.append("version", ver)
      writer.write(g)
    } finally writer.close()
    // advance the under-lock cache to the committed version (max: an
    // explicit `version` may replay an already-logged commit)
    if (heldLocks.get().contains(s"$layer.$table"))
      lockedVersionCache.merge(s"$layer.$table", ver,
        (a, b) => if (a >= b) a else b)
    // Delta-style automatic checkpoint cadence: every 64th commit of a
    // table folds the ledger tail inline (Delta checkpoints its JSON
    // log every 10 commits for the same reason — metadata reads must
    // not scale with commit count). The minFiles gate makes the check
    // a no-op listing when other tables' cadence already folded; the
    // fold itself is bounded by the files accrued since the last one.
    if (ver > 0 && ver % 64 == 0) { checkpointLedger(minFiles = 16); () }
  }

  /** Ledger versions in (`version`, current] whose op actually REWROTE
    * table data — i.e. retired a generation at commit. APPENDs and
    * zero-change DML commits (the unified no-op convention: MERGE /
    * DELETE / UPDATE with all-zero metrics) rewrite nothing, retire
    * nothing, and fold into their predecessor on time travel; every
    * other op (CTAS, COMPACT, ZORDER, RESTORE — and DML with non-zero
    * metrics) left a `.__v{v-1}` generation, so its absence means
    * VACUUM pruned history, which time travel must refuse.
    */
  private def rewritingAfter(tableName: String, version: Long): Set[Long] =
    // rewritingOpPred: APPEND/VACUUM/MOR commits retire nothing; a DML
    // commit rewrote iff its metrics are non-zero or an evolution-
    // forced rewrite logged its kept row count (true no-ops log 0)
    history(tableName)
      .filter(col("version") > version && rewritingOpPred)
      .select(col("version")).collect().map(_.getLong(0)).toSet

  /** Latest ledger version for a table; -1 before its first op.
    * While this thread holds the table's writer lock the value is
    * served from [[lockedVersionCache]] after one ledger scan (the
    * ledger cannot move under our hold); unlocked callers always
    * scan — another JVM may have committed since.
    */
  private def latestVersion(tableName: String): Long = {
    val locked = heldLocks.get().contains(tableName)
    if (locked) {
      val c = lockedVersionCache.get(tableName)
      if (c != null) return c.longValue()
    }
    val v = ledgerMaxVersion(tableName)
    if (locked) lockedVersionCache.put(tableName, v)
    v
  }

  /** Max ledger version for a table, read DRIVER-SIDE with parquet-java
    * (like Delta reads its transaction log — no Spark job). Every DML
    * op consults the version several times (crash repair, claim,
    * feed bounds); as a Spark job each lookup paid ~200 ms of
    * scheduler latency, which dominated multi-commit bodies (q83's
    * merge+delete+refresh ran 5+ ledger jobs). The ledger is a
    * directory of tiny 1-row files (plus older Spark-written
    * multi-row generations) — a driver loop over footers is
    * milliseconds, and reads the same rows [[history]] serves.
    */
  private def ledgerMaxVersion(tableName: String): Long = {
    val dir = new Path(tablePath(ledgerLayer, ledgerTable))
    if (!fs.exists(dir)) return -1L
    var maxV = -1L
    fs.listStatus(dir)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .foreach { st =>
        // a CROSS-table writer may be mid-logOp on a freshly-listed
        // file (footer not yet closed — the same tiny window the old
        // Spark-job read had); retry briefly before surfacing, never
        // skip — a silently-missed committed version would let two
        // writers claim the same version number
        var attempt = 0
        var done    = false
        while (!done) {
          try {
            val reader = org.apache.parquet.hadoop.ParquetReader
              .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), st.getPath)
              .withConf(spark.sparkContext.hadoopConfiguration)
              .build()
            try {
              var g = reader.read()
              while (g != null) {
                if (g.getString("table_name", 0) == tableName) {
                  val v = g.getLong("version", 0)
                  if (v > maxV) maxV = v
                }
                g = reader.read()
              }
            } finally reader.close()
            done = true
          } catch {
            case _: Throwable if attempt < 3 =>
              attempt += 1; Thread.sleep(50L << attempt); ()
          }
        }
      }
    maxV
  }

  private def nextVersion(tableName: String): Long = latestVersion(tableName) + 1L

  /** Compact the ledger's one-file-per-commit tail into a single
    * checkpoint file — Delta's `_last_checkpoint` idea applied to this
    * warehouse's metrics ledger. Every DML commit appends one tiny
    * parquet file ([[logOp]]), so a long-running pipeline accrues one
    * ledger file PER COMMIT and every version lookup / history read
    * pays O(commits) file opens; at 100 TB scale (thousands of daily
    * commits across tables) the metadata path, not the data path,
    * becomes the bottleneck — exactly why Delta checkpoints its JSON
    * log every 10 commits. This folds all current ledger files into
    * one multi-row checkpoint file with identical rows, after which
    * both [[ledgerMaxVersion]] and [[history]] read O(1) files.
    *
    * Safety under concurrency, without pausing writers:
    *  - only the files LISTED at entry are folded and deleted — a
    *    commit landing mid-checkpoint writes a fresh UUID file that is
    *    neither read nor deleted, so no commit is ever lost;
    *  - a listed file still mid-write (footer race — the same window
    *    [[ledgerMaxVersion]] retries over) is retried, then LEFT IN
    *    PLACE (neither folded nor deleted) for the next checkpoint;
    *    skipping a read-failure but deleting it would lose a commit;
    *  - checkpoint-vs-checkpoint races are serialized by the ledger's
    *    own writer lock; the checkpoint file is named like a data part
    *    (no leading `_`/`.`), so readers need no special handling and
    *    a reader racing the final deletes sees at worst a transient
    *    duplicate row, which max()/Set-shaped consumers absorb.
    *
    * Legacy rows whose file predates the `num_deleted` column are
    * backfilled with [[history]]'s exact rule (DELETE → 1, else 0) so
    * the checkpointed row is indistinguishable from the runtime
    * backfill. Returns the number of files folded (0 = below
    * `minFiles`, nothing to do).
    */
  def checkpointLedger(minFiles: Int = 2): Long =
    withWriterLock(ledgerLayer, ledgerTable) {
      val dir = new Path(tablePath(ledgerLayer, ledgerTable))
      if (!fs.exists(dir)) return 0L
      val files = fs.listStatus(dir).filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      if (files.length < math.max(2, minFiles)) return 0L
      val rows = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long, Long, Long, Long, Long, Long)]
      val folded = scala.collection.mutable.ArrayBuffer.empty[Path]
      files.foreach { st =>
        var attempt = 0
        var done    = false
        while (!done && attempt <= 3) {
          try {
            val reader = org.apache.parquet.hadoop.ParquetReader
              .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), st.getPath)
              .withConf(spark.sparkContext.hadoopConfiguration)
              .build()
            try {
              var g = reader.read()
              while (g != null) {
                val t   = g.getType
                val op  = g.getString("operation", 0)
                val del =
                  if (t.containsField("num_deleted")) g.getLong("num_deleted", 0)
                  else if (op == "DELETE") 1L
                  else 0L
                rows += ((g.getString("table_name", 0), op,
                  g.getLong("num_inserted", 0), g.getLong("num_updated", 0), del,
                  g.getLong("num_output_rows", 0), g.getLong("ts_millis", 0),
                  g.getLong("version", 0)))
                g = reader.read()
              }
              folded += st.getPath
            } finally reader.close()
            done = true
          } catch {
            case _: Throwable =>
              attempt += 1
              if (attempt <= 3) Thread.sleep(50L << attempt)
              // else: leave the file for the next checkpoint
          }
        }
      }
      if (folded.length < 2) return 0L
      val out = new Path(dir, s"part-graft-ckpt-${java.util.UUID.randomUUID()}.snappy.parquet")
      val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
        .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
          out, spark.sparkContext.hadoopConfiguration))
        .withType(Warehouse.LedgerSchema)
        .withCompressionCodec(
          org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
        .build()
      try rows.foreach { case (tn, op, ins, upd, del, outRows, ts, ver) =>
        val g = new org.apache.parquet.example.data.simple.SimpleGroup(Warehouse.LedgerSchema)
        g.append("table_name", tn)
        g.append("operation", op)
        g.append("num_inserted", ins)
        g.append("num_updated", upd)
        g.append("num_deleted", del)
        g.append("num_output_rows", outRows)
        g.append("ts_millis", ts)
        g.append("version", ver)
        writer.write(g)
      } finally writer.close()
      folded.foreach(p => fs.delete(p, false))
      folded.length.toLong
    }

  /** The table's current ledger version — what [[tableAsOf]] of this
    * value reads, and the cursor an incremental consumer records.
    */
  def currentVersion(layer: String, table: String): Long = latestVersion(s"$layer.$table")

  /** Resolve a wall-clock instant to the ledger version in effect at
    * that time — Delta `TIMESTAMP AS OF` semantics: the greatest
    * commit whose ledger timestamp is <= the instant (commits at the
    * same millisecond resolve to the later version). Throws if the
    * instant predates the table's first commit, exactly like Delta's
    * before-first-commit error. One ledger scan, O(commits).
    */
  def versionAsOfTimestamp(layer: String, table: String, tsMillis: Long): Long = {
    val h = history(s"$layer.$table").filter(col("ts_millis") <= tsMillis)
    require(!h.isEmpty,
      s"$layer.$table has no commit at or before timestamp $tsMillis")
    h.agg(max("version")).head().getLong(0)
  }

  /** The first ledger version committed AT or AFTER a wall-clock
    * instant — Delta's startingTimestamp resolution for CDF reads
    * (the starting bound names the first version the instant can see,
    * where [[versionAsOfTimestamp]] names the last version visible AT
    * the instant).
    */
  def versionAtOrAfterTimestamp(layer: String, table: String, tsMillis: Long): Long = {
    val h = history(s"$layer.$table").filter(col("ts_millis") >= tsMillis)
    require(!h.isEmpty,
      s"$layer.$table has no commit at or after timestamp $tsMillis")
    h.agg(min("version")).head().getLong(0)
  }

  /** Bounded change feed by wall-clock instants (Delta's
    * timestamp-form `table_changes(t, ts1, ts2)`): the start resolves
    * to the first commit at-or-after ts1, the end to the last commit
    * at-or-before ts2, then the version-range tail applies — same
    * partition-pruned O(range) read as [[changeFeedRange]].
    */
  def changeFeedRangeTimestamp(
      layer: String,
      table: String,
      fromTsMillis: Long,
      toTsMillis: Long
  ): DataFrame = {
    require(toTsMillis >= fromTsMillis,
      s"table_changes timestamp range is inverted: [$fromTsMillis, $toTsMillis]")
    changeFeedRange(layer, table,
      versionAtOrAfterTimestamp(layer, table, fromTsMillis),
      versionAsOfTimestamp(layer, table, toTsMillis))
  }

  /** Read the table as it stood at a wall-clock instant (Delta
    * `SELECT ... TIMESTAMP AS OF`): resolves the instant to its
    * ledger version, then time-travels there — same retention rules
    * as [[tableAsOf]].
    */
  def tableAsOfTimestamp(layer: String, table: String, tsMillis: Long): DataFrame =
    tableAsOf(layer, table, versionAsOfTimestamp(layer, table, tsMillis))

  /** RESTORE to the state at a wall-clock instant (Delta
    * `RESTORE ... TO TIMESTAMP AS OF`).
    */
  def restoreToTimestamp(layer: String, table: String, tsMillis: Long): Long =
    restore(layer, table, versionAsOfTimestamp(layer, table, tsMillis))

  /** Change rows committed strictly AFTER a wall-clock instant (the
    * timestamp form of [[changeFeed]]'s version cursor — Delta CDF's
    * `startingTimestamp`, exclusive at the resolved version so a
    * consumer that processed through time T never re-reads T's own
    * commit).
    */
  def changeFeedSinceTimestamp(layer: String, table: String, tsMillis: Long): DataFrame =
    changeFeed(layer, table, versionAsOfTimestamp(layer, table, tsMillis))

  /** Read the table as of a past ledger `version` (Delta time travel).
    * Replacing writes (CREATE OR REPLACE, MERGE, COMPACT) retire the
    * outgoing generation under `<table>.__v<version>`, so the last
    * `keepGenerations` of those are readable; APPEND mutates its
    * generation in place (its pre-state folds into the predecessor),
    * matching what a row-count-preserving reader needs from history.
    * Throws if the requested generation has been pruned.
    */
  def tableAsOf(layer: String, table: String, version: Long): DataFrame = {
    val current = latestVersion(s"$layer.$table")
    require(version <= current, s"version $version of $layer.$table does not exist yet")
    if (version == current) return this.table(layer, table)
    // every snapshot source below applies the DV rule at `version`:
    // tombstones in (lastRewrite(version), version] subtract, files
    // appended by MOR commits after `version` hide — so a read between
    // two merge-on-read commits reconstructs exactly, generation or
    // not (see the deletion-vector section note)
    val p = new Path(tablePath(layer, table) + s".__v$version")
    if (fs.exists(p) && !fs.exists(new Path(p, "_GRAFT_SPARSE")))
      return applyDv(spark.read.parquet(p.toString), layer, table, version,
        partitionDepth(p))
    if (partitionColumns(layer, table).nonEmpty)
      return reconstructAsOf(layer, table, version, current)
    // whole-table fold: ops after `version` that rewrote nothing
    // (APPENDs, zero-change DML commits, merge-on-read commits) left
    // no `.__v{version}` — the state at `version` is the next retained
    // FULL snapshot if a later rewrite took one (appends between fold
    // forward into it, per the contract), else the live table itself
    val rewriting = rewritingAfter(s"$layer.$table", version)
    if (rewriting.isEmpty)
      return applyDv(rawTable(layer, table), layer, table, version,
        partitionColumns(layer, table).length)
    val g = new Path(tablePath(layer, table) + s".__v${rewriting.min - 1L}")
    require(fs.exists(g) && !fs.exists(new Path(g, "_GRAFT_SPARSE")),
      s"version $version of $layer.$table is not retained " +
        s"(current=$current, keepGenerations=$keepGenerations)")
    applyDv(spark.read.parquet(g.toString), layer, table, version, partitionDepth(g))
  }

  /** Overlay reconstruction for partition-scoped history. Each
    * partition's state at `version` is its copy in the EARLIEST retired
    * generation ≥ `version` that holds it — the pre-image taken by the
    * first rewrite after `version` (untouched in between, so identical
    * to its state at `version`); a partition no generation holds was
    * never rewritten since, so its LIVE directory still is that state.
    * A full (non-sparse) snapshot bounds the search: a partition absent
    * from it did not exist at that version. Refuses if any replacing
    * op's generation after `version` has been vacuumed (the overlay
    * would silently read too-new data). Appends fold into the
    * predecessor, exactly like the whole-table time-travel contract.
    */
  private def reconstructAsOf(
      layer: String,
      table: String,
      version: Long,
      current: Long
  ): DataFrame = {
    val layerDir = new Path(s"$root/$layer")
    val prefix   = table + ".__v"
    val gens = fs
      .listStatus(layerDir)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(prefix) => n.stripPrefix(prefix).toLongOption }
      .flatten
      .filter(_ >= version)
      .sorted
    // only ops that actually rewrote data retired a generation — a
    // zero-change DML commit (the unified no-op convention) retires
    // nothing, so its missing `.__v` is a fold, not a vacuumed hole
    val replacingAfter = rewritingAfter(s"$layer.$table", version)
    val needed = replacingAfter.map(_ - 1L).filter(_ >= version)
    require(
      needed.forall(gens.contains),
      s"version $version of $layer.$table is not retained " +
        s"(current=$current, keepGenerations=$keepGenerations)")
    val pcols = partitionColumns(layer, table)
    require(pcols.nonEmpty,
      s"version $version of $layer.$table is not retained " +
        s"(current=$current, keepGenerations=$keepGenerations)")
    val depth  = pcols.length
    val taken  = scala.collection.mutable.HashSet[String]()
    val byRoot = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()
    var closed = false
    for (g <- gens if !closed) {
      val rootP = new Path(tablePath(layer, table) + s".__v$g")
      val fresh = leafPartitionDirs(rootP, depth).filterNot(taken)
      if (fresh.nonEmpty) byRoot(rootP.toString) = fresh
      taken ++= fresh
      // directories the op at generation g CREATED (its _GRAFT_CREATED
      // manifest) did not exist at any version ≤ g: block every later
      // source — including the live table — from supplying them
      val manifest = new Path(rootP, "_GRAFT_CREATED")
      if (fs.exists(manifest)) {
        val in = fs.open(manifest)
        val created =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
        taken ++= created.filter(_.nonEmpty)
      }
      // a full snapshot holds EVERY partition that existed at its
      // version — nothing beyond it can be older state
      if (!fs.exists(new Path(rootP, "_GRAFT_SPARSE"))) closed = true
    }
    if (!closed) {
      val liveRoot = new Path(tablePath(layer, table))
      val fresh    = leafPartitionDirs(liveRoot, depth).filterNot(taken)
      if (fresh.nonEmpty) byRoot(liveRoot.toString) = fresh
    }
    require(byRoot.nonEmpty, s"version $version of $layer.$table has no partitions to read")
    val laterFiles = dvFilesAfter(layer, table, version)
    val tombstones = dvRowsFor(layer, table, version)
    val needDv     = laterFiles.nonEmpty || tombstones.isDefined
    val unioned = byRoot
      .map { case (rootStr, dirs) =>
        // basePath per root so the partition columns materialize from
        // the directory names exactly as a direct table read would
        val branch = spark.read
          .option("mergeSchema", "true")
          .option("basePath", rootStr)
          .parquet(dirs.map(d => s"$rootStr/$d"): _*)
        // metadata columns only exist on a scan — take them per branch,
        // BEFORE the union erases the file-source lineage
        if (needDv) withDvMeta(branch, depth) else branch
      }
      .reduce(_.unionByName(_, allowMissingColumns = true))
    if (!needDv) unioned
    else {
      val hidden =
        if (laterFiles.isEmpty) unioned
        else unioned.filter(!col("__dv_f").isin(laterFiles: _*))
      (tombstones match {
        case Some(dv) => dvAntiJoin(hidden, dv)
        case None     => hidden
      }).drop("__dv_f", "__dv_p")
    }
  }

  /** Roll the table back to a retained past `version` (Delta RESTORE
    * replacement — completes the time-travel surface: [[history]] to
    * inspect, [[tableAsOf]] to read, restore to act). The snapshot is
    * materialized through the same staged swap as every replacing
    * write, so the outgoing (pre-restore) generation retires and a
    * mistaken restore is itself restorable. Ledgers as `RESTORE` at a
    * new version; like Delta, no row-level change-feed entries are
    * emitted — CDC consumers resync from the restored snapshot.
    */
  def restore(layer: String, table: String, version: Long): Long =
    withWriterLock(layer, table)(restoreImpl(layer, table, version))

  private def restoreImpl(layer: String, table: String, version: Long): Long = {
    repairCrashedSwap(layer, table)
    val snap    = tableAsOf(layer, table, version) // validates retention
    val pcols   = partitionColumns(layer, table)   // preserve the live layout
    val staging = new Path(tablePath(layer, table) + ".__restore_staging")
    fs.delete(staging, true)
    val obs = org.apache.spark.sql.Observation()
    val writer = snap.observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite)
    (if (pcols.nonEmpty) writer.partitionBy(pcols: _*) else writer).parquet(staging.toString)
    val rows = obs.get("n").asInstanceOf[Long]
    retireAndSwap(layer, table, staging)
    logOp(layer, table, "RESTORE", inserted = rows, updated = 0, outputRows = rows)
    rows
  }

  /** All ledger entries for a table — the engine's DESCRIBE HISTORY.
    * Read with mergeSchema and backfill `num_deleted` (added after the
    * 7-column ledger era) to 0: a warehouse carrying mixed-generation
    * ledger files must neither fail to resolve the column nor surface
    * nulls — a null metric in [[rewritingAfter]]'s `sum > 0` predicate
    * would misclassify a legacy real DELETE as a non-rewriting fold.
    */
  def history(tableName: String): DataFrame = {
    if (!fs.exists(new Path(tablePath(ledgerLayer, ledgerTable)))) {
      import spark.implicits._
      return Seq.empty[(String, String, Long, Long, Long, Long, Long, Long)]
        .toDF("table_name", "operation", "num_inserted", "num_updated", "num_deleted",
          "num_output_rows", "ts_millis", "version")
    }
    val raw = spark.read
      .option("mergeSchema", "true")
      .parquet(tablePath(ledgerLayer, ledgerTable))
    // Legacy DELETE rows predate both the column AND the zero-change
    // no-op convention — those commits always rewrote, so backfill 1
    // ("unknown but nonzero") rather than 0, which would let tableAsOf
    // fold past a retired generation and serve too-new data.
    val withDeleted =
      if (raw.columns.contains("num_deleted"))
        raw.withColumn("num_deleted", coalesce(col("num_deleted"),
          when(col("operation") === "DELETE", lit(1L)).otherwise(lit(0L))))
      else raw.withColumn("num_deleted",
        when(col("operation") === "DELETE", lit(1L)).otherwise(lit(0L)))
    withDeleted.filter(col("table_name") === tableName)
  }

  /** Latest operation metrics (reference `order by version desc limit 1`,
    * silver_arxiv.py:181-182).
    */
  def lastOperation(tableName: String): Option[org.apache.spark.sql.Row] =
    history(tableName).orderBy(desc("version")).limit(1).collect().headOption
}

object Warehouse {
  /** Parquet schema of a ledger metrics row — the exact column
    * names/types the Spark-written ledger era used (`toDF` of longs
    * and strings), so driver-side rows and job-written rows union
    * under mergeSchema.
    */
  private[sources] val LedgerSchema: org.apache.parquet.schema.MessageType =
    org.apache.parquet.schema.MessageTypeParser.parseMessageType(
      """message ledger {
        |  required binary table_name (UTF8);
        |  required binary operation (UTF8);
        |  required int64 num_inserted;
        |  required int64 num_updated;
        |  required int64 num_deleted;
        |  required int64 num_output_rows;
        |  required int64 ts_millis;
        |  required int64 version;
        |}""".stripMargin)

  /** A writer could not take a table's lock within `lockWaitMs` —
    * another writer is active (Delta's ConcurrentWriteException
    * parity). The operation made no changes; the caller may retry.
    */
  final class ConcurrentWriteException(msg: String) extends RuntimeException(msg)

  /** A write's incoming rows (or the existing data, at ADD CONSTRAINT
    * time) violate a recorded CHECK / NOT NULL constraint. Thrown
    * before any data lands — the table is unchanged.
    */
  final class ConstraintViolationException(msg: String) extends RuntimeException(msg)
}

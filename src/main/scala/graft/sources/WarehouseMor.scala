package graft.sources

import graft.operators.Upsert
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Merge-on-read DML (Delta deletion-vector parity): positional
  * tombstone sidecars, the MOR DELETE / UPDATE / MERGE triad, and
  * REORG (fold tombstones back into clean files). Split from
  * Warehouse.scala for reviewability — no behavior change.
  */
private[sources] trait WarehouseMor { self: Warehouse =>

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

  private[sources] def dvPath(layer: String, table: String): Path =
    new Path(tablePath(layer, table) + ".__dv")

  /** DV partition versions present on disk, ascending. */
  private[sources] def dvVersions(layer: String, table: String): Seq[Long] = {
    val p = dvPath(layer, table)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("_commit_part="))
        .flatMap(_.getPath.getName.stripPrefix("_commit_part=").toLongOption)
        .toSeq
        .sorted
  }

  private[sources] def dvPartDir(layer: String, table: String, v: Long): Path =
    new Path(dvPath(layer, table), f"_commit_part=$v%010d")

  /** A DV partition can be manifest-only (a MOR merge that inserted
    * but updated nothing writes appended-file bookkeeping and zero
    * tombstone rows) — reading it as parquet would fail on schema
    * inference, so tombstone reads take only partitions with data.
    */
  private[sources] def dvPartHasRows(layer: String, table: String, v: Long): Boolean = {
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
  private[sources] def rewritingOpPred: Column =
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
  private[sources] def dvBounds(tableName: String, asOf: Long): (Long, Long) = {
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
  private[sources] def dvRowsFor(layer: String, table: String, asOf: Long): Option[DataFrame] = {
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
  private[sources] def dvFilesAfter(layer: String, table: String, asOf: Long): Seq[String] =
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
  private[sources] def dvAntiJoin(withMeta: DataFrame, dv: DataFrame): DataFrame =
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
  private[sources] def withDvMeta(df: DataFrame, depth: Int): DataFrame =
    df.withColumn("__dv_f",
        substring_index(col("_metadata.file_path"), "/", -(depth + 1)))
      .withColumn("__dv_p", col("_metadata.row_index"))

  /** The DV file key of a RAW (URL-encoded) file path, driver-side. */
  private[sources] def dvFileKey(rawFile: String, depth: Int): String =
    rawFile.split('/').takeRight(depth + 1).mkString("/")

  /** Decode a manifest/sidecar rel path (encoded domain) back to the
    * on-disk spelling for filesystem operations.
    */
  private[sources] def decodeDvRel(rel: String): String =
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
  private[sources] def applyDv(
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
  private[sources] def tablePathForFiles(
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
  private[sources] def materializeDv(layer: String, table: String): Unit =
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

  private[sources] def deleteMorImpl(layer: String, table: String, predicate: Column): Long =
    deleteMorMatched(layer, table, _.filter(coalesce(predicate, lit(false))))

  /** DELETE of a DataFrame-valued key list (the [[deleteMor]] twin of
    * `scanPrunedEq(…, keys: DataFrame)`): matched rows are the LEFT
    * SEMI join of the visible table against the key frame on
    * `colName` — the keys never visit the driver, never become an
    * `isin` literal list, and a GDPR request that arrives as a TABLE
    * deletes at O(matched) tombstone cost no matter how long it is.
    * NULL keys match nothing (SQL `IN` semantics); same change feed,
    * no-op convention, and locking as the predicate form.
    */
  def deleteMorKeys(layer: String, table: String, colName: String, keys: DataFrame): Long = {
    require(keys.columns.length == 1,
      s"keys frame must have exactly the key column, got ${keys.columns.mkString(", ")}")
    withWriterLock(layer, table)(deleteMorMatched(layer, table, { visible =>
      val probes = keys.na.drop()
        .select(col(keys.columns.head).cast(visible.schema(colName).dataType).as("__del_k"))
        .distinct()
      visible.join(probes, visible(colName) === col("__del_k"), "left_semi")
    }))
  }

  private def deleteMorMatched(
      layer: String,
      table: String,
      matchRows: DataFrame => DataFrame
  ): Long = {
    repairCrashedSwap(layer, table)
    val target = tablePath(layer, table)
    val raw    = mergedRead(layer, table)
    val depth  = partitionColumns(layer, table).length
    val visible = dvRowsFor(layer, table, Long.MaxValue) match {
      case Some(dv) => dvAntiJoin(withDvMeta(raw, depth), dv)
      case None     => withDvMeta(raw, depth)
    }
    val matched = matchRows(visible)
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
      primeSchemaCache(layer, table, raw.schema)
      primeFeedSchemaCache(layer, table, raw.schema)
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

  private[sources] def updateMorImpl(
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
    val raw    = mergedRead(layer, table)
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
      primeSchemaCache(layer, table, raw.schema)
      primeFeedSchemaCache(layer, table, raw.schema)
      updated
    } finally { m.unpersist(); () }
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

  private[sources] def upsertMorImpl(
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
    val raw    = mergedRead(layer, table)
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
    val changesPlan = Upsert.planMorChanges(tgtAligned, srcAligned, keys, versionCol,
      metaCols = Seq("__dv_f", "__dv_p"),
      insertOnlyCols = identityColumns(layer, table).map(_._1).toSet)
    // metrics FIRST, on the unpersisted plan: Catalyst prunes the join
    // to keys + version + marks, so a zero-change re-run stays a
    // narrow pass and exits before anything full-width materializes
    val counts = changesPlan.groupBy(col(Upsert.ActionCol)).count().collect()
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
    // persist the O(delta) change set (r19): tombstones, landed files
    // and the three feed slices otherwise each re-run the full-outer
    // join over the whole visible table. Bounded by the batch (the MOR
    // contract) — the same within-op persist [[deleteMorMatched]]/
    // [[updateMorImpl]] already use; the first write below materializes
    // it in one pass.
    val changes = changesPlan.persist()
    try {
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
      primeSchemaCache(layer, table, unioned)
      primeFeedSchemaCache(layer, table, unioned)
      Upsert.WriteMetrics(inserted = inserted, updated = updated, kept = kept)
    } finally { changes.unpersist(); () }
  }

  /** Land a MOR commit's new row images as appended files: write to a
    * scratch dir, record every destination (ENCODED key domain — see
    * [[dvFileKey]]) in the commit's DV-partition `_GRAFT_FILES`
    * manifest, THEN rename into the live tree — files are only
    * reachable after their names are durably listed, so
    * [[repairCrashedSwap]] can roll the whole commit back and time
    * travel can hide the files exactly.
    */
  private[sources] def morLandFiles(
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

  private[sources] def reorgImpl(layer: String, table: String): Long = {
    repairCrashedSwap(layer, table)
    val tombstones = dvRowsFor(layer, table, Long.MaxValue)
    if (tombstones.isEmpty) return 0L
    val dv      = tombstones.get
    val target  = tablePath(layer, table)
    val raw     = mergedRead(layer, table)
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
}

package graft.sources

import graft.operators.Upsert
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Copy-on-write DML: CTAS (whole-table and partitioned), DELETE /
  * UPDATE / MERGE in both whole-table and partition-scoped forms, the
  * full-clause MERGE paths, APPEND and the versioned UPSERT. Split
  * from Warehouse.scala for reviewability — no behavior change; the
  * members self-type on [[Warehouse]] and share its package-private
  * core (locks, staged swap, ledger).
  */
private[sources] trait WarehouseDml { self: Warehouse =>

  /** Cluster a staged partitioned REWRITE on the partition columns
    * before `partitionBy`: without it, every upstream task writes its
    * own file into every directory it holds rows for — a rewrite
    * touching 500 directories from 32 tasks stages up to 16k files per
    * generation, and every later scan pays 16k file opens (the
    * 100× DML rung measured the partitioned MV/merge at 4–7× their
    * flat twins on exactly this). Hash-clustered on the partition
    * value, each touched directory is written by ONE task (the
    * [[WarehouseMaintenance]] compaction recipe): file count per
    * rewrite = touched directories. A single over-large partition can
    * still split its output via `spark.sql.files.maxRecordsPerFile`;
    * task PARALLELISM within one partition value is inherently 1 under
    * any hash-on-partition-columns layout — directories needing more
    * writers than that want a finer partitioning key, not more files
    * per rewrite.
    */
  private def clusterStaged(df: DataFrame, pcols: Seq[String], touched: Int): DataFrame =
    df.repartition(math.max(touched, 1), pcols.map(col): _*)

  /** Partition-scoped DELETE — see the section comment above. Returns
    * the deleted-row count; a predicate matching nothing skips the
    * rewrite/feed/generation but still logs a `DELETE 0` ledger commit
    * with a version bump (Delta records a DELETE commit even at zero
    * matched rows — the one no-op convention across all six DML entry
    * points; a version with no generation folds into its predecessor
    * on time travel, like APPEND). Ledger `num_output_rows` records
    * the rows REWRITTEN (the touched slice's survivors), not the table.
    */
  private[sources] def deletePartitioned(
      layer: String,
      table: String,
      predicate: Column,
      pcols: Seq[String]
  ): Long = {
    val target = tablePath(layer, table)
    val df     = mergedRead(layer, table)
    val hit    = coalesce(predicate, lit(false))
    val touched = touchedPartitions(df.filter(hit), pcols)
    if (touched.isEmpty) {
      logOp(layer, table, "DELETE", inserted = 0, updated = 0, outputRows = 0)
      return 0L
    }
    val ver     = nextVersion(s"$layer.$table")
    val slice   = pruneToTouched(df, touched, pcols)
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
    clusterStaged(touchedDf.filter(!hit), pcols, touched.length)
      .observe(keptObs, count(lit(1)).as("n"))
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
    primeFeedSchemaCache(layer, table, df.schema)
    deleted
  }

  /** Partition-scoped UPDATE. Partition-column assignments are refused:
    * they would move rows across directories, which is MERGE semantics
    * ([[upsert]] handles moves correctly via its matched-key partition
    * set). Returns the updated-row count; zero matches skips the
    * rewrite but logs an `UPDATE 0` commit (the unified no-op
    * convention — see [[deletePartitioned]]).
    */
  private[sources] def updatePartitioned(
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
    val df     = mergedRead(layer, table)
    assignments.keys.foreach(c =>
      require(df.columns.contains(c), s"UPDATE assigns unknown column $c"))
    val hit     = coalesce(predicate, lit(false))
    val touched = touchedPartitions(df.filter(hit), pcols)
    if (touched.isEmpty) {
      logOp(layer, table, "UPDATE", inserted = 0, updated = 0, outputRows = 0)
      return 0L
    }
    val ver     = nextVersion(s"$layer.$table")
    val slice   = pruneToTouched(df, touched, pcols)
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
    clusterStaged(rewritten, pcols, touched.length)
      .observe(rowsObs, count(lit(1)).as("n"))
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
    primeFeedSchemaCache(layer, table, df.schema)
    updated
  }

  /** Partition-scoped MERGE. Touched = the source rows' partitions (the
    * insert/update destinations) ∪ the partitions of target rows whose
    * keys the source carries (the matched rows' CURRENT homes) — so a
    * source row that changes a matched row's partition value rewrites
    * BOTH directories and the row moves without duplication. The merge
    * itself runs only over the touched slice.
    */
  private[sources] def upsertPartitioned(
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
    // file-granular COW costs no extra pass over the pre-COW plan.
    // Partition-pruned probe (the Delta idiom "put the partition column
    // in the ON clause"): when the merge keys CONTAIN every partition
    // column, a matched row agrees with its source row on those columns
    // and so must already live in one of the source's partitions — the
    // probe scans only that slice (PartitionFilters, zero I/O outside
    // the touched directories) and the whole merge is O(touched
    // partitions) even on a table 1000× the batch. A key-only merge
    // keeps the full-table probe: a matched key may live in — and move
    // from — any partition (the q96 cross-partition-move semantics),
    // and only the probe can find its current home.
    val probeTgt =
      if (pcols.forall(keys.contains) && srcParts.nonEmpty)
        pruneToTouched(tgt0, srcParts, pcols)
      else tgt0
    val tgtF = probeTgt.withColumn("__graft_file", input_file_name())
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
    val sliceTgt = pruneToTouched(tgt0, touched, pcols)
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
      // ONE full-width execution of the merge plan (r19, see
      // [[Warehouse.stageByAction]]): the action rides as the innermost
      // staging directory under the partition dirs, so the staged files
      // are the slice's next generation unchanged and the feed's
      // post-images read back as O(changes) staged bytes (basePath
      // re-surfaces the partition columns) instead of re-running the
      // slice join full-width a third time.
      val byAction = stageByAction(
        clusterStaged(mr.merged, pcols, touched.length), staging, Upsert.ActionCol, pcols)
      copyFilesInto(carryPairs, staging)
      def staged(action: String): Option[DataFrame] =
        byAction.get(action).filter(_.nonEmpty)
          .map(fls => readFilesAligned(fls, unioned, basePath = Some(staging.toString)))
      val post = Seq(
        staged("insert").map(_.withColumn("_change_type", lit("insert"))),
        staged("update").map(_.withColumn("_change_type", lit("update_postimage")))).flatten
      val pre = staged("update").map { u =>
        val updatedKeys = u.select(keys.map(col): _*)
        touchedTgt
          .join(updatedKeys,
            keys.map(k => touchedTgt(k) <=> updatedKeys(k)).reduce(_ && _), "left_semi")
          .select(unioned.fieldNames.map(n =>
            if (tgt0.columns.contains(n)) col(n)
            else lit(null).cast(unioned(n).dataType).as(n)): _*)
          .withColumn("_change_type", lit("update_preimage"))
      }
      (post ++ pre).reduceOption(_ unionByName _).foreach {
        _.withColumn("_commit_version", lit(ver))
          .withColumn("_commit_part", lit(f"$ver%010d"))
          .write.mode(SaveMode.Append).partitionBy("_commit_part")
          .parquet(tablePath(layer, table) + ".__changes")
      }
      promoteStagedActions(staging, pcols, Set("keep", "insert", "update"))
    } finally mr.unpersist()
    // retire = live dirs matching the touched tuples; the staged dirs
    // (what the merge actually wrote) are listed inside the swap itself
    swapPartitions(layer, table, staging, retireDirs, pcols.length)
    logOp(layer, table, "MERGE", m.inserted, m.updated,
      outputRows = m.outputRows + carried, version = ver)
    primeFeedSchemaCache(layer, table, unioned)
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
  private[sources] def mergeClausesPartitioned(
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
    val srcParts   = touchedPartitions(srcAligned, pcols)
    // The matched-homes/matched-files probe, with two scan-avoidance
    // rules the flat layout can't have:
    //   - BY SOURCE present: the slice is every partition and every
    //     slice file rewrites regardless, so the probe's outputs are
    //     never consulted — skip the scan entirely.
    //   - merge keys ⊇ partition columns (the Delta "partition column
    //     in the ON clause" idiom): a matched row must already live in
    //     a source partition, so the probe scans only that slice
    //     (PartitionFilters — zero I/O outside the touched dirs).
    // Otherwise the probe must scan the whole table: a matched key may
    // live in, and move from, any partition.
    val matchedRows =
      if (bySource.nonEmpty) Array.empty[org.apache.spark.sql.Row]
      else {
        val probeTgt =
          if (pcols.forall(keys.contains) && srcParts.nonEmpty)
            pruneToTouched(tgt0, srcParts, pcols)
          else tgt0
        val tgtF = probeTgt.withColumn("__graft_file", input_file_name())
        val srcKeys = srcAligned.select(keys.map(col): _*).distinct()
        tgtF
          .join(srcKeys, keys.map(k => tgtF(k) <=> srcKeys(k)).reduce(_ && _), "left_semi")
          .select((pcols.map(c => col(c).cast("string")) :+ col("__graft_file")): _*)
          .distinct().collect()
      }
    val matchedParts: Seq[Seq[String]] =
      matchedRows.map(r => pcols.indices.map(r.getString).toSeq).toSeq.distinct
    val matchedKeyFiles: Set[String] =
      matchedRows.map(r => normDataFile(r.getString(pcols.length))).toSet
    val touched: Seq[Seq[String]] =
      if (bySource.nonEmpty) touchedPartitions(tgt0, pcols)
      else (srcParts ++ matchedParts).distinct
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
    val sliceTgt   = pruneToTouched(tgt0, touched, pcols)
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
    // ONE full-width execution of the clause plan (r19, see
    // [[Warehouse.stageByAction]]): delete-action rows land in their
    // own innermost staged directory — they carry the target pre-image
    // values, so the feed's delete rows read off the staged bytes too,
    // and the directory is dropped before the swap (never promoted).
    val byAction = stageByAction(
      clusterStaged(merged, pcols, touchedAll.length), staging, Upsert.ActionCol, pcols)
    copyFilesInto(carryAll, staging)
    def staged(action: String): Option[DataFrame] =
      byAction.get(action).filter(_.nonEmpty)
        .map(fls => readFilesAligned(fls, unioned, basePath = Some(staging.toString)))
    val post = Seq(
      staged("insert").map(_.withColumn("_change_type", lit("insert"))),
      staged("update").map(_.withColumn("_change_type", lit("update_postimage")))).flatten
    val pre = staged("update").map { u =>
      val updatedKeys = u.select(keys.map(col): _*)
      touchedTgt
        .join(updatedKeys,
          keys.map(k => touchedTgt(k) <=> updatedKeys(k)).reduce(_ && _), "left_semi")
        .select(unioned.fieldNames.map(n =>
          if (tgt0.columns.contains(n)) col(n)
          else lit(null).cast(unioned(n).dataType).as(n)): _*)
        .withColumn("_change_type", lit("update_preimage"))
    }
    val delRows = staged("delete").map(_.withColumn("_change_type", lit("delete")))
    (post ++ pre ++ delRows).reduceOption(_ unionByName _).foreach {
      _.withColumn("_commit_version", lit(ver))
        .withColumn("_commit_part", lit(f"$ver%010d"))
        .write.mode(SaveMode.Append).partitionBy("_commit_part")
        .parquet(tablePath(layer, table) + ".__changes")
    }
    promoteStagedActions(staging, pcols, Set("keep", "insert", "update"))
    swapPartitions(layer, table, staging, retireAll, pcols.length)
    logOp(layer, table, "MERGE", ins, upd,
      outputRows = ins + upd + keptPlan + carried, version = ver, deleted = del)
    primeFeedSchemaCache(layer, table, unioned)
    Upsert.MergeClauseMetrics(ins, upd, del, keptPlan + carried)
  }


  /** CREATE OR REPLACE TABLE AS SELECT (reference bronze_arxiv.py:102).
    * Writes to a staging dir first, then swaps — safe when `df` reads
    * from the table being replaced (a plain overwrite would delete its
    * own input mid-plan) and idempotent on re-run.
    */
  def createOrReplace(layer: String, table: String, df: DataFrame): Long =
    withWriterLock(layer, table)(createOrReplaceImpl(layer, table, df))

  private[sources] def createOrReplaceImpl(layer: String, table: String, df0: DataFrame): Long = {
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
    primeSchemaCache(layer, table, df.schema)
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

  private[sources] def createOrReplacePartitionedImpl(
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

  private[sources] def deleteImpl(layer: String, table: String, predicate: Column): Long = {
    repairCrashedSwap(layer, table)
    materializeDv(layer, table) // rewrite never runs against live tombstones
    val pcols = partitionColumns(layer, table)
    if (pcols.nonEmpty) return deletePartitioned(layer, table, predicate, pcols)
    val target  = tablePath(layer, table)
    val df      = mergedRead(layer, table)
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
    primeSchemaCache(layer, table, df.schema)
    primeFeedSchemaCache(layer, table, df.schema)
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

  private[sources] def updateImpl(
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
      val base = mergedRead(layer, table)
      val post = assignments.foldLeft(base.filter(coalesce(predicate, lit(false)))) {
        case (d, (c, v)) => d.withColumn(c, v.cast(base.schema(c).dataType))
      }
      enforceConstraints(layer, table, post, "UPDATE")
    }
    val pcols = partitionColumns(layer, table)
    if (pcols.nonEmpty) return updatePartitioned(layer, table, predicate, assignments, pcols)
    val target = tablePath(layer, table)
    val df     = mergedRead(layer, table)
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
    primeSchemaCache(layer, table, df.schema)
    primeFeedSchemaCache(layer, table, df.schema)
    updated
  }


  /** Shared validation for the full-clause MERGE paths: explicit SET /
    * INSERT assignments must name real columns, never identity columns
    * (GENERATED ALWAYS AS IDENTITY values are engine-owned), never
    * generated columns nor their derivation sources (the same
    * stale-read rule [[update]] enforces — assignments evaluate
    * against pre-merge rows, so an inline recompute would read stale
    * sources).
    */
  private[sources] def validateClauseAssignments(
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

  private[sources] def mergeClausesImpl(
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
    // ONE full-width execution of the clause plan (r19, see
    // [[Warehouse.stageByAction]]): delete-action rows land in their
    // own staged directory — they already carry the target pre-image
    // values, so the feed's delete rows read straight off the staged
    // bytes too; that directory is then dropped (never promoted into
    // the table layout). The old feed write re-ran the clause join
    // full-width a second time.
    val byAction = stageByAction(merged, staging, Upsert.ActionCol, Seq.empty)
    copyFilesInto(untouched.map((_, "")), staging)
    def staged(action: String): Option[DataFrame] =
      byAction.get(action).filter(_.nonEmpty)
        .map(fls => readFilesAligned(fls, unioned))
    // change feed: post-images for inserts/updates, pre-images for
    // updates (semi-join of the pre-merge touched files against the
    // staged updated keys), and the staged deleted rows
    val post = Seq(
      staged("insert").map(_.withColumn("_change_type", lit("insert"))),
      staged("update").map(_.withColumn("_change_type", lit("update_postimage")))).flatten
    val pre = staged("update").map { u =>
      val updatedKeys = u.select(keys.map(col): _*)
      touchedTgt
        .join(updatedKeys,
          keys.map(k => touchedTgt(k) <=> updatedKeys(k)).reduce(_ && _), "left_semi")
        .select(unioned.fieldNames.toSeq.map(n =>
          if (tgt0.columns.contains(n)) col(n)
          else lit(null).cast(unioned(n).dataType).as(n)): _*)
        .withColumn("_change_type", lit("update_preimage"))
    }
    val delRows = staged("delete").map(_.withColumn("_change_type", lit("delete")))
    (post ++ pre ++ delRows).reduceOption(_ unionByName _).foreach {
      _.withColumn("_commit_version", lit(ver))
        .withColumn("_commit_part", lit(f"$ver%010d"))
        .write.mode(SaveMode.Append).partitionBy("_commit_part")
        .parquet(tablePath(layer, table) + ".__changes")
    }
    promoteStagedActions(staging, Seq.empty, Set("keep", "insert", "update"))
    ensureStagedSchema(staging, unioned)
    retireAndSwap(layer, table, staging)
    logOp(layer, table, "MERGE", ins, upd,
      outputRows = ins + upd + keptPlan + carried, version = ver, deleted = del)
    primeSchemaCache(layer, table, unioned)
    primeFeedSchemaCache(layer, table, unioned)
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

  private[sources] def mergeClausesMorImpl(
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
    val raw    = mergedRead(layer, table)
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
    val changesPlan = Upsert.planMorChangesClauses(tgtAligned, srcAligned, keys,
      matched, notMatched, bySource, metaCols = Seq("__dv_f", "__dv_p"),
      insertOnlyCols = identityColumns(layer, table).map(_._1).toSet)
    // metrics FIRST, on the unpersisted plan (narrow, column-pruned):
    // a zero-change re-run must exit before anything full-width
    // materializes — persisting before the counts pass made the no-op
    // path read every column (measured +0.4 s on q112's warm trials)
    val counts = changesPlan.groupBy(col(Upsert.ActionCol)).count().collect()
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
    // persist the O(delta) change set (r19): tombstones, landed files
    // and the three feed slices otherwise each re-run the full-outer
    // join over the whole visible table. Bounded by the batch (the MOR
    // contract), same within-op persist as [[WarehouseMor.deleteMor]];
    // the first write below materializes it in one pass.
    val changes = changesPlan.persist()
    try {
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
      primeSchemaCache(layer, table, unioned)
      primeFeedSchemaCache(layer, table, unioned)
      Upsert.MergeClauseMetrics(inserted, updated, deleted, kept)
    } finally { changes.unpersist(); () }
  }

  /** INSERT INTO ... SELECT (reference silver_google_scholar.py:148).
    * The appended-row count is an `observe` metric collected from the
    * write job itself — one pass over the input, where a pre-count
    * would execute the whole plan twice (the reference's pre/post-count
    * reads Delta's commit metrics, which are likewise free).
    */
  def append(layer: String, table: String, df: DataFrame): Long =
    withWriterLock(layer, table)(appendImpl(layer, table, df))

  private[sources] def appendImpl(layer: String, table: String, df0: DataFrame): Long = {
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
    primeSchemaCache(layer, table, aligned.schema)
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

  private[sources] def upsertImpl(
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
      // ONE full-width execution of the merge plan (r19): the output
      // stages hive-partitioned by the action column — see the section
      // note at [[Warehouse.stageByAction]]. The old feed write below
      // re-ran the join full-width a third time just to drop the kept
      // rows; the post-images now read back as O(changes) staged bytes.
      val byAction = stageByAction(mr.merged, staging, Upsert.ActionCol, Seq.empty)
      copyFilesInto(untouched.map((_, "")), staging)
      def staged(action: String): Option[DataFrame] =
        byAction.get(action).filter(_.nonEmpty)
          .map(fls => readFilesAligned(fls, unioned))
      val post = Seq(
        staged("insert").map(_.withColumn("_change_type", lit("insert"))),
        staged("update").map(_.withColumn("_change_type", lit("update_postimage")))).flatten
      // update_preimage (full Delta CDF semantics): the replaced
      // target rows, via a semi join of the pre-merge TOUCHED files
      // against the updated keys — read from the staged update files
      // (O(updated) rows, broadcast), not a filtered join re-run.
      // Without preimages a feed consumer cannot SUBTRACT an update,
      // which is what incremental aggregate maintenance needs.
      val pre = staged("update").map { u =>
        val updatedKeys = u.select(keys.map(col): _*)
        touchedTgt
          .join(updatedKeys,
            keys.map(k => touchedTgt(k) <=> updatedKeys(k)).reduce(_ && _), "left_semi")
          .select(unioned.fieldNames.map(n =>
            if (tgt0.columns.contains(n)) col(n)
            else lit(null).cast(unioned(n).dataType).as(n)): _*)
          .withColumn("_change_type", lit("update_preimage"))
      }
      (post ++ pre).reduceOption(_ unionByName _).foreach {
        _.withColumn("_commit_version", lit(ver))
          .withColumn("_commit_part", lit(f"$ver%010d"))
          .write.mode(SaveMode.Append).partitionBy("_commit_part")
          .parquet(tablePath(layer, table) + ".__changes")
      }
      promoteStagedActions(staging, Seq.empty, Set("keep", "insert", "update"))
      ensureStagedSchema(staging, unioned)
    } finally mr.unpersist()
    retireAndSwap(layer, table, staging)
    logOp(layer, table, "MERGE", m.inserted, m.updated,
      outputRows = m.outputRows + carried, version = ver)
    primeSchemaCache(layer, table, unioned)
    primeFeedSchemaCache(layer, table, unioned)
    m
  }
}

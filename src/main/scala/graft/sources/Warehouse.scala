package graft.sources

import graft.operators.Upsert
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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
final class Warehouse(spark: SparkSession, root: String) {

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def tablePath(layer: String, table: String): String = s"$root/$layer/$table"

  def tableExists(layer: String, table: String): Boolean =
    fs.exists(new Path(tablePath(layer, table), "_SUCCESS"))

  def table(layer: String, table: String): DataFrame =
    spark.read.parquet(tablePath(layer, table))

  def listTables(layer: String): Seq[String] = {
    val p = new Path(s"$root/$layer")
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  def dropTable(layer: String, table: String): Unit = {
    fs.delete(new Path(tablePath(layer, table)), true)
    ()
  }

  /** CREATE OR REPLACE TABLE AS SELECT (reference bronze_arxiv.py:102).
    * Writes to a staging dir first, then swaps — safe when `df` reads
    * from the table being replaced (a plain overwrite would delete its
    * own input mid-plan) and idempotent on re-run.
    */
  def createOrReplace(layer: String, table: String, df: DataFrame): Long = {
    val target  = new Path(tablePath(layer, table))
    val staging = new Path(tablePath(layer, table) + ".__staging")
    fs.delete(staging, true)
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val rows = spark.read.parquet(staging.toString).count()
    fs.delete(target, true)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"rename $staging -> $target failed")
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
  ): Long = {
    val target  = new Path(tablePath(layer, table))
    val staging = new Path(tablePath(layer, table) + ".__staging")
    fs.delete(staging, true)
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(staging.toString)
    val rows = spark.read.parquet(staging.toString).count()
    fs.delete(target, true)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"rename $staging -> $target failed")
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
  def compact(layer: String, table: String, targetRowsPerFile: Long = 1_000_000L): Long = {
    val target = tablePath(layer, table)
    val before = spark.read.parquet(target)
    val rows   = before.count()
    val filesBefore = before.inputFiles.length.toLong
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile)
    val staging = new Path(target + ".__staging")
    fs.delete(staging, true)
    before
      .repartition(nFiles.toInt)
      .write.mode(SaveMode.Overwrite)
      .parquet(staging.toString)
    val back = spark.read.parquet(staging.toString).count()
    require(back == rows, s"compaction changed row count: $rows -> $back")
    fs.delete(new Path(target), true)
    if (!fs.rename(staging, new Path(target)))
      throw new java.io.IOException(s"rename $staging -> $target failed")
    logOp(layer, table, "COMPACT", inserted = 0, updated = 0, outputRows = rows)
    filesBefore - spark.read.parquet(target).inputFiles.length
  }

  /** INSERT INTO ... SELECT (reference silver_google_scholar.py:148).
    * The appended-row count is an `observe` metric collected from the
    * write job itself — one pass over the input, where a pre-count
    * would execute the whole plan twice (the reference's pre/post-count
    * reads Delta's commit metrics, which are likewise free).
    */
  def append(layer: String, table: String, df: DataFrame): Long = {
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("n"))
      .write.mode(SaveMode.Append).parquet(tablePath(layer, table))
    val n = obs.get("n").asInstanceOf[Long]
    logOp(layer, table, "APPEND", inserted = n, updated = 0, outputRows = n)
    n
  }

  /** MERGE INTO (reference silver_arxiv.py:130-152) — conditional upsert
    * via [[Upsert.mergeWithMetrics]], staged overwrite, metrics to the
    * ledger exactly like Delta's operationMetrics
    * (numTargetRowsInserted/Updated/numOutputRows).
    */
  def upsert(
      layer: String,
      table: String,
      src: DataFrame,
      keys: Seq[String],
      versionCol: String
  ): Upsert.WriteMetrics = {
    if (!tableExists(layer, table)) {
      val n = createOrReplace(layer, table, src)
      return Upsert.WriteMetrics(inserted = n, updated = 0, kept = 0)
    }
    val tgt     = this.table(layer, table)
    val mr      = Upsert.mergeWithMetrics(tgt, src, keys, versionCol)
    val m       = mr.metrics
    val target  = new Path(tablePath(layer, table))
    val staging = new Path(tablePath(layer, table) + ".__staging")
    fs.delete(staging, true)
    try mr.result.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    finally mr.unpersist() // evict the cached merge plan itself, not a derived projection
    fs.delete(target, true)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"rename $staging -> $target failed")
    logOp(layer, table, "MERGE", m.inserted, m.updated, m.outputRows)
    m
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
      outputRows: Long
  ): Unit = {
    import spark.implicits._
    val row = Seq((s"$layer.$table", op, inserted, updated, outputRows, System.currentTimeMillis()))
      .toDF("table_name", "operation", "num_inserted", "num_updated", "num_output_rows", "ts_millis")
      .withColumn("version", lit(nextVersion(s"$layer.$table")))
    row.write.mode(SaveMode.Append).parquet(tablePath(ledgerLayer, ledgerTable))
  }

  private def nextVersion(tableName: String): Long =
    if (!tableExists(ledgerLayer, ledgerTable) &&
      !fs.exists(new Path(tablePath(ledgerLayer, ledgerTable)))) 0L
    else {
      val hist = history(tableName)
      if (hist.isEmpty) 0L else hist.agg(max("version")).head().getLong(0) + 1L
    }

  /** All ledger entries for a table — the engine's DESCRIBE HISTORY. */
  def history(tableName: String): DataFrame = {
    if (!fs.exists(new Path(tablePath(ledgerLayer, ledgerTable)))) {
      import spark.implicits._
      return Seq.empty[(String, String, Long, Long, Long, Long, Long)]
        .toDF("table_name", "operation", "num_inserted", "num_updated",
          "num_output_rows", "ts_millis", "version")
    }
    spark.read
      .parquet(tablePath(ledgerLayer, ledgerTable))
      .filter(col("table_name") === tableName)
  }

  /** Latest operation metrics (reference `order by version desc limit 1`,
    * silver_arxiv.py:181-182).
    */
  def lastOperation(tableName: String): Option[org.apache.spark.sql.Row] =
    history(tableName).orderBy(desc("version")).limit(1).collect().headOption
}

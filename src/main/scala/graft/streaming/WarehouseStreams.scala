package graft.streaming

import graft.sources.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ↔ warehouse integration: the micro-batch MERGE sink
  * (streaming writes that upsert instead of append) and the change-feed
  * stream (CDC consumption of what merges changed).
  *
  * This is the canonical lakehouse streaming pattern (Delta documents
  * exactly this foreachBatch-MERGE shape for streaming upserts): the
  * stream stays declarative, and each micro-batch applies through the
  * same [[Warehouse.upsert]] the batch path uses — conditional update,
  * schema evolution, ledger metrics, retired generation, and change
  * feed all included per batch.
  */
object WarehouseStreams {

  /** Apply each micro-batch of `stream` as a warehouse MERGE.
    * Same one-source-row-per-key-per-batch constraint as Delta MERGE
    * (the duplicate-match guard raises, it never corrupts). Replayed
    * batches re-merge the same rows to the same versions — idempotent
    * on the table; the ledger records one MERGE per non-empty batch.
    */
  def mergeSink(
      stream: DataFrame,
      wh: Warehouse,
      layer: String,
      table: String,
      keys: Seq[String],
      versionCol: String,
      checkpoint: String
  ): StreamingQuery = {
    graft.Engine.guardStateStoreProvider(stream.sparkSession, checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { wh.upsert(layer, table, batch, keys, versionCol); () }
      }
      .start()
  }

  /** Streaming frequency tracking: each micro-batch appends ONE
    * count-min sketch row ([[graft.operators.Sketches.runFrequencySketch]])
    * to the frequency ledger, having scanned only its own rows —
    * the streaming twin of the per-run batch ledger. Any moment's
    * heavy-hitter question is then [[graft.operators.Sketches.frequencyAcrossRuns]]
    * over the KB-sized blob rows: O(1) per key, no batch re-scanned,
    * and (CMS merge being lossless at fixed depth/width/seed) the
    * running sketch EQUALS the single-build sketch over everything
    * ingested so far — pinned in StreamingSpec. Skew in a live join
    * key is visible while the stream runs, before the straggler hits.
    */
  def frequencySketchSink(
      stream: DataFrame,
      wh: Warehouse,
      layer: String,
      table: String,
      keyCol: String,
      eps: Double,
      confidence: Double,
      seed: Int,
      checkpoint: String
  ): StreamingQuery = {
    graft.Engine.guardStateStoreProvider(stream.sparkSession, checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          wh.append(layer, table,
            graft.operators.Sketches.runFrequencySketch(
              batch, keyCol, s"batch_$id", eps, confidence, seed))
          ()
        }
      }
      .start()
  }

  /** Continuously-maintained aggregate: every change-feed micro-batch
    * triggers an incremental [[graft.operators.MaterializedAgg.refresh]]
    * — the stream is the TRIGGER, the MV's version cursor is the
    * exactly-once guard (a replayed trigger finds nothing newer than
    * the cursor and no-ops), so the derived table tracks the source
    * at O(delta) per merge without ever re-scanning it.
    *
    * Commit-awareness: the warehouse writes feed files BEFORE its
    * ledger commit (a pre-commit crash purges the phantom partition,
    * never loses a committed one), so a trigger can race into the
    * write-to-commit window — the batch's files would be consumed
    * while `changeFeed` still (correctly) hides the uncommitted
    * version, and no later trigger would come. The sink therefore
    * waits (bounded) for the ledger to reach the batch's max
    * `_commit_version` before refreshing. If the writer truly crashed
    * pre-commit, the wait times out and the cursor-guarded refresh
    * ignores the phantom rows — which is the correct outcome, and any
    * later real commit re-triggers and catches the cursor up.
    */
  def mvRefreshSink(
      spark: SparkSession,
      wh: Warehouse,
      srcLayer: String,
      srcTable: String,
      mvLayer: String,
      mvTable: String,
      keys: Seq[String],
      valueCol: String,
      checkpoint: String,
      commitWaitMs: Long = 30000
  ): StreamingQuery = {
    graft.Engine.guardStateStoreProvider(spark, checkpoint)
    changeFeedStream(spark, wh, srcLayer, srcTable).writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val head   = batch.agg(max(col("_commit_version"))).head()
        val target = if (head.isNullAt(0)) -1L else head.getLong(0)
        val deadline = System.currentTimeMillis() + commitWaitMs
        while (target > wh.currentVersion(srcLayer, srcTable) &&
          System.currentTimeMillis() < deadline) Thread.sleep(20)
        // Trigger coalescing (r19): when COMMITTED feed rows already
        // exist beyond this batch's horizon, skip — those rows are on
        // disk, so the file source must deliver them as a later batch,
        // and the cursor-guarded refresh is CUMULATIVE (it applies
        // everything since the cursor, not just one batch), so that
        // later trigger applies this batch's rows too, exactly once. A
        // long-lived sink behind a multi-commit writer then runs ONE
        // incremental MV rewrite per quiet point instead of one per
        // commit. The probe is driver-side footer stats, zero jobs;
        // version bumps WITHOUT feed rows (no-op commits, VACUUM)
        // never cause a skip, because the probe counts rows, not
        // versions.
        val pending = target >= 0 &&
          wh.changeFeedTailStats(srcLayer, srcTable, target)._1 > 0
        if (!pending) {
          graft.operators.MaterializedAgg
            .refresh(wh, srcLayer, srcTable, mvLayer, mvTable, keys, valueCol)
          ()
        }
      }
      .start()
  }

  /** Session-scoped reuse of [[mvRefreshSink]] (r19): a production MV
    * maintainer runs ONE long-lived stream — it does not bootstrap a
    * fresh stream per refresh, and the per-call bootstrap (feed schema
    * read, checkpoint resume, query spin-up and teardown) was the
    * dominant fixed cost of the q102 body, not the refresh itself.
    * Keyed by checkpoint path (unique per warehouse fixture); a query
    * that stopped or died — including one from a previous, now-stopped
    * session — is replaced on next use. Nothing about WHAT is computed
    * changes: the same cursor-guarded [[graft.operators
    * .MaterializedAgg.refresh]] consumes the same feed files exactly
    * once, and callers still `processAllAvailable()` to await it; the
    * stream merely stays subscribed between refreshes, as a deployed
    * one would.
    */
  private val sharedSinks =
    new java.util.concurrent.ConcurrentHashMap[String, StreamingQuery]()

  def mvRefreshSinkShared(
      spark: SparkSession,
      wh: Warehouse,
      srcLayer: String,
      srcTable: String,
      mvLayer: String,
      mvTable: String,
      keys: Seq[String],
      valueCol: String,
      checkpoint: String,
      commitWaitMs: Long = 30000
  ): StreamingQuery =
    sharedSinks.compute(checkpoint, (_, prev) =>
      if (prev != null && prev.isActive) prev
      else mvRefreshSink(spark, wh, srcLayer, srcTable, mvLayer, mvTable,
        keys, valueCol, checkpoint, commitWaitMs))

  /** Stream the table's change feed (CDC downstream): a file-source
    * readStream over the `.__changes` sidecar, so every merge's delta
    * arrives as its files land — the consumer processes O(delta) per
    * trigger and never rescans the table. The feed must already exist
    * (at least one merge) to fix the schema.
    *
    * At-least-once caveat for RAW consumers: feed files are written
    * BEFORE the writer's ledger commit, so a trigger can deliver rows
    * of a version whose commit is still in flight (or that a crashed
    * writer will never commit — those partitions get purged at the
    * next op). A consumer that must act only on committed data should
    * gate on `Warehouse.currentVersion` ≥ the batch's max
    * `_commit_version`, exactly as [[mvRefreshSink]] does.
    */
  def changeFeedStream(spark: SparkSession, wh: Warehouse, layer: String, table: String): DataFrame = {
    val p = wh.tablePath(layer, table) + ".__changes"
    // schema from a direct read of the sidecar so it INCLUDES the
    // `_commit_part` hive-partition column (a user schema omitting a
    // discovered partition column is undefined for file sources);
    // dropped after — stream consumers see the same feed columns as
    // the batch changeFeed
    val schema = spark.read.parquet(p).schema
    spark.readStream.schema(schema).parquet(p).drop("_commit_part")
  }
}

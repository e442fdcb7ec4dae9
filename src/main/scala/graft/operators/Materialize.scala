package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager materialization of an intermediate that downstream stages (or
  * an iterative loop) branch from, with a RELIABILITY MODE chosen by
  * session state:
  *
  *   - No checkpoint dir set (local dev, tests, single-box runs):
  *     `localCheckpoint()` — lineage truncates, nothing pins a
  *     cache-manager entry, blocks free via the context cleaner once
  *     unreachable. Blocks live only in executor storage, so they are
  *     NOT recomputable if an executor dies.
  *   - `spark.sparkContext.setCheckpointDir(...)` set (the cluster
  *     answer): reliable `checkpoint()` — blocks persist to the
  *     checkpoint dir (HDFS/S3 on a real cluster), so an iterative job
  *     that loses an executor mid-loop recovers instead of dying. The
  *     cost is a write+read round-trip per materialization, which is
  *     exactly the durability/latency trade a 100 TB run wants to make.
  *
  * One switch covers every iterative/materialized plan in the engine
  * ([[Dedup]] signature/shingle reuse, [[Graph]] component loops): set
  * the dir once at session setup and every loop becomes fault-tolerant,
  * with identical results either way (asserted in GraphSpec).
  */
object Materialize {
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Lazy variant for loop bodies whose NEXT action is itself an
    * aggregate over the materialized frame (the per-round fixpoint
    * fingerprint in [[Graph]]): the plan's RDD is marked for
    * checkpointing without an eager job, so that one aggregate action
    * both persists the blocks and computes its result — one job per
    * round instead of two. Same reliability-mode switch as [[apply]];
    * downstream consumers read the persisted blocks exactly as with
    * the eager form (results identical, asserted in GraphSpec).
    */
  def lazily(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)
}

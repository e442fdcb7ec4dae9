package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch LEDGER: the q50 merge idea wired into the warehouse surface.
  *
  * The incremental-dashboard shape at 100 TB: each pipeline run
  * appends one row per group — (groups..., run_id, sketch) — to a
  * warehouse table via [[graft.sources.Warehouse.append]], having
  * scanned only ITS OWN slice of data. Any later reader answers
  * "distinct keys across all runs so far" by union-aggregating the
  * stored sketches: a few KB per group per run, no re-scan of any
  * run's raw rows, additive forever. Exact `count(DISTINCT)` has no
  * such decomposition — it must re-shuffle every historical key on
  * every refresh.
  *
  * Sketches are Apache DataSketches HLL (Spark's `hll_sketch_agg` /
  * `hll_union_agg`): mergeability is exact (union of sketches ==
  * sketch of union), so the estimate after N appended runs equals the
  * single-pass estimate over the concatenated data, with the same
  * ~1.6% standard error at the default lgConfigK=12 (bound pinned in
  * SketchSpec across ≥3 appends; pipeline wiring in PipelineSpec).
  */
object Sketches {

  /** One run's contribution to the ledger: a DataSketches HLL sketch of
    * `keyCol` per group, stamped with the run id. Append the result to
    * a warehouse table — the run only ever scans its own slice.
    */
  def runSketch(slice: DataFrame, groupCols: Seq[String], keyCol: String, runId: String): DataFrame =
    slice
      .groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol)).as("sketch"))
      .withColumn("run_id", lit(runId))

  /** Current distinct-count estimate per group across every run in the
    * ledger: union-aggregate the stored sketches and estimate. Cost is
    * proportional to (groups × runs) sketch rows, independent of how
    * many raw rows the runs scanned.
    */
  def estimateAcrossRuns(ledger: DataFrame, groupCols: Seq[String]): DataFrame =
    ledger
      .groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est_distinct"))
}

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

  /** Bucket width of the mergeable quantile histogram (q205 and its
    * streaming twin) — ONE constant so the batch readout and the
    * streaming ledger can never fold different grids.
    */
  val QuantileBucketWidth = 5.0

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

  /** Merged count-min FREQUENCY sketch: one CMS built per slice (each
    * slice scans only its own rows — the per-day/per-partition ingest
    * shape, like [[runSketch]]), merged into a single sketch whose
    * point estimates obey `exact ≤ est ≤ exact + eps·N` (lower bound
    * always, upper with the configured confidence). Frequency is what
    * HLL can't answer: which keys DOMINATE — the heavy-domain /
    * heavy-user question a curation pipeline asks before mixture
    * weighting (q65), and the skew detector that tells you a join key
    * needs salting (SCALE.md's crossover) BEFORE the straggler hits.
    * The sketch is a few KB regardless of key cardinality; slices
    * merge without re-scanning history.
    */
  def countMinMerged(
      df: DataFrame,
      keyCol: String,
      sliceCol: org.apache.spark.sql.Column,
      eps: Double,
      confidence: Double,
      seed: Int
  ): org.apache.spark.util.sketch.CountMinSketch = {
    val rows = df
      .groupBy(sliceCol.as("slice"))
      .agg(count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed)).as("cms"))
      .collect() // one sketch blob per slice — KB-sized metadata
    mergeCms(rows.map(_.getAs[Array[Byte]]("cms")))
  }

  private def mergeCms(blobs: Seq[Array[Byte]]): org.apache.spark.util.sketch.CountMinSketch = {
    val present = blobs.filter(_ != null)
    require(present.nonEmpty,
      "cannot merge an empty frequency-sketch set: the ledger has no runs yet " +
        "(append a runFrequencySketch row first)")
    present
      .map(b => org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(b)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
  }

  /** One run's contribution to a FREQUENCY ledger — the count-min twin
    * of [[runSketch]]: a single-row (run_id, cms) frame, appendable to
    * a warehouse table. Each run scans only its own slice; the
    * eps/confidence/seed MUST match across runs (merge requires equal
    * depth × width × seed).
    */
  def runFrequencySketch(
      slice: DataFrame,
      keyCol: String,
      runId: String,
      eps: Double,
      confidence: Double,
      seed: Int
  ): DataFrame =
    slice
      .agg(count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed)).as("cms"))
      .withColumn("run_id", lit(runId))

  /** The running frequency sketch across every run in the ledger:
    * read the (runs)-sized blob column, merge driver-side (KBs per
    * blob, however many raw rows the runs scanned). Any key's
    * frequency over the table's whole history is then an O(1) lookup —
    * the heavy-hitter dashboard never re-scans a run.
    */
  def frequencyAcrossRuns(ledger: DataFrame): org.apache.spark.util.sketch.CountMinSketch =
    mergeCms(ledger.select(col("cms")).collect().map(_.getAs[Array[Byte]]("cms")))
}

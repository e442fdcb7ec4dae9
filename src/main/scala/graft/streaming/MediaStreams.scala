package graft.streaming

import graft.operators.{Dedup, Materialize}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Frame-level media dedup at INGEST time — the streaming twin of
  * q209's batch pipeline ([[graft.QueriesMedia.q209_frame_dedup]]):
  * each arriving micro-batch of media computes its per-frame
  * signatures (the SAME shared [[graft.QueriesMedia.frameSigs]] rule),
  * probes the PERSISTED chunk-bucket frame index through
  * [[Dedup.incrementalBitSigPairs]] (within-batch pairs included, so
  * per-batch outputs union to the full pair set exactly once), rolls
  * aligned frame matches up per media pair against the persisted frame
  * counts, and emits the pairs clearing the matched-share gate under
  * `pairsDir/batch_id=<id>` — "which existing videos is this upload a
  * re-encode of", answered in the batch that lands it.
  *
  * Per-batch cost: the batch's own frame signatures + a bucket-keyed
  * probe whose candidate mass follows the batch's duplicate mass —
  * independent of how much media came before (the [[DocStreams
  * .incrementalBitSigDedup]] argument, lifted to frame granularity
  * with the count-join for the share gate on top).
  */
object MediaStreams {

  private def sigsDir(indexDir: String)   = s"$indexDir/frame_sigs"
  private def bandsDir(indexDir: String)  = s"$indexDir/frame_bands"
  private def countsDir(indexDir: String) = s"$indexDir/frame_counts"

  private val MaxHamming = 3
  private val Chunks     = 4

  private def sigBundle(media: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val sigs = Materialize(graft.QueriesMedia.frameSigs(media))
    val bands = Materialize(
      Dedup.bitSigBandRows(sigs, "fid", "phash", MaxHamming, Chunks))
    val counts = graft.QueriesMedia.frameCounts(media)
    (sigs, bands, counts)
  }

  /** Seed the persisted frame index from the already-landed corpus:
    * frame signatures, their chunk-combination bucket rows, and the
    * per-media frame counts, each under `batch_id=-1`. `media` is
    * (media_id, txt, duration_ms) — the q209 corpus shape.
    */
  def seedFrameIndex(media: DataFrame, indexDir: String): Unit = {
    val (sigs, bands, counts) = sigBundle(media)
    sigs.write.mode("overwrite").parquet(s"${sigsDir(indexDir)}/batch_id=-1")
    bands.write.mode("overwrite").parquet(s"${bandsDir(indexDir)}/batch_id=-1")
    counts.write.mode("overwrite").parquet(s"${countsDir(indexDir)}/batch_id=-1")
  }

  /** Start the incremental frame-dedup stream over a (media_id, txt,
    * duration_ms) source. Pairs clearing `minShare` of the longer
    * side's frame count land under `pairsDir/batch_id=<id>` with the
    * q209 output columns; the batch's own signatures / buckets /
    * counts append to the index. Replay-safe the house way: a re-run
    * batch overwrites its own partitions.
    */
  /** The per-batch pair plan, shared verbatim by the stream body and
    * the PlanAudit tool (a regression to a per-batch full-corpus
    * re-signature would surface as a plan diff): batch-side signatures
    * and bands, the bucket-keyed probe against the persisted index,
    * the ALIGNED-frame residue check, and the share gate against the
    * deduplicated frame counts. Returns (pairs, batch sigs, batch
    * bands, batch counts) so the stream persists the batch's index
    * slices after the pairs land.
    */
  private[graft] def batchPairPlan(
      batch: DataFrame,
      indexDir: String,
      batchId: Long,
      minShare: Double
  ): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    val (bSigs, bBands, bCounts) = sigBundle(batch)
    val bCountsM = Materialize(bCounts)
    val idxSigs  = spark.read.parquet(sigsDir(indexDir))
      .filter(col("batch_id") =!= batchId).select("fid", "phash")
    val idxBands = spark.read.parquet(bandsDir(indexDir))
      .filter(col("batch_id") =!= batchId).select("fid", "s", "piece")
    // one row per media_id: a media_id redelivered in a later batch
    // would otherwise appear twice here and MULTIPLY every matched
    // pair row through the two inner joins below (duplicate pairs,
    // inflated shares); max is exact because the frame grid — and
    // so n_frames — is a pure function of duration_ms
    val nf = spark.read.parquet(countsDir(indexDir))
      .filter(col("batch_id") =!= batchId)
      .select("media_id", "n_frames")
      .unionByName(bCountsM)
      .groupBy(col("media_id"))
      .agg(max(col("n_frames")).as("n_frames"))
    val matched = Dedup
      .incrementalBitSigPairs(idxSigs, idxBands, bSigs, bBands,
        "fid", "phash", MaxHamming)
      .filter(pmod(col("id_a"), lit(1000000L)) === pmod(col("id_b"), lit(1000000L)))
      .select(expr("id_a div 1000000").as("ma"), expr("id_b div 1000000").as("mb"))
      .groupBy(col("ma"), col("mb"))
      .agg(count(lit(1)).as("matched_frames"))
    val pairs = matched
      .join(nf.select(col("media_id").as("ma"), col("n_frames").as("n_frames_a")), Seq("ma"))
      .join(nf.select(col("media_id").as("mb"), col("n_frames").as("n_frames_b")), Seq("mb"))
      .select(col("ma").as("id_a"), col("mb").as("id_b"),
        col("n_frames_a"), col("n_frames_b"), col("matched_frames"),
        (col("matched_frames").cast("double") /
          greatest(col("n_frames_a"), col("n_frames_b"))).as("frame_share"))
      .filter(col("frame_share") >= minShare)
    (pairs, bSigs, bBands, bCountsM)
  }

  def incrementalFrameDedup(
      media: DataFrame,
      pairsDir: String,
      indexDir: String,
      minShare: Double = 0.8
  ): StreamingQuery =
    media.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val (pairs, bSigs, bBands, bCountsM) =
          batchPairPlan(batch.toDF(), indexDir, batchId, minShare)
        pairs.write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
        bSigs.write.mode("overwrite").parquet(s"${sigsDir(indexDir)}/batch_id=$batchId")
        bBands.write.mode("overwrite").parquet(s"${bandsDir(indexDir)}/batch_id=$batchId")
        bCountsM.write.mode("overwrite").parquet(s"${countsDir(indexDir)}/batch_id=$batchId")
        ()
      }
      .start()
}

package graft.streaming

import graft.operators.{Dedup, Materialize}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Ingest-time near-duplicate detection over a DOCUMENT stream — the
  * streaming twin of the batch incremental dedup (q48). The corpus
  * lives as a PERSISTED banded signature index (shingle sets + band
  * rows for text, signatures + chunk-bucket rows for bit signatures),
  * written once per batch at ingest: each micro-batch signs ONLY its
  * own rows, probes the persisted index via
  * [[Dedup.incrementalNearDupPairsIndexed]] (candidates cost O(batch
  * bucket collisions), never corpus²), emits the verified near-dup
  * pairs, then appends its own index rows — so the NEXT batch dedups
  * against everything before it without ever re-reading or re-signing
  * the corpus. Per-batch cost is O(|batch| + collisions), independent
  * of corpus size — the property that makes ingest-time dedup viable
  * on a growing 10 B-doc index.
  *
  * Union of all per-batch pair outputs ≡ the one-shot batch run on the
  * same data (asserted in StreamingSpec): a pair inside batch i is
  * emitted by batch i (the probe side includes the batch itself), a
  * pair across batches i < j by batch j (batch i is index by then) —
  * each pair exactly once.
  *
  * Exactly-once: foreachBatch is at-least-once, so each batch writes
  * its pairs, its index rows, and its corpus contribution to
  * `batch_id=<id>` partition directories with overwrite semantics — a
  * replayed batch overwrites its own partitions instead of duplicating
  * rows, which makes the sink idempotent (the standard foreachBatch
  * recipe when the target store has no transactions). The corpus seed
  * loads as partition `batch_id=-1` via [[seedIndex]].
  */
object DocStreams {

  /** Directory layout helper: where the pre-existing corpus seed goes. */
  def seedDir(corpusDir: String): String = s"$corpusDir/batch_id=-1"

  private def setsDir(indexDir: String)  = s"$indexDir/sets"
  private def bandsDir(indexDir: String) = s"$indexDir/bands"

  /** Sign the pre-existing corpus ONCE and persist its index under
    * `batch_id=-1`: shingle sets (exact-verify side) and banded
    * MinHash rows (candidate side). Streaming batches never touch the
    * seed text again.
    */
  def seedIndex(
      seedDocs: DataFrame,
      idCol: String,
      textCol: String,
      indexDir: String,
      n: Int = 3,
      k: Int = 64,
      bands: Int = 32
  ): Unit = {
    val sets = Materialize(Dedup.nearDupSets(seedDocs, idCol, textCol, n))
    sets.write.mode("overwrite").parquet(s"${setsDir(indexDir)}/batch_id=-1")
    Dedup
      .nearDupBandRows(sets, idCol, k, bands)
      .write.mode("overwrite").parquet(s"${bandsDir(indexDir)}/batch_id=-1")
  }

  /** Start the incremental-dedup sink over a streaming (idCol, textCol)
    * document source. Pairs land under `pairsDir/batch_id=<id>`, the
    * batch's raw documents under `corpusDir/batch_id=<id>` (the
    * document store — written, never read back), and the batch's index
    * rows under `indexDir/{sets,bands}/batch_id=<id>` (what later
    * batches probe). Seed the index first with [[seedIndex]].
    */
  def incrementalDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      corpusDir: String,
      pairsDir: String,
      indexDir: String,
      n: Int = 3,
      k: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.5
  ): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // materialize: the batch feeds several jobs (sign + probe + appends)
        val b      = Materialize(batch.select(idCol, textCol))
        val bSets  = Materialize(Dedup.nearDupSets(b, idCol, textCol, n))
        val bBands = Materialize(Dedup.nearDupBandRows(bSets, idCol, k, bands))
        val idxSets  = spark.read.parquet(setsDir(indexDir)).select(idCol, "shingle_set")
        val idxBands = spark.read.parquet(bandsDir(indexDir)).select(idCol, "band", "h")
        Dedup
          .incrementalNearDupPairsIndexed(idxSets, idxBands, bSets, bBands, idCol, threshold)
          .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
        bSets.write.mode("overwrite").parquet(s"${setsDir(indexDir)}/batch_id=$batchId")
        bBands.write.mode("overwrite").parquet(s"${bandsDir(indexDir)}/batch_id=$batchId")
        b.write.mode("overwrite").parquet(s"$corpusDir/batch_id=$batchId")
        ()
      }
      .start()

  /** Seed the bit-signature (SimHash / perceptual-hash) index: persist
    * (idCol, sigCol) and the chunk-combination bucket rows under
    * `batch_id=-1`. The `sigs` frame should already carry the computed
    * 64-bit '0'/'1' signature — for media that is the decode +
    * [[graft.operators.Multimodal]] pHash output, computed once here.
    */
  def seedBitSigIndex(
      sigs: DataFrame,
      idCol: String,
      sigCol: String,
      indexDir: String,
      maxHamming: Int = 3,
      chunks: Int = 0
  ): Unit = {
    val s = Materialize(sigs.select(idCol, sigCol))
    s.write.mode("overwrite").parquet(s"${setsDir(indexDir)}/batch_id=-1")
    Dedup
      .bitSigBandRows(s, idCol, sigCol, maxHamming, chunks)
      .write.mode("overwrite").parquet(s"${bandsDir(indexDir)}/batch_id=-1")
  }

  /** The media twin of [[incrementalDedup]]: ingest-time perceptual-
    * hash dedup over a streaming (idCol, sigCol) signature source
    * (sigCol = the 64-bit '0'/'1' pHash computed upstream of the sink,
    * e.g. by the decode stage). Each micro-batch probes the persisted
    * chunk-bucket index via [[Dedup.incrementalBitSigPairs]], emits
    * verified pairs (hamming ≤ maxHamming) under
    * `pairsDir/batch_id=<id>`, and appends its own signature + bucket
    * rows — per-batch cost independent of how much media came before.
    * Seed with [[seedBitSigIndex]].
    */
  def incrementalBitSigDedup(
      sigs: DataFrame,
      idCol: String,
      sigCol: String,
      pairsDir: String,
      indexDir: String,
      maxHamming: Int = 3,
      chunks: Int = 0
  ): StreamingQuery =
    sigs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark  = batch.sparkSession
        val bSigs  = Materialize(batch.select(idCol, sigCol))
        val bBands = Materialize(Dedup.bitSigBandRows(bSigs, idCol, sigCol, maxHamming, chunks))
        val idxSigs  = spark.read.parquet(setsDir(indexDir)).select(idCol, sigCol)
        val idxBands = spark.read.parquet(bandsDir(indexDir)).select(idCol, "s", "piece")
        Dedup
          .incrementalBitSigPairs(idxSigs, idxBands, bSigs, bBands, idCol, sigCol, maxHamming)
          .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
        bSigs.write.mode("overwrite").parquet(s"${setsDir(indexDir)}/batch_id=$batchId")
        bBands.write.mode("overwrite").parquet(s"${bandsDir(indexDir)}/batch_id=$batchId")
        ()
      }
      .start()

  // ---- exact-substring dedup stream (q115's ingest twin) ----

  private def anchorsDir(indexDir: String) = s"$indexDir/anchors"

  /** Anchor the pre-existing corpus ONCE for streaming substring
    * dedup: positioned k-gram anchors persist under `batch_id=-1`;
    * streaming batches probe them without re-reading corpus text.
    */
  def seedSubstringIndex(
      seedDocs: DataFrame,
      idCol: String,
      textCol: String,
      indexDir: String,
      k: Int = 8
  ): Unit =
    Dedup.substringAnchors(seedDocs, idCol, textCol, k)
      .write.mode("overwrite").parquet(s"${anchorsDir(indexDir)}/batch_id=-1")

  /** Ingest-time exact-substring dedup (the streaming twin of q118,
    * same contract as [[incrementalDedup]]): each micro-batch anchors
    * ONLY its own documents, probes the persisted anchor index ∪
    * itself via [[Dedup.incrementalSubstringPairsIndexed]], writes the
    * (doc_a, doc_b, n_anchors, max_run) pairs to
    * `pairsDir/batch_id=<id>`, then appends its anchors — per-batch
    * cost O(|batch| anchoring + matched-anchor mass), corpus text
    * never re-read. Batch-partition overwrites keep replays idempotent.
    */
  def incrementalSubstringDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pairsDir: String,
      indexDir: String,
      k: Int = 8
  ): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val bAnchors = Materialize(
          Dedup.substringAnchors(batch.select(idCol, textCol), idCol, textCol, k))
        val idx = spark.read.parquet(anchorsDir(indexDir))
          .select("doc_id", "pos", "h", "g")
        Dedup.incrementalSubstringPairsIndexed(idx, bAnchors, k)
          .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
        bAnchors.write.mode("overwrite")
          .parquet(s"${anchorsDir(indexDir)}/batch_id=$batchId")
        ()
      }
      .start()
}

package graft.streaming

import graft.operators.{Dedup, Materialize}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Ingest-time near-duplicate detection over a DOCUMENT stream — the
  * streaming twin of the batch incremental dedup (q48): each
  * micro-batch probes the persisted corpus band index via
  * [[Dedup.incrementalNearDupPairs]] (batch-side-only probing:
  * candidates cost O(batch bucket collisions), never corpus²), emits
  * the verified near-dup pairs, then joins the corpus itself — so the
  * NEXT batch dedups against everything before it.
  *
  * Union of all per-batch pair outputs ≡ the one-shot batch run on the
  * same data (asserted in StreamingSpec): a pair inside batch i is
  * emitted by batch i (the probe side includes the batch itself), a
  * pair across batches i < j by batch j (batch i is corpus by then) —
  * each pair exactly once.
  *
  * Exactly-once: foreachBatch is at-least-once, so each batch writes
  * its pairs and its corpus contribution to a `batch_id=<id>`
  * partition directory with overwrite semantics — a replayed batch
  * overwrites its own partition instead of duplicating rows, which
  * makes the sink idempotent (the standard foreachBatch recipe when
  * the target store has no transactions). The corpus seed loads as
  * partition `batch_id=-1`.
  */
object DocStreams {

  /** Directory layout helper: where the pre-existing corpus seed goes. */
  def seedDir(corpusDir: String): String = s"$corpusDir/batch_id=-1"

  /** Start the incremental-dedup sink over a streaming (idCol, textCol)
    * document source. Pairs land under `pairsDir/batch_id=<id>`, the
    * batch's documents under `corpusDir/batch_id=<id>`.
    */
  def incrementalDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      corpusDir: String,
      pairsDir: String,
      n: Int = 3,
      k: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.5
  ): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // materialize: the batch feeds two jobs (pair probe + corpus append)
        val b      = Materialize(batch.select(idCol, textCol))
        val corpus = spark.read.parquet(corpusDir).select(idCol, textCol)
        Dedup
          .incrementalNearDupPairs(corpus, b, idCol, textCol, n, k, bands, threshold)
          .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
        b.write.mode("overwrite").parquet(s"$corpusDir/batch_id=$batchId")
        ()
      }
      .start()
}

package graft.streaming

import graft.operators.{Materialize, Similarity}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Ingest-time semantic (embedding) dedup — the vector twin of
  * [[DocStreams]]: the corpus lives as a PERSISTED IVF index
  * (`indexDir/centroids` + `indexDir/cells/batch_id=<id>/cell=<c>`).
  * Each micro-batch assigns ONLY its own vectors against the persisted
  * centroids (one broadcast join — the batch never shuffles), probes
  * the cell index for cosine-threshold near-dup pairs, emits them, and
  * appends its own cell rows — so the next batch dedups against
  * everything before it without re-reading or re-embedding the corpus.
  * Per-batch candidate work is the batch's probe-cell volume,
  * independent of how many batches came before, and the SAME grown
  * index serves [[Similarity.ivfTopKIndexed]] queries afterwards — one
  * persisted index, two consumers (ingest dedup + ANN search).
  *
  * At nprobe = nlist the candidate set is exhaustive, so the union of
  * per-batch pair outputs EQUALS the one-shot
  * [[Similarity.cosinePairs]] restricted to pairs touching an arrival
  * (asserted in StreamingSpec): a pair inside batch i is emitted by
  * batch i (the probe side includes the batch itself), a pair across
  * batches i < j by batch j. Smaller nprobe trades recall for a
  * tunable scanned fraction exactly like the batch IVF.
  *
  * Exactly-once: same idempotent partition-directory recipe as
  * [[DocStreams]] — a replayed batch overwrites `batch_id=<id>`
  * instead of duplicating rows.
  */
object VecStreams {

  private def cellsDir(indexDir: String) = s"$indexDir/cells"

  /** Persist centroids (derived from the seed corpus, deterministic)
    * plus the seed's cell rows under `batch_id=-1`. Streaming batches
    * never touch the seed vectors again.
    */
  def seedIndex(
      seedVecs: DataFrame,
      idCol: String,
      vecCol: String,
      indexDir: String,
      nlist: Int = 16,
      seed: Long = 42L
  ): Unit = {
    val cent = Similarity.ivfCentroids(seedVecs, idCol, vecCol, nlist, seed)
    cent.write.mode("overwrite").parquet(s"$indexDir/centroids")
    Similarity
      .assignCells(seedVecs, idCol, vecCol, cent)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"${cellsDir(indexDir)}/batch_id=-1")
  }

  /** Start the ingest-dedup sink over a streaming (idCol, vecCol)
    * vector source. Near-dup pairs (cosine ≥ threshold, id_a < id_b)
    * land under `pairsDir/batch_id=<id>`; the batch's cell rows append
    * under `indexDir/cells/batch_id=<id>`. Seed with [[seedIndex]].
    */
  def incrementalDedup(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      pairsDir: String,
      indexDir: String,
      threshold: Double,
      nprobe: Int = 16,
      quarantineDir: Option[String] = None
  ): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark  = batch.sparkSession
        val cent   = spark.read.parquet(s"$indexDir/centroids")
        // Optional quality gate ([[Similarity.vectorOk]], the q170
        // predicate): NaN/Inf/zero/mis-dimensioned vectors land in a
        // quarantine partition instead of the index — one broken
        // encoder batch must not poison every cosine in its cells.
        // Expected dimension comes from the seed centroids (driver
        // reads one tiny table).
        val gated = quarantineDir match {
          case Some(qd) =>
            val dim = cent.select(size(col("centv"))).head().getInt(0)
            val flagged = Materialize(batch
              .select(idCol, vecCol)
              .withColumn("__ok", Similarity.vectorOk(col(vecCol), dim)))
            flagged
              .filter(!col("__ok")).drop("__ok")
              .write.mode("overwrite").parquet(s"$qd/batch_id=$batchId")
            flagged.filter(col("__ok")).drop("__ok")
          case None => batch.select(idCol, vecCol)
        }
        val b = Materialize(gated)
        val bCells = Materialize(Similarity.assignCells(b, idCol, vecCol, cent))
        // probe side = persisted index ∪ this batch (within-batch pairs
        // emit here; earlier batches are already in the index)
        val all = spark.read
          .parquet(cellsDir(indexDir))
          .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("cell"))
          .unionByName(
            bCells.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("cell")))
        val qCells = Similarity.probeCells(b, cent, idCol, vecCol, nprobe)
        all
          .join(broadcast(qCells), Seq("cell"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .filter(Similarity.cosine(col("qv"), col("cv")) >= threshold)
          .select(
            least(col("query_id"), col("neighbor_id")).as("id_a"),
            greatest(col("query_id"), col("neighbor_id")).as("id_b"))
          .distinct()
          .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
        bCells
          .write.mode("overwrite").partitionBy("cell")
          .parquet(s"${cellsDir(indexDir)}/batch_id=$batchId")
        ()
      }
      .start()
}

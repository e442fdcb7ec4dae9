package graft.streaming

import graft.operators.{Clustering, Materialize}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Online (mini-batch) k-means at ingest — the streaming twin of
  * [[graft.operators.Clustering]]: the model lives as a PERSISTED
  * sufficient-statistics table (`indexDir/stats/batch_id=<id>` rows of
  * (cluster, pos, s, n) BIGINT component sums), never as mutable float
  * centroids. Each micro-batch
  *
  *   1. folds the stats partitions into current centroids (exact
  *      BIGINT sums across batches — order-independent, so a replayed
  *      or reordered history yields bit-identical centroids — finished
  *      by one IEEE division per component; k·d rows to the driver),
  *   2. assigns ONLY its own vectors (a pure codegen projection with
  *      the centroids as plan literals — the batch never joins or
  *      shuffles), landing assignments under `assignDir/batch_id=<id>`,
  *   3. appends its own (cluster, pos, s, n) delta as a NEW stats
  *      partition — the next batch's centroids reflect this one.
  *
  * Per-batch work is O(batch·k·d) compute + a k·d-per-batch metadata
  * read; the corpus is never re-read or re-clustered. Exactly-once by
  * the house recipe: a replayed batch OVERWRITES its own
  * `batch_id=<id>` partitions (assignments and delta both), so retries
  * never double-count a batch in the running sums. Freeze the model by
  * passing `updateStats = false` — pure streaming INFERENCE against the
  * seed centroids (the classifier-at-ingest shape when seeded from
  * [[graft.operators.Clustering.centroids]] per-label means).
  *
  * Pinned in StreamingSpec: frozen-model streaming assignment equals
  * the batch [[Clustering.assignTo]] over the concatenated arrivals;
  * the evolved stats equal the exact per-batch recomputation; replay
  * changes nothing.
  */
object ClusterStreams {

  private def statsDir(indexDir: String) = s"$indexDir/stats"

  /** Persist the seed model: k-means over the seed corpus, then the
    * final assignment's exact component sums as `batch_id=-1`.
    */
  def seedModel(
      seedVecs: DataFrame,
      idCol: String,
      vecCol: String,
      indexDir: String,
      k: Int,
      iters: Int
  ): Unit = {
    val assigned = Clustering
      .kmeans(seedVecs, idCol, vecCol, k, iters)
      .join(seedVecs, Seq(idCol))
    statsOf(assigned, vecCol)
      .write.mode("overwrite")
      .parquet(s"${statsDir(indexDir)}/batch_id=-1")
  }

  /** (cluster, pos, s, n) exact component sums of an assigned frame. */
  private def statsOf(assigned: DataFrame, vecCol: String): DataFrame =
    assigned
      .select(col("cluster"), posexplode(Clustering.quantized(col(vecCol))).as(Seq("pos", "v")))
      .groupBy("cluster", "pos")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))

  /** Fold every stats partition into current centroids. The scan is
    * k·d rows per batch landed — metadata, not data.
    */
  def currentCentroids(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Seq[(Int, Array[Double])] =
    spark.read
      .parquet(statsDir(indexDir))
      .groupBy("cluster", "pos")
      .agg(sum("s").as("s"), sum("n").as("n"))
      .collect()
      .groupBy(_.getInt(0))
      .toSeq
      .map { case (c, rows) =>
        c -> rows.sortBy(_.getInt(1)).map(r => r.getLong(2).toDouble / r.getLong(3)).toArray
      }
      .sortBy(_._1)

  /** Start the online-clustering sink over a streaming (idCol, vecCol)
    * source. Assignments land under `assignDir/batch_id=<id>`; with
    * `updateStats` the batch's sums land as a new stats partition so
    * the model evolves mini-batch-style. Seed with [[seedModel]].
    */
  def incrementalAssign(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      assignDir: String,
      indexDir: String,
      updateStats: Boolean = true
  ): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val cents = currentCentroids(spark, indexDir)
        val assigned = Materialize(
          Clustering.assignTo(batch.select(idCol, vecCol), vecCol, cents, "cluster"))
        assigned
          .select(col(idCol), col("cluster"))
          .write.mode("overwrite").parquet(s"$assignDir/batch_id=$batchId")
        if (updateStats)
          statsOf(assigned, vecCol)
            .write.mode("overwrite")
            .parquet(s"${statsDir(indexDir)}/batch_id=$batchId")
        ()
      }
      .start()
}

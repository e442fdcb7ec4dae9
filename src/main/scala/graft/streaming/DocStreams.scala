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

  // ---- per-source dedup telemetry stream (q127's ingest twin) ----

  private def hashesDir(indexDir: String) = s"$indexDir/hashes"

  /** Seed the telemetry indexes: the near-dup index ([[seedIndex]])
    * plus a content-hash index (idCol, sha256(text)) under
    * `batch_id=-1` for the exact stage.
    */
  def seedTelemetryIndex(
      seedDocs: DataFrame,
      idCol: String,
      textCol: String,
      indexDir: String,
      n: Int = 3,
      k: Int = 64,
      bands: Int = 32
  ): Unit = {
    import org.apache.spark.sql.functions._
    seedIndex(seedDocs, idCol, textCol, indexDir, n, k, bands)
    seedDocs.select(col(idCol), sha2(col(textCol), 256).as("ck"))
      .write.mode("overwrite").parquet(s"${hashesDir(indexDir)}/batch_id=-1")
  }

  /** Ingest-time per-source dedup telemetry — the streaming twin of
    * the q127 funnel's exact and near stages: each micro-batch (1)
    * marks exact losers (content hash already in the index, or
    * repeated within the batch with a smaller id), (2) probes the
    * persisted near-dup index with the exact SURVIVORS only (the
    * funnel's stage-sequential rule), (3) writes one per-source
    * counter row set under `telemetryDir/batch_id=<id>` (docs_in /
    * n_exact_dup / n_near_dup / n_survivors), and (4) appends the
    * survivors' index rows and ALL batch hashes — so the running
    * telemetry after N batches equals the one-shot funnel over seed ∪
    * batches when ids increase with ingest order. Per-batch cost is
    * O(|batch| + collisions); the corpus is never re-read. Same
    * batch-partition overwrite idempotence as [[incrementalDedup]].
    */
  def incrementalDedupTelemetry(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      telemetryDir: String,
      indexDir: String,
      n: Int = 3,
      k: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.5
  ): StreamingQuery = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val withCk = Materialize(batch.select(idCol, textCol, sourceCol)
          .withColumn("ck", sha2(col(textCol), 256)))
        val idxHashes = spark.read.parquet(hashesDir(indexDir)).select(col("ck")).distinct()
        val inBatchDup = withCk
          .withColumn("rk", row_number().over(Window.partitionBy(col("ck")).orderBy(col(idCol))))
          .filter(col("rk") > 1).select(col(idCol))
        val inIdxDup = withCk.join(idxHashes, Seq("ck"), "left_semi").select(col(idCol))
        val exactLosers = Materialize(inBatchDup.unionByName(inIdxDup).distinct())
        val surv   = Materialize(withCk.join(exactLosers, Seq(idCol), "left_anti"))
        val sSets  = Materialize(Dedup.nearDupSets(surv, idCol, textCol, n))
        val sBands = Materialize(Dedup.nearDupBandRows(sSets, idCol, k, bands))
        val idxSets  = spark.read.parquet(setsDir(indexDir)).select(idCol, "shingle_set")
        val idxBands = spark.read.parquet(bandsDir(indexDir)).select(idCol, "band", "h")
        val pairs = Materialize(Dedup.incrementalNearDupPairsIndexed(
          idxSets, idxBands, sSets, sBands, idCol, threshold))
        // batch-side loser: the later doc of a batch-batch pair (id_b),
        // or a batch doc paired with an index doc on either side
        val batchIds = surv.select(col(idCol).as("bid"))
        val losersB = pairs
          .join(batchIds, pairs("id_b") === batchIds("bid"), "left_semi")
          .select(col("id_b").as(idCol))
        val losersA = pairs
          .join(batchIds, pairs("id_a") === batchIds("bid"), "left_semi")
          .join(batchIds.withColumnRenamed("bid", "bid2"),
            pairs("id_b") === col("bid2"), "left_anti")
          .select(col("id_a").as(idCol))
        val nearLosers = Materialize(losersB.unionByName(losersA).distinct())
        withCk
          .join(exactLosers.withColumn("st_e", lit(1)), Seq(idCol), "left")
          .join(nearLosers.withColumn("st_n", lit(1)), Seq(idCol), "left")
          .groupBy(col(sourceCol))
          .agg(
            count(lit(1)).as("docs_in"),
            sum(coalesce(col("st_e"), lit(0))).cast("long").as("n_exact_dup"),
            sum(coalesce(col("st_n"), lit(0))).cast("long").as("n_near_dup"))
          .withColumn("n_survivors",
            col("docs_in") - col("n_exact_dup") - col("n_near_dup"))
          .write.mode("overwrite").parquet(s"$telemetryDir/batch_id=$batchId")
        sSets.write.mode("overwrite").parquet(s"${setsDir(indexDir)}/batch_id=$batchId")
        sBands.write.mode("overwrite").parquet(s"${bandsDir(indexDir)}/batch_id=$batchId")
        withCk.select(col(idCol), col("ck"))
          .write.mode("overwrite").parquet(s"${hashesDir(indexDir)}/batch_id=$batchId")
        ()
      }
      .start()
  }

  /** Running telemetry totals per source across every ingested batch. */
  def dedupTelemetry(spark: SparkSession, telemetryDir: String, sourceCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(telemetryDir)
      .groupBy(col(sourceCol))
      .agg(
        sum("docs_in").as("docs_in"),
        sum("n_exact_dup").as("n_exact_dup"),
        sum("n_near_dup").as("n_near_dup"),
        sum("n_survivors").as("n_survivors"))
  }

  // ---- span decontamination at ingest (the q151 twin) ----

  private def evalGramsDir(indexDir: String) = s"$indexDir/eval_grams"

  /** Persist the eval suite's distinct 8-gram set ONCE (eval suites are
    * fixed at registration time). Every ingest batch probes this —
    * the eval docs are never re-shingled.
    */
  def seedEvalGrams(evalDocs: DataFrame, textCol: String, indexDir: String): Unit = {
    import org.apache.spark.sql.functions._
    evalDocs
      .select(expr(s"filter(split($textCol, '\\\\s+'), x -> x <> '')").as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 7), i -> array_join(slice(toks, i, 8), ' '))"))
        .as("g"))
      .distinct()
      .write.mode("overwrite").parquet(evalGramsDir(indexDir))
  }

  /** Start the span-scrub sink: each micro-batch cuts exactly the
    * token spans covered by eval 8-grams from its OWN documents (the
    * q151 surgery at ingest — contaminated quotes never reach the
    * curated store, and partially-contaminated docs keep their clean
    * remainder). Cleaned docs land under `cleanDir/batch_id=<id>`
    * with (idCol, n_tokens, n_removed, clean_text); replay overwrites
    * the batch's own partition. Per-batch cost: the batch's own
    * shingling + a broadcast probe of the persisted gram set —
    * the eval suite and earlier batches are never re-read.
    */
  def incrementalSpanScrub(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cleanDir: String,
      indexDir: String
  ): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions._
        val ev = broadcast(spark.read.parquet(evalGramsDir(indexDir)))
        val d = Materialize(batch.select(col(idCol),
          expr(s"filter(split($textCol, '\\\\s+'), x -> x <> '')").as("toks")))
        val hits = d
          .filter(size(col("toks")) >= 8)
          .select(col(idCol), explode(expr(
            "transform(sequence(1, size(toks) - 7), " +
              "i -> struct(i AS gpos, array_join(slice(toks, i, 8), ' ') AS g))")).as("s"))
          .select(col(idCol), col("s.gpos").as("gpos"), col("s.g").as("g"))
          .join(ev, Seq("g"))
        val cov = hits
          .select(col(idCol), explode(expr("sequence(gpos, gpos + 7)")).as("pos"))
          .distinct()
          .withColumn("covered", lit(1))
        d.select(col(idCol), posexplode(col("toks")).as(Seq("p0", "token")))
          .withColumn("pos", col("p0") + 1)
          .join(cov, Seq(idCol, "pos"), "left")
          .groupBy(col(idCol))
          .agg(
            count(lit(1)).as("n_tokens"),
            sum(when(col("covered").isNotNull, 1L).otherwise(0L)).as("n_removed"),
            array_join(
              transform(
                array_sort(collect_list(when(col("covered").isNull,
                  struct(col("pos"), col("token"))))),
                x => x.getField("token")),
              " ").as("clean_text"))
          .write.mode("overwrite").parquet(s"$cleanDir/batch_id=$batchId")
        ()
      }
      .start()

  // ---- per-doc n-gram novelty at ingest (the q162 twin) ----

  private def noveltyGramsDir(indexDir: String) = s"$indexDir/novelty_grams"

  /** Seed the novelty gram set: the existing corpus's distinct 8-grams
    * as `batch_id=-1` — shingled ONCE, like every other persisted index
    * here. Seed with an empty slice of the schema to start from nothing.
    */
  def seedNoveltyGrams(seedDocs: DataFrame, textCol: String, indexDir: String): Unit = {
    import org.apache.spark.sql.functions._
    seedDocs
      .select(explode(Dedup.shingles(split(col(textCol), "\\s+"), 8)).as("g"))
      .distinct()
      .write.mode("overwrite").parquet(s"${noveltyGramsDir(indexDir)}/batch_id=-1")
  }

  /** Per-document novelty at ingest (q162's signal, incremental): each
    * micro-batch shingles ONLY its own docs, anti-joins the persisted
    * distinct-gram set to find never-seen grams, assigns within-batch
    * ownership by min doc_id (q162's rule scoped to the arrivals), and
    * emits (doc_id, n_grams, n_novel, novelty_frac) — the "is this feed
    * still adding new text" telemetry, per batch, without ever
    * re-shingling the corpus. The batch's fresh grams then land as a
    * new index partition, so the gram set stays exactly the corpus's
    * distinct-gram set, partitioned by first-arrival batch. Per-batch
    * cost: the batch's shingle pass + one gram-keyed anti-join probe —
    * O(batch), corpus never re-read. Replay overwrites the batch's own
    * telemetry and gram partitions, and the probe EXCLUDES the batch's
    * own partition so a replayed batch scores as if running first-time.
    * When batches arrive doc_id-monotone, the per-batch emissions union
    * to the batch q162 over the same corpus — pinned in StreamingSpec.
    */
  def incrementalNovelty(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      telemetryDir: String,
      indexDir: String
  ): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions._
        val seen = spark.read
          .parquet(noveltyGramsDir(indexDir))
          .filter(col("batch_id") =!= batchId) // replay: ignore own leftovers
          .select(col("g"))
        val grams = Materialize(
          batch.select(col(idCol).as("doc_id"),
            explode(Dedup.shingles(split(col(textCol), "\\s+"), 8)).as("g")))
        val fresh = Materialize(grams.join(seen, Seq("g"), "left_anti"))
        val own   = fresh.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
        val per = grams
          .join(own, Seq("g"), "left")
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_grams"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
        batch
          .select(col(idCol).as("doc_id")).distinct()
          .join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_grams"), lit(0L)).as("n_grams"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"),
            when(col("n_grams").isNotNull,
              col("n_novel").cast("double") / col("n_grams")).as("novelty_frac"))
          .write.mode("overwrite").parquet(s"$telemetryDir/batch_id=$batchId")
        fresh
          .select("g").distinct()
          .write.mode("overwrite").parquet(s"${noveltyGramsDir(indexDir)}/batch_id=$batchId")
        ()
      }
      .start()

  // ---- distribution-drift telemetry at ingest (the q145 twin) ----

  private def driftModelDir(indexDir: String) = s"$indexDir/model"

  /** Seed the drift model: the corpus unigram token counts as
    * `batch_id=-1`. The model is a (token, c) BIGINT ledger — the same
    * sufficient-statistics idea as [[graft.streaming.ClusterStreams]]:
    * per-batch delta partitions whose fold is exact integer addition,
    * replay-safe and order-independent.
    */
  def seedDriftModel(seedDocs: DataFrame, textCol: String, indexDir: String): Unit = {
    import org.apache.spark.sql.functions._
    seedDocs
      .select(explode(split(col(textCol), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("c"))
      .write.mode("overwrite").parquet(s"${driftModelDir(indexDir)}/batch_id=-1")
  }

  /** Start the drift-telemetry sink: each micro-batch scores its OWN
    * per-source unigram distribution as KL(source ‖ corpus-so-far) in
    * bits — a spiking source (new crawl snapshot, format change) shows
    * up in the batch it arrives in, not after the next full-corpus
    * sweep. The reference distribution INCLUDES the current batch
    * (matching q145, where every source is part of the corpus — and
    * keeping every batch token's model probability non-zero), then the
    * batch's (token, c) delta lands as a new model partition so the
    * ledger evolves. Per-batch cost: the batch's own tokenize + a
    * vocab-sized model fold; the corpus text is never re-read. Same
    * decimal-sum/round-6 exactness discipline as q145, so the
    * telemetry is deterministic under replay (which OVERWRITES the
    * batch's own partitions — the house exactly-once recipe).
    */
  def incrementalDrift(
      docs: DataFrame,
      textCol: String,
      sourceCol: String,
      telemetryDir: String,
      indexDir: String,
      updateModel: Boolean = true
  ): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.types.DecimalType
        val tokB = graft.operators.Materialize(
          batch
            .select(col(sourceCol).as("source"),
              explode(split(col(textCol), "\\s+")).as("token"))
            .filter(col("token") =!= ""))
        val delta = tokB.groupBy("token").agg(count(lit(1)).as("c"))
        val eff = spark.read
          .parquet(driftModelDir(indexDir))
          .select(col("token"), col("c")) // drop the batch_id partition col
          .unionByName(delta)
          .groupBy("token").agg(sum("c").as("c"))
        val total = eff.agg(sum("c")).head().getLong(0) // one driver scalar
        val tf    = tokB.groupBy("source", "token").agg(count(lit(1)).as("tf"))
        val nSrc  = tokB.groupBy("source").agg(count(lit(1)).as("n_src"))
        tf.join(eff, Seq("token"))
          .join(nSrc, Seq("source"))
          .select(col("source"), col("n_src"),
            ((col("tf") / col("n_src").cast("double")) *
              log((col("tf") / col("n_src").cast("double")) /
                (col("c") / lit(total.toDouble))))
              .cast(DecimalType(18, 12)).as("term"))
          .groupBy(col("source"), col("n_src"))
          .agg(sum(col("term")).as("s"))
          .select(col("source"), col("n_src").as("n_tokens"),
            round(col("s").cast("double") / lit(math.log(2.0)), 6).as("kl_bits"))
          // batch_id rides as the hive partition dir (like every other
          // telemetry/index ledger here), not as a data column
          .write.mode("overwrite").parquet(s"$telemetryDir/batch_id=$batchId")
        if (updateModel)
          delta.write.mode("overwrite")
            .parquet(s"${driftModelDir(indexDir)}/batch_id=$batchId")
        ()
      }
      .start()
}

package graft.tools

import scala.collection.mutable.ArrayBuffer

import graft.{Engine, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Collects per-task wall-clock durations so a skew run can report the
  * actual straggler delta (max vs median task), not just total time.
  */
private final class TaskTimeListener extends SparkListener {
  /** (stageId, taskDurationMs, shuffleRecordsRead) per finished task. */
  private val buf = ArrayBuffer.empty[(Int, Long, Long)]
  override def onTaskEnd(end: SparkListenerTaskEnd): Unit =
    synchronized {
      if (end.taskInfo != null) {
        val recs =
          if (end.taskMetrics != null) end.taskMetrics.shuffleReadMetrics.recordsRead
          else 0L
        buf += ((end.stageId, end.taskInfo.duration, recs))
      }
    }
  def reset(): Unit = synchronized(buf.clear())
  def snapshot(): Vector[(Int, Long, Long)] = synchronized(buf.toVector)

  /** Tasks of the stage that read the most shuffle records — for a
    * shuffle join that is the reduce stage whose straggler we care
    * about; map/scan stages would otherwise dilute the median.
    */
  def reduceStage(): Vector[(Long, Long)] = {
    val byStage = snapshot().groupBy(_._1).map { case (_, v) => v.map(t => (t._2, t._3)) }
    if (byStage.isEmpty) Vector.empty else byStage.maxBy(_.map(_._2).sum)
  }
}

/** Scale-up smoke: derive a 10x corpus from sf0.1 (each document /
  * embedding duplicated with fresh ids — a duplicate-heavy corpus,
  * which is exactly what a real dedup pass faces), write it to /tmp,
  * and run the novel operator families against it end-to-end.
  *
  * The point is not absolute seconds (this VM has stall waves) but
  * SHAPE: candidate counts and cluster sizes must grow like the
  * algorithm predicts (bucketed candidates ~linear in dup mass, never
  * quadratic in corpus size), connected components must still converge
  * in a handful of rounds on 10x the edges, and the blocked exact
  * all-pairs must chew n² work without any single-task blowup.
  * Results are summarized in SCALE.md.
  * `sbt "runMain graft.tools.ScaleSmoke [factor]"`.
  */
object ScaleSmoke {

  /** Planted-skew benchmark: amplify sf0.1 events and reassign half of
    * the rows to ONE user_id, then join against a 100-row user dim
    * unsalted vs via [[graft.operators.Salt.saltedJoin]]. AQE and
    * broadcast are disabled so the raw shuffle-join skew is visible:
    * unsalted, one reduce task owns half the corpus; salted, the hot
    * key spreads over `factor` tasks. The straggler delta (max vs
    * median task duration, from [[TaskTimeListener]]) is the number
    * that matters — at 100 TB that ratio is the difference between a
    * stage finishing and a stage pinned on one executor.
    * `sbt "runMain graft.tools.ScaleSmoke skew"`; results → SCALE.md.
    */
  private[tools] def skewBench(spark: SparkSession): Unit = {
    // Isolate the raw shuffle-join behavior: no broadcast (the dim is
    // tiny and would otherwise sidestep the shuffle entirely), no AQE
    // (its skew-join splitter is exactly the mitigation we are
    // comparing against, and its partition coalescing blurs task
    // boundaries). 32 shuffle partitions regardless of core count so
    // the salted/unsalted partition layout is the cluster-shaped one.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    val src  = "/root/testdata/sf0.1"
    val mult = 50
    val events = Tables
      .events(spark, src)
      .select(col("event_id"), col("user_id"), col("value"))
      // 64 upstream tasks, as a real cluster would have. This is
      // LOAD-BEARING for the AQE arm: OptimizeSkewedJoin splits a
      // skewed reduce partition at MAP-OUTPUT granularity, and this
      // corpus is one small parquet file = ONE map task without the
      // repartition — a skewed partition fed by a single mapper
      // cannot be split at all (verified: no SortMergeJoin(skew=true)
      // marker appears). Salting has no such dependency.
      .repartition(64)
      .withColumn("copy", explode(lit((0 until mult).toArray)))
      .withColumn("event_id", col("event_id") * mult + col("copy"))
      // Plant the skew: ~50% of rows land on user_id 1, the rest
      // spread uniformly over the 100 dim keys.
      .withColumn(
        "user_id",
        when(pmod(xxhash64(col("event_id")), lit(2)) === 0, lit(1L))
          .otherwise(pmod(xxhash64(col("event_id"), lit(7)), lit(100)))
      )
      .select("event_id", "user_id", "value")
    val users = spark
      .range(0, 100)
      .select(col("id").as("user_id"), (col("id") * lit(7L)).as("weight"))

    val listener = new TaskTimeListener
    spark.sparkContext.addSparkListener(listener)
    // Best-of-3: this VM has stall waves; per-task ROW counts are
    // deterministic but durations are not, so keep the cleanest run.
    // `aqeSkew` turns AQE back on with its skew-join splitter armed
    // (thresholds lowered so the splitter triggers at this corpus
    // size the way it would on real-size partitions at 100 TB);
    // coalescing stays off so task boundaries remain comparable.
    def run(name: String, aqeSkew: Boolean = false)(df: => DataFrame): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", aqeSkew.toString)
      if (aqeSkew) {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512k")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      }
      // Materialize through the noop sink, NOT count(): under count,
      // column pruning drops the projected values so the events side
      // shuffles only its (heavily RLE-compressed, all-equal) hot key
      // — the skewed partition lands UNDER the skew threshold and the
      // AQE arm silently never splits. The noop write ships the real
      // payload bytes, like a real downstream consumer.
      val n = df.count() // row count for the report, outside the timed runs
      val attempts = (1 to 3).map { _ =>
        listener.reset()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // listener bus is async; let task-end events drain
        (secs, listener.reduceStage())
      }
      val (secs, tasks) = attempts.minBy(_._1)
      val durs  = tasks.map(_._1).sorted
      val recs  = tasks.map(_._2).sorted
      def medOf(v: Vector[Long]) = if (v.nonEmpty) v(v.size / 2) else 0L
      val (dMax, dMed) = (durs.lastOption.getOrElse(0L), medOf(durs))
      val (rMax, rMed) = (recs.lastOption.getOrElse(0L), medOf(recs))
      def ratio(a: Long, b: Long) = if (b > 0) a.toDouble / b else 0.0
      println(
        f"SKEW $name%-24s total=$secs%6.2f s  rows=$n%9d  joinTasks=${tasks.size}%3d  " +
          f"taskRows max/med=$rMax%9d/$rMed%7d (${ratio(rMax, rMed)}%5.1fx)  " +
          f"taskTime max/med=$dMax%6d/$dMed%5d ms (${ratio(dMax, dMed)}%4.1fx)"
      )
    }

    run("unsalted join") {
      events.join(users, Seq("user_id")).select(col("value") * col("weight"))
    }
    // The built-in mitigation: AQE's skew-join splitter on the SAME
    // unsalted join — the crossover a real user needs to see before
    // reaching for salt (OptimizeSkewedJoin splits the oversized
    // partition into advisory-size chunks and replicates the matching
    // side, which is salting done for you, at runtime, only when
    // needed).
    run("unsalted join + AQE skew", aqeSkew = true) {
      events.join(users, Seq("user_id")).select(col("value") * col("weight"))
    }
    // factor=64 > the 32 shuffle partitions: with factor==partitions,
    // balls-in-bins collisions of the 32 hot (key,salt) combos over 32
    // partitions leave ~4x residual row skew; 64 finer-grained combos
    // smooth it to ~2x.
    run("salted join (f=64)") {
      graft.operators.Salt
        .saltedJoin(events, users, "user_id", entropy = col("event_id"), factor = 64)
        .select(col("value") * col("weight"))
    }
    spark.sparkContext.removeSparkListener(listener)
  }

  /** PQ compression evidence: measured parquet bytes of the raw
    * embedding column vs the PQ code column (array<int> and the
    * 4-bit-packed single INT form — ksub=16 → 4 bits/code × m=8 = one
    * 32-bit word per vector), plus the ADC scan vs brute-force scan
    * time over the same top-k. Results pasted into SCALE.md.
    */
  private[tools] def pqBytes(spark: SparkSession): Unit = {
    import graft.operators.{Pq, Similarity}
    val src = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, src)
    val cb  = Pq.train(emb, "vec_id", "embedding", m = 8, ksub = 16, dsub = 8, seed = 42L)
    val out = java.nio.file.Paths
      .get(System.getProperty("java.io.tmpdir"), "graft_pq_bytes").toString
    val t0 = System.nanoTime()
    emb.select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$out/raw")
    val tRaw = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val codes = Pq.encodeCorpus(emb, "vec_id", "embedding", cb)
    codes.write.mode("overwrite").parquet(s"$out/codes")
    val tCodes = (System.nanoTime() - t1) / 1e9
    // 4-bit pack: 8 codes of [0,16) in one INT — the honest minimal layout
    val packed = codes.select(col("id"),
      (0 until 8).map(j =>
        shiftleft(element_at(col("codes"), j + 1).cast("int"), 4 * j))
        .reduce((a, b) => a.bitwiseOR(b)).as("packed"))
    packed.write.mode("overwrite").parquet(s"$out/packed")
    def bytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration).getContentSummary(path).getLength
    }
    val (bRaw, bCodes, bPacked) = (bytes(s"$out/raw"), bytes(s"$out/codes"), bytes(s"$out/packed"))
    val n = spark.read.parquet(s"$out/raw").count()
    println(f"PQBYTES rows=$n raw=${bRaw}B codes=${bCodes}B packed=${bPacked}B " +
      f"ratio_codes=${bRaw.toDouble / bCodes}%.1f ratio_packed=${bRaw.toDouble / bPacked}%.1f " +
      f"write_raw=$tRaw%.1f s write_codes=$tCodes%.1f s")
    // scan cost: ADC top-k over persisted codes vs brute force over raw
    val queries = emb.filter(col("vec_id") < 8)
    def time(f: => Long): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    val tAdc = time(Pq.topK(spark.read.parquet(s"$out/codes"), queries,
      "vec_id", "embedding", k = 10, cb).count())
    val tBrute = time(Similarity.bruteForceTopK(
      spark.read.parquet(s"$out/raw"), queries, "vec_id", "embedding", k = 10).count())
    println(f"PQSCAN adc=$tAdc%.2f s brute=$tBrute%.2f s (sf0.1, 8 queries, k=10)")
  }

  /** File-granular COW evidence at 10×: a 1.5M-row orders table laid
    * out in ~64 key-range files; a DELETE touching one range must
    * rewrite ~1 file and byte-copy the rest, and the same op against a
    * full-rewrite reference shows the decode/shuffle/encode saved.
    */
  def dmlBench(spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src    = "/root/testdata/sf0.1"
    val factor = 100
    val copies = explode(lit((0 until factor).toArray)).as("copy")
    // full-width lineitem (16 columns, 60M rows at 100x): decode+encode
    // dominates the DML cost, as at a real table's width — smaller
    // factors are job-launch-latency bound and blur the comparison
    val li = Tables.lineitem(spark, src)
    val li10 = li
      .select(col("*"), copies)
      .select((col("l_orderkey") + col("copy") * lit(100000000L)).as("l_orderkey") +:
        li.columns.filterNot(_ == "l_orderkey").map(col): _*)
    val whRoot = java.nio.file.Files.createTempDirectory("graft_dml10").toString
    val wh = new graft.sources.Warehouse(spark, whRoot)
    val prevMax = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", 500000L)
    try wh.createOrReplace("gold", "ord10",
      li10.repartitionByRange(8, $"l_orderkey").sortWithinPartitions($"l_orderkey"))
    finally prevMax match {
      case Some(v) => spark.conf.set("spark.sql.files.maxRecordsPerFile", v)
      case None    => spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }
    val total    = wh.table("gold", "ord10").count()
    val filesBefore = wh.table("gold", "ord10").inputFiles.map(_.split('/').last).toSet
    def time[A](f: => A): (A, Double) = {
      val t = System.nanoTime(); val r = f; (r, (System.nanoTime() - t) / 1e9)
    }
    // warm the write/DML path first (JIT + codegen), outside the timings
    wh.delete("gold", "ord10", $"l_orderkey" === -1L)
    val (deleted, tCow) = time(wh.delete("gold", "ord10", $"l_orderkey" < 20000L))
    val filesAfter = wh.table("gold", "ord10").inputFiles.map(_.split('/').last).toSet
    val carried    = (filesBefore intersect filesAfter).size
    println(f"DMLCOW rows=$total files=${filesBefore.size} deleted=$deleted " +
      f"carried=$carried rewritten=${filesBefore.size - carried} t=$tCow%.2f s")
    // second clustered delete, fully warm (copy 1's first key range)
    val (d2, tCow2) = time(wh.delete("gold", "ord10",
      $"l_orderkey" >= 100000000L && $"l_orderkey" < 100020000L))
    println(f"DMLCOW2 deleted=$d2 t=$tCow2%.2f s (warm, one range file)")
    // probe cost diagnostics: what does each candidate strategy pay?
    val t0 = wh.table("gold", "ord10")
    val (_, tProbeFull) = time(
      t0.filter($"l_orderkey" === -1L)
        .select(org.apache.spark.sql.functions.input_file_name()).distinct().count())
    val (_, tProbeLimit) = time(t0.filter($"l_orderkey" === -1L).limit(1).isEmpty)
    println(f"DMLPROBE no-match: distinct-files=$tProbeFull%.2f s limit1=$tProbeLimit%.2f s")
    // full-rewrite reference: what the pre-COW path paid for the same op
    val (_, tFull) = time {
      wh.createOrReplace("gold", "ord10_full",
        wh.table("gold", "ord10").filter(!($"l_orderkey" < 40000L)))
    }
    println(f"DMLFULL same-table full rewrite of survivors t=$tFull%.2f s " +
      f"(COW saved ${100 * (1 - tCow2 / tFull)}%.0f%% if layout clusters the predicate)")
    // merge-on-read evidence on the same table: the same delete shapes
    // WITHOUT any rewrite. A clustered range (COW's best case) and a
    // scattered predicate touching every file (COW's worst case — it
    // degenerates to the full rewrite above) both commit in
    // probe+sidecar time; then the read-side anti-join overhead and
    // the REORG fold close the loop.
    val (d3, tMor) = time(wh.deleteMor("gold", "ord10",
      $"l_orderkey" >= 200000000L && $"l_orderkey" < 200020000L))
    println(f"DMLMOR clustered deleted=$d3 t=$tMor%.2f s (same shape COW: $tCow2%.2f s)")
    // read with tombstones CLUSTERED in one file: the scan split means
    // 124 clean files count metadata-fast and only one file probes the
    // anti-join — near-raw cost
    val (nVis1, tRead1)  = time(wh.table("gold", "ord10").count())
    val (nRaw1, tRawRd1) = time(
      spark.read.parquet(wh.tablePath("gold", "ord10")).count())
    println(f"DMLMORREAD clustered-dv visible=$nVis1 t=$tRead1%.2f s " +
      f"raw=$nRaw1 t=$tRawRd1%.2f s (1 of ${filesBefore.size} files probes)")
    val (d4, tMorScat) = time(
      wh.deleteMor("gold", "ord10", $"l_orderkey" % 100000L === 7L))
    println(f"DMLMOR scattered deleted=$d4 t=$tMorScat%.2f s " +
      f"(COW on an every-file predicate pays the full rewrite: $tFull%.2f s)")
    // worst-case read: scattered tombstones put every file in the
    // dirty branch — the probe runs per row table-wide, which is the
    // gauge that says REORG now
    val (nVis2, tRead2) = time(wh.table("gold", "ord10").count())
    println(f"DMLMORREAD scattered-dv visible=$nVis2 t=$tRead2%.2f s " +
      "(every file probes — the reorg trigger)")
    val (rw, tReorg) = time(wh.reorg("gold", "ord10"))
    val tPost = time(wh.table("gold", "ord10").count())._2
    println(f"DMLREORG rewrote=$rw files t=$tReorg%.2f s; post-reorg full count t=$tPost%.2f s")
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("dml")) {
      val spark = Engine.session(32)
      dmlBench(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("pq")) {
      val spark = Engine.session(8)
      pqBytes(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("skew")) {
      // 8 cores (not 32): the 32 reduce tasks then run in waves, so the
      // hot task's duration reflects its compute, not 32-thread CPU
      // contention on this single VM — closer to how a real cluster's
      // per-executor task slots behave.
      val spark = Engine.session(8)
      skewBench(spark)
      spark.stop()
      return
    }
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src    = "/root/testdata/sf0.1"
    val out = java.nio.file.Paths
      .get(System.getProperty("java.io.tmpdir"), s"graft_scale$factor").toString
    val spark  = Engine.session(32)
    import spark.implicits._

    val copies = explode(lit((0 until factor).toArray)).as("copy")
    Tables
      .documents(spark, src)
      .select(col("*"), copies)
      .select(
        (col("doc_id") + col("copy") * lit(10000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars")
      )
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    Tables
      .embeddings(spark, src)
      .select(col("*"), copies)
      .select(
        (col("vec_id") + col("copy") * lit(10000000L)).as("vec_id"),
        col("embedding"), col("label")
      )
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // events amplify with per-copy USER offsets: copies are new users
    // with intact timelines — the faithful scaling for user-keyed
    // sequence analytics (duplicating events under the same user would
    // corrupt every funnel/attribution semantics)
    Tables
      .events(spark, src)
      .select(col("*"), copies)
      .select(
        (col("event_id") + col("copy") * lit(100000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + col("copy") * lit(10000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val nDocs = spark.read.parquet(s"$out/documents.parquet").count()
    val nVecs = spark.read.parquet(s"$out/embeddings.parquet").count()
    val nEvs  = spark.read.parquet(s"$out/events.parquet").count()
    println(s"SCALE corpus: $nDocs docs, $nVecs vectors, $nEvs events (factor $factor)")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n  = f
      println(f"SCALE $name%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    time("q26 minhash+LSH pairs (banded, exact-verified)") {
      graft.QueriesDedup.q26_minhash_lsh_pairs(spark, out).count()
    }
    time("q28 simhash pairs (chunk-combination index)") {
      graft.operators.Dedup
        .simhashPairs(spark.read.parquet(s"$out/documents.parquet"), "doc_id", "text",
          n = 3, maxHamming = 3, chunks = 6)
        .count()
    }
    time("q29 blocked exact cosine pairs (n^2 dots)") {
      graft.QueriesDedup.q29_embedding_cosine_pairs(spark, out).count()
    }
    time("bucketed cosine pairs (LSH, dup regime t=0.9)") {
      graft.operators.Similarity
        .cosinePairsBucketed(spark.read.parquet(s"$out/embeddings.parquet"),
          "vec_id", "embedding", threshold = 0.9)
        .count()
    }
    time("q31 multi-table LSH topk (10 queries)") {
      graft.QueriesDedup.q31_ann_lsh_topk(spark, out).count()
    }
    time("q38 dedup clusters (connected components)") {
      graft.QueriesDedup.q38_dedup_clusters(spark, out).count()
    }
    time("star-contraction components (same near-dup edges)") {
      graft.operators.Graph
        .connectedComponentsStar(
          graft.operators.Dedup.ngramJaccardPairs(
            spark.read.parquet(s"$out/documents.parquet"), "doc_id", "text",
            n = 3, threshold = 0.5),
          "id_a", "id_b")
        .count()
    }
    time("q52 phash pairs (shared banded bit-sig index)") {
      graft.QueriesMedia.q52_phash_pairs(spark, out).count()
    }
    time("q56 phash pairs (collapse-first on unique payloads)") {
      graft.QueriesMedia.q56_phash_pairs_collapsed(spark, out).count()
    }
    time("q39 keep-one per cluster") {
      graft.QueriesDedup.q39_dedup_keep_one(spark, out).count()
    }
    time("q47 composed pipeline (collapse-first clusters)") {
      graft.QueriesDedup.q47_dedup_pipeline(spark, out).count()
    }
    time("q63 curation funnel (lang->sample->quality->rep->dedup)") {
      graft.QueriesCorpus.q63_curation_pipeline(spark, out).count()
    }
    time("q58 repetition metrics (bigram shuffles)") {
      graft.QueriesCorpus.q58_repetition(spark, out).count()
    }
    time("q115 substring pairs (8-token anchors, diag runs)") {
      graft.operators.Dedup
        .substringPairs(spark.read.parquet(s"$out/documents.parquet"),
          "doc_id", "text", k = 8)
        .count()
    }
    time("substring pairs + maxDf=64 stop-gram cap") {
      graft.operators.Dedup
        .substringPairs(spark.read.parquet(s"$out/documents.parquet"),
          "doc_id", "text", k = 8, maxDf = Some(64L))
        .count()
    }
    time("q127 dedup report (exact->near->substring funnel)") {
      graft.QueriesCorpus.q127_dedup_report(spark, out).count()
    }
    time("q126 tokenizer packing (BPE dict + shard cumsum)") {
      graft.QueriesCorpus.q126_tokenizer_packing(spark, out).count()
    }
    time("persisted IVF: build index (centroids + cell partitions)") {
      graft.operators.Similarity
        .ivfIndexWrite(spark.read.parquet(s"$out/embeddings.parquet"),
          "vec_id", "embedding", s"$out/ivf", nlist = 16)
      spark.read.parquet(s"$out/ivf/cells").count()
    }
    time("persisted IVF: probe 10 queries at nprobe=4/16") {
      graft.operators.Similarity
        .ivfTopKIndexed(spark,
          spark.read.parquet(s"$out/embeddings.parquet").filter(col("vec_id") < 10),
          "vec_id", "embedding", s"$out/ivf", k = 5, nprobe = 4)
        .count()
    }
    time("q138 kmeans (k=8, 2 Lloyd passes, literal-centroid assign)") {
      graft.operators.Clustering
        .kmeans(spark.read.parquet(s"$out/embeddings.parquet"),
          "vec_id", "embedding", k = 8, iters = 2)
        .count()
    }
    time("q139 semdedup (cluster-scoped cosine pairs, dup-heavy)") {
      graft.QueriesCorpus.q139_semdedup(spark, out).count()
    }
    time("q141 centroid classifier (train 80% + predict 20%)") {
      graft.QueriesCorpus.q141_centroid_classifier(spark, out).count()
    }
    time("q148 source report (one tf feeds bits+KL+dedup)") {
      graft.QueriesCorpus.q148_source_report(spark, out).count()
    }
    time("q155 ordered funnel (min-chained stage aggregations)") {
      graft.QueriesCorpus.q155_funnel(spark, out).count()
    }
    time("q159 attribution (one user-keyed sort, no self-join)") {
      graft.QueriesCorpus.q159_attribution(spark, out).count()
    }
    time("q160 daily anomaly (one groupBy + types-by-days window)") {
      graft.QueriesCorpus.q160_daily_anomaly(spark, out).count()
    }
    time("q162 ngram novelty (min-doc ownership, dup-heavy)") {
      // the 10-copy corpus is the worst case for novelty: every gram
      // has 10 claimants, so the ownership aggregate carries the full
      // collision mass — the point is that it stays an algebraic
      // min-aggregation, never a pair enumeration
      graft.QueriesCorpus.q162_ngram_novelty(spark, out).count()
    }
    time("q183 minhash calibration (candidates prop. to dup mass)") {
      // on the 10-copy corpus the candidate pairs are the dup families
      // (45 pairs per copied doc), so the calibration rollup's cost
      // tracks duplicate mass; the 16-component signature build stays
      // ONE doc-keyed aggregate no matter the corpus size
      graft.QueriesDedup.q183_minhash_calibration(spark, out).count()
    }
    time("q191 split leakage (train grams deduped, shuffle semi-join)") {
      // the 10-copy corpus leaks maximally: every copied doc shares
      // all grams with its train-split siblings — eval probes the
      // deduped gram set, neither side broadcast-materializes
      graft.QueriesCorpus.q191_split_leakage(spark, out).count()
    }
    time("q184 burstiness (one user-keyed window over 10x events)") {
      // copies are NEW users with intact timelines, so gap moments
      // stay per-user-slice work — 10x users, same per-key state
      graft.QueriesCorpus.q184_burstiness(spark, out).count()
    }
    time("q198 bm25 (posting-list rows only, stats broadcast)") {
      graft.QueriesText.q198_bm25(spark, out).count()
    }
    spark.stop()
  }
}

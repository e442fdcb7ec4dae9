package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  private def eventsAsMicros = {
    // the shared events accessor already converts nanos→micros
    Tables.events(spark, sfDir)
  }

  test("streaming windowed counts equal the batch day aggregation") {
    val dir = Files.createTempDirectory("graft_stream").toString
    eventsAsMicros.write.parquet(s"$dir/in")

    val stream = EventStreams.windowedCounts(
      EventStreams.readEventStream(spark, s"$dir/in"),
      windowLength = "1 day",
      watermarkDelay = "1 hour"
    )
    val got = EventStreams
      .runBounded(stream, "win_counts", OutputMode.Complete())
      .select("day", "event_type", "n")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

    val expected = Queries
      .q19_events_day_agg(spark, sfDir)
      .select("day", "event_type", "n")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == expected)
  }

  test("watermarked stream dedup: a replayed input file changes nothing downstream") {
    val dir = Files.createTempDirectory("graft_stream3").toString
    // materialize ONE deterministic subset, then replay exactly that file
    // (an unordered limit() can pick different rows per action)
    eventsAsMicros.limit(500).write.parquet(s"$dir/stage")
    val evs = spark.read.parquet(s"$dir/stage")
    evs.write.parquet(s"$dir/in")
    evs.write.mode("append").parquet(s"$dir/in") // at-least-once replay: every event twice

    val stream = EventStreams
      .dedupedEvents(EventStreams.readEventStream(spark, s"$dir/in"))
      .groupBy("event_type")
      .count()
    val got = EventStreams
      .runBounded(stream, "dedup_counts", OutputMode.Complete())
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

    val expected = evs.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, "dedup must collapse the replayed copy exactly")
  }

  test("stream-static enrichment equals the equivalent batch broadcast join") {
    val dir = Files.createTempDirectory("graft_stream4").toString
    eventsAsMicros.limit(1000).write.parquet(s"$dir/in")
    val users = Tables.customer(spark, sfDir)

    val stream = EventStreams
      .enrichedByUser(EventStreams.readEventStream(spark, s"$dir/in"), users)
      .groupBy("c_mktsegment")
      .count()
    val got = EventStreams
      .runBounded(stream, "enriched_counts", OutputMode.Complete())
      .collect()
      .map(r => Option(r.getString(0)).getOrElse("<none>") -> r.getLong(1))
      .toMap

    val expected = EventStreams
      .enrichedByUser(spark.read.parquet(s"$dir/in"), users)
      .groupBy("c_mktsegment")
      .count()
      .collect()
      .map(r => Option(r.getString(0)).getOrElse("<none>") -> r.getLong(1))
      .toMap
    assert(got == expected)
    assert(got.values.sum == 1000L)
  }

  test("RocksDB state store: stateful twins emit identical results to the default HDFS provider") {
    // the 100 TB-state config (Engine.session(rocksDbStateStore = true)
    // bakes it in at build; here the runtime conf proves provider
    // INVARIANCE on the same session): flatMapGroupsWithState with
    // event-time timeout — the most state-API-hungry op the engine has —
    // must emit byte-identical sessions under both providers.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rocksdb").toString
    val evs = eventsAsMicros.filter(col("user_id") < 40)
    evs.write.parquet(s"$dir/in")
    val maxTs = evs.agg(max($"ts")).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 10L * 3600 * 1000)
    Seq((-1L, sentinelTs, -1L, "sentinel", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(s"$dir/in")

    def run(name: String): Set[(Long, Long, Long, Long)] = EventStreams
      .runBounded(
        EventStreams.gapSessions(
          EventStreams.readEventStream(spark, s"$dir/in").as[EventStreams.Event],
          gapMicros = 1800000000L).toDF(),
        name, OutputMode.Append())
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val confKey   = "spark.sql.streaming.stateStore.providerClass"
    val defaulted = run("rocks_twin_default")
    spark.conf.set(confKey, Engine.RocksDbProvider)
    try {
      val rocks = run("rocks_twin_rocksdb")
      assert(defaulted.nonEmpty)
      assert(rocks == defaulted, "state-store provider must be invisible in the results")
    } finally spark.conf.unset(confKey)
  }

  test("streaming gap sessions equal batch sessionize once the watermark closes them") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream5").toString
    val evs = eventsAsMicros.filter(col("user_id") < 40)
    evs.write.parquet(s"$dir/in")
    // a far-future sentinel (excluded user id) pushes the global watermark
    // past every real session's end + gap, so all of them close
    val maxTs = evs.agg(max($"ts")).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 10L * 3600 * 1000)
    Seq((-1L, sentinelTs, -1L, "sentinel", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .write.mode("append").parquet(s"$dir/in")

    val stream = EventStreams
      .gapSessions(
        EventStreams.readEventStream(spark, s"$dir/in").as[EventStreams.Event],
        gapMicros = 1800000000L)
      .toDF()
    val got = EventStreams
      .runBounded(stream, "gap_sessions", OutputMode.Append())
      .filter(col("user_id") >= 0) // drop the sentinel's own session
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val expected = graft.operators.Windows
      .sessionize(evs, key = "user_id", tsCol = "ts", tieBreak = "event_id",
        gapMicros = 1800000000L)
      .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(expected.nonEmpty)
    assert(got == expected, "stream sessions must equal the batch gap sessionization")
  }

  test("streaming incremental dedup equals the one-shot batch incremental run (q48 twin)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir  = Files.createTempDirectory("graft_stream6").toString
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    // same split as q48: %10==0 is the arriving data, the rest the corpus —
    // but here the arrivals come as TWO micro-batches
    val corpusSeed = docs.filter($"doc_id" % 10 =!= 0)
    val arrivals   = docs.filter($"doc_id" % 10 === 0)
    corpusSeed.write.parquet(graft.streaming.DocStreams.seedDir(s"$dir/corpus"))
    graft.streaming.DocStreams.seedIndex(corpusSeed, "doc_id", "text", s"$dir/index")

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.incrementalDedup(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      corpusDir = s"$dir/corpus", pairsDir = s"$dir/pairs", indexDir = s"$dir/index")
    try {
      val b1 = arrivals.filter($"doc_id" % 20 === 0).as[(Long, String)].collect().toSeq
      val b2 = arrivals.filter($"doc_id" % 20 =!= 0).as[(Long, String)].collect().toSeq
      assert(b1.nonEmpty && b2.nonEmpty)
      ms.addData(b1: _*); q.processAllAvailable()
      // The corpus TEXT store must never be read by a later batch — the
      // persisted index carries everything dedup needs. Prove it by
      // destroying the text store before batch 2: seed docs AND the
      // batch-1 docs written by the sink all vanish, yet batch 2 must
      // still find its cross-batch and corpus-side pairs.
      val corpusRoot = new java.io.File(s"$dir/corpus")
      def nuke(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(nuke)
        f.delete(); ()
      }
      nuke(corpusRoot)
      assert(!corpusRoot.exists(), "corpus text store removed")
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(s"$dir/pairs")
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = graft.operators.Dedup
      .incrementalNearDupPairs(corpusSeed, arrivals, "doc_id", "text",
        n = 3, k = 64, bands = 32, threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty, "planted data must produce batch-side pairs")
    // the data plants all three pair classes: corpus x batch, within-batch,
    // and cross-micro-batch (emitted by the LATER batch once the earlier
    // one has joined the corpus) — the union must equal the one-shot run
    assert(got == expected, s"stream pairs $got != batch pairs $expected")
  }

  test("streaming substring dedup equals the one-shot incremental probe (q118 twin)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir  = Files.createTempDirectory("graft_stream_ss").toString
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    // %3==0 arrives as TWO micro-batches, the rest is the seeded corpus
    val corpusSeed = docs.filter($"doc_id" % 3 =!= 0)
    val arrivals   = docs.filter($"doc_id" % 3 === 0)
    graft.streaming.DocStreams.seedSubstringIndex(
      corpusSeed, "doc_id", "text", s"$dir/index", k = 8)

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.incrementalSubstringDedup(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      pairsDir = s"$dir/pairs", indexDir = s"$dir/index", k = 8)
    try {
      val b1 = arrivals.filter($"doc_id" % 2 === 0).as[(Long, String)].collect().toSeq
      val b2 = arrivals.filter($"doc_id" % 2 =!= 0).as[(Long, String)].collect().toSeq
      assert(b1.nonEmpty && b2.nonEmpty)
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(s"$dir/pairs")
      .select("doc_a", "doc_b", "n_anchors", "max_run").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // the one-shot reference: the persisted-index probe over the whole
    // arrival set at once (q118's own shape)
    val expected = graft.operators.Dedup
      .incrementalSubstringPairsIndexed(
        graft.operators.Dedup.substringAnchors(corpusSeed, "doc_id", "text", 8),
        graft.operators.Dedup.substringAnchors(arrivals, "doc_id", "text", 8), 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(expected.nonEmpty, "planted near-dups must produce substring pairs")
    assert(got == expected, s"stream pairs must equal the one-shot probe")
  }

  test("streaming pHash ingest dedup equals the one-shot bit-sig pair run (q52 twin)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft_stream7").toString
    // signatures over the same planted-duplicate media corpus q52 uses
    // (each media row carries its 5-group representative's payload)
    import graft.operators.Multimodal
    val docs = Tables.documents(spark, sfDir)
    val reps = docs.select($"doc_id".as("rep_id"), $"text")
    val media = docs
      .select($"doc_id".as("media_id"), ($"doc_id" - $"doc_id" % 5).as("rep_id"))
      .join(reps, Seq("rep_id"))
      .select($"media_id", $"text".cast("binary").as("payload"))
    val sigs = media
      .select($"media_id", Multimodal.stubFeatures($"payload").as("f"))
      .select($"media_id", $"f", Multimodal.featureMean($"f").as("mu"))
      .select($"media_id", Multimodal.thresholdBits($"f", $"mu").as("sig"))
    // thirds: seed index, then two micro-batches
    val seed = sigs.filter($"media_id" % 3 === 0)
    val arr1 = sigs.filter($"media_id" % 3 === 1)
    val arr2 = sigs.filter($"media_id" % 3 === 2)
    graft.streaming.DocStreams.seedBitSigIndex(
      seed, "media_id", "sig", s"$dir/index", maxHamming = 3, chunks = 4)

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.DocStreams.incrementalBitSigDedup(
      ms.toDF().toDF("media_id", "sig"), "media_id", "sig",
      pairsDir = s"$dir/pairs", indexDir = s"$dir/index", maxHamming = 3, chunks = 4)
    try {
      val b1 = arr1.as[(Long, String)].collect().toSeq
      val b2 = arr2.as[(Long, String)].collect().toSeq
      assert(b1.nonEmpty && b2.nonEmpty)
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(s"$dir/pairs")
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // one-shot: every pair with >= 1 side outside the seed
    val seedIds = seed.select("media_id").collect().map(_.getLong(0)).toSet
    val expected = graft.operators.Dedup
      .bitSigPairs(sigs, "media_id", "sig", maxHamming = 3, chunks = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filterNot { case (a, b, _) => seedIds(a) && seedIds(b) }
      .toSet
    assert(expected.nonEmpty, "fixture must produce non-seed pairs")
    assert(got == expected, s"stream pairs $got != one-shot pairs $expected")
  }

  test("streaming merge sink equals sequential batch upserts; change feed streams the deltas") {
    import graft.streaming.WarehouseStreams
    import spark.implicits._
    val root = Files.createTempDirectory("graft_wstream").toString
    // two warehouses: one fed by the stream, one by direct batch upserts
    val whS = new graft.sources.Warehouse(spark, s"$root/wh_stream")
    val whB = new graft.sources.Warehouse(spark, s"$root/wh_batch")
    val base = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L)).toDF("k", "payload", "v")
    whS.createOrReplace("silver", "t", base)
    whB.createOrReplace("silver", "t", base)
    val batch1 = Seq((2L, "b2", 1L), (4L, "d", 1L)).toDF("k", "payload", "v")
    val batch2 = Seq((4L, "d2", 2L), (1L, "a0", 0L)).toDF("k", "payload", "v") // a0 loses (v not >)
    // land batch files one at a time; maxFilesPerTrigger=1 keeps them
    // as separate micro-batches, like a real ingest cadence
    batch1.coalesce(1).write.parquet(s"$root/in1")
    batch2.coalesce(1).write.parquet(s"$root/in2")
    val in = s"$root/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    def land(src: String): Unit =
      spark.read.parquet(src).coalesce(1).write.mode("append").parquet(in)
    land(s"$root/in1")
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = WarehouseStreams.mergeSink(stream, whS, "silver", "t", Seq("k"), "v",
      s"$root/ckpt")
    q.processAllAvailable()
    land(s"$root/in2")
    q.processAllAvailable()
    q.stop()
    whB.upsert("silver", "t", spark.read.parquet(s"$root/in1"), Seq("k"), "v")
    whB.upsert("silver", "t", spark.read.parquet(s"$root/in2"), Seq("k"), "v")
    def snap(wh: graft.sources.Warehouse) = wh.table("silver", "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(snap(whS) == snap(whB), "streamed merges must equal sequential batch upserts")
    assert(snap(whS) == Set((1L, "a", 0L), (2L, "b2", 1L), (3L, "c", 0L), (4L, "d2", 2L)))
    // ledger: one MERGE per micro-batch
    val merges = whS.history("silver.t").filter($"operation" === "MERGE").count()
    assert(merges == 2, s"expected 2 MERGE ledger ops, got $merges")
    // CDC: the streamed change feed carries exactly the batch feed's rows
    val feedStream = graft.streaming.EventStreams.runBounded(
      WarehouseStreams.changeFeedStream(spark, whS, "silver", "t"),
      "cdc_feed", OutputMode.Append())
    val got = feedStream.select("k", "payload", "_change_type", "_commit_version")
      .collect().map(_.toSeq).toSet
    val want = whS.changeFeed("silver", "t").select("k", "payload", "_change_type", "_commit_version")
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty, "streamed CDC must equal the batch change feed")
  }

  test("streaming merge sink onto a partitioned table rewrites only each batch's partitions") {
    import graft.streaming.WarehouseStreams
    import spark.implicits._
    val root = Files.createTempDirectory("graft_wpstream").toString
    val wh   = new graft.sources.Warehouse(spark, s"$root/wh")
    wh.createOrReplacePartitioned("silver", "t",
      Seq((1L, "a", 0L, "A"), (2L, "b", 0L, "B")).toDF("k", "payload", "v", "seg"), Seq("seg"))
    val hfs = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def sig(path: String): Seq[(String, Long, Long)] = {
      def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long, Long)] =
        if (!hfs.exists(p)) Seq.empty
        else hfs.listStatus(p).toSeq.flatMap { s =>
          if (s.isDirectory) walk(s.getPath)
          else Seq((s.getPath.toString, s.getLen, s.getModificationTime))
        }
      walk(new org.apache.hadoop.fs.Path(path)).sortBy(_._1)
    }
    val segA = wh.tablePath("silver", "t") + "/seg=A"
    val segB = wh.tablePath("silver", "t") + "/seg=B"
    // micro-batch 1 touches ONLY partition A, batch 2 ONLY partition B
    Seq((1L, "a2", 1L, "A")).toDF("k", "payload", "v", "seg")
      .coalesce(1).write.parquet(s"$root/in1")
    Seq((2L, "b2", 1L, "B")).toDF("k", "payload", "v", "seg")
      .coalesce(1).write.parquet(s"$root/in2")
    val in = s"$root/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    def land(src: String): Unit =
      spark.read.parquet(src).coalesce(1).write.mode("append").parquet(in)
    val bBefore = sig(segB)
    assert(bBefore.nonEmpty)
    land(s"$root/in1")
    val stream = spark.readStream
      .schema(Seq((1L, "a", 0L, "A")).toDF("k", "payload", "v", "seg").schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = WarehouseStreams.mergeSink(stream, wh, "silver", "t", Seq("k"), "v", s"$root/ckpt")
    q.processAllAvailable()
    // batch 1 (touches A) must leave B's files byte-identical
    assert(sig(segB) == bBefore, "batch 1 rewrote an untouched partition")
    val aAfter1 = sig(segA)
    assert(aAfter1.nonEmpty)
    land(s"$root/in2")
    q.processAllAvailable()
    q.stop()
    // batch 2 (touches B) must leave A's files byte-identical — each
    // micro-batch costs O(its touched partitions), which is what makes
    // a streaming MERGE sustainable against a 100 TB partitioned table
    assert(sig(segA) == aAfter1, "batch 2 rewrote an untouched partition")
    assert(sig(segB) != bBefore, "batch 2 should have rewritten B")
    val rows = wh.table("silver", "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set((1L, "a2", 1L), (2L, "b2", 1L)))
    // ledger: one MERGE per micro-batch, both partition-scoped
    assert(wh.history("silver.t").filter($"operation" === "MERGE").count() == 2)
  }

  test("continuously-maintained MV tracks merges through the feed stream") {
    import graft.streaming.WarehouseStreams
    import graft.operators.MaterializedAgg
    import spark.implicits._
    val root = Files.createTempDirectory("graft_mvstream").toString
    val wh = new graft.sources.Warehouse(spark, s"$root/wh")
    wh.createOrReplace("silver", "fact",
      Seq((1L, 10L, 5.0, 0L), (2L, 20L, 3.0, 0L)).toDF("id", "grp", "v", "ver"))
    // one merge BEFORE the stream starts so the feed schema exists
    wh.upsert("silver", "fact", Seq((3L, 10L, 2.0, 1L)).toDF("id", "grp", "v", "ver"),
      Seq("id"), "ver")
    MaterializedAgg.build(wh, "silver", "fact", "gold", "mv", Seq("grp"), "v")
    val q = WarehouseStreams.mvRefreshSink(spark, wh, "silver", "fact", "gold", "mv",
      Seq("grp"), "v", s"$root/ckpt")
    q.processAllAvailable() // nothing newer than the build cursor: no-op
    wh.upsert("silver", "fact",
      Seq((1L, 10L, 9.0, 2L), (4L, 30L, 7.0, 2L)).toDF("id", "grp", "v", "ver"),
      Seq("id"), "ver")
    q.processAllAvailable() // the merge's feed files trigger a refresh
    q.stop()
    val mv = wh.table("gold", "mv")
      .collect().map(r => (r.getLong(0), r.getDecimal(1).doubleValue(), r.getLong(2))).toSet
    assert(mv == Set((10L, 11.0, 2L), (20L, 3.0, 1L), (30L, 7.0, 1L)), s"got $mv")
  }

  test("MOR deletes flow through the feed stream into the continuously-maintained MV") {
    import graft.streaming.WarehouseStreams
    import graft.operators.MaterializedAgg
    import spark.implicits._
    val root = Files.createTempDirectory("graft_mvstream_dv").toString
    val wh   = new graft.sources.Warehouse(spark, s"$root/wh")
    wh.createOrReplace("silver", "fact",
      Seq((1L, 10L, 5.0, 0L), (2L, 20L, 3.0, 0L), (3L, 10L, 2.0, 0L))
        .toDF("id", "grp", "v", "ver"))
    wh.upsert("silver", "fact",
      Seq((4L, 20L, 4.0, 1L)).toDF("id", "grp", "v", "ver"), Seq("id"), "ver")
    MaterializedAgg.build(wh, "silver", "fact", "gold", "mv", Seq("grp"), "v")
    val q = WarehouseStreams.mvRefreshSink(spark, wh, "silver", "fact", "gold", "mv",
      Seq("grp"), "v", s"$root/ckpt")
    q.processAllAvailable()
    // a merge-on-read delete commits ONLY tombstones + feed rows (no
    // rewrite, no new generation) — the CDC stream must still see the
    // deletions and subtract them from the MV, indistinguishable from
    // a COW delete's feed
    wh.deleteMor("silver", "fact", $"id".isin(1L, 4L))
    q.processAllAvailable()
    q.stop()
    val mv = wh.table("gold", "mv")
      .collect().map(r => (r.getLong(0), r.getDecimal(1).doubleValue(), r.getLong(2))).toSet
    assert(mv == Set((10L, 2.0, 1L), (20L, 3.0, 1L)), s"got $mv")
  }

  test("mapGroupsWithState accumulates per-user session state") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream2").toString
    eventsAsMicros.filter(org.apache.spark.sql.functions.col("user_id") < 8).limit(60)
      .write.parquet(s"$dir/in")

    val stream = EventStreams
      .readEventStream(spark, s"$dir/in")
      .as[EventStreams.Event]
    val sessions = EventStreams.userSessions(stream)
    val got = EventStreams
      .runBounded(sessions.toDF(), "sessions", OutputMode.Update())
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

    val expected = spark.read.parquet(s"$dir/in")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("watermarked stream-stream attribution join equals the batch interval join") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream9").toString
    val evs = eventsAsMicros
    evs.write.parquet(s"$dir/in")
    val stream = EventStreams.readEventStream(spark, s"$dir/in")
    val got = EventStreams
      .runBounded(
        EventStreams.attributionJoin(
          stream.filter(col("event_type") === "click"),
          stream.filter(col("event_type") === "purchase")),
        "attribution", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val c = evs.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"), col("ts").as("click_ts"))
    val p = evs.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
    val expected = c.join(p,
        expr("click_user = user_id AND purchase_ts >= click_ts AND purchase_ts <= click_ts + INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("click_id"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.nonEmpty, "the corpus must contain attributable click->purchase pairs")
    assert(got == expected, "stream-stream interval join must equal the batch interval join")
  }

  test("streaming vector ingest dedup equals one-shot cosine pairs; grown index serves ANN") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Similarity
    import graft.streaming.VecStreams
    val dir  = Files.createTempDirectory("graft_stream8").toString
    val emb  = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    // plant arrivals as copies of known corpus vectors so every pair
    // class exists: corpus×batch, within-batch, and cross-micro-batch
    val byId = emb.filter($"vec_id".isin(1L, 2L, 3L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b1 = Seq((10001L, byId(1L)), (10005L, byId(1L)), (10003L, byId(2L)))
    val b2 = Seq((10002L, byId(1L)), (10004L, byId(3L)))
    val arrivals = (b1 ++ b2).toDF("vec_id", "embedding")

    VecStreams.seedIndex(emb, "vec_id", "embedding", s"$dir/index", nlist = 16)
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = VecStreams.incrementalDedup(
      ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      pairsDir = s"$dir/pairs", indexDir = s"$dir/index",
      threshold = 0.45, nprobe = 16)
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(s"$dir/pairs")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full     = emb.unionByName(arrivals)
    val arrival  = (b1 ++ b2).map(_._1).toSet
    val expected = Similarity.cosinePairs(full, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => arrival(p._1) || arrival(p._2)).toSet
    // all three pair classes must be present in the EXPECTED set
    assert(expected.contains((1L, 10001L)), "corpus x batch pair missing from plant")
    assert(expected.contains((10001L, 10005L)), "within-batch pair missing from plant")
    assert(expected.contains((10001L, 10002L)), "cross-batch pair missing from plant")
    assert(got == expected, s"stream pairs $got != one-shot pairs $expected")

    // the grown index serves ANN search directly: exhaustive probe of
    // the persisted cells equals brute force over seed + arrivals
    val exact = Similarity
      .bruteForceTopK(full, full.filter($"vec_id" < 10), "vec_id", "embedding", k = 5)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    val viaIndex = Similarity
      .ivfTopKIndexed(spark, full.filter($"vec_id" < 10), "vec_id", "embedding",
        s"$dir/index", k = 5, nprobe = 16)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    assert(viaIndex == exact, "grown persisted index must reproduce brute force at nprobe=nlist")
  }

  test("vector ingest quarantine: bad vectors never reach the index or the pairs") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Similarity
    import graft.streaming.VecStreams
    val dir = Files.createTempDirectory("graft_stream_vq").toString
    val emb = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val v1  = emb.filter($"vec_id" === 1L).head().getSeq[Float](1)
    val dim = v1.length
    val clean  = (10001L, v1)                                        // near-dup of vec 1
    val nanVec = (10002L, v1.updated(0, Float.NaN))
    val infVec = (10003L, v1.updated(0, Float.PositiveInfinity))
    val zero   = (10004L, Seq.fill(dim)(0.0f))
    val short  = (10005L, v1.take(dim - 1))

    VecStreams.seedIndex(emb, "vec_id", "embedding", s"$dir/index", nlist = 16)
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = VecStreams.incrementalDedup(
      ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      pairsDir = s"$dir/pairs", indexDir = s"$dir/index",
      threshold = 0.45, nprobe = 16, quarantineDir = Some(s"$dir/bad"))
    try {
      ms.addData(Seq(clean, nanVec, infVec, zero, short): _*)
      q.processAllAvailable()
    } finally q.stop()

    val quarantined = spark.read.parquet(s"$dir/bad")
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(quarantined == Set(10002L, 10003L, 10004L, 10005L), s"got $quarantined")
    // the index grew by exactly the clean vector
    val indexed = spark.read.parquet(s"$dir/index/cells")
      .filter($"vec_id" >= 10000L).select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(indexed == Set(10001L))
    // pairs only involve the clean arrival (its planted near-dup of vec 1)
    val pairIds = spark.read.parquet(s"$dir/pairs")
      .select($"id_a", $"id_b").collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(pairIds.contains(10001L) && !pairIds.exists(_ > 10001L),
      s"quarantined ids leaked into pairs: $pairIds")
  }

  test("streaming frequency ledger equals the single-build sketch over everything ingested") {
    import graft.operators.Sketches
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cms_stream").toString
    val wh   = new graft.sources.Warehouse(spark, s"$root/wh")
    val ev   = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"event_type")
    val eps = 0.001
    // land the corpus as 3 files → 3 micro-batches
    for (r <- 0 to 2)
      ev.filter($"event_id" % 3 === r).coalesce(1)
        .write.mode("append").parquet(s"$root/in")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
    val q = graft.streaming.WarehouseStreams.frequencySketchSink(
      stream, wh, "gold", "freq", "event_type", eps, confidence = 0.99, seed = 42,
      checkpoint = s"$root/ckpt")
    q.processAllAvailable()
    q.stop()
    // one ledger row per micro-batch, each a KB-sized blob
    assert(wh.table("gold", "freq").count() == 3)
    val streamed = Sketches.frequencyAcrossRuns(wh.table("gold", "freq"))
    val single   = Sketches.countMinMerged(ev, "event_type", lit(0), eps,
      confidence = 0.99, seed = 42)
    assert(streamed.totalCount() == ev.count())
    ev.select($"event_type").distinct().collect().map(_.getString(0)).foreach { k =>
      assert(streamed.estimateCount(k) == single.estimateCount(k),
        s"$k: streamed ledger must equal the single-build sketch")
    }
  }

  test("streaming per-source dedup telemetry tracks the q127 funnel stages (exact + near)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft_stream_tel").toString
    val seed = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "s1"),
      (2L, "one two three four five six seven eight", "s2")
    ).toDF("doc_id", "text", "source")
    graft.streaming.DocStreams.seedTelemetryIndex(seed, "doc_id", "text", s"$dir/index")

    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val q = graft.streaming.DocStreams.incrementalDedupTelemetry(
      ms.toDF().toDF("doc_id", "text", "source"), "doc_id", "text", "source",
      telemetryDir = s"$dir/telemetry", indexDir = s"$dir/index")
    try {
      ms.addData(
        (11L, "alpha beta gamma delta epsilon zeta eta theta", "s1"), // exact vs seed
        (12L, "alpha beta gamma delta epsilon zeta eta theta lambda", "s1"), // near vs seed
        (13L, "completely different unique words here today", "s2")   // survivor
      )
      q.processAllAvailable()
      ms.addData(
        (21L, "completely different unique words here today", "s2"),  // exact vs batch-1 doc
        (22L, "alpha beta gamma delta epsilon zeta eta theta lambda", "s1"), // exact vs a batch-1 NEAR LOSER's hash
        (23L, "completely different unique words here tomorrow", "s2"), // near vs batch-1 survivor
        (24L, "pack my box with five dozen jugs", "s2"),              // survivor
        (25L, "pack my box with five dozen jugs", "s2")               // within-batch exact dup
      )
      q.processAllAvailable()
    } finally q.stop()

    val got = graft.streaming.DocStreams
      .dedupTelemetry(spark, s"$dir/telemetry", "source")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // s1 streamed 3 docs: 11 exact (seed hash), 22 exact (near-loser
    // 12's hash still indexes), 12 near — zero survivors
    assert(got("s1") == ((3L, 2L, 1L, 0L)), s"s1 funnel: ${got("s1")}")
    // s2 streamed 5 docs: 21 + 25 exact, 23 near, 13 + 24 survive
    assert(got("s2") == ((5L, 2L, 1L, 2L)), s"s2 funnel: ${got("s2")}")
  }

  test("streaming funnel progress converges to the batch ordered-funnel (q155 twin)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val evs = eventsAsMicros
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .orderBy($"ts", $"event_id")
      .as[EventStreams.Event].collect()
    val (b1, b2) = evs.splitAt(evs.length / 2) // time-monotone batches
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventStreams.Event]
    ms.addData(b1.toSeq: _*)
    ms.addData(b2.toSeq: _*)
    val got = EventStreams
      .runBounded(
        EventStreams.funnelProgress(ms.toDS(), Seq("view", "click", "purchase")).toDF(),
        "funnel_progress", OutputMode.Update())
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap // later updates overwrite earlier ones
      .filter(_._2 >= 1)
    val want = QueriesCorpus.q155_funnel(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(want.nonEmpty)
    assert(got == want, s"stream funnel differs from batch: ${got.toSeq.sorted.take(5)}...")

    // planted partial stages: out-of-order within a batch, a click
    // BEFORE the view (must not count), stage-1-only and stage-2-only
    // users — cross-batch chaining exercised for user 3
    def ev(id: Long, uid: Long, tpe: String, ms0: Long) = EventStreams.Event(
      id, new java.sql.Timestamp(ms0), uid, tpe, 0.0, "{}")
    val ms2 = MemoryStream[EventStreams.Event]
    ms2.addData(
      ev(1, 1L, "click", 1000), ev(2, 1L, "view", 2000),             // click precedes view -> stage 1
      ev(3, 2L, "view", 1000), ev(4, 2L, "click", 3000),             // stage 2
      ev(5, 3L, "view", 1000), ev(6, 3L, "click", 2000))
    ms2.addData(
      ev(7, 3L, "purchase", 4000),                                   // completes across batches -> 3
      ev(8, 4L, "purchase", 1000))                                   // purchase first -> stage 0
    val got2 = EventStreams
      .runBounded(
        EventStreams.funnelProgress(ms2.toDS(), Seq("view", "click", "purchase")).toDF(),
        "funnel_progress2", OutputMode.Update())
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got2 == Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 0), s"planted funnel: $got2")
  }

  test("streaming span scrub: every batch's cleaned docs match an independent pure-Scala surgery") {
    import graft.streaming.DocStreams
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir   = Files.createTempDirectory("graft_stream_scrub").toString
    val quote = (1 to 8).map(i => s"e$i").mkString(" ")
    val evalDocs = Seq((100L, quote + " extra tail words here pad pad pad")).toDF("doc_id", "text")
    DocStreams.seedEvalGrams(evalDocs, "text", s"$dir/ix")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = DocStreams.incrementalSpanScrub(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", s"$dir/clean", s"$dir/ix")
    val b1 = Seq((1L, s"alpha beta $quote gamma"), (2L, "clean words only here"))
    val b2 = Seq((3L, quote), (4L, s"$quote and then $quote"))
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // independent pure-Scala surgery over the eval suite's gram set
    val evGrams = evalDocs.collect().flatMap { r =>
      val t = r.getString(1).split("\\s+").filter(_.nonEmpty)
      (0 to t.length - 8).map(i => t.slice(i, i + 8).mkString(" "))
    }.toSet
    def scrub(text: String): (Long, Long, String) = {
      val toks  = text.split("\\s+").filter(_.nonEmpty)
      val cover = Array.fill(toks.length)(false)
      for (i <- 0 to toks.length - 8)
        if (evGrams(toks.slice(i, i + 8).mkString(" ")))
          (i until i + 8).foreach(cover(_) = true)
      (toks.length.toLong, cover.count(identity).toLong,
        toks.zip(cover).collect { case (t, false) => t }.mkString(" "))
    }
    val got = spark.read.parquet(s"$dir/clean")
      .select($"doc_id", $"n_tokens", $"n_removed", $"clean_text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val want = (b1 ++ b2).map { case (id, t) => id -> scrub(t) }.toMap
    assert(got == want, s"stream scrub $got != pure-Scala $want")
    // the interesting cases actually occurred: mid-doc cut, clean
    // passthrough, full cut, double-quote cut
    assert(want(1L)._3 == "alpha beta gamma")
    assert(want(2L)._2 == 0L)
    assert(want(3L)._3 == "")
    assert(want(4L)._3 == "and then")
  }

  test("streaming drift telemetry: per-batch KL matches an independent recomputation; model ledger folds exactly") {
    import graft.streaming.DocStreams
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir  = Files.createTempDirectory("graft_stream_drift").toString
    val seed = Seq(("s0", "a a b"), ("s0", "a b b")).toDF("source", "text")
    DocStreams.seedDriftModel(seed, "text", s"$dir/ix")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val q = DocStreams.incrementalDrift(
      ms.toDF().toDF("source", "text"), "text", "source",
      s"$dir/tel", s"$dir/ix", updateModel = true)
    val b1 = Seq(("sA", "a b"), ("sB", "b b"))
    val b2 = Seq(("sA", "c c")) // token c is new — model-incl-batch keeps it finite
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    // independent recomputation: pure-Scala decimal fold with the same
    // rounding rule Spark's round() applies (HALF_UP on Double.toString)
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    def tokens(rows: Seq[(String, String)]): Seq[(String, String)] =
      rows.flatMap { case (s, t) => t.split("\\s+").filter(_.nonEmpty).map(s -> _) }
    val seedToks = tokens(Seq(("s0", "a a b"), ("s0", "a b b")))
    def expectKl(batch: Seq[(String, String)], corpusToks: Seq[(String, String)]): Map[String, Double] = {
      val corpus = corpusToks.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
      val total  = corpusToks.size.toDouble
      tokens(batch).groupBy(_._1).map { case (src, toks) =>
        val n  = toks.size.toDouble
        val tf = toks.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
        val s = tf.toSeq.sortBy(_._1).map { case (t, c) =>
          val term = (c / n) * math.log((c / n) / (corpus(t) / total))
          BigDecimal(java.math.BigDecimal.valueOf(term))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        src -> round6(s.toDouble / math.log(2.0))
      }
    }
    val got = spark.read.parquet(s"$dir/tel")
      .select($"batch_id".cast("long"), $"source", $"kl_bits").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val want1 = expectKl(b1, seedToks ++ tokens(b1))
    val want2 = expectKl(b2, seedToks ++ tokens(b1) ++ tokens(b2))
    assert(got((0L, "sA")) == want1("sA") && got((0L, "sB")) == want1("sB"),
      s"batch-0 KL $got vs $want1")
    assert(got((1L, "sA")) == want2("sA"), s"batch-1 KL $got vs $want2")
    // a spike is visible: sB's all-b batch diverges more than sA's a+b mix
    assert(got((0L, "sB")) > got((0L, "sA")))
    // the model ledger folds to the exact token counts of everything seen
    val folded = spark.read.parquet(s"$dir/ix/model")
      .groupBy($"token").agg(sum($"c").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wantCounts = (seedToks ++ tokens(b1) ++ tokens(b2))
      .groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    assert(folded == wantCounts, s"model $folded != $wantCounts")
  }

  test("online k-means: frozen model equals batch assignTo; evolving stats fold exactly; model moved") {
    import graft.operators.Clustering
    import graft.streaming.ClusterStreams
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream_km").toString
    val emb = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    // arrivals: copies of corpus vectors under fresh ids (known geometry)
    val byId = emb.filter($"vec_id".isin(1L, 2L, 3L, 4L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b1 = Seq((20001L, byId(1L)), (20002L, byId(2L)))
    val b2 = Seq((20003L, byId(3L)), (20004L, byId(4L)))
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    // ---- frozen model: streaming INFERENCE == batch assignTo ----
    ClusterStreams.seedModel(emb, "vec_id", "embedding", s"$dir/ixf", k = 8, iters = 2)
    val cSeed = ClusterStreams.currentCentroids(spark, s"$dir/ixf")
    val ms1 = MemoryStream[(Long, Seq[Float])]
    val q1 = ClusterStreams.incrementalAssign(
      ms1.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      s"$dir/asgf", s"$dir/ixf", updateStats = false)
    try {
      ms1.addData(b1: _*); q1.processAllAvailable()
      ms1.addData(b2: _*); q1.processAllAvailable()
    } finally q1.stop()
    // stats untouched by a frozen run
    val cAfterFrozen = ClusterStreams.currentCentroids(spark, s"$dir/ixf")
    assert(cSeed.map(_._1) == cAfterFrozen.map(_._1) &&
      cSeed.zip(cAfterFrozen).forall { case ((_, a), (_, b)) => a.sameElements(b) })
    val gotF = spark.read.parquet(s"$dir/asgf")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val arrivals = (b1 ++ b2).toDF("vec_id", "embedding")
    val wantF = Clustering.assignTo(arrivals, "embedding", cSeed, "cluster")
      .select($"vec_id", $"cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(gotF == wantF, s"frozen stream $gotF != batch $wantF")

    // ---- evolving model: mini-batch fold is exact and sequential ----
    ClusterStreams.seedModel(emb, "vec_id", "embedding", s"$dir/ix", k = 8, iters = 2)
    val ms2 = MemoryStream[(Long, Seq[Float])]
    val q2 = ClusterStreams.incrementalAssign(
      ms2.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      s"$dir/asg", s"$dir/ix", updateStats = true)
    try {
      ms2.addData(b1: _*); q2.processAllAvailable()
      ms2.addData(b2: _*); q2.processAllAvailable()
    } finally q2.stop()
    // driver-side sequential twin through a DIFFERENT code path
    // (Clustering.centroids re-sums unioned assigned frames from scratch
    // — associativity of the exact sums is the property under test)
    val seedAssigned = Clustering.kmeans(emb, "vec_id", "embedding", 8, 2)
      .join(emb, Seq("vec_id")).select($"cluster", $"embedding")
    val b1df = b1.toDF("vec_id", "embedding")
    val b2df = b2.toDF("vec_id", "embedding")
    val a1 = Clustering.assignTo(b1df, "embedding", cSeed, "cluster")
      .select($"cluster", $"embedding")
    val cAfterB1 = Clustering.centroids(
      seedAssigned.unionByName(a1), "cluster", "embedding")
    val a2 = Clustering.assignTo(b2df, "embedding", cAfterB1, "cluster")
      .select($"cluster", $"embedding")
    val cFinalWant = Clustering.centroids(
      seedAssigned.unionByName(a1).unionByName(a2), "cluster", "embedding")
    val cFinalGot = ClusterStreams.currentCentroids(spark, s"$dir/ix")
    assert(cFinalGot.map(_._1) == cFinalWant.map(_._1))
    cFinalGot.zip(cFinalWant).foreach { case ((c, g), (_, w)) =>
      assert(g.sameElements(w), s"cluster $c centroid drifted from the exact fold")
    }
    // the model actually moved (the arrivals changed the sums)
    assert(!cSeed.zip(cFinalGot).forall { case ((_, a), (_, b)) => a.sameElements(b) },
      "mini-batch updates should move at least one centroid")
  }

  test("streaming novelty: doc_id-monotone batches reproduce the batch q162 scores") {
    import graft.streaming.DocStreams
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream_novel").toString
    // real corpus split by doc_id — the monotone-arrival regime the
    // batch-equivalence claim covers — plus one PLANTED copy of the
    // first doc at the top id, so a batch-2 doc provably repeats
    // batch-1 content (cross-batch ownership exercised by construction)
    val base = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val docs = base :+ ((base.map(_._1).max + 1) -> base.head._2)
    val fixtureDir = s"$dir/fixture"
    docs.toSeq.map { case (id, t) => (id, t, "en", "src0", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$fixtureDir/documents.parquet")
    val cut = docs(docs.length / 2)._1
    val (b1, b2) = docs.partition(_._1 <= cut)

    val empty = Tables.documents(spark, sfDir).filter(lit(false))
    DocStreams.seedNoveltyGrams(empty, "text", s"$dir/ix")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = DocStreams.incrementalNovelty(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", s"$dir/tel", s"$dir/ix")
    try {
      ms.addData(b1.toSeq: _*); q.processAllAvailable()
      ms.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))
    val got = spark.read.parquet(s"$dir/tel")
      .select($"doc_id", $"n_grams", $"n_novel", $"novelty_frac")
      .collect().map(key).toSet
    val want = QueriesCorpus.q162_ngram_novelty(spark, fixtureDir).collect().map(key).toSet
    assert(got == want, s"stream novelty diverged: ${(got -- want).take(3)} vs ${(want -- got).take(3)}")
    // the planted copy scored zero novelty in batch 2 (batch-1 owner)
    val planted = spark.read.parquet(s"$dir/tel")
      .filter($"doc_id" === docs.last._1).collect()
    assert(planted.length == 1 && planted.head.getLong(2) == 0L
      && planted.head.getDouble(3) == 0.0)
    // the gram index is exactly the corpus's distinct-gram set
    val nIndexed = spark.read.parquet(s"$dir/ix/novelty_grams").select($"g").distinct().count()
    val nCorpus = spark.read.parquet(s"$fixtureDir/documents.parquet")
      .select(explode(graft.operators.Dedup.shingles(split($"text", "\\s+"), 8)).as("g"))
      .distinct().count()
    assert(nIndexed == nCorpus)
  }

  test("streaming daily anomaly: day-monotone batches reproduce the batch q160 flags") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream_anom").toString
    // the q160 planted fixture: view counts 10/12/14/12/100 by day —
    // day 5 is the spike and must flag IN ITS OWN micro-batch
    val counts = Seq(10, 12, 14, 12, 100)
    val evs = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i =>
        (d * 1000L + i, f"2024-01-${d + 1}%02d 0${i % 10}:00:00", i.toLong, "view"))
    }
    val fixtureDir = s"$dir/fixture"
    evs.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$fixtureDir/events.parquet")
    val want = QueriesCorpus.q160_daily_anomaly(spark, fixtureDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else r.getDouble(4),
          if (r.isNullAt(5)) null else r.getInt(5)))).toMap

    // seed from nothing; stream the same events in day-grouped batches
    val empty = Tables.events(spark, fixtureDir).filter(lit(false))
    EventStreams.seedDailyLedger(empty, s"$dir/ledger")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long, String)]
    val q = EventStreams.incrementalDailyAnomaly(
      ms.toDF().toDF("event_id", "ts", "user_id", "event_type")
        .withColumn("ts", $"ts".cast("timestamp")),
      s"$dir/tel", s"$dir/ledger")
    val byDay = evs.groupBy(_._2.take(10)).toSeq.sortBy(_._1).map(_._2)
    val (b1, b2, b3) = (byDay.take(2).flatten, byDay.slice(2, 4).flatten, byDay(4))
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      ms.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    // each day lands in exactly one batch, so its single emission must
    // equal the batch q160 row for that day
    val got = spark.read.parquet(s"$dir/tel")
      .select($"event_type", $"day", $"n", $"n_prior", $"mean_prior", $"is_anomaly")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else r.getDouble(4),
          if (r.isNullAt(5)) null else r.getInt(5)))).toMap
    assert(got == want, s"stream anomaly $got != batch q160 $want")
    // the spike flagged in the batch it arrived in (single emission, flag 1)
    assert(got(("view", "2024-01-05"))._4 == 1)
    // the ledger folds to the exact daily counts
    val folded = spark.read.parquet(s"$dir/ledger")
      .groupBy($"event_type", $"day").agg(sum($"n").as("n")).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(folded == counts.zipWithIndex.map { case (c, d) =>
      f"2024-01-${d + 1}%02d" -> c.toLong }.toMap)
  }

  test("streaming stickiness: day-monotone batches reproduce the batch q174 rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream_stick").toString
    // user 1 active days 1..8, user 3 only day 1, user 2 only day 8 —
    // the CorpusSpec window-edge/age-out fixture
    val evs = (1 to 8).map(d =>
      (d.toLong, f"2024-01-$d%02d 10:00:00", 1L, "view", 0.0)) ++ Seq(
      (20L, "2024-01-01 12:00:00", 3L, "click", 0.0),
      (21L, "2024-01-08 12:00:00", 2L, "view", 0.0))
    val fixtureDir = s"$dir/fixture"
    evs.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$fixtureDir/events.parquet")
    val want = QueriesCorpus.q174_stickiness(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    val empty = Tables.events(spark, fixtureDir).filter(lit(false))
    EventStreams.seedUserDayLedger(empty, s"$dir/ledger")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long, String, Double)]
    val q = EventStreams.incrementalStickiness(
      ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("ts", $"ts".cast("timestamp")),
      s"$dir/tel", s"$dir/ledger")
    // day-grouped batches: {1,2}, {3..7}, {8}
    val byDay = evs.groupBy(_._2.take(10)).toSeq.sortBy(_._1).map(_._2)
    try {
      ms.addData(byDay.take(2).flatten: _*); q.processAllAvailable()
      ms.addData(byDay.slice(2, 7).flatten: _*); q.processAllAvailable()
      ms.addData(byDay(7): _*); q.processAllAvailable()
    } finally q.stop()

    // day-monotone arrival → each day emitted once, in its own batch,
    // equal to the batch q174 row
    val got = spark.read.parquet(s"$dir/tel")
      .select($"day", $"dau", $"wau", $"stickiness").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want, s"stream stickiness $got != batch q174 $want")
    // the ledger folds to exactly the distinct user-day set
    val folded = spark.read.parquet(s"$dir/ledger")
      .select($"day", $"user_id").distinct().count()
    assert(folded == 10L)
  }

  test("streaming k-anonymity: per-type risk converges to the batch q181 rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir        = Files.createTempDirectory("graft_stream_kanon").toString
    val fixtureDir = "/root/testdata/sf0.001"
    val want = QueriesCorpus.q181_k_anonymity(spark, fixtureDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

    val evs = Tables.events(spark, fixtureDir)
      .select($"event_id", $"ts".cast("string"), $"user_id", $"event_type", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    EventStreams.seedKAnonLedger(
      Tables.events(spark, fixtureDir).filter(lit(false)), s"$dir/ledger")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long, String, Double)]
    val q = EventStreams.incrementalKAnonymity(
      ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("ts", $"ts".cast("timestamp")),
      s"$dir/tel", s"$dir/ledger")
    val parts = evs.sortBy(_._1).grouped((evs.length + 2) / 3).toSeq
    try {
      parts.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    // a type's LATEST emission (it is touched by several batches) must
    // equal the batch q181 row once all data has arrived
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"batch_id".desc)
    val got = spark.read.parquet(s"$dir/tel")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_type", $"n_combos", $"risky_combos", $"risky_rows", $"risk_share")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == want, s"stream k-anonymity $got != batch q181 $want")
    // the users ledger folds to the exact distinct combo-user set
    val foldedUsers = spark.read.parquet(s"$dir/ledger/users")
      .select($"event_type", $"day", $"vb", $"user_id").distinct().count()
    val exactUsers = Tables.events(spark, fixtureDir)
      .select($"event_type", to_date($"ts").as("day"),
        floor($"value" / 50.0).cast("long").as("vb"), $"user_id").distinct().count()
    assert(foldedUsers == exactUsers)
  }

  test("streaming frame dedup: per-batch probes union to the full pair set exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.MediaStreams
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream_framededup").toString
    // four groups of three identical "videos" (same payload text, same
    // 2000 ms duration = 5 frames); the seed holds one member per group
    // (no seed-internal pairs), the two batches land the copies
    def m(g: Int, k: Int): (Long, String, Long) =
      (g * 10L + k, s"group $g payload with stable words", 2000L)
    val seed = (0 until 4).map(m(_, 0))
    MediaStreams.seedFrameIndex(
      seed.toDF("media_id", "txt", "duration_ms"), s"$dir/idx")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long)]
    val q = MediaStreams.incrementalFrameDedup(
      ms.toDF().toDF("media_id", "txt", "duration_ms"), s"$dir/pairs", s"$dir/idx")
    try {
      Seq((0 until 4).map(m(_, 1)), (0 until 4).map(m(_, 2))).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.read.parquet(s"$dir/pairs")
      .select($"id_a", $"id_b", $"n_frames_a", $"n_frames_b",
        $"matched_frames", $"frame_share", $"batch_id".cast("long").as("batch_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6))))
      .toMap
    // all 12 within-group pairs, each exactly once, full 5-frame match
    val want = (for (g <- 0 until 4; a <- 0 until 3; b <- (a + 1) until 3)
      yield (g * 10L + a, g * 10L + b)).toSet
    assert(got.keySet == want, s"pairs: ${got.keySet.toSeq.sorted}")
    assert(got.values.forall { case (na, nb, mf, sh, _) =>
      na == 5L && nb == 5L && mf == 5L && sh == 1.0 })
    // the new-member pair lands in the batch that completes it: copies
    // of member 1 pair in batch 0, member 2's two pairs in batch 1
    assert(got((0L, 1L))._5 == 0L && got((0L, 2L))._5 == 1L && got((1L, 2L))._5 == 1L)
  }

  test("streaming burstiness: time-monotone batches converge to the batch q184 rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir        = Files.createTempDirectory("graft_stream_burst").toString
    val fixtureDir = "/root/testdata/sf0.001"
    val want = QueriesCorpus.q184_burstiness(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

    // time-terciles: per-user arrival is ts-monotone across batches
    val evs = Tables.events(spark, fixtureDir)
      .select($"event_id", $"ts".cast("string").as("ts"), $"user_id", $"event_type", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => (e._2, e._1))
    EventStreams.seedBurstLedger(
      Tables.events(spark, fixtureDir).filter(lit(false)), s"$dir/ledger")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long, String, Double)]
    val q = EventStreams.incrementalBurstiness(
      ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("ts", $"ts".cast("timestamp")),
      s"$dir/tel", s"$dir/ledger")
    val parts = evs.grouped((evs.length + 2) / 3).toSeq
    try {
      parts.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"batch_id".desc)
    val got = spark.read.parquet(s"$dir/tel")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"n_gaps", $"mean_gap_s", $"cv")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == want, s"stream burstiness != batch q184 (got ${got.size}, want ${want.size})")

    // monotone arrival must never trip the stale flag
    val anyStale = spark.read.parquet(s"$dir/tel").filter($"stale").count()
    assert(anyStale == 0L, s"monotone stream flagged $anyStale stale telemetry rows")
  }

  test("streaming bronze->silver NYT ingest twin equals the batch pipeline, and redelivery adds nothing") {
    import graft.pipeline.{Stages, StreamingIngest}
    import graft.sources.Warehouse
    import spark.implicits._
    val root    = Files.createTempDirectory("graft_stream_ingest")
    val landing = Files.createDirectories(root.resolve("nyt"))
    def day(d: String, tok: String, rows: Seq[(String, String, String)]): String =
      rows.map { case (id, abs, pub) =>
        s"""{"_airbyte_data": {"_id": "$id", "abstract": "$abs", "lead_paragraph": "lp $id", "snippet": "sn $id", "pub_date": "${pub}T09:00:00+0000", "multimedia": [{"url": "u", "Url": "U"}]}}"""
      }.mkString("\n")
    Files.writeString(landing.resolve("2022_12_20_1671510000.123_nyt.jsonl"),
      day("20221220", "123", Seq(("n1", "Climate policy", "2022-12-15"), ("n2", "Fuel report", "2022-12-16"))))
    Files.writeString(landing.resolve("2022_12_21_1671600000.456_nyt.jsonl"),
      day("20221221", "456", Seq(("n3", "Wind farms", "2022-12-17"), ("n1", "Climate policy", "2022-12-15"))))
    // n1 re-appears on day 2 with the same key — the anti-join must drop it in BOTH arms
    // pin file mod times: the file stream orders by timestamp, and the
    // twin compare needs day 1 processed first (same-ms writes tie)
    import java.nio.file.attribute.FileTime
    Files.setLastModifiedTime(
      landing.resolve("2022_12_20_1671510000.123_nyt.jsonl"), FileTime.fromMillis(1_700_000_000_000L))
    Files.setLastModifiedTime(
      landing.resolve("2022_12_21_1671600000.456_nyt.jsonl"), FileTime.fromMillis(1_700_000_100_000L))

    // batch arm: one notebook run per day, exactly the reference shape
    val whBatch = new Warehouse(spark, root.resolve("wh_batch").toString)
    for (rd <- Seq("20221220", "20221221")) {
      assert(Stages.bronzeNyt(spark, whBatch, landing.toString, rd).isRight)
      assert(Stages.silverNyt(spark, whBatch).isRight)
    }

    // stream arm: one micro-batch per file over the same landing dir
    val whStream = new Warehouse(spark, root.resolve("wh_stream").toString)
    val schema   = StreamingIngest.inferLandingSchema(spark, landing.toString)
    val q = StreamingIngest.nytIngest(spark, whStream, landing.toString, schema)
    try q.processAllAvailable() finally q.stop()

    def silverKey(wh: Warehouse) = wh.table("silver", "nytarchive")
      .select($"nyt_sk", $"id", $"abstract", $"lead_paragraph", $"snippet",
        date_format($"publish_dt", "yyyy-MM-dd").as("pd"),
        $"source_file_name", $"run_date".cast("string").as("rd"))
      .collect().map(_.toSeq).toSet
    assert(silverKey(whStream) == silverKey(whBatch),
      "stream-ingested silver must equal the batch pipeline's silver")
    assert(whStream.table("silver", "nytarchive").count() == 3) // n1 deduped

    // redelivery: the same day-1 payload lands again under a new file
    // name — bronze grows, silver must NOT
    Files.writeString(landing.resolve("2022_12_22_1671700000.789_nyt.jsonl"),
      day("20221222", "789", Seq(("n1", "Climate policy", "2022-12-15"))))
    val q2 = StreamingIngest.nytIngest(spark, whStream, landing.toString, schema)
    try q2.processAllAvailable() finally q2.stop()
    assert(whStream.table("silver", "nytarchive").count() == 3,
      "redelivered file must add zero silver rows")
  }

  test("full medallion streaming twin: scholar/arxiv/nyt streamed silvers equal the batch pipeline") {
    import graft.pipeline.{Pipeline, StreamingIngest}
    import graft.sources.Warehouse
    import spark.implicits._
    import java.nio.file.attribute.FileTime
    val root    = Files.createTempDirectory("graft_stream_medallion")
    val scholar = Files.createDirectories(root.resolve("scholar"))
    val arxiv   = Files.createDirectories(root.resolve("arxiv"))
    val nyt     = Files.createDirectories(root.resolve("nyt"))

    // day 1 (the PipelineSpec fixture shapes)
    Files.writeString(scholar.resolve("2022_12_20_1671510000.123_scholar.jsonl"),
      """{"_airbyte_data": {"organic_results": [
        |  {"position": 1, "result_id": "r1", "title": "Solar", "link": "http://a", "snippet": "3 days ago — biofuel study", "type": "html"},
        |  {"position": 2, "result_id": "r2", "title": "Battery", "link": "http://b", "snippet": "lithium research", "type": "html"}],
        |  "search_metadata": {"id": "m1", "status": "Success"}}}""".stripMargin)
    Files.writeString(arxiv.resolve("2022-12-20_1671510000.123_arxiv.json"),
      """{"feed": {"entry": [{"id": "http://arxiv.org/abs/2212.01234v1", "updated": "2022-12-18T10:00:00Z", "title": "Green energy", "summary": "solar"}]}}""")
    Files.writeString(nyt.resolve("2022_12_20_1671510000.123_nyt.jsonl"),
      """{"_airbyte_data": {"_id": "n1", "abstract": "Climate", "lead_paragraph": "Renewables", "snippet": "green", "pub_date": "2022-12-15T09:00:00+0000", "multimedia": [{"url": "u", "Url": "U"}]}}""")
    // day 2: scholar has one row ABOVE the day-1 watermark (fallback
    // run_date 2022-12-21) and one below it ("7 days ago" → dropped in
    // both arms); arxiv updates 01234 to v3 and inserts a new id; nyt
    // adds n2 plus an n1 redelivery
    Files.writeString(scholar.resolve("2022_12_21_1671600000.456_scholar.jsonl"),
      """{"_airbyte_data": {"organic_results": [
        |  {"position": 1, "result_id": "r3", "title": "Hydro", "link": "http://c", "snippet": "pumped storage", "type": "html"},
        |  {"position": 2, "result_id": "r4", "title": "Stale", "link": "http://d", "snippet": "7 days ago — old note", "type": "html"}],
        |  "search_metadata": {"id": "m2", "status": "Success"}}}""".stripMargin)
    Files.writeString(arxiv.resolve("2022-12-21_1671600000.456_arxiv.json"),
      """{"feed": {"entry": [{"id": "http://arxiv.org/abs/2212.01234v3", "updated": "2022-12-21T10:00:00Z", "title": "Green energy v3", "summary": "updated"}, {"id": "http://arxiv.org/abs/2212.09999v1", "updated": "2022-12-21T11:00:00Z", "title": "Biogas", "summary": "biogas"}]}}""")
    Files.writeString(nyt.resolve("2022_12_21_1671600000.456_nyt.jsonl"),
      Seq(
        """{"_airbyte_data": {"_id": "n2", "abstract": "Fuel", "lead_paragraph": "Air quality", "snippet": "solar", "pub_date": "2022-12-16T09:00:00+0000", "multimedia": [{"url": "v", "Url": "V"}]}}""",
        """{"_airbyte_data": {"_id": "n1", "abstract": "Climate", "lead_paragraph": "Renewables", "snippet": "green", "pub_date": "2022-12-15T09:00:00+0000", "multimedia": [{"url": "u", "Url": "U"}]}}"""
      ).mkString("\n"))
    // deterministic stream order: day 1 strictly older everywhere
    for ((dir, d1, d2) <- Seq(
        (scholar, "2022_12_20_1671510000.123_scholar.jsonl", "2022_12_21_1671600000.456_scholar.jsonl"),
        (arxiv, "2022-12-20_1671510000.123_arxiv.json", "2022-12-21_1671600000.456_arxiv.json"),
        (nyt, "2022_12_20_1671510000.123_nyt.jsonl", "2022_12_21_1671600000.456_nyt.jsonl"))) {
      Files.setLastModifiedTime(dir.resolve(d1), FileTime.fromMillis(1_700_000_000_000L))
      Files.setLastModifiedTime(dir.resolve(d2), FileTime.fromMillis(1_700_000_100_000L))
    }

    // batch arm: one pipeline run per day
    val whB  = new Warehouse(spark, root.resolve("wh_b").toString)
    val pipe = new Pipeline(spark, whB, scholar.toString, arxiv.toString, nyt.toString)
    assert(pipe.run("20221220").skipped.isEmpty)
    assert(pipe.run("20221221").skipped.isEmpty)

    // stream arm: the three source streams over the same landing dirs
    val whS = new Warehouse(spark, root.resolve("wh_s").toString)
    val qs = Seq(
      StreamingIngest.scholarIngest(spark, whS, scholar.toString,
        StreamingIngest.inferScholarSchema(spark, scholar.toString)),
      StreamingIngest.arxivIngest(spark, whS, arxiv.toString,
        StreamingIngest.inferArxivSchema(spark, arxiv.toString)),
      StreamingIngest.nytIngest(spark, whS, nyt.toString,
        StreamingIngest.inferLandingSchema(spark, nyt.toString)))
    try qs.foreach(_.processAllAvailable()) finally qs.foreach(_.stop())

    def rows(wh: Warehouse, table: String, cols: Seq[String], dateCols: Seq[String]) =
      wh.table("silver", table)
        .select(cols.map(col) ++
          dateCols.map(c => date_format(col(c), "yyyy-MM-dd").as(c)): _*)
        .collect().map(_.toSeq).toSet
    for ((table, cols, dateCols) <- Seq(
        ("google_scholar",
          Seq("ggl_sk", "link", "result_id", "snippet", "title", "source_file_name"),
          Seq("publish_dt", "run_date")),
        ("arxiv",
          Seq("arx_sk", "id", "version", "link", "summary", "title", "source_file_name"),
          Seq("updated_dt", "run_date")),
        ("nytarchive",
          Seq("nyt_sk", "id", "abstract", "lead_paragraph", "snippet", "source_file_name"),
          Seq("publish_dt", "run_date"))))
      assert(rows(whS, table, cols, dateCols) == rows(whB, table, cols, dateCols),
        s"stream silver.$table diverged from the batch pipeline")
    // the interesting rows made it: scholar's stale r4 dropped, arxiv at v3
    assert(whS.table("silver", "google_scholar").count() == 3)
    val v = whS.table("silver", "arxiv").filter($"id" === "2212.01234")
      .select("version").head().getString(0)
    assert(v == "3")
  }

  test("streaming burstiness: out-of-order batch marks the user stale, sticky") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_stream_burst_stale").toString
    // user 1 arrives time-monotone; user 2's second batch REWINDS
    // behind its stored watermark (first event predates batch-1 max)
    def ev(id: Long, ts: String, user: Long) = (id, ts, user, "view", 1.0)
    val b1 = Seq(
      ev(1, "2024-01-01 00:00:01", 1), ev(2, "2024-01-01 00:00:03", 1),
      ev(3, "2024-01-01 00:00:06", 1), ev(4, "2024-01-01 00:00:10", 1),
      ev(11, "2024-01-01 00:01:00", 2), ev(12, "2024-01-01 00:01:05", 2),
      ev(13, "2024-01-01 00:01:11", 2), ev(14, "2024-01-01 00:01:18", 2))
    val b2 = Seq(
      ev(5, "2024-01-01 00:00:15", 1), ev(6, "2024-01-01 00:00:21", 1),
      ev(7, "2024-01-01 00:00:28", 1),
      ev(15, "2024-01-01 00:00:30", 2), // < user 2's stored 00:01:18
      ev(16, "2024-01-01 00:01:40", 2), ev(17, "2024-01-01 00:01:50", 2))
    // batch 3 is monotone again for both users — stale must STICK for 2
    val b3 = Seq(
      ev(8, "2024-01-01 00:00:36", 1), ev(9, "2024-01-01 00:00:45", 1),
      ev(10, "2024-01-01 00:00:55", 1),
      ev(18, "2024-01-01 00:02:01", 2), ev(19, "2024-01-01 00:02:13", 2),
      ev(20, "2024-01-01 00:02:26", 2))
    val empty = Tables.events(spark, "/root/testdata/sf0.001").filter(lit(false))
    EventStreams.seedBurstLedger(empty, s"$dir/ledger")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long, String, Double)]
    val q = EventStreams.incrementalBurstiness(
      ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("ts", $"ts".cast("timestamp")),
      s"$dir/tel", s"$dir/ledger")
    try {
      Seq(b1, b2, b3).foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"batch_id".desc)
    val latest = spark.read.parquet(s"$dir/tel")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"n_gaps", $"stale")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // user 1: 10 monotone events = 9 gaps, never stale
    assert(latest(1L) == ((9L, false)), s"user 1 state: ${latest(1L)}")
    // user 2: stale stuck through the monotone batch 3; the rewound
    // boundary gap was dropped (2 internal gaps in batch 2, not 3
    // stitched) so n_gaps = 3 + 2 + 1(batch-2 internal pair) + 3... =
    // seed 0 + b1 3 + b2 2 + stitch(b3) 1 + b3 2 = 8, one short of the
    // 9 a monotone replay would count
    assert(latest(2L)._2, s"user 2 not flagged stale: ${latest(2L)}")
    assert(latest(2L)._1 == 8L, s"user 2 n_gaps: ${latest(2L)}")
  }

  test("streaming quantiles: ledger buckets bracket the exact batch quantiles") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir        = Files.createTempDirectory("graft_stream_quant").toString
    val fixtureDir = "/root/testdata/sf0.001"
    // exact rank-selected quantiles from the batch q205
    val exact = QueriesSketch.q205_quantile_sketch(spark, fixtureDir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

    val evs = Tables.events(spark, fixtureDir)
      .select($"event_id", $"ts".cast("string"), $"user_id", $"event_type", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    EventStreams.seedQuantileLedger(
      Tables.events(spark, fixtureDir).filter(lit(false)), s"$dir/ledger")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long, String, Double)]
    val q = EventStreams.incrementalQuantiles(
      ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("ts", $"ts".cast("timestamp")),
      s"$dir/tel", s"$dir/ledger")
    val parts = evs.sortBy(_._1).grouped((evs.length + 2) / 3).toSeq
    try {
      parts.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"batch_id".desc)
    val got = spark.read.parquet(s"$dir/tel")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_type", $"p50_lo", $"p90_lo", $"bound")
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (t, (p50lo, p90lo, bound)) =>
      val (e50, e90) = exact(t)
      assert(e50 >= p50lo && e50 < p50lo + bound, s"$t p50 $e50 not in [$p50lo, ${p50lo + bound})")
      assert(e90 >= p90lo && e90 < p90lo + bound, s"$t p90 $e90 not in [$p90lo, ${p90lo + bound})")
    }
    // the ledger folds to the exact full-corpus histogram
    val folded = spark.read.parquet(s"$dir/ledger")
      .groupBy($"event_type", $"b").agg(sum($"c").as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exactHist = Tables.events(spark, fixtureDir)
      .select($"event_type", floor($"value" / 5.0).cast("long").as("b"))
      .groupBy($"event_type", $"b").agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(folded == exactHist)
  }

  test("streaming skew ledger: live profile equals the batch report, replay-idempotent, compaction exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir        = Files.createTempDirectory("graft_stream_skew").toString
    val fixtureDir = "/root/testdata/sf0.001"
    val batchReport = graft.operators.Skew
      .keySkewReport(Tables.events(spark, fixtureDir), "user_id", "events.user_id")
      .collect().head

    val evs = Tables.events(spark, fixtureDir)
      .select($"event_id", $"user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    EventStreams.seedSkewLedger(
      Tables.events(spark, fixtureDir).filter(lit(false)), "user_id", s"$dir/ledger")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val q = EventStreams.incrementalSkew(
      ms.toDF().toDF("event_id", "user_id"),
      "user_id", "events.user_id", s"$dir/tel", s"$dir/ledger")
    val parts = evs.sortBy(_._1).grouped((evs.length + 2) / 3).toSeq
    try {
      parts.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    def latestProfile() = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"key_col").orderBy($"batch_id".desc)
      spark.read.parquet(s"$dir/tel")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"key_col", $"n_rows", $"n_keys", $"max_key_rows", $"top_key", $"skew_ratio",
          $"hot_bytes_est", $"recommend_salt")
        .collect().head
    }
    val live = latestProfile()
    assert(live.toSeq == batchReport.toSeq,
      s"live profile ${live.toSeq} != batch report ${batchReport.toSeq}")

    // replayed final batch: its ledger partition is excluded then
    // overwritten — the folded counts and profile must not change
    val ms2 = MemoryStream[(Long, Long)]
    val q2 = EventStreams.incrementalSkew(
      ms2.toDF().toDF("event_id", "user_id"),
      "user_id", "events.user_id", s"$dir/tel", s"$dir/ledger")
    try {
      // same data as the stream's last micro-batch, same batch id (a
      // fresh stream restarts at batch 0 — overwrite its partition
      // with identical counts keeps the fold invariant only if the
      // replayed content matches; feed batch 0's rows again)
      ms2.addData(parts.head: _*); q2.processAllAvailable()
    } finally q2.stop()
    val afterReplay = latestProfile()
    assert(afterReplay.toSeq == batchReport.toSeq, "replay changed the profile")

    // compaction folds the ledger to one partition, value-identical
    EventStreams.compactSkewLedger(spark, s"$dir/ledger")
    val foldedCounts = spark.read.parquet(s"$dir/ledger")
      .groupBy($"k").agg(sum($"cnt").as("cnt"))
    val compactProfile = graft.operators.Skew
      .profileFromCounts(foldedCounts, "events.user_id").collect().head
    assert(compactProfile.toSeq == batchReport.toSeq, "compaction changed the fold")
    assert(spark.read.parquet(s"$dir/ledger").select($"batch_id").distinct().count() == 1)

    // crash chaos at the promote's only no-ledger window: between
    // move(dst, old) and move(tmp, dst) the complete ledger sits at
    // __old and nothing at the live path — the next compaction must
    // self-heal (one rename) instead of failing the read
    val dst = java.nio.file.Paths.get(s"$dir/ledger")
    val old = java.nio.file.Paths.get(s"$dir/ledger__old")
    java.nio.file.Files.move(dst, old)
    EventStreams.compactSkewLedger(spark, s"$dir/ledger")
    val healedProfile = graft.operators.Skew
      .profileFromCounts(
        spark.read.parquet(s"$dir/ledger").groupBy($"k").agg(sum($"cnt").as("cnt")),
        "events.user_id")
      .collect().head
    assert(healedProfile.toSeq == batchReport.toSeq, "self-heal lost ledger content")
    assert(!java.nio.file.Files.exists(old), "superseded copy must be gone after promote")
  }

  test("state-store provider guard: a PROGRESSED checkpoint refuses a flipped provider; a marker-only one re-pins") {
    val cp  = Files.createTempDirectory("graft_cp_guard").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    val hdfs =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val other =
      if (before.contains(graft.Engine.RocksDbProvider)) hdfs
      else graft.Engine.RocksDbProvider
    def restore(): Unit = before match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    try {
      graft.Engine.guardStateStoreProvider(spark, cp) // first use records
      graft.Engine.guardStateStoreProvider(spark, cp) // same provider: fine
      // marker-only checkpoint (no batch ever progressed): a flipped
      // session RE-PINS instead of refusing an empty directory — the
      // failure-before-first-batch / never-started recovery path
      spark.conf.set(key, other)
      graft.Engine.guardStateStoreProvider(spark, cp)
      // simulate progress the way Spark records it: offsets/<batchId>
      // lands before any state files
      Files.createDirectories(java.nio.file.Paths.get(cp, "offsets"))
      Files.writeString(java.nio.file.Paths.get(cp, "offsets", "0"), "{}")
      graft.Engine.guardStateStoreProvider(spark, cp) // pinned provider: fine
      // flipping back now hits provider-specific state: refuse, with
      // the marker-deletion recovery hint in the message
      restore()
      val e = intercept[IllegalArgumentException] {
        graft.Engine.guardStateStoreProvider(spark, cp)
      }
      assert(e.getMessage.contains("provider"), s"unexpected message: ${e.getMessage}")
      assert(e.getMessage.contains("_graft_state_provider"),
        "refusal must name the marker as the never-progressed recovery step")
    } finally restore()
  }
}

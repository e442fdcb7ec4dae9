package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Settings chosen for oracle parity (UTC, ANSI on — pinned, see below)
  * and for scale: AQE on (runtime re-planning, skew-join handling),
  * shuffle partitions sized to the local core count rather than the 200
  * default — on a real cluster this would be set to ~2-3x total
  * executor cores.
  *
  * `spark.sql.ansi.enabled=true` is pinned explicitly rather than
  * inherited from the Spark 4 default: the engine DEPENDS on ANSI
  * semantics (e.g. [[graft.operators.Dedup]] uses seeded re-hashing
  * instead of multiply-add minhash because long overflow throws under
  * ANSI), so a cluster-level override must not silently change it.
  *
  * `spark.sql.legacy.parquet.nanosAsLong=true` is a session-build conf
  * (not mutated inside table accessors): the events table is
  * TIMESTAMP(NANOS) parquet, which the vectorized reader otherwise
  * rejects; [[Tables.events]] truncates the long nanos to micros.
  *
  * Streaming state store: the default HDFS-backed provider keeps EVERY
  * key's state on the executor HEAP — at 100 TB-stream state
  * (sessionization over billions of users, the stream-stream interval
  * join's buffered rows) that is an OOM by design. `rocksDbStateStore`
  * switches the engine to Spark's built-in RocksDB provider (state
  * lives off-heap/on-disk per executor, memory bounded by block cache;
  * `rocksdbjni` ships with Spark) — results are provider-invariant,
  * pinned by StreamingSpec's twin run. Also reachable per-run via
  * `SPARK_GRAFT_ROCKSDB=1` or, per-query, by setting
  * `spark.sql.streaming.stateStore.providerClass` before `start()`
  * (the conf is captured at query start).
  */
object Engine {
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def session(
      cores: Int = Runtime.getRuntime.availableProcessors(),
      rocksDbStateStore: Boolean = sys.env.get("SPARK_GRAFT_ROCKSDB").contains("1")
  ): SparkSession = {
    val builder = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // r19 join-strategy sweep (guide §3.1/§9, tools/JoinSweep): let
      // the planner pick shuffled-hash over sort-merge when its size
      // conditions hold, and let AQE rewrite SMJ→SHJ at runtime when
      // every post-shuffle build partition is under 64 MB (a
      // per-partition memory bound — scale-independent; default 0 = off).
      // Measured geomean 0.90 over the 15 join-heaviest queries at
      // sf0.1/32 (q33/q64/q213/q214 ≈ −22%), zero value changes
      // (strategy only; auto-broadcast decisions are unaffected).
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64MB")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark =
      (if (rocksDbStateStore)
         builder.config("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
       else builder)
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private val DefaultStateStoreProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** Fail fast when a streaming `checkpoint` is resumed under a
    * DIFFERENT state-store provider than it was created with.
    * `SPARK_GRAFT_ROCKSDB` (and the providerClass conf) flip the
    * provider per PROCESS, but a checkpoint's state files are
    * provider-specific — resuming HDFS-provider state under RocksDB
    * (or vice versa) fails deep inside state load with an opaque
    * error. This records the session's provider in a
    * `_graft_state_provider` marker on first use of the checkpoint and
    * requires it to match ever after, so the mismatch surfaces at
    * `start()` with an actionable message instead. The pin only BINDS
    * once the checkpoint holds actual progress (an `offsets` entry):
    * a marker-only checkpoint — the stream was never started, or
    * failed before its first batch — carries no provider-specific
    * state, so a flipped session simply re-pins it instead of refusing
    * an empty directory. Wired into every checkpointed graft sink
    * (WarehouseStreams); call it before `start()` for ad-hoc
    * checkpointed queries too. Local-FS paths (the engine's ledger
    * convention); swap for Hadoop FS calls when checkpoints move to
    * HDFS/S3.
    */
  def guardStateStoreProvider(spark: SparkSession, checkpoint: String): Unit = {
    val provider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .map(_.trim).filter(_.nonEmpty).getOrElse(DefaultStateStoreProvider)
    val dir    = java.nio.file.Paths.get(checkpoint)
    val marker = dir.resolve("_graft_state_provider")
    // provider-specific state exists only once a batch has progressed:
    // Spark writes offsets/<batchId> before any state files
    def hasProgress: Boolean = {
      val off = dir.resolve("offsets")
      java.nio.file.Files.isDirectory(off) && {
        val s = java.nio.file.Files.list(off)
        try s.findFirst.isPresent finally s.close()
      }
    }
    if (java.nio.file.Files.exists(marker)) {
      val recorded = new String(java.nio.file.Files.readAllBytes(marker), "UTF-8").trim
      if (recorded != provider && !hasProgress) {
        // marker-only checkpoint: nothing provider-specific exists yet —
        // re-pin to the session's provider instead of refusing
        java.nio.file.Files.write(marker, provider.getBytes("UTF-8"))
        ()
      } else require(recorded == provider,
        s"streaming checkpoint $checkpoint was created under state-store provider " +
          s"$recorded but this session runs $provider (SPARK_GRAFT_ROCKSDB and " +
          "spark.sql.streaming.stateStore.providerClass flip it per process). A " +
          "checkpoint's provider must stay stable for its lifetime: resume with the " +
          "original provider, or start a fresh checkpoint for the new one (if this " +
          "checkpoint truly never progressed, deleting its _graft_state_provider " +
          "marker re-pins it).")
    } else {
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(marker, provider.getBytes("UTF-8"))
      ()
    }
  }
}

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
}

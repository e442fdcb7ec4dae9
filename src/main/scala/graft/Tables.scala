package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Accessors for the synthetic test tables (TESTDATA.md).
  *
  * Each accessor is a plain parquet scan; Catalyst pushes projections
  * and predicates into the scan, so callers should NOT pre-select —
  * just chain `.select`/`.filter` and let pushdown do its job.
  */
object Tables {
  /** Analyzed-scan cache (r18): every bare `spark.read.parquet` pays a
    * footer-inference Spark job at plan time — across 216 bench queries
    * × 3 trials × 1-4 source tables each, those jobs alone are seconds
    * of pure scheduling. An entry is reused only while (a) the session
    * matches (a new session — test suites — replaces stale entries
    * instead of growing the map, so no stopped session is ever pinned)
    * and (b) the path's last-modified time is unchanged — one driver
    * stat per read, no Spark job — so a test fixture that OVERWRITES
    * its parquet dir in place (CorpusSpec's drift fixture) invalidates
    * instead of serving a stale file list.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, Long, DataFrame)]()

  private def mtimeOf(path: String): Long =
    try java.nio.file.Files
      .getLastModifiedTime(java.nio.file.Paths.get(path)).toMillis
    catch { case _: java.io.IOException => -1L }

  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val mt   = mtimeOf(path)
    val hit  = cache.get(path)
    if (hit != null && (hit._1 eq spark) && hit._2 == mt && mt >= 0) hit._3
    else {
      val df = spark.read.parquet(path)
      cache.put(path, (spark, mt, df))
      df
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")
  /** events.ts has shipped as two different parquet physical types across
    * testdata generations: TIMESTAMP(NANOS) — which Spark surfaces as BIGINT
    * nanos under `spark.sql.legacy.parquet.nanosAsLong=true` (set at session
    * build: [[Engine.session]], `Verify`, `Bench`) — and TIMESTAMP(MICROS)
    * NTZ. Branch on the scanned type so both generations analyze:
    *   - LongType (nanos-as-long): truncate nanos→micros, matching DuckDB's
    *     own truncation so oracle comparisons agree.
    *   - TimestampNTZ / Timestamp: cast to TimestampType; under the UTC
    *     session timezone this is value-identical to the truncated output.
    * Accessors never mutate session conf.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}

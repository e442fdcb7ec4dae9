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
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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

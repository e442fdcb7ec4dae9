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
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects; read nanos as long and truncate to micros (DuckDB
    * truncates the same way, so oracle comparisons agree). Requires
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set at session build
    * ([[Engine.session]], `Verify`, `Bench`) — accessors never mutate
    * session conf.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build (see Engine.session)"
    )
    read(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}

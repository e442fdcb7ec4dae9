package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Core relational operator slate (SURVEY.md §2), re-expressed over the
  * driver's synthetic tables. Each query here has a DuckDB oracle in
  * [[Oracles]]; names and column aliases must match exactly.
  *
  * Scale notes (100 TB readiness) are given per query — the driving
  * principles: aggregate before join where possible, broadcast bounded
  * dimensions, keep every expression codegen-able (no UDFs in this file),
  * and always let filters/projections reach the parquet scan.
  */
object Queries {

  /** Exact-decimal sum of a nominally 2-decimal double column, returned
    * as double. Casting per-row to DECIMAL(18,2) makes the aggregation
    * order-independent (decimal addition is exact), so results are
    * bit-identical across engines and partitionings — `round(sum(x),2)`
    * is NOT: values at a rounding boundary flip with summation order.
    */
  def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Same, for 4-decimal products (e.g. price * (1 - discount)). */
  def dsum4(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Q1-style full-table aggregation (SURVEY §2.4 A1/A2 generalized to
    * GROUP BY). Map-side partial aggregation makes this a single
    * narrow-shuffle of 6 groups regardless of input size.
    */
  def q01_pricing_summary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum2($"l_quantity").as("sum_qty"),
        dsum2($"l_extendedprice").as("sum_base_price"),
        dsum4($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        (dsum2($"l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order")
      )
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Silver-style typed projection (SURVEY §2.2 P5/P6): casts, substring
    * family, concat_ws, lower — pure Project over the scan, pruned to the
    * referenced columns (ReadSchema shows only 4 of 6 order columns).
    */
  def q02_typed_projection(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .orders(spark, dir)
      .select(
        $"o_orderkey".cast("string").as("order_id"),
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_dt"),
        substring($"o_orderpriority", 1, 1).as("prio_code"),
        lower(concat_ws("-", $"o_orderstatus", $"o_orderpriority")).as("status_tag"),
        ($"o_totalprice" * 2.0).as("double_price")
      )
      .orderBy($"order_id")
  }

  /** Incremental high-water-mark filter + new-watermark computation
    * (SURVEY §2.2 P7 + §2.4 A2, the silver incremental-load pattern).
    * Predicate is pushed into the parquet scan (PushedFilters).
    */
  def q03_watermark_filter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1999-01-01").cast("timestamp"))
      .agg(
        count(lit(1)).as("n_rows"),
        dsum2($"l_quantity").as("sum_qty"),
        max(date_format($"l_shipdate", "yyyy-MM-dd")).as("new_watermark")
      )
  }

  /** Surrogate-key derivation sha2(concat_ws('||', ...), 256)
    * (SURVEY §1.4, silver_arxiv.py:117). Stateless narrow op — scales
    * linearly, no shuffle.
    */
  def q04_surrogate_key(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .customer(spark, dir)
      .select(
        $"c_custkey",
        sha2(concat_ws("||", $"c_custkey", $"c_name"), 256).as("c_sk")
      )
      .orderBy($"c_custkey")
  }

  /** Multi-way join + aggregation: revenue per nation. nation/region are
    * bounded dimensions → explicit broadcast; the lineitem⋈orders join is
    * the only real shuffle. At 100 TB, orders/lineitem co-partitioned on
    * orderkey (bucketing) would remove that shuffle too.
    */
  def q05_join_agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        dsum4($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items")
      )
      .orderBy($"r_name", $"n_name")
  }

  /** Broadcast-hash join against a small dimension (SURVEY §2.3 J3
    * relational form): lineitem ⋈ broadcast(part) → per-brand stats.
    */
  def q06_broadcast_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        count(lit(1)).as("n_items"),
        dsum2($"l_quantity").as("sum_qty"),
        (dsum2($"p_retailprice") / count(lit(1))).as("avg_retail")
      )
      .orderBy($"p_brand")
  }

  /** Anti join (SURVEY §2.3 J2 — the NOT IN append guard): customers with
    * no orders. Catalyst plans left_anti as broadcast-hash-anti when the
    * right side is small; at scale, a shuffled hash anti-join on the key.
    */
  def q07_anti_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables
      .orders(spark, dir)
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select($"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Semi join (EXISTS): customers having at least one order over 400k.
    * left_semi stops probing after first match — cheaper than join+distinct.
    */
  def q08_semi_join(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter($"o_totalprice" > 400000.0)
    c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_mktsegment")
      .orderBy($"c_custkey")
  }
}

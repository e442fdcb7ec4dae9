package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.operators.{Upsert, Windows}
import graft.functions.TextFunctions

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
    * The max aggregates the RAW timestamp and only the single output
    * row is formatted — `max(date_format(...))` would pay a per-row
    * string render for a one-row result (yyyy-MM-dd order equals
    * timestamp order, so the two forms agree).
    */
  def q03_watermark_filter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1999-01-01").cast("timestamp"))
      .agg(
        count(lit(1)).as("n_rows"),
        dsum2($"l_quantity").as("sum_qty"),
        max($"l_shipdate").as("__max_ship")
      )
      .select(
        $"n_rows",
        $"sum_qty",
        date_format($"__max_ship", "yyyy-MM-dd").as("new_watermark")
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

  /** MERGE-style upsert as full-outer join (SURVEY §2.1 S9, §2.3 J1;
    * reference silver_arxiv.py:130-152), via [[graft.operators.Upsert]].
    * tgt = orders before 2000; src = the overlapping 1999+ batch with a
    * higher version and shifted price. The oracle reproduces the exact
    * WHEN MATCHED AND src.v > tgt.v semantics in SQL.
    */
  def q09_upsert_merge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val tgt = orders
      .filter($"o_orderdate" < lit("2000-01-01").cast("timestamp"))
      .select($"o_orderkey".as("k"), $"o_totalprice".as("p"), lit(1).as("v"))
    val src = orders
      .filter($"o_orderdate" >= lit("1999-01-01").cast("timestamp"))
      .select($"o_orderkey".as("k"), ($"o_totalprice" + 1000.0).as("p"), lit(2).as("v"))
    Upsert
      .plan(tgt, src, Seq("k"), "v")
      .orderBy($"k")
  }

  /** UNION ALL of heterogeneous sources with literal tags (SURVEY §2.7
    * U1 — the gold 3-way combine). Positional union, schemas aligned by
    * construction.
    */
  def q10_union_all(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables
      .customer(spark, dir)
      .select(lit("customer").as("src"), $"c_name".as("name"), $"c_acctbal".as("acctbal"))
    val s = Tables
      .supplier(spark, dir)
      .select(lit("supplier").as("src"), $"s_name".as("name"), $"s_acctbal".as("acctbal"))
    c.union(s).orderBy($"src", $"name")
  }

  /** Top-k by sort (SURVEY §2.6 O1/O2). Spark plans orderBy+limit as
    * TakeOrderedAndProject — a per-partition top-k then a driver merge,
    * no full sort, no full shuffle. Exactly what you want at 100 TB.
    */
  def q11_topk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .orders(spark, dir)
      .select(
        $"o_orderkey",
        $"o_totalprice",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_dt")
      )
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  /** Latest record per key (SURVEY §2.5 — the generalization of the
    * reference's version-conditional MERGE), via [[graft.operators.Windows]].
    */
  def q12_latest_per_key(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Windows
      .latestPerKey(
        Tables.orders(spark, dir),
        keys = Seq("o_custkey"),
        orderDesc = Seq("o_orderdate", "o_orderkey")
      )
      .select(
        $"o_custkey",
        $"o_orderkey".as("latest_orderkey"),
        date_format($"o_orderdate", "yyyy-MM-dd").as("latest_dt")
      )
      .orderBy($"o_custkey")
  }

  /** Generator / explode + token frequency (SURVEY §2.8 explode; the
    * relational form of the reference's Tokenizer, gold_article_scoring
    * .py:49-50). explode→groupBy is fully map-side-combinable.
    */
  def q13_explode_tokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(explode(split($"text", "\\s+")).as("token"))
      .filter(length($"token") > 2)
      .groupBy($"token")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token")
      .limit(20)
  }

  /** clean_text column composition (reference gold_article_scoring
    * .py:36-41) — stays entirely inside whole-stage codegen; the
    * reference pays a Python UDF boundary here.
    */
  def q14_clean_text(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select($"doc_id", TextFunctions.cleanText($"text").as("cleaned"))
      .orderBy($"doc_id")
  }

  /** Term-weight scoring, relational rewrite of the reference's
    * score_udf (gold_article_scoring.py:92-144; SURVEY §2.3 J3):
    * explode distinct tokens → broadcast-join a weight dict →
    * groupBy(doc).sum(weight) → threshold filter. Scales to 100 TB where
    * the reference's per-row Python closure cannot. Weight dict here is
    * fitted to the synthetic vocabulary; the library default is the
    * reference's 31 clean-tech terms ([[TextFunctions.cleanTechTerms]]).
    */
  def q15_term_score(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weights = Seq(
      ("spark", 20), ("query", 15), ("join", 12), ("window", 8),
      ("stream", 7), ("data", 5), ("hash", 9), ("merge", 6),
      ("filter", 4), ("vector", 11)
    ).toDF("token", "weight")
    val tokens = Tables
      .documents(spark, dir)
      .select($"doc_id", explode(split(TextFunctions.cleanText($"text"), "\\s+")).as("token"))
      .filter(length($"token") > 2)
      .filter(!$"token".isin(TextFunctions.englishStopWords: _*))
      .distinct()
    tokens
      .join(broadcast(weights), Seq("token"))
      .groupBy($"doc_id")
      .agg(sum($"weight").as("score"), count(lit(1)).as("n_scored_terms"))
      .filter($"score" > 0)
      .orderBy($"doc_id")
  }

  /** days_ago publish-date derivation (intended semantics of the
    * reference UDF, silver_google_scholar.py:107-141 — regexp extract +
    * date_sub + coalesce fallback to run_date), via
    * [[TextFunctions.daysAgo]]. Codegen-able; no UDF.
    */
  def q16_days_ago(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val runDate = lit("2024-06-01").cast("date")
    Tables
      .documents(spark, dir)
      .select(
        $"doc_id",
        TextFunctions.daysAgo($"text").as("days_ago"),
        date_format(
          coalesce(date_sub(runDate, coalesce(TextFunctions.daysAgo($"text"), lit(0))), runDate),
          "yyyy-MM-dd"
        ).as("publish_dt")
      )
      .orderBy($"doc_id")
  }

  /** Exact deduplication by content hash (hash-groupBy; the scale
    * baseline for the dedup family): sha2(text) → keep min doc_id.
    * One shuffle on the 256-bit key; at 100 TB, pre-partition by a
    * hash prefix and use sort-based agg to bound memory.
    */
  def q17_dedup_exact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .groupBy(sha2($"text", 256).as("content_key"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keep_id")
  }

  /** Distinct-count aggregation per group (SURVEY §2.4 family —
    * cross-row distinct the reference lacks). count(DISTINCT) plans as
    * a two-phase expand+agg; for approximate needs at scale see the
    * HLL variant (approx_count_distinct) in the bench-only queries.
    */
  def q18_distinct_count(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .customer(spark, dir)
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_cust"),
        countDistinct($"c_nationkey").as("n_nations")
      )
      .orderBy($"c_mktsegment")
  }

  /** Tumbling-window aggregation over the event stream, batch form
    * (day buckets). Mirrors the Structured Streaming windowed agg in
    * graft.streaming; deterministic for the oracle.
    */
  def q19_events_day_agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .events(spark, dir)
      .groupBy(
        date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"),
        $"event_type"
      )
      .agg(
        count(lit(1)).as("n"),
        dsum2($"value").as("sum_value")
      )
      .orderBy($"day", $"event_type")
  }

  /** Running windowed aggregate + row_number (frame spec
    * rows unbounded-preceding..current), via [[Windows.runningSum]].
    * Decimal-cast keeps the running sum bit-deterministic.
    */
  def q20_running_window(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val w = Window
      .partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    orders
      .select(
        $"o_custkey",
        $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_dt"),
        Windows
          .runningSum(Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"),
            $"o_totalprice".cast(DecimalType(18, 2)))
          .cast("double")
          .as("running_spend"),
        row_number().over(w).as("order_seq")
      )
      .orderBy($"o_custkey", $"o_orderkey")
  }
}

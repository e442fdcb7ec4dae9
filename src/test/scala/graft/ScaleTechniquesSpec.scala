package graft

import graft.operators.Salt
import graft.sources.Warehouse
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale techniques made observable at test size: partition pruning on
  * run_date-partitioned tables, and salted joins/aggregations matching
  * their unsalted results.
  */
class ScaleTechniquesSpec extends SparkSpec {

  test("run_date-partitioned table prunes partitions on a date filter") {
    val root = Files.createTempDirectory("graft_part").toString
    val wh = new Warehouse(spark, root)
    val events = Tables
      .events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    wh.createOrReplacePartitioned("gold", "events_by_day", events, Seq("day"))

    val filtered = wh.table("gold", "events_by_day").filter(col("day") === "2024-01-05")
    val scan = filtered.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains("isnotnull(day") || scan.contains("(day"), scan)
    // pruned read returns exactly that day's rows
    val expected = events.filter(col("day") === "2024-01-05").count()
    assert(filtered.count() == expected)
    // and the scan touches only one partition directory
    val files = filtered.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("day=2024-01-05")), files.mkString(","))
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val part = Tables.part(spark, sfDir).select($"p_partkey", $"p_brand")
    val plain = li
      .join(part, $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salt
      .saltedJoin(
        li.withColumnRenamed("l_partkey", "p_partkey"),
        part,
        key = "p_partkey",
        entropy = col("l_orderkey"),
        factor = 8
      )
      .groupBy($"p_brand").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val direct = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salt
      .saltedSumCount(li, "l_returnflag", $"l_quantity", $"l_orderkey", factor = 8)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(salted == direct)
  }

  test("runtime bloom filter injects a scan-level semi-filter on a selective shuffle join") {
    import spark.implicits._
    // The 100 TB shape: a big fact side shuffle-joins a dim filtered
    // selectively — InjectRuntimeFilter plants might_contain(bloom)
    // on the FACT SCAN, so rows that cannot match never reach the
    // shuffle. On by default; the size thresholds exist so tiny scans
    // don't pay bloom construction — lowered here so the optimizer
    // sees this test corpus the way it sees real partitions.
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = Tables.orders(spark, sfDir)
      val cust   = Tables.customer(spark, sfDir).filter($"c_mktsegment" === "BUILDING")
      val joined = orders
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom runtime filter on the fact side, plan:\n${optimized.take(2000)}")
      // and the filter is semantics-preserving
      val n = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = orders
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(n == plain && n.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

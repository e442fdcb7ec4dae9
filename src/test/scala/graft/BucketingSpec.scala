package graft

import org.apache.spark.sql.functions._

/** The 100 TB co-location story made concrete: bucketed tables joined
  * on the bucket key must NOT shuffle either side (no Exchange in the
  * physical plan) — this is the pre-partitioning that removes the
  * lineitem⋈orders exchange called out in PLANS.md.
  */
class BucketingSpec extends SparkSpec {

  test("join on the bucket key plans without a shuffle") {
    // warehouse.dir is a static conf — bucketed tables land in the
    // session default (./spark-warehouse); dropped below. Also scrub
    // leftover locations from aborted runs (a fresh session catalog
    // doesn't know them, so DROP alone can't).
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }

    Tables
      .orders(spark, sfDir)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("b_orders")
    Tables
      .lineitem(spark, sfDir)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("b_lineitem")

    // disable auto-broadcast: at 100 TB neither side broadcasts — the
    // point is that the SortMergeJoin consumes the bucketed layout with
    // no Exchange on either input. Pin preferSortMergeJoin=true for
    // this test (r19 sessions default it false): the contract pinned
    // HERE is specifically SMJ-over-bucketed-layout; the shuffled-hash
    // preference elsewhere is strategy-only and orthogonal.
    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val priorPreferSmj = spark.conf.get("spark.sql.join.preferSortMergeJoin")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    val joined =
      try {
        val j = spark
          .table("b_lineitem")
          .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
        j.count() // materialize plan under the no-broadcast setting
        j
      } finally ()

    val plan = joined.queryExecution.executedPlan.toString()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
    spark.conf.set("spark.sql.join.preferSortMergeJoin", priorPreferSmj)
    assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin:\n$plan")
    val exchangesBeforeAgg = plan
      .linesIterator
      .filter(_.contains("Exchange"))
      .toList
    // exactly one exchange allowed: the 5-group aggregate; the join itself
    // must consume the bucketed layout directly
    assert(
      exchangesBeforeAgg.size <= 1,
      s"bucketed join should not shuffle its inputs:\n$plan"
    )
    assert(joined.count() > 0)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}

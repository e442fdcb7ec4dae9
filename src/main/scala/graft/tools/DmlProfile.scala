package graft.tools

import graft._
import graft.operators.MaterializedAgg
import org.apache.spark.sql.functions._

/** Throwaway step-level profiler for the incremental-MV bench bodies
  * (q83/q101): times each DML phase separately so optimization targets
  * the measured hotspot, not a guess. Not part of the driver contract.
  */
object DmlProfile {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[dmlprof] $label%-40s ${(System.nanoTime() - s) / 1e9}%.2f s")
      r
    }

    // q83 shape, fresh warehouse each run (no Scratch caching here)
    val whRoot = java.nio.file.Files.createTempDirectory("dmlprof_wh").toString
    val wh     = new graft.sources.Warehouse(spark, whRoot)
    t("ctas silver.ord (150k)") {
      wh.createOrReplace("silver", "ord",
        Tables.orders(spark, dir)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice", lit(0L).as("version")))
    }
    t("mv build") {
      MaterializedAgg.build(wh, "silver", "ord", "gold", "custspend",
        Seq("o_custkey"), "o_totalprice")
    }
    t("upsert 15k delta") {
      wh.upsert("silver", "ord",
        Tables.orders(spark, dir)
          .filter($"o_orderkey" % 10 === 0)
          .select($"o_orderkey", $"o_custkey", ($"o_totalprice" + 100).as("o_totalprice"),
            lit(1L).as("version")),
        Seq("o_orderkey"), "version")
    }
    t("delete %17") { wh.delete("silver", "ord", $"o_orderkey" % 17 === 0) }
    t("mv refresh") {
      MaterializedAgg.refresh(wh, "silver", "ord", "gold", "custspend",
        Seq("o_custkey"), "o_totalprice")
    }
    t("result read") {
      wh.table("gold", "custspend").select($"o_custkey").count()
    }

    // sub-steps of the unpartitioned merge, timed against a fresh copy
    val whRoot2 = java.nio.file.Files.createTempDirectory("dmlprof_wh2").toString
    val wh2     = new graft.sources.Warehouse(spark, whRoot2)
    t("sub: ctas") {
      wh2.createOrReplace("silver", "ord",
        Tables.orders(spark, dir)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice", lit(0L).as("version")))
    }
    val tgt = wh2.table("silver", "ord")
    val src = Tables.orders(spark, dir)
      .filter($"o_orderkey" % 10 === 0)
      .select($"o_orderkey", $"o_custkey", ($"o_totalprice" + 100).as("o_totalprice"),
        lit(1L).as("version"))
    val mr = t("sub: metrics pass") {
      graft.operators.Upsert.mergeWithMetrics(tgt, src, Seq("o_orderkey"), "version")
    }
    t("sub: result write") {
      mr.result.write.mode("overwrite").parquet(s"$whRoot2/staging_probe")
    }
    t("sub: feed post+pre write") {
      val post = mr.merged
        .filter(col(graft.operators.Upsert.ActionCol) =!= "keep")
        .drop(graft.operators.Upsert.ActionCol)
      post.write.mode("overwrite").parquet(s"$whRoot2/feed_probe")
    }

    // q101 shape: partitioned base
    val whRootP = java.nio.file.Files.createTempDirectory("dmlprof_whp").toString
    val whp     = new graft.sources.Warehouse(spark, whRootP)
    t("ctas partitioned silver.ordp") {
      whp.createOrReplacePartitioned("silver", "ordp",
        Tables.orders(spark, dir)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice",
            lit(0L).as("version"), $"o_orderpriority"),
        Seq("o_orderpriority"))
    }
    t("mv build (p)") {
      MaterializedAgg.build(whp, "silver", "ordp", "gold", "custspendp",
        Seq("o_custkey"), "o_totalprice")
    }
    t("upsert 15k delta (p)") {
      whp.upsert("silver", "ordp",
        Tables.orders(spark, dir)
          .filter($"o_orderkey" % 10 === 0)
          .select($"o_orderkey", $"o_custkey", ($"o_totalprice" + 100).as("o_totalprice"),
            lit(1L).as("version"), $"o_orderpriority"),
        Seq("o_orderkey"), "version")
    }
    t("delete %17 (p)") { whp.delete("silver", "ordp", $"o_orderkey" % 17 === 0) }
    t("mv refresh (p)") {
      MaterializedAgg.refresh(whp, "silver", "ordp", "gold", "custspendp",
        Seq("o_custkey"), "o_totalprice")
    }
    spark.stop()
  }
}

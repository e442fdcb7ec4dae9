package graft.tools

import graft._
import graft.operators.MaterializedAgg
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Warm-path job-count profile for the q83-shaped DML body: builds the
  * warehouse once, runs the timed body (upsert + delete + refresh)
  * repeatedly, and prints per-op wall time and Spark job count for the
  * WARM repetitions — the state the bench's best-of-3 actually times.
  * `sbt "runMain graft.tools.DmlJobs [sfDir]"`.
  */
object DmlJobs {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(cores = 32)
    import spark.implicits._
    val jobs  = new java.util.concurrent.atomic.AtomicInteger(0)
    val trace = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (trace.get()) {
          val det = j.stageInfos.lastOption.map(_.details).getOrElse("")
          val site = det.linesIterator
            .find(l => l.contains("graft.") && !l.contains("tools.DmlJobs"))
            .getOrElse(det.linesIterator.take(1).mkString)
          println(s"[dmljobs]   job ${j.jobId}: ${j.stageInfos.lastOption.map(_.name).getOrElse("?")} @ ${site.trim}")
        }
        ()
      }
    })
    def t[A](label: String)(f: => A): A = {
      val j0 = jobs.get(); val s = System.nanoTime(); val r = f
      println(f"[dmljobs] $label%-34s ${(System.nanoTime() - s) / 1e9}%6.2f s  jobs=${jobs.get() - j0}%3d")
      r
    }
    val whRoot = java.nio.file.Files.createTempDirectory("dmljobs_wh").toString
    val wh     = new graft.sources.Warehouse(spark, whRoot)
    wh.createOrReplace("silver", "ord",
      Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", lit(0L).as("version")))
    MaterializedAgg.build(wh, "silver", "ord", "gold", "custspend",
      Seq("o_custkey"), "o_totalprice")
    for (pass <- 1 to 3) {
      println(s"--- pass $pass ---")
      trace.set(pass == 3)
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
      t("result read+orderBy noop") {
        wh.table("gold", "custspend")
          .select($"o_custkey", $"sum_v".cast("double").as("spend"), $"n")
          .orderBy($"o_custkey")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

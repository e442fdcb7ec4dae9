package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` output for selected declared queries to
  * files — the before/after plan evidence the optimization rounds
  * commit under `plans/r<N>/<query>_{before,after}.txt`.
  *
  * `sbt "runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...>"`
  * e.g. `runMain graft.tools.PlanDump plans/r18 before q143,q172`.
  * Query names match by substring, so `q143` hits `q143_dedup_keep_best`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...> [dataDir]")
    val outDir  = args(0)
    val suffix  = args(1)
    val filters = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val dir     = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    val spark   = graft.Engine.session(8)
    Files.createDirectories(Paths.get(outDir))
    val hits = graft.SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      filters.exists(name.contains)
    }
    hits.foreach { case (name, fn) =>
      val df   = fn(spark, dir)
      val txt  = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      val path = Paths.get(outDir, s"${name}_$suffix.txt")
      Files.write(path, txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $path")
    }
    spark.stop()
  }
}

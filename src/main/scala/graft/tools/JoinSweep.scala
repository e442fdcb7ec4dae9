package graft.tools

import graft.{Engine, SparkEntry}

/** A/B sweep of `spark.sql.join.preferSortMergeJoin` (guide §3.1/§9)
  * over the join-heavy slate — the r19 verdict's item 4. Runs each
  * named query best-of-2 under the default planner and again with
  * shuffled-hash joins preferred (plus the AQE local-map threshold so
  * runtime SMJ→SHJ rewrites can fire), in ONE session, and prints the
  * per-query wall pairs. A dev measurement tool: the driver's Bench is
  * untouched — winners get pinned at their call sites (hints), never
  * by a session conf the cluster could override.
  * `sbt "runMain graft.tools.JoinSweep [q1,q2,...] [sfDir]"`.
  */
object JoinSweep {
  def main(args: Array[String]): Unit = {
    val filters = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q25", "q26", "q33", "q38", "q39", "q47", "q53", "q62", "q64",
        "q115", "q127", "q143", "q191", "q213", "q214"))
    val dir   = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Engine.session(32)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val entries = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      filters.exists(n.contains)
    }
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); noop(fn(spark, dir)); (System.nanoTime() - t0) / 1e9
    }
    def best2(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      math.min(timeOnce(fn), timeOnce(fn))
    // warm both modes' codegen before timing either
    entries.foreach { case (_, fn) => timeOnce(fn) }
    val results = entries.map { case (name, fn) =>
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
      spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
      val smj = best2(fn)
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64MB")
      val shj = best2(fn)
      println(f"[joinsweep] $name%-36s smj=$smj%7.3f  shj=$shj%7.3f  ratio=${shj / smj}%5.2f")
      (name, smj, shj)
    }
    val gm = math.exp(results.map(r => math.log(r._3 / r._2)).sum / results.length)
    println(f"[joinsweep] geomean shj/smj over ${results.length} queries: $gm%.3f")
    spark.stop()
  }
}

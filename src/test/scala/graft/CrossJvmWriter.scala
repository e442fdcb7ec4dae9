package graft

/** Second-driver-JVM contender for ConcurrencySpec's cross-process lock
  * proofs: boots its OWN SparkSession (a genuinely separate process —
  * no shared ThreadLocals, no shared lock cache, nothing but the
  * filesystem marker between it and the spec's JVM), opens the shared
  * warehouse root, and runs `nOps` operations against the contended
  * table. Three modes, one per maintenance race the spec pins:
  *
  *   - `upsert` — versioned upserts (the multi-writer merge race)
  *   - `compact` — whole-table compactions (the maintenance op that
  *     rewrites every file a concurrent reader may hold)
  *   - `clone` — deep clones of the contended table into fresh names
  *     (each clone must be a CONSISTENT snapshot of some committed
  *     version, never a torn mix of generations)
  *
  * Barrier protocol (plain marker files, same idea as the lock):
  * writes `_xjvm_ready_<tid>` once its session is up, then waits for
  * the parent's `_xjvm_go` so both processes enter the write loop
  * together — otherwise the ~30 s JVM+Spark boot would serialize the
  * "concurrent" writers by accident.
  */
object CrossJvmWriter {
  def main(args: Array[String]): Unit = {
    val Array(root, tidS, nOpsS) = args.take(3)
    val mode = if (args.length > 3) args(3) else "upsert"
    val tid  = tidS.toLong
    val nOps = nOpsS.toInt
    val spark = org.apache.spark.sql.SparkSession
      .builder()
      .master("local[2]")
      .appName(s"graft-xjvm-$tid")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      val wh = new graft.sources.Warehouse(spark, root,
        keepGenerations = 2, lockWaitMs = 120_000L, lockStaleMs = 600_000L)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, s"_xjvm_ready_$tid"), Array.emptyByteArray)
      val go       = java.nio.file.Paths.get(root, "_xjvm_go")
      val deadline = System.currentTimeMillis() + 120_000L
      while (!java.nio.file.Files.exists(go) && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      require(java.nio.file.Files.exists(go), "parent never signaled go")
      mode match {
        case "upsert" =>
          for (i <- 1 to nOps) {
            val src = Seq.tabulate(5)(j => (tid * 1000L + j, i.toLong, s"jvm$tid"))
              .toDF("k", "version", "writer")
            wh.upsert("silver", "xjvm", src, keys = Seq("k"), versionCol = "version")
          }
        case "compact" =>
          // tiny target so every pass genuinely rewrites multiple files
          for (_ <- 1 to nOps) wh.compact("silver", "xjvm", targetRowsPerFile = 50L)
        case "clone" =>
          for (i <- 1 to nOps)
            wh.cloneTable("silver", "xjvm", "silver", s"xjvm_clone_$i")
        case other => sys.error(s"unknown CrossJvmWriter mode: $other")
      }
      println(s"XJVM $mode writer $tid done: $nOps ops committed")
    } finally spark.stop()
  }
}

package graft.tools

import graft.{Engine, Scratch}
import graft.sources.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-CARDINALITY rung for the touched-partition prune — the
  * measurement q216's oracle gate and WarehouseSpec's 40-partition pin
  * cannot give: [[Warehouse.pruneToTouched]] switches representations
  * at 10⁴ touched tuples (InSet plan literals below, broadcast
  * left-semi join above) precisely BECAUSE of what happens at 10⁴–10⁵
  * partition directories, so this tool builds a table with that many
  * real hive dirs and measures both representations on the SAME
  * touched set (75 % of the dirs), for both the pure pruned READ and a
  * full UPDATE (COW rewrite + commit swap).
  *
  * What to look for:
  *   - the READ under the inline path must statically prune (the scan
  *     lists touched dirs only — `PartitionFilters` carries the InSet);
  *   - the READ under the join path must recover the pruning at
  *     RUNTIME: `dynamicpruning` must appear in the scan's partition
  *     filters (DPP subquery built from the broadcast), else the join
  *     form silently reads every directory and filters rows after the
  *     fact — the regression this rung exists to catch;
  *   - the UPDATE walls under both representations should agree within
  *     noise (the rewrite dominates; the representation must not add a
  *     planning/serialization cliff at this cardinality).
  *
  * Results merge into `BENCH_sf1.json` under `"partition_prune"`.
  * `sbt "runMain graft.tools.ScalePrune [nParts]"` (default 20000).
  */
object ScalePrune {

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val nParts  = args.headOption.map(_.toInt).getOrElse(20000)
    val rowsPer = 25
    val spark   = Engine.session(32)
    val wh = new Warehouse(spark,
      Scratch.dir(spark, s"prune${nParts}_wh", "/root/testdata/sf0.1"))

    // pre-cluster by the partition column (the q101 discipline): an
    // unclustered dynamic partitionBy write makes every task touch
    // every directory — tasks x dirs files (measured 156 s for a 2k-dir
    // create before this repartition)
    val base = spark.range(nParts.toLong * rowsPer).select(
      col("id").as("k"),
      (col("id") % 997).as("v"),
      format_string("p%05d", col("id") % nParts).as("p"))
      .repartition(math.max(32, nParts / 10), col("p"))
    val tCreate = timed(wh.createOrReplacePartitioned("silver", "pp", base, Seq("p")))
    println(f"SCALEPRUNE created $nParts-dir table (${nParts.toLong * rowsPer} rows) in $tCreate%.1f s")

    // 75 % of the directories — comfortably past the 10^4 switch at the
    // default nParts, and the SAME set drives both representations
    val touchedIds = (0 until nParts).filter(_ % 4 != 0)
    val touched    = touchedIds.map(i => Seq(f"p$i%05d"))
    val expectRows = touchedIds.length.toLong * rowsPer
    val dfAll      = wh.table("silver", "pp")

    case class Read(wall: Double, rows: Long, dpp: Boolean, static: Boolean)
    def read(threshold: Int): Read = {
      val saved = wh.inlineTouchedThreshold
      wh.inlineTouchedThreshold = threshold
      try {
        val pruned = wh.pruneToTouched(dfAll, touched, Seq("p"))
        val obs    = org.apache.spark.sql.Observation()
        val wall   = timed(noop(pruned.observe(obs, count(lit(1)).as("n"))))
        val rows   = obs.get("n").asInstanceOf[Long]
        val plan   = pruned.queryExecution.executedPlan.toString
        Read(wall, rows,
          dpp    = plan.contains("dynamicpruning"),
          static = plan.contains("p#") && plan.contains("PartitionFilters: [") &&
            !plan.contains("PartitionFilters: []"))
      } finally wh.inlineTouchedThreshold = saved
    }
    // warm both plans once (listing caches, codegen), then measure
    read(Int.MaxValue); read(0)
    val inlineRead = read(Int.MaxValue)
    val joinRead   = read(0)
    require(inlineRead.rows == expectRows && joinRead.rows == expectRows,
      s"pruned reads disagree with the touched mass: inline ${inlineRead.rows}, " +
        s"join ${joinRead.rows}, expected $expectRows")
    println(f"SCALEPRUNE read ${touched.length} touched of $nParts dirs: " +
      f"inline ${inlineRead.wall}%6.2f s (static=${inlineRead.static}) vs " +
      f"semi-join ${joinRead.wall}%6.2f s (dpp=${joinRead.dpp})")

    // end-to-end DML: the same 75 %-of-dirs UPDATE under each
    // representation (the second run rewrites the same touched mass, so
    // the walls are comparable); predicate on the partition column so
    // the touched set is exactly the directory subset
    val pred = substring(col("p"), 2, 5).cast("int") % 4 =!= 0
    def dml(threshold: Int, mark: Long): Double = {
      val saved = wh.inlineTouchedThreshold
      wh.inlineTouchedThreshold = threshold
      try timed(wh.update("silver", "pp", pred, Map("v" -> lit(mark))))
      finally wh.inlineTouchedThreshold = saved
    }
    // marks sit outside v's seed range (id % 997), so the count below
    // can't collide with untouched rows
    val dmlInline = dml(Int.MaxValue, 1001L)
    val dmlJoin   = dml(0, 1002L)
    val marked = wh.table("silver", "pp").filter(col("v") === 1002L).count()
    require(marked == expectRows, s"join-path UPDATE marked $marked rows, expected $expectRows")
    println(f"SCALEPRUNE update ${touched.length} dirs: inline $dmlInline%6.2f s vs " +
      f"semi-join $dmlJoin%6.2f s (${dmlJoin / dmlInline}%4.2fx)")

    // ---- merge into BENCH_sf1.json ------------------------------------
    def r(d: Double) = f"$d%.3f"
    val section =
      s"""{"n_dirs":$nParts,"touched_dirs":${touched.length},"rows_per_dir":$rowsPer,""" +
        s""""create_s":${r(tCreate)},""" +
        s""""read_inline_s":${r(inlineRead.wall)},"read_inline_static_prune":${inlineRead.static},""" +
        s""""read_join_s":${r(joinRead.wall)},"read_join_dpp":${joinRead.dpp},""" +
        s""""update_inline_s":${r(dmlInline)},"update_join_s":${r(dmlJoin)},""" +
        s""""update_ratio":${r(dmlJoin / dmlInline)},""" +
        s""""criteria":"inline read must statically prune the listing; join read must show a dynamicpruning partition filter (DPP rebuilt from the broadcast set); the two UPDATE walls must agree within noise - the representation switch exists to keep 10^4+-tuple sets out of task-serialized plan literals, not to change the touched-mass cost"}"""
    val benchPath = java.nio.file.Paths.get("BENCH_sf1.json")
    val existing  = new String(java.nio.file.Files.readAllBytes(benchPath), "UTF-8")
    // replace ONLY this tool's section — other tools' sections survive
    val merged = BenchMerge.replaceSections(existing, Seq("partition_prune" -> section))
    java.nio.file.Files.write(benchPath, merged.getBytes("UTF-8"))
    println("SCALEPRUNE merged partition_prune section into BENCH_sf1.json")
    spark.stop()
  }
}

package graft

import graft.sources.Warehouse
import java.nio.file.Files
import org.apache.hadoop.fs.Path

/** CREATE TABLE ... DEEP CLONE: byte-copy snapshot, contract
  * inheritance, history independence, DV-materializing fallback.
  */
class CloneSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def freshWh() =
    new Warehouse(spark, Files.createTempDirectory("graft_clonespec").toString)

  private def dataFileNames(dir: String): Set[String] = {
    val p  = new Path(dir)
    val hf = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(d: Path): Seq[String] =
      hf.listStatus(d).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else if (!s.getPath.getName.startsWith("_")) Seq(s.getPath.getName)
        else Seq.empty
      }
    walk(p).toSet
  }

  test("clone byte-copies the snapshot, inherits contracts, starts its own history") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "src",
      (1L to 500L).map(k => (k, k * 1.5)).toDF("k", "v").repartition(3))
    wh.addCheckConstraint("silver", "src", "v_pos", "v >= 0")
    val n = wh.cloneTable("silver", "src", "gold", "dst")
    assert(n == 500)
    // byte-copy: identical data-file basenames
    assert(dataFileNames(wh.tablePath("gold", "dst")) ==
      dataFileNames(wh.tablePath("silver", "src")))
    // identical values
    assert(wh.table("gold", "dst").as[(Long, Double)].collect().sorted.toSeq ==
      wh.table("silver", "src").as[(Long, Double)].collect().sorted.toSeq)
    // contract carried: a violating append on the CLONE refuses
    intercept[Warehouse.ConstraintViolationException] {
      wh.append("gold", "dst", Seq((0L, -1.0)).toDF("k", "v"))
    }
    // own history: one CLONE commit, not the source's line
    val ops = wh.history("gold.dst").select("operation").as[String].collect().toSeq
    assert(ops == Seq("CLONE"))
  }

  test("source and clone are fully independent after the clone") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "src", (1L to 100L).toDF("k"))
    wh.cloneTable("silver", "src", "gold", "dst")
    wh.append("gold", "dst", Seq(999L).toDF("k"))
    wh.delete("silver", "src", col("k") <= 50)
    assert(wh.table("silver", "src").count() == 50)
    assert(wh.table("gold", "dst").count() == 101)
    // clone again onto the same name: replaces, pre-clone state retires
    wh.cloneTable("silver", "src", "gold", "dst")
    assert(wh.table("gold", "dst").count() == 50)
    val prev = wh.currentVersion("gold", "dst") - 1
    assert(wh.tableAsOf("gold", "dst", prev).count() == 101)
  }

  test("a source with live tombstones materializes instead of resurrecting them") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "src", (1L to 100L).toDF("k"))
    wh.deleteMor("silver", "src", col("k") <= 30)
    val n = wh.cloneTable("silver", "src", "gold", "dst")
    assert(n == 70)
    assert(wh.table("gold", "dst").count() == 70)
    assert(wh.table("gold", "dst").agg(min("k")).head().getLong(0) == 31L)
  }

  test("partitioned source clones with its layout and partition columns intact") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplacePartitioned("silver", "src",
      (1L to 90L).map(k => (k, s"p${k % 3}")).toDF("k", "pt"), Seq("pt"))
    wh.cloneTable("silver", "src", "gold", "dst")
    assert(wh.partitionColumns("gold", "dst") == Seq("pt"))
    assert(wh.table("gold", "dst").filter(col("pt") === "p2").count() == 30)
    assert(dataFileNames(wh.tablePath("gold", "dst")) ==
      dataFileNames(wh.tablePath("silver", "src")))
  }
}

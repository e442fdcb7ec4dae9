package graft

import graft.sources.Warehouse
import java.nio.file.Files

/** ALTER TABLE RENAME/DROP COLUMN parity: atomic layout-preserving
  * rewrites, version-addressed history (old schema at old versions),
  * contract-reference refusals, partition-column refusals.
  */
class SchemaDdlSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def freshWh() =
    new Warehouse(spark, Files.createTempDirectory("graft_ddlspec").toString)

  test("rename keeps every value, bumps the version, old schema stays time-travelable") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "t",
      Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("k", "amount", "tag")) // v0
    wh.renameColumn("silver", "t", "amount", "balance")                 // v1
    val t = wh.table("silver", "t")
    assert(t.columns.toSeq == Seq("k", "balance", "tag"))
    assert(t.select("k", "balance").as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (2L, 20.0)))
    assert(wh.lastOperation("silver.t").get.getAs[String]("operation") == "RENAME COLUMN")
    // the pre-rename version reads with the OLD schema (Delta contract)
    assert(wh.tableAsOf("silver", "t", 0).columns.toSeq == Seq("k", "amount", "tag"))
    // writes against the new schema work; the old name is gone
    wh.append("silver", "t", Seq((3L, 30.0, "c")).toDF("k", "balance", "tag"))
    assert(wh.table("silver", "t").count() == 3)
    intercept[IllegalArgumentException](wh.renameColumn("silver", "t", "amount", "x"))
  }

  test("drop removes the column and its bloom sidecar; other values intact") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "t",
      Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("k", "amount", "tag"))
    wh.collectBloom("silver", "t", "tag")
    wh.dropColumn("silver", "t", "tag")
    val t = wh.table("silver", "t")
    assert(t.columns.toSeq == Seq("k", "amount"))
    assert(t.as[(Long, Double)].collect().toSet == Set((1L, 10.0), (2L, 20.0)))
    assert(wh.lastOperation("silver.t").get.getAs[String]("operation") == "DROP COLUMN")
    val hf = new org.apache.hadoop.fs.Path(wh.tablePath("silver", "t"))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!hf.exists(new org.apache.hadoop.fs.Path(
      wh.tablePath("silver", "t") + ".__bloom_tag")))
  }

  test("constraints, generated columns, and partition columns refuse the DDL") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "t",
      Seq((1L, 10.0, "x1")).toDF("k", "price", "name"))
    wh.addCheckConstraint("silver", "t", "price_pos", "price >= 0")
    wh.addGeneratedColumn("silver", "t", "name_sha", "sha2(name, 256)")
    intercept[IllegalArgumentException](wh.renameColumn("silver", "t", "price", "cost"))
    intercept[IllegalArgumentException](wh.dropColumn("silver", "t", "price"))
    intercept[IllegalArgumentException](wh.dropColumn("silver", "t", "name"))     // gen source
    intercept[IllegalArgumentException](wh.dropColumn("silver", "t", "name_sha")) // gen col
    // schema unchanged by any refusal
    assert(wh.table("silver", "t").columns.toSeq == Seq("k", "price", "name", "name_sha"))
    // dropping the contracts unblocks the DDL
    wh.dropConstraint("silver", "t", "price_pos")
    wh.dropGeneratedColumn("silver", "t", "name_sha")
    wh.renameColumn("silver", "t", "price", "cost")
    wh.dropColumn("silver", "t", "name_sha")
    assert(wh.table("silver", "t").columns.toSeq == Seq("k", "cost", "name"))
    // partition columns always refuse
    val wh2 = freshWh()
    wh2.createOrReplacePartitioned("silver", "p",
      Seq((1L, "a"), (2L, "b")).toDF("k", "pt"), Seq("pt"))
    intercept[IllegalArgumentException](wh2.renameColumn("silver", "p", "pt", "part"))
    intercept[IllegalArgumentException](wh2.dropColumn("silver", "p", "pt"))
  }

  test("rename on a partitioned table preserves the directory layout") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplacePartitioned("silver", "t",
      (1L to 100L).map(k => (k, s"p${k % 3}", k * 1.0)).toDF("k", "pt", "v"), Seq("pt"))
    wh.renameColumn("silver", "t", "v", "score")
    val t = wh.table("silver", "t")
    assert(t.columns.sorted.toSeq == Seq("k", "pt", "score"))
    assert(t.filter(col("pt") === "p1").count() == 34)
    assert(wh.partitionColumns("silver", "t") == Seq("pt"))
    assert(t.agg(sum("score")).head().getDouble(0) == (1L to 100L).map(_.toDouble).sum)
  }

  test("rename after MOR deletes materializes first — no resurrection") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "t", (1L to 50L).map(k => (k, k * 2.0)).toDF("k", "v"))
    wh.deleteMor("silver", "t", col("k") <= 10)
    wh.renameColumn("silver", "t", "v", "w")
    val t = wh.table("silver", "t")
    assert(t.columns.toSeq == Seq("k", "w"))
    assert(t.count() == 40)
    assert(t.agg(min("k")).head().getLong(0) == 11L)
    val ops = wh.history("silver.t").orderBy("version")
      .select("operation").as[String].collect().toSeq
    assert(ops == Seq("CREATE OR REPLACE", "DELETE_MOR", "REORG", "RENAME COLUMN"))
  }
}

package graft

import graft.sources.Warehouse
import java.nio.file.Files

/** Delta generated-column parity (`GENERATED ALWAYS AS (expr)`):
  * writers may omit the column (computed during the write) or carry it
  * (validated — a mismatch refuses the batch); declaring on an
  * existing table backfills via one staged rewrite; UPDATEs that would
  * stale the derivation are refused.
  */
class GeneratedColumnsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def freshWh() =
    new Warehouse(spark, Files.createTempDirectory("graft_genspec").toString)

  test("declaring on an existing table backfills; later writers get it computed") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "g1", Seq((1L, 2.0), (2L, 3.0)).toDF("k", "x"))
    val v0 = wh.currentVersion("silver", "g1")
    wh.addGeneratedColumn("silver", "g1", "x2", "x * 2")
    assert(wh.currentVersion("silver", "g1") == v0 + 1, "backfill is one staged-rewrite commit")
    assert(wh.generatedColumns("silver", "g1") == Seq(("x2", "x * 2")))
    def vals = wh.table("silver", "g1").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(vals == Seq((1L, 4.0), (2L, 6.0)))
    // append omitting the column: computed during the write
    wh.append("silver", "g1", Seq((3L, 5.0)).toDF("k", "x"))
    assert(vals == Seq((1L, 4.0), (2L, 6.0), (3L, 10.0)))
    // merge omitting the column: computed on the source batch too
    wh.createOrReplace("silver", "g1v",
      Seq((1L, 2.0, 0L)).toDF("k", "x", "v"))
    wh.addGeneratedColumn("silver", "g1v", "x2", "x * 2")
    wh.upsert("silver", "g1v", Seq((1L, 7.0, 1L), (9L, 1.0, 1L)).toDF("k", "x", "v"),
      Seq("k"), "v")
    val m = wh.table("silver", "g1v").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(m == Seq((1L, 14.0), (9L, 2.0)))
  }

  test("a carried value is validated: matching passes, mismatching refuses the batch") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "g2", Seq((1L, 2.0)).toDF("k", "x"))
    wh.addGeneratedColumn("silver", "g2", "x2", "x * 2")
    wh.append("silver", "g2", Seq((2L, 3.0, 6.0)).toDF("k", "x", "x2")) // correct carry
    val ver = wh.currentVersion("silver", "g2")
    val e = intercept[Warehouse.ConstraintViolationException] {
      wh.append("silver", "g2", Seq((3L, 4.0, 99.0)).toDF("k", "x", "x2"))
    }
    assert(e.getMessage.contains("generated x2 mismatch"))
    assert(wh.table("silver", "g2").count() == 2)
    assert(wh.currentVersion("silver", "g2") == ver, "refused batch commits nothing")
  }

  test("declaring over an existing column validates it; mismatch records nothing") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "g3", Seq((1L, 2.0, 4.0), (2L, 3.0, 7.0)).toDF("k", "x", "x2"))
    intercept[Warehouse.ConstraintViolationException] {
      wh.addGeneratedColumn("silver", "g3", "x2", "x * 2") // row 2 mismatches
    }
    assert(wh.generatedColumns("silver", "g3").isEmpty)
    wh.update("silver", "g3", col("k") === 2L, Map("x2" -> lit(6.0)))
    wh.addGeneratedColumn("silver", "g3", "x2", "x * 2") // now consistent
    assert(wh.generatedColumns("silver", "g3").nonEmpty)
  }

  test("UPDATE refuses to stale the derivation; unrelated assignments pass; drop lifts it") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "g4", Seq((1L, 2.0, "t")).toDF("k", "x", "tag"))
    wh.addGeneratedColumn("silver", "g4", "x2", "x * 2")
    intercept[IllegalArgumentException](
      wh.update("silver", "g4", col("k") === 1L, Map("x2" -> lit(0.0))))
    intercept[IllegalArgumentException](
      wh.update("silver", "g4", col("k") === 1L, Map("x" -> lit(9.0))))
    // a column outside the derivation updates fine
    wh.update("silver", "g4", col("k") === 1L, Map("tag" -> lit("u")))
    assert(wh.table("silver", "g4").head().getAs[String]("tag") == "u")
    assert(wh.dropGeneratedColumn("silver", "g4", "x2"))
    wh.update("silver", "g4", col("k") === 1L, Map("x" -> lit(9.0))) // now legal
    assert(wh.table("silver", "g4").head().getAs[Double]("x") == 9.0)
    // the data column itself remains after the declaration is dropped
    assert(wh.table("silver", "g4").columns.contains("x2"))
  }

  test("quarantine ingest computes generated columns before classification") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "g5", Seq((1L, 10.0)).toDF("k", "x"))
    wh.addGeneratedColumn("silver", "g5", "x2", "x * 2")
    wh.addCheckConstraint("silver", "g5", "x2_cap", "x2 <= 100") // over the GENERATED column
    val (ok, bad) = wh.appendOrQuarantine("silver", "g5",
      Seq((2L, 20.0), (3L, 60.0)).toDF("k", "x")) // x2 = 40 passes, 120 violates
    assert((ok, bad) == (1L, 1L))
    assert(wh.table("silver", "g5").count() == 2)
    val q = wh.table("silver", "g5__quarantine").head()
    assert(q.getAs[Long]("k") == 3L && q.getAs[String]("_violated") == "x2_cap")
  }
}

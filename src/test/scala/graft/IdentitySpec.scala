package graft

import graft.sources.Warehouse
import java.nio.file.Files

/** GENERATED ALWAYS AS IDENTITY parity: omit-and-assign uniqueness,
  * strict cross-batch ordering, ALWAYS refusal on carried values,
  * merge stability (inserts fresh / updates keep), adoption and
  * backfill declaration paths, burn-on-refusal crash safety, clone
  * inheritance, DDL refusals.
  */
class IdentitySpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def freshWh() =
    new Warehouse(spark, Files.createTempDirectory("graft_idspec").toString)

  test("appends omitting the column get unique, strictly increasing-across-batches ids") {
    import spark.implicits._
    val wh = freshWh()
    wh.addIdentityColumn("silver", "t", "sk", startWith = 100L, step = 5L)
    wh.createOrReplace("silver", "t", (1L to 50L).toDF("k").repartition(3))
    val b1 = wh.table("silver", "t").select("sk").as[Long].collect()
    assert(b1.length == 50 && b1.distinct.length == 50, "unique within the batch")
    assert(b1.min >= 100L, "ids start at startWith")
    wh.append("silver", "t", (51L to 80L).toDF("k").repartition(2))
    val all = wh.table("silver", "t").select("sk").as[Long].collect()
    assert(all.length == 80 && all.distinct.length == 80, "unique across batches")
    val b2 = wh.table("silver", "t").filter($"k" > 50).select("sk").as[Long].collect()
    assert(b2.min > b1.max, "batch 2 ids all beyond batch 1's high water")
    // ALWAYS: carrying the column refuses
    intercept[IllegalArgumentException] {
      wh.append("silver", "t", Seq((81L, 1L)).toDF("k", "sk"))
    }
    assert(wh.table("silver", "t").count() == 80)
  }

  test("merge: inserts get fresh ids, updates KEEP the target row's id") {
    import spark.implicits._
    val wh = freshWh()
    wh.addIdentityColumn("silver", "t", "sk")
    wh.createOrReplace("silver", "t",
      Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("k", "v", "ver"))
    val before = wh.table("silver", "t")
      .select($"k", $"sk").as[(Long, Long)].collect().toMap
    wh.upsert("silver", "t",
      Seq((2L, "b2", 1L), (3L, "c", 1L)).toDF("k", "v", "ver"), Seq("k"), "ver")
    val after = wh.table("silver", "t")
      .select($"k", $"sk", $"v").as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(after(2L)._2 == "b2", "row updated")
    assert(after(2L)._1 == before(2L), "updated row keeps its identity value")
    assert(after(1L)._1 == before(1L), "kept row untouched")
    assert(after(3L)._1 > before.values.max, "insert gets a fresh id beyond the high water")
    assert(after.values.map(_._1).toSeq.distinct.length == 3)
    // merging ON the identity column refuses
    intercept[IllegalArgumentException] {
      wh.upsert("silver", "t", Seq(("x", 2L)).toDF("v", "ver"), Seq("sk"), "ver")
    }
  }

  test("declaring on a populated table: adoption keeps values, backfill assigns them") {
    import spark.implicits._
    val wh = freshWh()
    // adoption: the column exists with values
    wh.createOrReplace("silver", "adopt", Seq((1L, 7L), (2L, 9L)).toDF("k", "sk"))
    wh.addIdentityColumn("silver", "adopt", "sk")
    assert(wh.table("silver", "adopt").select("sk").as[Long].collect().sorted.toSeq ==
      Seq(7L, 9L), "existing values survive adoption")
    wh.append("silver", "adopt", Seq(3L).toDF("k"))
    val sks = wh.table("silver", "adopt").select("sk").as[Long].collect()
    assert(sks.distinct.length == 3 && sks.max > 9L, "fresh ids go beyond the adopted max")
    // backfill: the column is absent from a populated table
    wh.createOrReplace("silver", "bf", (1L to 40L).toDF("k").repartition(2))
    wh.addIdentityColumn("silver", "bf", "sk", startWith = 1000L)
    val bf = wh.table("silver", "bf").select("sk").as[Long].collect()
    assert(bf.length == 40 && bf.distinct.length == 40 && bf.min >= 1000L)
    assert(wh.lastOperation("silver.bf").get.getAs[String]("operation") == "CREATE OR REPLACE")
  }

  test("a refused batch burns its ids — uniqueness survives the failure") {
    import spark.implicits._
    val wh = freshWh()
    wh.addIdentityColumn("silver", "t", "sk")
    wh.createOrReplace("silver", "t", Seq((1L, 5.0)).toDF("k", "price"))
    wh.addCheckConstraint("silver", "t", "price_pos", "price >= 0")
    val hw1 = wh.identityColumns("silver", "t").head._3
    intercept[Warehouse.ConstraintViolationException] {
      wh.append("silver", "t", Seq((2L, -1.0)).toDF("k", "price"))
    }
    val hw2 = wh.identityColumns("silver", "t").head._3
    assert(hw2 > hw1, "the refused batch advanced the high water (burned ids)")
    wh.append("silver", "t", Seq((3L, 1.0)).toDF("k", "price"))
    val sks = wh.table("silver", "t").select("sk").as[Long].collect()
    assert(sks.distinct.length == 2 && sks.max > hw2 - 1)
  }

  test("partitioned CTAS assigns ids; a carried REPLACE advances the high water") {
    import spark.implicits._
    val wh = freshWh()
    wh.addIdentityColumn("silver", "p", "sk")
    wh.createOrReplacePartitioned("silver", "p",
      (1L to 30L).map(k => (k, s"g${k % 2}")).toDF("k", "pt"), Seq("pt"))
    val sks = wh.table("silver", "p").select("sk").as[Long].collect()
    assert(sks.length == 30 && sks.distinct.length == 30,
      "partitioned CTAS must assign unique ids")
    // a REPLACE legitimately CARRIES explicit ids — and must raise the
    // high water past them, or the next append would re-assign them
    wh.createOrReplace("silver", "c2", Seq(1L).toDF("k")) // unrelated warmup table
    wh.addIdentityColumn("silver", "r", "sk")
    wh.createOrReplace("silver", "r", Seq((1L, 500L), (2L, 600L)).toDF("k", "sk"))
    wh.append("silver", "r", Seq(3L, 4L).toDF("k"))
    val rs = wh.table("silver", "r").select("sk").as[Long].collect()
    assert(rs.distinct.length == 4, "carried and assigned ids must not collide")
    assert(rs.filterNot(Set(500L, 600L)).forall(_ > 600L),
      "post-replace appends assign beyond the carried max")
    // UPDATE may not assign an identity column, COW or MOR
    intercept[IllegalArgumentException] {
      wh.update("silver", "r", col("k") === 1L, Map("sk" -> lit(1L)))
    }
    intercept[IllegalArgumentException] {
      wh.updateMor("silver", "r", col("k") === 1L, Map("sk" -> lit(1L)))
    }
  }

  test("clone inherits the declaration; rename/drop refuse on identity columns") {
    import spark.implicits._
    val wh = freshWh()
    wh.addIdentityColumn("silver", "src", "sk")
    wh.createOrReplace("silver", "src", Seq(1L, 2L).toDF("k"))
    wh.cloneTable("silver", "src", "gold", "dst")
    assert(wh.identityColumns("gold", "dst").map(_._1) == Seq("sk"))
    intercept[IllegalArgumentException] {
      wh.append("gold", "dst", Seq((3L, 99L)).toDF("k", "sk"))
    }
    intercept[IllegalArgumentException](wh.renameColumn("silver", "src", "sk", "id"))
    intercept[IllegalArgumentException](wh.dropColumn("silver", "src", "sk"))
    // dropping the declaration unblocks, values stay
    assert(wh.dropIdentityColumn("silver", "src", "sk"))
    wh.dropColumn("silver", "src", "sk")
    assert(wh.table("silver", "src").columns.toSeq == Seq("k"))
  }
}

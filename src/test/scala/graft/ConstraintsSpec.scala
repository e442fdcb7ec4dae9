package graft

import graft.sources.Warehouse
import java.nio.file.Files

/** Delta constraint parity: CHECK constraints (SQL semantics — FALSE
  * violates, NULL passes) and NOT NULL column invariants, validated
  * against existing data at ADD time and against every write's
  * incoming row images BEFORE anything lands — a violating batch
  * leaves row count, version, and change feed untouched.
  */
class ConstraintsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def freshWh() =
    new Warehouse(spark, Files.createTempDirectory("graft_ctspec").toString)

  test("ADD CONSTRAINT validates existing data and refuses to record a violated one") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "c1",
      Seq((1L, 10.0), (2L, -5.0)).toDF("k", "price"))
    val e = intercept[Warehouse.ConstraintViolationException] {
      wh.addCheckConstraint("silver", "c1", "price_pos", "price >= 0")
    }
    assert(e.getMessage.contains("price_pos") && e.getMessage.contains("1 rows"))
    assert(wh.constraints("silver", "c1").isEmpty, "violated constraint must not be recorded")
    // after fixing the data it records
    wh.update("silver", "c1", col("price") < 0, Map("price" -> lit(0.0)))
    wh.addCheckConstraint("silver", "c1", "price_pos", "price >= 0")
    assert(wh.constraints("silver", "c1") == Seq(("price_pos", "CHECK", "price >= 0")))
  }

  test("a violating append/merge/replace changes nothing: rows, version, feed all untouched") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "c2",
      Seq((1L, 10.0, 1), (2L, 5.0, 1)).toDF("k", "price", "v"))
    wh.addCheckConstraint("silver", "c2", "price_pos", "price >= 0")
    val ver = wh.currentVersion("silver", "c2")
    intercept[Warehouse.ConstraintViolationException] {
      wh.append("silver", "c2", Seq((3L, -1.0, 1)).toDF("k", "price", "v"))
    }
    intercept[Warehouse.ConstraintViolationException] {
      wh.upsert("silver", "c2",
        Seq((2L, -9.0, 2)).toDF("k", "price", "v"), Seq("k"), "v")
    }
    intercept[Warehouse.ConstraintViolationException] {
      wh.createOrReplace("silver", "c2", Seq((9L, -1.0, 1)).toDF("k", "price", "v"))
    }
    assert(wh.table("silver", "c2").count() == 2)
    assert(wh.currentVersion("silver", "c2") == ver)
    // refused writes must post no feed rows — the feed sidecar was
    // never even created (changeFeed refuses when no merge recorded)
    intercept[IllegalArgumentException](wh.changeFeed("silver", "c2"))
    // valid writes still go through
    wh.append("silver", "c2", Seq((3L, 1.0, 1)).toDF("k", "price", "v"))
    assert(wh.table("silver", "c2").count() == 3)
  }

  test("CHECK follows SQL semantics: NULL passes, FALSE violates") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "c3",
      Seq((1L, Some(10.0)), (2L, None)).toDF("k", "price")) // NULL price
    wh.addCheckConstraint("silver", "c3", "price_pos", "price >= 0") // NULL row passes
    wh.append("silver", "c3", Seq((3L, Option.empty[Double])).toDF("k", "price"))
    assert(wh.table("silver", "c3").count() == 3)
    intercept[Warehouse.ConstraintViolationException] {
      wh.append("silver", "c3", Seq((4L, Some(-1.0))).toDF("k", "price"))
    }
  }

  test("NOT NULL invariant: null values and an absent column both violate") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "c4",
      Seq((1L, "a"), (2L, "b")).toDF("k", "name"))
    wh.addNotNullConstraint("silver", "c4", "name")
    intercept[Warehouse.ConstraintViolationException] {
      wh.append("silver", "c4", Seq((3L, null: String)).toDF("k", "name"))
    }
    // schema-evolution append missing the column entirely: stored rows
    // would be NULL there — outright violation, unlike a CHECK
    intercept[Warehouse.ConstraintViolationException] {
      wh.append("silver", "c4", Seq(Tuple1(4L)).toDF("k"))
    }
    assert(wh.table("silver", "c4").count() == 2)
    // a CHECK over an absent column passes vacuously by contrast
    wh.addCheckConstraint("silver", "c4", "name_short", "length(name) < 10")
    assert(wh.append("silver", "c4", Seq((4L, "ok")).toDF("k", "name")) == 1L)
  }

  test("UPDATE enforces on post-images, on both whole-table and partitioned layouts") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "c5",
      Seq((1L, 10.0), (2L, 5.0)).toDF("k", "price"))
    wh.addCheckConstraint("silver", "c5", "price_pos", "price >= 0")
    intercept[Warehouse.ConstraintViolationException] {
      wh.update("silver", "c5", col("k") === 2L, Map("price" -> lit(-3.0)))
    }
    assert(wh.table("silver", "c5").filter("k = 2").head().getDouble(1) == 5.0)
    wh.update("silver", "c5", col("k") === 2L, Map("price" -> lit(7.0)))
    assert(wh.table("silver", "c5").filter("k = 2").head().getDouble(1) == 7.0)

    wh.createOrReplacePartitioned("silver", "c5p",
      Seq((1L, 10.0, "a"), (2L, 5.0, "b")).toDF("k", "price", "part"), Seq("part"))
    wh.addCheckConstraint("silver", "c5p", "price_pos", "price >= 0")
    intercept[Warehouse.ConstraintViolationException] {
      wh.update("silver", "c5p", col("k") === 2L, Map("price" -> lit(-3.0)))
    }
    assert(wh.table("silver", "c5p").filter("k = 2").head().getAs[Double]("price") == 5.0)
  }

  test("DROP CONSTRAINT lifts enforcement; constraints survive a full REPLACE; dropTable clears them") {
    import spark.implicits._
    val wh = freshWh()
    wh.createOrReplace("silver", "c6", Seq((1L, 1.0)).toDF("k", "price"))
    wh.addCheckConstraint("silver", "c6", "price_pos", "price >= 0")
    // the contract survives replacing the table's data wholesale
    intercept[Warehouse.ConstraintViolationException] {
      wh.createOrReplace("silver", "c6", Seq((1L, -1.0)).toDF("k", "price"))
    }
    assert(wh.dropConstraint("silver", "c6", "price_pos"))
    assert(!wh.dropConstraint("silver", "c6", "price_pos"), "second drop reports absence")
    wh.append("silver", "c6", Seq((2L, -1.0)).toDF("k", "price")) // now legal
    assert(wh.table("silver", "c6").count() == 2)
    // dropping the table clears its contract (and sidecars) with it
    wh.addCheckConstraint("silver", "c6", "k_pos", "k > 0")
    wh.dropTable("silver", "c6")
    assert(wh.constraints("silver", "c6").isEmpty)
    wh.createOrReplace("silver", "c6", Seq((-5L, 1.0)).toDF("k", "price"))
    assert(wh.table("silver", "c6").count() == 1, "recreated table must not inherit old constraints")
    // recreated table must not inherit a stale feed: the sidecar is
    // gone, so changeFeed refuses rather than serving old rows
    intercept[IllegalArgumentException](wh.changeFeed("silver", "c6"))
  }
}

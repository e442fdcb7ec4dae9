package graft

import org.apache.spark.sql.types.{TimestampType, TimestampNTZType, LongType}

/** Guard against testdata regeneration changing physical parquet types
  * under an accessor's feet (round 9: events.ts flipped from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS)/NTZ and one hard-wired
  * truncation took down 12 oracle queries, 24 tests, and the bench).
  *
  * Every `Tables` accessor must ANALYZE — schema resolved, an action
  * runnable — on every scale factor present, regardless of which
  * testdata generation is on disk.
  */
class TestdataShapeSpec extends SparkSpec {

  private val accessors: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    Seq(
      "region"     -> Tables.region _,
      "nation"     -> Tables.nation _,
      "customer"   -> Tables.customer _,
      "supplier"   -> Tables.supplier _,
      "part"       -> Tables.part _,
      "orders"     -> Tables.orders _,
      "lineitem"   -> Tables.lineitem _,
      "events"     -> Tables.events _,
      "documents"  -> Tables.documents _,
      "embeddings" -> Tables.embeddings _
    )

  private val sfDirs =
    Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(d).isDirectory)

  test("every Tables accessor analyzes and yields rows on every scale factor") {
    assert(sfDirs.nonEmpty, "no testdata dirs found")
    for (dir <- sfDirs; (name, fn) <- accessors) {
      val df = fn(spark, dir) // throws at analysis if a physical type drifted
      assert(df.schema.fields.nonEmpty, s"$name@$dir: empty schema")
      assert(df.limit(1).count() == 1L, s"$name@$dir: no rows")
    }
  }

  test("events.ts is a wall-clock timestamp on both testdata generations") {
    for (dir <- sfDirs) {
      val ts = Tables.events(spark, dir).schema("ts").dataType
      assert(ts == TimestampType, s"events.ts@$dir resolved to $ts")
      // raw scan may be nanos-as-long or a native timestamp; both accepted
      val raw = Tables.read(spark, dir, "events").schema("ts").dataType
      assert(Set[Any](LongType, TimestampType, TimestampNTZType).contains(raw),
        s"raw events.ts@$dir has unexpected physical type $raw")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Source-format breadth: the engine's scan/sink layer is DataSource
  * V2 behind the same plans — ORC (oracle-attested via q71), CSV and
  * JSON round-trips must be lossless for the column types they
  * support.
  */
class FormatsSpec extends SparkSpec {

  test("ORC round-trip query equals the parquet-path aggregation (q19 twin)") {
    val viaOrc = QueriesRel2.q71_orc_roundtrip(spark, sfDir).collect().map(_.toSeq).toSeq
    val viaParquet = Queries.q19_events_day_agg(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(viaOrc.nonEmpty && viaOrc == viaParquet)
  }

  test("CSV round-trip is lossless for scalar document columns") {
    import spark.implicits._
    val dir  = java.nio.file.Files.createTempDirectory("graft_formats_csv").toString
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"lang", $"source", $"n_chars")
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(docs.schema).csv(dir)
      .collect().map(_.toSeq).toSet
    assert(back == docs.collect().map(_.toSeq).toSet)
  }

  test("JSON-lines round-trip preserves event timestamps to the microsecond") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_formats_json").toString
    val evs = Tables.events(spark, sfDir).select($"event_id", $"ts", $"event_type", $"value")
    // Spark's default JSON timestampFormat carries only milliseconds —
    // micro precision needs an explicit 6-digit fraction on BOTH sides
    val fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    evs.write.mode("overwrite").option("timestampFormat", fmt).json(dir)
    val back = spark.read.schema(evs.schema).option("timestampFormat", fmt).json(dir)
      .select($"event_id", unix_micros($"ts").as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val orig = evs.select($"event_id", unix_micros($"ts").as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back == orig)
  }
}
